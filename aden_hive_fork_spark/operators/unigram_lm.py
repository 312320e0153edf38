"""Unigram-LM (SentencePiece-style) tokenizer training as PURE
relational operators — the third member of the trained-tokenizer
family (BPE: operators/bpe_train.bpe_train_relational, q240/q314;
WordPiece: operators/bpe_train.wordpiece_segment, q325).

Model: Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates" — the unigram
language model underlying SentencePiece. The deterministic variant
implemented here is hard-EM (Viterbi-EM): the E-step segments every
word by its single BEST segmentation under the current token
log-probabilities (argmax instead of forward-backward marginals) and
counts token usage from those segmentations; the M-step re-estimates
add-one-smoothed probabilities over the fixed seed vocabulary.
Viterbi-EM is the classical deterministic member of the EM family
and makes every intermediate value an exact integer or a quantized
double — hash-gate checkable (suite q334 model / q335 segmentation).

Reference parity: the reference has NO tokenizer trainer (its text
tooling pretokenizes per call — tools/src/aden_tools/tools); this is
a §2.D training-data-pipeline extension alongside BPE and WordPiece.

Scale shape (the q240 discipline): the corpus reduces ONCE to the
(word, freq) vocabulary — the only data-sized pass. Everything after
runs on vocabulary-sized relations: the seed-vocab aggregate, one
broadcast join + one keyed aggregate per E-step, and 1-row broadcast
totals per M-step. The Viterbi DP itself is MAP-SIDE — a nested
higher-order ``aggregate`` over sequence(1, length(word)) carrying
(best-score, backpointer) arrays, with token log-probs looked up
from a per-word map built by ONE broadcast join. No Python in the
row path, no driver-side loop over positions, no per-position
shuffle; EM rounds are a driver loop over em_rounds (2-3) only.

Determinism contract (what makes it engine-exact):
- words: split(trim(text), ' '), drop empties — the q325 tokenizer;
- seed vocabulary: ALL single characters, plus substrings of length
  2..max_piece_len whose freq-weighted occurrence count >= min_occ;
  seed counts are exact integers;
- probabilities: the dsir discipline (operators/sampling) — add-one
  smoothing over the seed vocab, ROUND-6 then floored at 1e-6, ln
  floor-quantized at 1e-9;
- DP: score additions are single IEEE doubles in identical order on
  both engines; ties broken toward the LONGER token (the oracle's
  ORDER BY score DESC, l DESC);
- E-step counts: exact integers (sum of word freqs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .stats import fquant


def unigram_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq BIGINT): the ONE corpus-sized pass — every later
    stage runs on this vocabulary-sized relation."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def unigram_seed_vocab(
    words: DataFrame, min_occ: int = 50, max_piece_len: int = 4
) -> DataFrame:
    """(token, seed_cnt BIGINT): the fixed training vocabulary — all
    single characters (unconditionally, so every word is segmentable)
    plus substrings of length 2..``max_piece_len`` whose freq-weighted
    occurrence count reaches ``min_occ``. Occurrences are counted at
    every start position (substring multiplicity), weighted by word
    frequency — the SentencePiece seed heuristic, exact integers."""
    occ = words.select(
        "freq",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), i ->
          transform(sequence(1, least({int(max_piece_len)},
                                      length(word) - i + 1)), l ->
            substring(word, i, l))))"""
            )
        ).alias("token"),
    )
    return (
        occ.groupBy("token")
        .agg(F.sum("freq").cast("bigint").alias("seed_cnt"))
        .filter(
            (F.length("token") == 1) | (F.col("seed_cnt") >= int(min_occ))
        )
    )


def _logp_table(counts: DataFrame, cnt_col: str) -> DataFrame:
    """(token, logp): M-step — add-one smoothed over the fixed seed
    vocabulary (V = row count, total = sum of counts), ROUND-6,
    floored at 1e-6 (the dsir probability-underflow guard), ln
    floor-quantized 1e-9."""
    totals = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("_v"),
        F.sum(cnt_col).cast("bigint").alias("_t"),
    )
    p = F.greatest(
        F.round(
            (F.col(cnt_col) + 1).cast("double")
            / (F.col("_t") + F.col("_v")).cast("double"),
            6,
        ),
        F.lit(1e-6),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token", fquant(F.log(p), 9).alias("logp")
    )


def viterbi_segment(
    words: DataFrame, vocab: DataFrame, max_piece_len: int
) -> DataFrame:
    """Best-path segmentation of every word under the unigram model
    ``vocab`` (token, logp) — ONE Arrow ``mapInPandas`` pass (r12)
    with the model collected to a driver dict (the same
    vocabulary-sized boundedness as the broadcast join the HOF form
    pays), replacing the interpreted higher-order-function DP that
    never enters whole-stage codegen (SCALING §29).

    IEEE-exact replay contract: the DP is a per-word SEQUENTIAL
    scalar recurrence — each candidate score is exactly
    ``best[j-l] + logp`` (one double add) compared with ``>=`` in
    ascending-``l`` order, so Python's float64 arithmetic reproduces
    the HOF bit for bit (no reassociated reductions exist to
    diverge). Pinned against the retained
    :func:`viterbi_segment_hof` by ``tests/test_round12_opts.py``.

    The loud vocabulary-coverage guard is preserved: a word whose
    best-path score sits at the -1e300 DP floor raises with the same
    "does not cover" message the HOF's ``assert_true`` carried
    (surfaced at action time as a PythonException).

    Returns (word, freq, pieces, n_pieces INT, score DOUBLE — the raw
    unrounded best-path log-probability)."""
    vmap = {
        r["token"]: r["logp"]
        for r in vocab.select("token", "logp").collect()
    }
    L = int(max_piece_len)

    def seg(batches):
        import pandas as pd

        for pdf in batches:
            pieces_out: list[str] = []
            np_out: list[int] = []
            score_out: list[float] = []
            for w in pdf["word"]:
                n = len(w)
                best = [0.0] * (n + 1)
                bp = [0] * (n + 1)
                for j in range(1, n + 1):
                    s = -1e300
                    pl = 0
                    for l in range(1, min(L, j) + 1):
                        lp = vmap.get(w[j - l : j])
                        if lp is None:
                            continue
                        sc = best[j - l] + lp
                        if sc >= s:
                            s = sc
                            pl = l
                    best[j] = s
                    bp[j] = pl
                if n > 0 and not best[n] > -1e250:
                    raise ValueError(
                        "viterbi_segment: vocabulary does not cover "
                        f"word '{w}' (every character must be in "
                        "vocab)"
                    )
                ps: list[str] = []
                cur = n
                while cur > 0:
                    l = bp[cur]
                    ps.append(w[cur - l : cur])
                    cur -= l
                ps.reverse()
                pieces_out.append(" ".join(ps))
                np_out.append(len(ps))
                score_out.append(best[n] if n > 0 else 0.0)
            yield pd.DataFrame(
                {
                    "word": pd.Series(
                        pdf["word"].to_numpy(), dtype="object"
                    ),
                    "freq": pd.Series(
                        pdf["freq"].to_numpy(), dtype="int64"
                    ),
                    "pieces": pd.Series(pieces_out, dtype="object"),
                    "n_pieces": pd.Series(np_out, dtype="int64"),
                    "score": pd.Series(score_out, dtype="float64"),
                }
            )

    return words.select("word", "freq").mapInPandas(
        seg,
        "word string, freq bigint, pieces string, n_pieces int, "
        "score double",
    )


def viterbi_segment_hof(
    words: DataFrame, vocab: DataFrame, max_piece_len: int
) -> DataFrame:
    """REFERENCE implementation of :func:`viterbi_segment` as
    higher-order-function expressions (the pre-r12 production path):
    map-side DP, one broadcast join + one keyed aggregate total.

    Plan: explode (end-position, length) candidate tokens per word
    (bounded: length(word) * max_piece_len rows), broadcast-join the
    vocabulary, fold the hits back to ONE map per word, then run the
    whole forward DP and the backtrack INSIDE higher-order
    ``aggregate`` expressions — whole-stage-codegen JVM arithmetic,
    no per-position shuffle, no Python.

    Ties prefer the LONGER token (iterating lengths ascending and
    replacing on >=, which is the oracle's ORDER BY s DESC, l DESC).

    Precondition: ``vocab`` must cover every character of every word
    (trainer-built vocabularies do — unigram_seed_vocab admits all
    single characters unconditionally). A word with an unreachable
    position would otherwise backtrack through bp=0 and emit
    malformed empty pieces; this function FAILS LOUDLY instead
    (assert_true on the final DP score), and fully-unmatched words
    are kept by the left join so they hit the same guard rather than
    silently dropping.

    Returns (word, freq, pieces, n_pieces INT, score DOUBLE — the raw
    unrounded best-path log-probability)."""
    L = int(max_piece_len)
    cand = words.select(
        "word",
        "freq",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), j ->
          transform(sequence(1, least({L}, j)), l ->
            struct(j AS j, l AS l,
                   substring(word, j - l + 1, l) AS token))))"""
            )
        ).alias("c"),
    ).select(
        "word",
        "freq",
        (F.col("c.j") * (L + 1) + F.col("c.l")).alias("k"),
        F.col("c.token").alias("token"),
    )
    # LEFT join: a candidate token absent from the vocab maps to a
    # null logp — element_at then returns null exactly as a missing
    # key would, so the DP arithmetic is unchanged; the difference is
    # that words with NO vocab hit at all survive to the loud guard
    # below instead of silently dropping at an inner join.
    rows = (
        cand.join(F.broadcast(vocab), "token", "left")
        .groupBy("word", "freq")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("k", "logp"))
            ).alias("cmap")
        )
    )

    n = F.length("word")

    def dp_step(acc, j):
        def try_l(a, l):
            sc = F.element_at(acc["best"], j - l + 1) + F.element_at(
                F.col("cmap"), j * (L + 1) + l
            )
            return F.when(
                sc >= a["s"], F.struct(sc.alias("s"), l.alias("l"))
            ).otherwise(a)

        inner = F.aggregate(
            F.sequence(F.lit(1), F.least(F.lit(L), j)),
            F.struct(
                F.lit(-1e300).cast("double").alias("s"),
                F.lit(0).alias("l"),
            ),
            try_l,
        )
        return F.struct(
            F.array_append(acc["best"], inner["s"]).alias("best"),
            F.array_append(acc["bp"], inner["l"]).alias("bp"),
        )

    dp = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            F.array(F.lit(0.0).cast("double")).alias("best"),
            F.array(F.lit(0)).alias("bp"),
        ),
        dp_step,
    )
    seg = rows.select("word", "freq", dp.alias("_dp")).select(
        "word",
        "freq",
        F.col("_dp.best").alias("_best"),
        F.col("_dp.bp").alias("_bp"),
    )

    def bt_step(a, _):
        l = F.element_at(F.col("_bp"), a["cur"] + 1)
        piece = F.col("word").substr(a["cur"] - l + 1, l)
        return F.when(
            a["cur"] > 0,
            F.struct(
                (a["cur"] - l).alias("cur"),
                F.concat(F.array(piece), a["ps"]).alias("ps"),
            ),
        ).otherwise(a)

    bt = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            n.alias("cur"),
            F.array_remove(F.array(F.lit("")), "").alias("ps"),
        ),
        bt_step,
    )
    # loud precondition guard: a best-path score at the -1e300 DP
    # floor means some position was unreachable (vocab misses a
    # character) — the backtrack would emit malformed pieces, so fail
    # the job instead. Legitimate scores are bounded far above
    # (logp >= ln(1e-6) per piece).
    guard = F.assert_true(
        F.element_at("_best", n + 1) > F.lit(-1e250),
        F.concat(
            F.lit("viterbi_segment: vocabulary does not cover word '"),
            F.col("word"),
            F.lit("' (every character must be in vocab)"),
        ),
    )
    return seg.select(
        "word",
        "freq",
        F.array_join(bt["ps"], " ").alias("pieces"),
        F.size(bt["ps"]).cast("int").alias("n_pieces"),
        F.when(guard.isNull(), F.element_at("_best", n + 1)).alias("score"),
    )


def _estep_counts(seg: DataFrame, seed: DataFrame) -> DataFrame:
    """(token, cnt BIGINT): freq-weighted Viterbi token usage over
    the FIXED seed vocabulary (unused tokens keep cnt = 0 and stay
    alive through add-one smoothing)."""
    cnts = (
        seg.select(
            "freq", F.explode(F.split("pieces", " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.sum("freq").cast("bigint").alias("_c"))
    )
    return seed.select("token").join(cnts, "token", "left").select(
        "token",
        F.coalesce(F.col("_c"), F.lit(0).cast("bigint")).alias("cnt"),
    )


def _train_chain(
    df: DataFrame,
    text_col: str,
    min_occ: int,
    max_piece_len: int,
    em_rounds: int,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared training chain. Returns (seed, final_counts,
    final_vocab, final_segmentation): em_rounds hard-EM iterations,
    then one final Viterbi pass under the trained model (so the
    segmentation surface reflects the model the trainer ships).
    Vocabulary-sized intermediates are localCheckpoint-truncated per
    round — the pagerank/q240 lineage discipline."""
    words = unigram_words(df, text_col).localCheckpoint(eager=True)
    return _train_chain_from_words(
        words, min_occ, max_piece_len, em_rounds
    )


def _train_chain_from_words(
    words: DataFrame,
    min_occ: int,
    max_piece_len: int,
    em_rounds: int,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The chain from an ALREADY-REDUCED (word, freq BIGINT) relation
    — the seam the streaming twin shares: (word, freq) is the one
    corpus-sized reduction and it is SUM-mergeable, so training over
    live merged counts is bit-identical to batch training over the
    union of every batch."""
    seed = unigram_seed_vocab(
        words, min_occ, max_piece_len
    ).localCheckpoint(eager=True)
    counts = seed.select("token", F.col("seed_cnt").alias("cnt"))
    for _ in range(int(em_rounds)):
        vocab = _logp_table(counts, "cnt").localCheckpoint(eager=True)
        seg = viterbi_segment(words, vocab, max_piece_len)
        counts = _estep_counts(seg, seed).localCheckpoint(eager=True)
    final_vocab = _logp_table(counts, "cnt").localCheckpoint(eager=True)
    final_seg = viterbi_segment(words, final_vocab, max_piece_len)
    return seed, counts, final_vocab, final_seg


def unigram_lm_train(
    df: DataFrame,
    text_col: str = "text",
    min_occ: int = 50,
    max_piece_len: int = 4,
    em_rounds: int = 2,
) -> DataFrame:
    """Train the unigram LM: ``em_rounds`` hard-EM iterations over
    the corpus vocabulary. Returns the MODEL — one row per seed
    token: (token, seed_cnt BIGINT, cnt BIGINT — final Viterbi usage,
    logp DOUBLE round-6 — final add-one-smoothed log-probability)."""
    seed, counts, final_vocab, _ = _train_chain(
        df, text_col, min_occ, max_piece_len, em_rounds
    )
    return (
        seed.join(counts, "token")
        .join(final_vocab, "token")
        .select(
            "token",
            "seed_cnt",
            "cnt",
            F.round("logp", 6).cast("double").alias("logp"),
        )
    )


def unigram_lm_segment(
    df: DataFrame,
    text_col: str = "text",
    min_occ: int = 50,
    max_piece_len: int = 4,
    em_rounds: int = 2,
) -> DataFrame:
    """The APPLICATION side: Viterbi segmentation of every corpus
    word under the TRAINED model (the q314 split — q334 checks what
    the trainer learns, this checks what the model does to words).
    Returns (word, word_freq BIGINT, pieces, n_pieces INT, score
    DOUBLE round-6 — best-path log-probability)."""
    _, _, _, final_seg = _train_chain(
        df, text_col, min_occ, max_piece_len, em_rounds
    )
    return _segment_surface(final_seg)


def unigram_lm_segment_from_words(
    words: DataFrame,
    min_occ: int = 50,
    max_piece_len: int = 4,
    em_rounds: int = 2,
) -> DataFrame:
    """:func:`unigram_lm_segment` from an ALREADY-REDUCED
    ``(word, freq BIGINT)`` relation (r12) — the
    :func:`unigram_words` output, shared across several tokenizer
    trainings so the corpus is exploded once, not once per family.
    ``words`` should be materialized (localCheckpoint) by the caller;
    the EM rounds re-read it once per Viterbi pass."""
    _, _, _, final_seg = _train_chain_from_words(
        words.select("word", "freq"), min_occ, max_piece_len, em_rounds
    )
    return _segment_surface(final_seg)


def _segment_surface(final_seg: DataFrame) -> DataFrame:
    return final_seg.select(
        "word",
        F.col("freq").alias("word_freq"),
        "pieces",
        "n_pieces",
        F.round("score", 6).cast("double").alias("score"),
    )
