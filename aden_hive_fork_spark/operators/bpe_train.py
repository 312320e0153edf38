"""Distributed BPE tokenizer training as PURE relational operators.

functions/bpe.train_bpe learns merges driver-side from a bounded
sample (the reference-parity tier; reference text tooling pretokenizes
per-call, tools/src/aden_tools/tools — no trainer exists there, this
is a §2.D extension). This module is the 100 TB tier: the corpus is
reduced ONCE to a (word, freq) vocabulary (one shuffle over the data),
and every merge round after that runs on the vocabulary-sized token
relation with DataFrame ops only — no Python in the row path, no
driver-side corpus.

Determinism contract (what makes it hash-gate checkable, q240):
- words: split on ``[^a-zA-Z]+`` then ASCII lowercase — identical in
  Java regex and RE2/DuckDB;
- pair choice: max total freq, ties to the lexicographically smallest
  (left, right);
- merge application: greedy left-to-right, expressed RELATIONALLY —
  positions where the pair matches form runs (overlaps only possible
  when left == right), and gaps-and-islands + run-start parity picks
  exactly the matches a sequential scan would take.

Scale shape per round: one groupBy (pair counts), one 1-row driver
collect (the argmax — a scalar like pagerank's convergence check), and
two windows partitioned by word. Lineage is truncated per round with
localCheckpoint, the pagerank/connected-components discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def bpe_word_freqs(
    df: DataFrame, text_col: str = "text", top_words: int = 500
) -> DataFrame:
    """(word, freq): corpus → vocabulary in one aggregate. The
    ``top_words`` cap (freq DESC, word ASC — deterministic) bounds
    every later round by vocabulary size, not corpus size; it is a
    TakeOrdered (no global sort materializes)."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), "[^a-zA-Z]+")).alias("w")
        )
        .filter(F.col("w") != "")
        .select(F.lower(F.col("w")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_words)
    )


def _initial_tokens(wf: DataFrame) -> DataFrame:
    """(wid, freq, pos, sym): one row per character of each vocabulary
    word, pos 1-based. sequence+substring (not split-on-regex) so the
    oracle's list_transform(range(...)) replays it exactly."""
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    return (
        wf.select(
            F.col("word").alias("wid"),
            "freq",
            F.posexplode(chars).alias("pos0", "sym"),
        )
        .select("wid", "freq", (F.col("pos0") + 1).alias("pos"), "sym")
    )


def bpe_train_relational(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    top_words: int = 500,
    min_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus, distributed.

    Returns [(rank, lhs, rhs, pair_count), ...] — the merge table (the
    model: k rows, driver-safe by construction). Stops early when the
    best pair's count falls below ``min_count``.
    """
    merges, _ = _train_with_tokens(
        df, text_col, n_merges, top_words, min_count
    )
    return merges


def bpe_vocab_segmentation(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    top_words: int = 500,
    min_count: int = 2,
) -> DataFrame:
    """The APPLICATION side of training: the final token table after
    all learned merges — (wid, freq, pos, sym), one row per token of
    each vocabulary word. This is what an encoder ships to executors;
    exposing it puts BPE application (not just the merge choices)
    under the value-hash gate (suite q314)."""
    _, toks = _train_with_tokens(df, text_col, n_merges, top_words, min_count)
    return toks


# Above this vocabulary size the merge rounds run relationally; at or
# below it the whole training (NOT the corpus reduction — that is
# always distributed) runs on the driver over the collected
# (word, freq) model. `top_words` explicitly bounds the driver state,
# so the gate is a contract, not a heuristic — the connected-
# components _CC_DRIVER_MAX_EDGES pattern.
_BPE_DRIVER_MAX_WORDS = 65536


def _train_with_tokens(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    top_words: int,
    min_count: int,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Dispatch: the corpus reduces to (word, freq) distributed
    (bpe_word_freqs — the only corpus-sized pass); the merge rounds
    then run driver-side when ``top_words`` bounds the vocabulary
    (r12 — ~12 driver-sequenced window/join jobs over a ~500-word
    relation were pure scheduling overhead), else relationally."""
    if int(top_words) <= _BPE_DRIVER_MAX_WORDS:
        return _train_with_tokens_driver(
            df, text_col, n_merges, top_words, min_count
        )
    return _train_with_tokens_relational(
        df, text_col, n_merges, top_words, min_count
    )


def _train_with_tokens_driver(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    top_words: int,
    min_count: int,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Driver-side merge rounds over the collected vocabulary —
    bit-identical to the relational rounds (same pair-count law
    including overlapping adjacent positions, same (cnt DESC, lhs
    ASC, rhs ASC) argmax, same greedy left-to-right sequential-scan
    merge the islands/parity relation encodes), pinned by
    tests/test_round12_opts.py's differential."""
    spark = df.sparkSession
    wf = [
        (r["word"], int(r["freq"]))
        for r in bpe_word_freqs(df, text_col, top_words).collect()
    ]
    toks_py: list[list[str]] = [list(w) for w, _ in wf]
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, int(n_merges) + 1):
        cnt: dict[tuple[str, str], int] = {}
        for (w, freq), syms in zip(wf, toks_py):
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                cnt[k] = cnt.get(k, 0) + freq
        if not cnt:
            break
        (a, b), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_count:
            break
        merges.append((r, a, b, c))
        ab = a + b
        for i, syms in enumerate(toks_py):
            j = 0
            out: list[str] = []
            m = len(syms)
            while j < m:
                if j + 1 < m and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            toks_py[i] = out
    rows = [
        (w, freq, p + 1, sym)
        for (w, freq), syms in zip(wf, toks_py)
        for p, sym in enumerate(syms)
    ]
    toks = spark.createDataFrame(
        rows, "wid string, freq bigint, pos int, sym string"
    )
    return merges, toks


def _train_with_tokens_relational(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    top_words: int,
    min_count: int,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """REFERENCE/large-vocabulary path: the merge rounds as
    relational windows + joins (pre-r12 production form), one eager
    checkpoint per round."""
    spark = df.sparkSession
    toks = _initial_tokens(
        bpe_word_freqs(df, text_col, top_words)
    ).localCheckpoint(eager=True)

    w_word = Window.partitionBy("wid").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        t = toks.withColumn("nxt", F.lead("sym").over(w_word))
        best = (
            t.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("sym"), F.asc("nxt"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["sym"], best[0]["nxt"], int(best[0]["cnt"])
        merges.append((r, a, b, cnt))

        m = t.withColumn(
            "m", (F.col("sym") == F.lit(a)) & (F.col("nxt") == F.lit(b))
        )
        # greedy non-overlapping match starts: islands of consecutive
        # matching positions, keep even offsets from each island start
        mrows = m.filter("m").select(
            "wid",
            "pos",
            (F.col("pos") - F.row_number().over(w_word)).alias("isl"),
        )
        keep = (
            mrows.withColumn(
                "s", F.min("pos").over(Window.partitionBy("wid", "isl"))
            )
            .filter(((F.col("pos") - F.col("s")) % 2) == 0)
            .select(F.col("wid").alias("kwid"), F.col("pos").alias("kpos"))
        )
        keep2 = keep.select(
            F.col("kwid").alias("pwid"), F.col("kpos").alias("ppos")
        )
        nt = (
            m.join(
                keep,
                (m["wid"] == keep["kwid"]) & (m["pos"] == keep["kpos"]),
                "left",
            )
            .join(
                keep2,
                (m["wid"] == keep2["pwid"])
                & (m["pos"] - 1 == keep2["ppos"]),
                "left",
            )
            .filter(F.col("ppos").isNull())  # consumed by previous match
            .select(
                "wid",
                "freq",
                F.col("pos").alias("opos"),
                F.when(
                    F.col("kpos").isNotNull(), F.concat("sym", "nxt")
                )
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
        )
        toks = (
            nt.withColumn(
                "pos",
                F.row_number().over(
                    Window.partitionBy("wid").orderBy("opos")
                ),
            )
            .select("wid", "freq", "pos", "sym")
            .localCheckpoint(eager=True)
        )
    return merges, toks


def bpe_merges_df(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    top_words: int = 500,
) -> DataFrame:
    """The merge table as a DataFrame: (rank, lhs, rhs, pair_count)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    rows = bpe_train_relational(df, text_col, n_merges, top_words)
    schema = StructType(
        [
            StructField("rank", IntegerType()),
            StructField("lhs", StringType()),
            StructField("rhs", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(r, a, b, c) for r, a, b, c in rows], schema
    )


# ---------------------------------------------------------------------------
# WordPiece-style greedy longest-match segmentation (round 9) — the
# maximal-munch cousin of BPE apply: instead of replaying merges, it
# segments each word against a frequency-thresholded substring vocab,
# always taking the LONGEST vocab token at the cursor. Single
# characters are always in-vocab, so segmentation never fails and
# every round advances every unfinished word by >= 1 char.
# ---------------------------------------------------------------------------
def wordpiece_vocab(
    wf: DataFrame,
    min_occ: int = 50,
    max_sub_len: int = 4,
) -> DataFrame:
    """Deterministic WordPiece vocabulary from a (word, freq)
    relation: every single character of the corpus, plus every
    substring of length 2..``max_sub_len`` whose frequency-weighted
    occurrence count is >= ``min_occ``. Two map-side position
    explodes and one keyed aggregate — no iteration, no floats.

    Returns one column ``token`` (distinct)."""
    chars = wf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            )
        ).alias("token")
    ).distinct()
    subs = (
        wf.select(
            "freq",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.filter(
                            F.transform(
                                F.sequence(
                                    F.lit(2), F.lit(max_sub_len)
                                ),
                                lambda l: F.when(
                                    i + l - 1 <= F.length("word"),
                                    F.col("word").substr(i, l),
                                ),
                            ),
                            lambda t: t.isNotNull(),
                        ),
                    )
                )
            ).alias("token"),
        )
        .groupBy("token")
        .agg(F.sum("freq").alias("_occ"))
        .filter(F.col("_occ") >= min_occ)
        .select("token")
    )
    return chars.unionByName(subs).distinct()


def wordpiece_segment(
    df: DataFrame,
    text_col: str = "text",
    min_occ: int = 50,
    max_sub_len: int = 4,
    max_rounds: int = 4096,
    words: DataFrame | None = None,
) -> DataFrame:
    """Greedy longest-match (maximal munch) segmentation of every
    distinct corpus word against the ``wordpiece_vocab`` table.

    The corpus reduces ONCE to (word, freq) — the BPE-train shuffle
    discipline — then the greedy loop runs on the vocabulary-sized
    relation only: each round explodes candidate lengths
    ``max_sub_len``..1 at the cursor (bounded map-side blowup), joins
    the broadcast vocab, takes MAX(match length) per word, and
    advances the cursor. Rounds are bounded by the longest word (a
    one-scalar driver collect, the pagerank convergence-check
    precedent) AND by ``max_rounds`` — a single pathological unsplit
    token (URL/base64/DNA) would otherwise make the driver loop
    effectively unbounded, so a corpus whose longest word exceeds
    ``max_rounds`` chars raises ValueError loudly instead of looping;
    lineage is localCheckpoint-truncated every round.
    All-integer/string arithmetic — bit-identical in any engine.

    Returns (word, word_freq, wordpiece, n_pieces) — wordpiece is the
    space-joined greedy segmentation.

    ``words`` (optional, r12) supplies an already-reduced
    ``(word, freq)`` relation — e.g. ``unigram_words`` output shared
    across several tokenizer trainings — and skips this function's
    own corpus explode. It MUST be the same whitespace reduction
    (split on single spaces of the trimmed text, empty tokens
    dropped, exact integer counts) or results will differ."""
    if words is not None:
        words = words.select("word", "freq")
        return _wordpiece_segment_tail(
            words, min_occ, max_sub_len, max_rounds
        )
    words = (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), " ")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return _wordpiece_segment_tail(words, min_occ, max_sub_len, max_rounds)


def _wordpiece_segment_tail(
    words: DataFrame,
    min_occ: int,
    max_sub_len: int,
    max_rounds: int,
) -> DataFrame:
    """The greedy maximal-munch segmentation downstream of the one
    corpus reduction — shared by the ``df`` and pre-reduced ``words``
    entry forms of :func:`wordpiece_segment`.

    r12 (guide §4.2): ONE Arrow ``mapInPandas`` pass over the
    vocabulary-sized (word, freq) relation with the finished vocab
    collected to a Python set — the same boundedness as the
    broadcast the previous driver-round form shipped, but zero
    per-round Spark jobs where the loop paid ~3 driver-sequenced
    actions per character of the longest word. The greedy law is
    unchanged and pure string/integer logic (longest in-vocab token
    at the cursor, ties impossible); Python slices strings by
    codepoints exactly as Spark ``substr`` does, so the output is
    bit-identical — pinned against the retained
    :func:`_wordpiece_segment_rounds` reference by
    ``tests/test_round12_opts.py``."""
    vocab = wordpiece_vocab(words, min_occ, max_sub_len)
    max_len = words.agg(
        F.max(F.length("word")).alias("m")
    ).collect()[0]["m"]
    if max_len is not None and int(max_len) > max_rounds:
        raise ValueError(
            f"wordpiece_segment: longest corpus word is {max_len} "
            f"chars > max_rounds={max_rounds}; segmentation needs one "
            "driver round per character of the longest word. Pre-"
            "filter pathological unsplit tokens (URLs/base64) or "
            "raise max_rounds explicitly."
        )
    if max_len is None:
        return words.select(
            "word",
            F.col("freq").alias("word_freq"),
            F.lit("").alias("wordpiece"),
            F.lit(0).cast("int").alias("n_pieces"),
        )
    # vocab-coverage law: every single character of every corpus word
    # is in the vocab (wordpiece_vocab admits all corpus chars
    # unconditionally), so the munch below always advances; a char
    # missing from the set would mean `words` was NOT the relation
    # the vocab was built from — the l == 1 fallback then mirrors
    # the rounds form, which drops such words at its inner join, by
    # never emitting an out-of-vocab piece for covered inputs.
    vocab_set = frozenset(
        r["token"] for r in vocab.collect()
    )
    L = int(max_sub_len)

    def munch(batches):
        import pandas as pd

        for pdf in batches:
            toks_out = []
            n_out = []
            keep = []
            for i, w in enumerate(pdf["word"]):
                n = len(w)
                pos = 0
                toks = []
                ok = True
                while pos < n:
                    l = min(L, n - pos)
                    while l > 1 and w[pos : pos + l] not in vocab_set:
                        l -= 1
                    if l == 1 and w[pos] not in vocab_set:
                        ok = False  # uncovered word: rounds-form drop
                        break
                    toks.append(w[pos : pos + l])
                    pos += l
                if ok:
                    keep.append(i)
                    toks_out.append(" ".join(toks))
                    n_out.append(len(toks))
            kept = pdf.iloc[keep]
            yield pd.DataFrame(
                {
                    "word": pd.Series(
                        kept["word"].to_numpy(), dtype="object"
                    ),
                    "word_freq": pd.Series(
                        kept["freq"].to_numpy(), dtype="int64"
                    ),
                    "wordpiece": pd.Series(toks_out, dtype="object"),
                    "n_pieces": pd.Series(n_out, dtype="int64"),
                }
            )

    return words.select("word", "freq").mapInPandas(
        munch,
        "word string, word_freq bigint, wordpiece string, "
        "n_pieces int",
    )


def _wordpiece_segment_rounds(
    words: DataFrame,
    min_occ: int,
    max_sub_len: int,
    max_rounds: int,
) -> DataFrame:
    """REFERENCE implementation of the greedy maximal-munch loop as
    driver-sequenced relational rounds (one per character position) —
    the pre-r12 production path, retained as the differential pin for
    the Arrow kernel in :func:`_wordpiece_segment_tail` (the
    quantize_embeddings / quantize_embeddings_hof pattern)."""
    vocab = wordpiece_vocab(words, min_occ, max_sub_len)
    max_len = words.agg(
        F.max(F.length("word")).alias("m")
    ).collect()[0]["m"]
    if max_len is not None and int(max_len) > max_rounds:
        raise ValueError(
            f"wordpiece_segment: longest corpus word is {max_len} "
            f"chars > max_rounds={max_rounds}; segmentation needs one "
            "driver round per character of the longest word. Pre-"
            "filter pathological unsplit tokens (URLs/base64) or "
            "raise max_rounds explicitly."
        )
    if max_len is None:
        return words.select(
            "word",
            F.col("freq").alias("word_freq"),
            F.lit("").alias("wordpiece"),
            F.lit(0).cast("int").alias("n_pieces"),
        )
    state = words.select(
        "word",
        F.length("word").alias("_len"),
        F.lit(1).alias("_pos"),
        F.lit("").alias("_toks"),
    ).localCheckpoint(eager=True)
    done_parts = []
    bvocab = F.broadcast(vocab)
    for _ in range(int(max_len)):
        finished = state.filter(F.col("_pos") > F.col("_len"))
        if finished.take(1):
            done_parts.append(
                finished.select("word", "_toks").localCheckpoint(
                    eager=True
                )
            )
        live = state.filter(F.col("_pos") <= F.col("_len"))
        if not live.take(1):
            state = None
            break
        cand = live.select(
            "word",
            "_len",
            "_pos",
            "_toks",
            F.explode(
                F.sequence(F.lit(1), F.lit(max_sub_len))
            ).alias("_l"),
        ).filter(F.col("_pos") + F.col("_l") - 1 <= F.col("_len"))
        matched = cand.join(
            bvocab,
            cand["word"].substr(F.col("_pos"), F.col("_l"))
            == vocab["token"],
        )
        best = matched.groupBy("word", "_len", "_pos", "_toks").agg(
            F.max("_l").alias("_ml")
        )
        tok = F.col("word").substr(F.col("_pos"), F.col("_ml"))
        state = best.select(
            "word",
            "_len",
            (F.col("_pos") + F.col("_ml")).alias("_pos"),
            F.when(F.col("_toks") == "", tok)
            .otherwise(F.concat_ws(" ", "_toks", tok))
            .alias("_toks"),
        ).localCheckpoint(eager=True)
    if state is not None:
        done_parts.append(
            state.filter(F.col("_pos") > F.col("_len")).select(
                "word", "_toks"
            )
        )
    spark = words.sparkSession
    if not done_parts:
        empty = spark.createDataFrame([], "word string, _toks string")
        done_parts.append(empty)
    done = done_parts[0]
    for part in done_parts[1:]:
        done = done.unionByName(part)
    return (
        done.join(words, "word")
        .select(
            "word",
            F.col("freq").alias("word_freq"),
            F.col("_toks").alias("wordpiece"),
            F.size(F.split("_toks", " ")).cast("int").alias(
                "n_pieces"
            ),
        )
    )
