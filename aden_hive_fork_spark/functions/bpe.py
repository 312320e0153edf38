"""Real byte-pair-encoding tokenizer: corpus-trained merges, greedy
rank-based encoding, distributed Arrow-batched token counting.

The existing text tier (suite/text.py q69) counts tokens with a
BPE-ish regex; training-data pipelines also need the REAL thing —
sequence packing, context budgeting, and per-domain mixture weights
are all denominated in tokenizer tokens (reference analog: the
conversation compactor's token budgeting, core/framework/llm/
compaction.py, which charges messages against a model token budget).

Scale split, same discipline as IVF's k-means (similarity.py):

- **Training is driver-side on a BOUNDED deterministic sample**
  (``sample_rows`` docs in ``doc_id`` order, ``max_chars`` per doc) —
  merge-table quality converges long before sample size matters, so
  the collect is scale-INDEPENDENT: training cost is identical at
  sf0.001 and 100 TB.
- **Encoding is distributed**: the merge-rank dict rides to the
  executors inside an Arrow-batched pandas UDF closure (broadcast by
  value); encoding a 100 TB corpus is map-side work, no shuffle.

The algorithm is the published BPE procedure (Sennrich et al. 2016;
the GPT-2 tokenizer is the same loop over bytes): train = repeatedly
merge the most-frequent adjacent symbol pair (count desc, then
lexicographic pair — fully deterministic); encode = repeatedly merge
the LOWEST-RANK adjacent pair until none applies.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic pre-tokenizer: letter runs, digit runs, punctuation
# runs (a simplified GPT-2-style split; no \p classes so re suffices)
PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

# end-of-word sentinel (Sennrich-style) so merges can't cross words
# and decoding can restore word boundaries
EOW = "</w>"


def pretokenize(text: str) -> list[str]:
    return PRETOKEN_RE.findall(text or "")


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_rows: int = 10_000,
    max_chars: int = 10_000,
    order_col: str | None = None,
) -> dict:
    """Learn ``n_merges`` BPE merges from a bounded deterministic
    corpus sample. Returns ``{"merges": [[a, b], ...], "vocab":
    [...]}`` — a plain JSON-able dict (persist once, encode forever).

    ``order_col`` pins the sample (defaults to the first column) so
    the merge table is reproducible under repartitioning.
    """
    order = order_col or df.columns[0]
    rows = (
        df.select(
            F.col(order).alias("_ord"),
            F.substring(F.col(text_col), 1, max_chars).alias("t"),
        )
        .filter(F.col("t").isNotNull())
        .orderBy("_ord")
        .limit(sample_rows)
        .collect()
    )
    word_freq: Counter = Counter()
    for r in rows:
        word_freq.update(pretokenize(r["t"]))

    words: dict[tuple[str, ...], int] = {
        _word_symbols(w): f for w, f in word_freq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographically smallest
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for syms, f in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words

    vocab = sorted(
        {s for syms in words for s in syms}
        | {a + b for a, b in merges}
    )
    return {"merges": [list(m) for m in merges], "vocab": vocab}


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one pre-token: repeatedly merge the
    lowest-rank adjacent pair (the published inference procedure)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_text(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    out: list[str] = []
    for w in pretokenize(text):
        out.extend(encode_word(w, ranks))
    return out


def _ranks(bpe: dict) -> dict[tuple[str, str], int]:
    return {tuple(m): i for i, m in enumerate(bpe["merges"])}


def bpe_tokens(df: DataFrame, bpe: dict, text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Distributed encode: token array per row via an Arrow-batched
    pandas UDF (merge ranks broadcast in the closure). Map-side."""
    from pyspark.sql.functions import pandas_udf

    merges = bpe["merges"]

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        return texts.map(lambda t: encode_text(t or "", ranks))

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_token_counts(df: DataFrame, bpe: dict, text_col: str = "text",
                     out_col: str = "n_bpe_tokens") -> DataFrame:
    """Distributed token COUNT per row — the packing/budgeting input
    (cheaper than materializing token arrays)."""
    from pyspark.sql.functions import pandas_udf

    merges = bpe["merges"]

    @pandas_udf("int")
    def cnt(texts: pd.Series) -> pd.Series:
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        return texts.map(lambda t: len(encode_text(t or "", ranks)))

    return df.withColumn(out_col, cnt(F.col(text_col)))


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of ``encode_text`` up to whitespace: tokens concatenate
    into pre-tokens at ``EOW`` boundaries, joined by single spaces."""
    text = "".join(tokens)
    return text.replace(EOW, " ").rstrip(" ")
