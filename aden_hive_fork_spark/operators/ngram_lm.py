"""Count-based n-gram language-model statistics over a text corpus.

The corpus-statistics primitive behind classic LM pretraining-data
work: n-gram counts, conditional probabilities P(w_n | prefix), and
per-document repetition signals. The reference's text tier exposes
token statistics one payload at a time; this is the corpus version,
and it feeds the quality filters (suite/text repetition metrics) and
the contamination checker (sampling.py) with the same tokenizer.

Spark-first: tokenize with ``split`` + ``posexplode`` (JVM
generators, no Python), form n-grams with ``lead`` windows
partitioned BY DOCUMENT — the window never crosses documents, so the
shuffle key is doc_id and skew is bounded by document length, not
corpus size. Counting is a keyed aggregate with map-side combine.

100 TB: tokens shuffle once on doc_id (window) and n-gram counts
shuffle once on the n-gram key. Conditional probability joins the
(n-1)-gram totals back by prefix — computed from the SAME n-gram
counts with one more aggregate (never a second corpus pass), then a
prefix-keyed join of two already-small count tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tokens(
    df: DataFrame, text_col: str, id_col: str, pattern: str = r"\s+"
) -> DataFrame:
    """(doc, pos, word): whitespace-split tokens with per-document
    positions. Empty tokens (leading/trailing separators) dropped."""
    t = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), pattern)).alias("pos", "word"),
    )
    return t.filter(F.col("word") != "")


def ngram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
) -> DataFrame:
    """(w1..wn, ngram_count) for every n-gram that occurs in the
    corpus. Windows are per-document: n-grams never span documents."""
    if n < 1:
        raise ValueError("n must be >= 1")
    t = tokens(df, text_col, id_col)
    w = Window.partitionBy("doc").orderBy("pos")
    cols = [F.col("word").alias("w1")]
    for i in range(1, n):
        cols.append(F.lead("word", i).over(w).alias(f"w{i + 1}"))
    grams = t.select(*cols).filter(F.col(f"w{n}").isNotNull())
    names = [f"w{i + 1}" for i in range(n)]
    return grams.groupBy(*names).agg(
        F.count(F.lit(1)).cast("bigint").alias("ngram_count")
    )


def conditional_prob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """(w1..wn, ngram_count, prefix_count, cond_p) where cond_p =
    count(w1..wn) / count(w1..w_{n-1} followed by anything) — the
    maximum-likelihood estimate. The prefix totals are derived by
    re-aggregating the n-gram counts (sum over the last word), so the
    corpus is tokenized exactly once."""
    grams = ngram_counts(df, text_col, id_col, n)
    prefix_names = [f"w{i + 1}" for i in range(n - 1)]
    if not prefix_names:
        raise ValueError("conditional_prob needs n >= 2")
    prefix = grams.groupBy(*prefix_names).agg(
        F.sum("ngram_count").cast("bigint").alias("prefix_count")
    )
    out = grams.join(prefix, prefix_names)
    return out.select(
        *[f"w{i + 1}" for i in range(n)],
        "ngram_count",
        "prefix_count",
        F.round(
            F.col("ngram_count").cast("double")
            / F.col("prefix_count").cast("double"),
            ndigits,
        )
        .cast("double")
        .alias("cond_p"),
    )


def tfidf(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """(doc, word, tf, df_t, tfidf) — raw term frequency × ln(N/df_t)
    inverse document frequency (the plain Salton weighting; BM25 in
    sources/search_source.py is the length-normalized cousin).

    df_t (documents per word) is a MAP-SIDE-COMBINING groupBy over
    the tf table joined back on word. Spark plans the tf subtree
    twice for that (exchange reuse does not dedupe it), so the
    corpus is tokenized twice — a deliberate tradeoff: the
    alternatives are worse at scale. A count window partitioned by
    word has NO partial aggregation, so a stopword's entire tf row
    set funnels through one task (hot-key OOM); persisting tf pins a
    data-sized cache for the session. Two passes over a columnar
    scan + split are cheap and skew-proof. N is a 1-row aggregate
    over just the id column — a column-pruned scan that reads no
    text — broadcast in. The weight is ROUNDED so ranking is
    engine- and partitioning-stable; ln on the same doubles is
    identical in Spark and DuckDB (the q99 BM25 precedent).
    """
    t = tokens(df, text_col, id_col)
    tf = t.groupBy("doc", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df_t = tf.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_t")
    )
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("_n_docs")
    )
    out = tf.join(df_t, "word").crossJoin(F.broadcast(n_docs))
    weight = F.col("tf").cast("double") * F.log(
        F.col("_n_docs") / F.col("df_t").cast("double")
    )
    return out.select(
        "doc",
        "word",
        "tf",
        "df_t",
        F.round(weight, ndigits).cast("double").alias("tfidf"),
    )


def doc_avg_nll(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Per-document average negative log-likelihood under the
    corpus's own MLE n-gram model — the CCNet-style LM quality
    signal: documents whose word continuations are atypical for the
    corpus score high (boilerplate and fluent prose score low).
    Output: ``doc, n_ngrams, avg_nll`` (nats/ngram; documents shorter
    than n tokens are absent — they have no n-grams to score).

    Train and score share ONE tokenize pass shape: the model is
    ``conditional_prob`` (n-gram counts re-aggregated for prefixes);
    scoring re-derives the per-document n-grams and inner-joins the
    model on the n-gram key (every document n-gram exists in a model
    trained on the same corpus, so the join drops nothing). Per-gram
    terms −ln(p) are floor-quantized then reduced with the sorted
    fold (doc-length-bounded), keeping the score engine-exact even
    though ln is not correctly rounded; cond_p itself is already
    ROUNDed by the model. At 100 TB the model table is
    vocabulary²-bounded and the score join is keyed by n-gram —
    both shuffles track distinct-gram counts, not corpus rows.
    """
    from .stats import det_sum, fquant

    names = [f"w{i + 1}" for i in range(n)]
    model = conditional_prob(df, text_col, id_col, n, ndigits).select(
        *names, "cond_p"
    )
    t = tokens(df, text_col, id_col)
    w = Window.partitionBy("doc").orderBy("pos")
    cols = [F.col("doc"), F.col("word").alias("w1")]
    for i in range(1, n):
        cols.append(F.lead("word", i).over(w).alias(f"w{i + 1}"))
    grams = t.select(*cols).filter(F.col(f"w{n}").isNotNull())
    scored = grams.join(model, names)
    term = fquant(-F.log(F.col("cond_p")), 9)
    per = scored.groupBy("doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
        det_sum(term, 9).alias("_s"),
    )
    return per.select(
        "doc",
        "n_ngrams",
        F.round(F.col("_s") / F.col("n_ngrams").cast("double"), ndigits)
        .cast("double")
        .alias("avg_nll"),
    )
