"""Data-quality batch: single-pass table profiling and declarative
constraint checking (operators/quality) under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T


# ---------------------------------------------------------------------------
# q128 — table profile (one wide aggregate → long report). Profiled
# columns are integer/string so min/max string forms agree across
# engines (double→string formatting is engine-specific and excluded
# by design: numeric centrality is reported via mean_value instead).
# ---------------------------------------------------------------------------
@query(
    "q128_table_profile",
    oracle="""
    WITH base AS (SELECT * FROM customer)
    SELECT 'c_custkey' AS "column", COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_nulls,
      CAST(ROUND(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
        / COUNT(*), 4) AS DOUBLE) AS null_frac,
      CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
      CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
      CAST(MAX(c_custkey) AS VARCHAR) AS max_value,
      CAST(ROUND(AVG(CAST(c_custkey AS DOUBLE)), 4) AS DOUBLE)
        AS mean_value
    FROM base
    UNION ALL
    SELECT 'c_nationkey', COUNT(*),
      CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(ROUND(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
        / COUNT(*), 4) AS DOUBLE),
      CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
      CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR),
      CAST(ROUND(AVG(CAST(c_nationkey AS DOUBLE)), 4) AS DOUBLE)
    FROM base
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*),
      CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(ROUND(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
        / COUNT(*), 4) AS DOUBLE),
      CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
      MIN(c_mktsegment), MAX(c_mktsegment),
      CAST(NULL AS DOUBLE)
    FROM base
    ORDER BY "column" ASC
    """,
)
def q128_table_profile(spark, sf_dir):
    """`quality.profile_table` over three customer columns: exact
    null/distinct/min/max/mean per column computed in ONE wide
    aggregate (no per-column scans), emitted long-form. The
    1000-column version is the same single job."""
    from ..operators.quality import profile_table

    c = T(spark, sf_dir, "customer")
    return profile_table(
        c, columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    ).orderBy("column")


# ---------------------------------------------------------------------------
# q129 — declarative constraint report (deequ/dbt-test analog).
# ---------------------------------------------------------------------------
@query(
    "q129_constraint_report",
    oracle="""
    WITH base AS (SELECT * FROM orders), t AS (
      SELECT COUNT(*) AS n,
        SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_nn,
        SUM(CASE WHEN o_totalprice IS NOT NULL
                  AND (o_totalprice < 0 OR o_totalprice > 1000000)
            THEN 1 ELSE 0 END) AS v_rng,
        SUM(CASE WHEN o_orderstatus IS NOT NULL
                  AND o_orderstatus NOT IN ('O','F','P')
            THEN 1 ELSE 0 END) AS v_set,
        SUM(CASE WHEN o_orderpriority IS NOT NULL
                  AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
            THEN 1 ELSE 0 END) AS v_re,
        SUM(CASE WHEN NOT COALESCE(o_totalprice > 1000, FALSE)
            THEN 1 ELSE 0 END) AS v_frac
      FROM base
    ), dup AS (
      SELECT COALESCE(SUM(cnt), 0) AS dup_rows,
             COUNT(*) AS dup_keys
      FROM (
        SELECT o_orderkey, COUNT(*) AS cnt FROM base
        WHERE o_orderkey IS NOT NULL
        GROUP BY o_orderkey HAVING COUNT(*) > 1
      )
    )
    SELECT * FROM (
      SELECT 'not_null(o_orderkey)' AS rule, v_nn = 0 AS passed,
        CAST(v_nn AS BIGINT) AS n_violations,
        CAST(ROUND(v_nn / n, 6) AS DOUBLE) AS metric FROM t
      UNION ALL
      SELECT 'in_range(o_totalprice,0,1000000)', v_rng = 0,
        CAST(v_rng AS BIGINT), CAST(ROUND(v_rng / n, 6) AS DOUBLE) FROM t
      UNION ALL
      SELECT 'in_set(o_orderstatus)', v_set = 0,
        CAST(v_set AS BIGINT), CAST(ROUND(v_set / n, 6) AS DOUBLE) FROM t
      UNION ALL
      SELECT 'matches(o_orderpriority)', v_re = 0,
        CAST(v_re AS BIGINT), CAST(ROUND(v_re / n, 6) AS DOUBLE) FROM t
      UNION ALL
      SELECT 'bulk_orders_over_1000', (1.0 - ROUND(v_frac / n, 6)) >= 0.5,
        CAST(v_frac AS BIGINT), CAST(ROUND(v_frac / n, 6) AS DOUBLE) FROM t
      UNION ALL
      SELECT 'unique(o_orderkey)', dup_rows = 0,
        CAST(dup_rows AS BIGINT), CAST(dup_keys AS DOUBLE) FROM dup
    )
    ORDER BY rule ASC
    """,
)
def q129_constraint_report(spark, sf_dir):
    """`quality.check_constraints`: six declarative rules (not-null,
    range, set membership, regex, minimum-fraction, uniqueness)
    evaluated in two aggregation passes; the report rows — passed
    flag, violation count, violation fraction (dup-key count for
    uniqueness) — must hash-match the SQL replay."""
    from ..operators.quality import (
        check_constraints,
        in_range,
        in_set,
        matches,
        min_fraction,
        not_null,
        unique,
    )

    o = T(spark, sf_dir, "orders")
    report = check_constraints(o, [
        not_null("o_orderkey"),
        in_range("o_totalprice", 0, 1_000_000),
        in_set("o_orderstatus", ["O", "F", "P"]),
        matches("o_orderpriority", "^[1-5]-"),
        min_fraction("o_totalprice", F.col("o_totalprice") > 1000, 0.5,
                     name="bulk_orders_over_1000"),
        unique("o_orderkey"),
    ])
    return report.orderBy("rule")


# ---------------------------------------------------------------------------
# q224 — weighted quantiles (operators/quality.weighted_quantiles):
# weighted median + p90 of document length per language, weights
# deterministic from doc_id. Lower-quantile definition = always an
# observed value, so the oracle replay is exact.
# ---------------------------------------------------------------------------
@query(
    "q224_weighted_quantiles",
    oracle="""
    WITH base AS (
      SELECT lang, CAST(n_chars AS DOUBLE) AS v,
        CAST(1 + doc_id % 3 AS DECIMAL(18,6)) AS w
      FROM documents
    ), cum AS (
      SELECT lang, v, w,
        SUM(w) OVER (PARTITION BY lang ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS cw,
        SUM(w) OVER (PARTITION BY lang) AS tw
      FROM base
    )
    SELECT lang, q,
      MIN(CASE WHEN CAST(cw AS DOUBLE) >= q * CAST(tw AS DOUBLE)
          THEN v END) AS value
    FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9]) AS q)
    GROUP BY lang, q
    ORDER BY lang ASC, q ASC
    """,
)
def q224_weighted_quantiles(spark, sf_dir):
    """Weighted median and p90 of n_chars per language (weight =
    1 + doc_id mod 3 — a stand-in for sampling mass). One window for
    cumulative weight + one aggregate; exact decimal weights make
    tie order inside equal values irrelevant."""
    from ..operators.quality import weighted_quantiles

    docs = T(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").alias("v"),
        (F.lit(1) + F.col("doc_id") % 3).alias("w"),
    )
    return weighted_quantiles(docs, "v", "w", [0.5, 0.9], ["lang"]).orderBy(
        F.asc("lang"), F.asc("q")
    )


# ---------------------------------------------------------------------------
# q252 — PSI drift between pre-/post-1998 order values: equi-depth
# reference deciles (quantile-cut broadcast, map-side binning — no
# NTILE), |bins|-bounded arithmetic after one conditional aggregate;
# ln through fquant, empty bins contribute 0.
# ---------------------------------------------------------------------------
def _q252_oracle() -> str:
    fr = ", ".join(repr(i / 10) for i in range(1, 10))
    return f"""
    WITH base AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS x,
        CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
          THEN 'ref' ELSE 'cur' END AS per
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    cuts AS (
      SELECT list_transform(quantile_cont(x, [{fr}]),
                            c -> ROUND(c, 6)) AS cs
      FROM base WHERE per = 'ref'
    ),
    binned AS (
      SELECT per, CAST(1 + len(list_filter(cs, c -> x > c)) AS INT) AS bin
      FROM base CROSS JOIN cuts
    ),
    counts AS (
      SELECT bin,
        CAST(SUM(CASE WHEN per = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_ref,
        CAST(SUM(CASE WHEN per = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_cur
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
        CAST(SUM(n_cur) AS BIGINT) AS tc
      FROM counts
    ),
    detail AS (
      SELECT bin, n_ref, n_cur,
        CAST(ROUND(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE), 6)
          AS DOUBLE) AS p,
        CAST(ROUND(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE), 6)
          AS DOUBLE) AS q,
        CAST(ROUND(CASE WHEN n_ref > 0 AND n_cur > 0 THEN
          (CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE)
           - CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE))
          * (FLOOR(ln((CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE))
                      / (CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE)))
                   * 1e9) / 1e9)
          ELSE 0.0 END, 6) AS DOUBLE) AS psi_term
      FROM counts CROSS JOIN tot
    ),
    total AS (
      SELECT CAST(ROUND(list_sum(list_sort(list(psi_term))), 6) AS DOUBLE)
        AS psi
      FROM detail
    )
    SELECT detail.*, total.psi FROM detail CROSS JOIN total
    ORDER BY bin ASC
    """


@query("q252_psi_drift", oracle=_q252_oracle())
def q252_psi_drift(spark, sf_dir):
    """operators/quality.psi_drift: order-value distribution shift,
    pre-1998 reference vs 1998+ current."""
    from ..operators.quality import psi_drift

    o = T(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.when(
            F.to_date("o_orderdate") < F.lit("1998-01-01"), "ref"
        )
        .otherwise("cur")
        .alias("per"),
    )
    return psi_drift(
        o, "o_totalprice", "per", "ref", "cur", n_bins=10
    ).orderBy(F.asc("bin"))


# ---------------------------------------------------------------------------
# q270 — key-gap report: the largest contiguous missing ranges in the
# order-key sequence (sequence-integrity audit — silent loss in an
# id-assigned pipeline shows up as unexplained gaps). One lead window
# over the distinct keys; totally-ordered top-20.
# ---------------------------------------------------------------------------
@query(
    "q270_key_gap_report",
    oracle="""
    WITH k AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderkey % 97 <> 0 AND o_orderkey % 101 <> 0
    ),
    g AS (
      SELECT k + 1 AS gap_start,
        LEAD(k) OVER (ORDER BY k ASC) - 1 AS gap_end
      FROM k
    )
    SELECT CAST(gap_start AS BIGINT) AS gap_start,
      CAST(gap_end AS BIGINT) AS gap_end,
      CAST(gap_end - gap_start + 1 AS BIGINT) AS gap_len
    FROM g
    WHERE gap_end IS NOT NULL AND gap_end >= gap_start
    ORDER BY gap_len DESC, gap_start ASC
    LIMIT 20
    """,
)
def q270_key_gap_report(spark, sf_dir):
    """Largest contiguous missing o_orderkey ranges (lead window
    over distinct keys)."""
    from pyspark.sql import Window

    k = (
        T(spark, sf_dir, "orders")
        # the synthetic key space is dense — drop two residue classes
        # to inject DETERMINISTIC gaps so the positive path runs under
        # the gate (the q190 orphan-injection precedent)
        .filter(
            (F.col("o_orderkey") % 97 != 0)
            & (F.col("o_orderkey") % 101 != 0)
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    w = Window.orderBy(F.col("k").asc())
    g = k.select(
        (F.col("k") + 1).alias("gap_start"),
        (F.lead("k").over(w) - 1).alias("gap_end"),
    ).filter(
        F.col("gap_end").isNotNull()
        & (F.col("gap_end") >= F.col("gap_start"))
    )
    return (
        g.select(
            F.col("gap_start").cast("bigint").alias("gap_start"),
            F.col("gap_end").cast("bigint").alias("gap_end"),
            (F.col("gap_end") - F.col("gap_start") + 1)
            .cast("bigint")
            .alias("gap_len"),
        )
        .orderBy(F.desc("gap_len"), F.asc("gap_start"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q271 — quantile normalization across groups (the expression-array
# feature-prep primitive): equal-size md5-order subsets per group,
# within-group value ranks, each rank mapped to the cross-group mean
# of that rank's order statistics (exact decimal). Audit slice: the
# first 10 ranks per priority.
# ---------------------------------------------------------------------------
_QN_N = 200


@query(
    "q271_quantile_normalization",
    oracle=f"""
    WITH sub AS (
      SELECT o_orderpriority AS g, o_totalprice AS v, o_orderkey AS id
      FROM (
        SELECT o_orderpriority, o_totalprice, o_orderkey,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY md5('qn271' || CAST(o_orderkey AS VARCHAR)) ASC,
                     o_orderkey ASC) AS srn
        FROM orders
      ) WHERE srn <= {_QN_N}
    ),
    ranked AS (
      SELECT g, v, id,
        ROW_NUMBER() OVER (PARTITION BY g ORDER BY v ASC, id ASC) AS r
      FROM sub
    ),
    profile AS (
      SELECT r,
        CAST(ROUND(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS norm_v,
        CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM ranked GROUP BY r
    )
    SELECT ranked.g AS priority, CAST(ranked.r AS INT) AS r,
      CAST(ranked.v AS DOUBLE) AS value, profile.norm_v, profile.n_groups
    FROM ranked JOIN profile ON profile.r = ranked.r
    WHERE ranked.r <= 10
    ORDER BY priority ASC, r ASC
    """,
)
def q271_quantile_normalization(spark, sf_dir):
    """Cross-group quantile normalization of order values: md5-order
    equal-size subsets, rank-profile mapping."""
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    sw = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(
            F.concat(F.lit("qn271"), F.col("o_orderkey").cast("string"))
        ).asc(),
        F.col("o_orderkey").asc(),
    )
    sub = (
        o.withColumn("srn", F.row_number().over(sw))
        .filter(F.col("srn") <= _QN_N)
        .select(
            F.col("o_orderpriority").alias("g"),
            F.col("o_totalprice").alias("v"),
            F.col("o_orderkey").alias("id"),
        )
    )
    rw = Window.partitionBy("g").orderBy(
        F.col("v").asc(), F.col("id").asc()
    )
    ranked = sub.withColumn("r", F.row_number().over(rw))
    profile = ranked.groupBy("r").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        )
        .cast("double")
        .alias("norm_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    return (
        ranked.join(profile, "r")
        .filter(F.col("r") <= 10)
        .select(
            F.col("g").alias("priority"),
            F.col("r").cast("int").alias("r"),
            F.col("v").cast("double").alias("value"),
            "norm_v",
            "n_groups",
        )
        .orderBy(F.asc("priority"), F.asc("r"))
    )


# ---------------------------------------------------------------------------
# q324 — vocabulary-saturation (Heaps'-law) census (round 9):
# cumulative corpus tokens vs cumulative distinct words at 20 id
# milestones via the first-occurrence trick (a word counts in the
# bucket of its MIN doc id — cumulative COUNT(DISTINCT) without a
# corpus-wide window). All-integer outputs, fully hash-gated.
# ---------------------------------------------------------------------------
@query(
    "q324_vocab_growth",
    oracle="""
    WITH bounds AS (
      SELECT MIN(doc_id) AS lo, MAX(doc_id) + 1 AS hi FROM documents
    ),
    base AS (
      SELECT doc_id,
        CAST(FLOOR((doc_id - lo) * 20 / (hi - lo)) AS INT) AS bucket,
        string_split(trim(text), ' ') AS ws
      FROM documents CROSS JOIN bounds
    ),
    toks AS (
      SELECT bucket, t.w AS w
      FROM base, unnest(ws) AS t(w)
      WHERE t.w != ''
    ),
    firsts AS (
      SELECT fb AS bucket, COUNT(*) AS new_words FROM (
        SELECT w, MIN(bucket) AS fb FROM toks GROUP BY w
      ) GROUP BY fb
    ),
    per_bucket AS (
      SELECT bucket, COUNT(*) AS n_docs,
        SUM(len(list_filter(ws, x -> x != ''))) AS toks
      FROM base GROUP BY bucket
    )
    SELECT CAST(p.bucket AS INT) AS bucket,
      CAST(p.n_docs AS BIGINT) AS n_docs,
      CAST(SUM(p.toks) OVER (ORDER BY p.bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS tokens_cum,
      CAST(SUM(COALESCE(f.new_words, 0)) OVER (ORDER BY p.bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS vocab_cum
    FROM per_bucket p LEFT JOIN firsts f ON f.bucket = p.bucket
    ORDER BY bucket ASC
    """,
)
def q324_vocab_growth(spark, sf_dir):
    """operators/quality.vocabulary_growth over documents: 20-bucket
    Heaps'-law curve — tokens_cum vs vocab_cum, exact integers."""
    from ..operators.quality import vocabulary_growth

    docs = T(spark, sf_dir, "documents")
    out = vocabulary_growth(docs, id_col="doc_id", text_col="text",
                            buckets=20)
    return out.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "tokens_cum",
        "vocab_cum",
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# q332 — dataset datasheet (round 9): the Gebru et al. "Datasheets
# for Datasets" release report in one call — per-language volume,
# provenance breadth, length profile, vocabulary size, and exact-
# duplicate exposure. Three per-language aggregates joined on the
# language key; exact integers except two guarded divisions.
# ---------------------------------------------------------------------------
@query(
    "q332_dataset_datasheet",
    oracle=r"""
    WITH base AS (
      SELECT lang, source, text, n_chars,
        len(list_filter(string_split_regex(trim(text), '\s+'),
                        w -> w <> '')) AS n_tokens,
        md5(text) AS h
      FROM documents
    ),
    dups AS (
      SELECT lang, h, COUNT(*) AS c FROM base GROUP BY lang, h
    ),
    dupagg AS (
      SELECT lang,
        SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_docs,
        SUM(c - 1) AS removable_docs
      FROM dups GROUP BY lang
    ),
    vocab AS (
      SELECT lang, COUNT(DISTINCT w) AS distinct_words FROM (
        SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY lang
    )
    SELECT b.lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(COUNT(DISTINCT b.source) AS BIGINT) AS n_sources,
      CAST(SUM(b.n_tokens) AS BIGINT) AS n_tokens,
      CAST(SUM(b.n_chars) AS BIGINT) AS n_chars,
      CAST(MIN(b.n_tokens) AS BIGINT) AS min_tokens,
      CAST(MAX(b.n_tokens) AS BIGINT) AS max_tokens,
      ROUND(CAST(SUM(b.n_tokens) AS DOUBLE) / COUNT(*), 4)
        AS mean_tokens,
      CAST(v.distinct_words AS BIGINT) AS distinct_words,
      CAST(d.dup_docs AS BIGINT) AS dup_docs,
      CAST(d.removable_docs AS BIGINT) AS removable_docs,
      ROUND(CAST(d.removable_docs AS DOUBLE) / COUNT(*), 6)
        AS dup_rate
    FROM base b
    JOIN dupagg d ON d.lang = b.lang
    JOIN vocab v ON v.lang = b.lang
    GROUP BY b.lang, v.distinct_words, d.dup_docs, d.removable_docs
    ORDER BY b.lang ASC
    """,
)
def q332_dataset_datasheet(spark, sf_dir):
    """operators/quality.dataset_datasheet over documents: the
    per-language release datasheet in one call."""
    from ..operators.quality import dataset_datasheet

    docs = T(spark, sf_dir, "documents")
    return dataset_datasheet(
        docs, "doc_id", "text", "lang", "source", "n_chars"
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# q344 — the full Gopher rule set minus repetition (Rae et al. 2021
# §A1.1; q298 covers the repetition half): mean word length, symbol-
# to-word ratio, bullet-/ellipsis-line fractions, alphabetic-word
# fraction, stopword presence, word-count bounds — ONE map-only wide
# conditional profile per document, every rule flag decided on the
# stable_round6 value so DuckDB replays the verdicts bit-for-bit.
# The raw documents are single-line prose, so deterministic structure
# is injected: bullet lines on every 3rd doc, ellipsis lines on every
# 4th, '#' runs on every 5th.
# ---------------------------------------------------------------------------
_Q344_R6 = "FLOOR({x} * 1000000 + 0.5) / 1000000"


@query(
    "q344_gopher_quality",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0
          THEN '- alpha beta' || chr(10) || '- gamma delta' || chr(10)
          ELSE '' END
        || text
        || CASE WHEN doc_id % 4 = 0
          THEN chr(10) || 'to be continued...' || chr(10) || 'more soon…'
          ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' ## ## ## ####' ELSE '' END
        AS text
      FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    base AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '') AS ws,
        list_filter(list_transform(string_split(text, chr(10)),
                                   l -> trim(l)),
                    l -> l <> '') AS lns
      FROM docs
    ),
    m AS (
      SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_words,
        CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
             AS BIGINT) AS wchars,
        CAST(length(text) - length(replace(text, '#', ''))
             AS BIGINT) AS hash_cnt,
        (CAST(length(text) - length(replace(text, '...', ''))
              AS DOUBLE) / 3.0)
          + CAST(length(text) - length(replace(text, '…', ''))
                 AS DOUBLE) AS ell_cnt,
        CAST(len(lns) AS BIGINT) AS n_lines,
        CAST(len(list_filter(lns, l -> starts_with(l, '- ')
             OR starts_with(l, '* ') OR starts_with(l, '•')))
             AS BIGINT) AS bullet_lines,
        CAST(len(list_filter(lns, l -> ends_with(l, '...')
             OR ends_with(l, '…'))) AS BIGINT) AS ellipsis_lines,
        CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
             AS BIGINT) AS alpha_words,
        CAST((CASE WHEN list_contains(list_transform(ws, x -> lower(x)),
               'the') THEN 1 ELSE 0 END)
          + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)),
               'be') THEN 1 ELSE 0 END)
          + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)),
               'to') THEN 1 ELSE 0 END)
          + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)),
               'of') THEN 1 ELSE 0 END)
          + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)),
               'and') THEN 1 ELSE 0 END)
          + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)),
               'that') THEN 1 ELSE 0 END)
          + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)),
               'have') THEN 1 ELSE 0 END)
          + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)),
               'with') THEN 1 ELSE 0 END) AS INT) AS stop_hits
      FROM base
    ),
    sig AS (
      SELECT doc_id, n_words, n_lines, stop_hits,
        COALESCE({_Q344_R6.format(x='CAST(wchars AS DOUBLE) / NULLIF(CAST(n_words AS DOUBLE), 0.0)')}, 0.0)
          AS mean_word_len,
        COALESCE({_Q344_R6.format(x='(CAST(hash_cnt AS DOUBLE) + ell_cnt) / NULLIF(CAST(n_words AS DOUBLE), 0.0)')}, 0.0)
          AS symbol_ratio,
        COALESCE({_Q344_R6.format(x='CAST(bullet_lines AS DOUBLE) / NULLIF(CAST(n_lines AS DOUBLE), 0.0)')}, 0.0)
          AS bullet_frac,
        COALESCE({_Q344_R6.format(x='CAST(ellipsis_lines AS DOUBLE) / NULLIF(CAST(n_lines AS DOUBLE), 0.0)')}, 0.0)
          AS ellipsis_frac,
        COALESCE({_Q344_R6.format(x='CAST(alpha_words AS DOUBLE) / NULLIF(CAST(n_words AS DOUBLE), 0.0)')}, 0.0)
          AS alpha_frac
      FROM m
    )
    SELECT doc_id, n_words,
      CAST(mean_word_len AS DOUBLE) AS mean_word_len,
      CAST(symbol_ratio AS DOUBLE) AS symbol_ratio,
      n_lines,
      CAST(bullet_frac AS DOUBLE) AS bullet_frac,
      CAST(ellipsis_frac AS DOUBLE) AS ellipsis_frac,
      CAST(alpha_frac AS DOUBLE) AS alpha_frac,
      stop_hits,
      CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS pass_words,
      CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT)
        AS pass_mean_word_len,
      CAST(symbol_ratio <= 0.1 AS INT) AS pass_symbol,
      CAST(bullet_frac <= 0.9 AS INT) AS pass_bullet,
      CAST(ellipsis_frac <= 0.3 AS INT) AS pass_ellipsis,
      CAST(alpha_frac >= 0.8 AS INT) AS pass_alpha,
      CAST(stop_hits >= 2 AS INT) AS pass_stopwords,
      CAST(n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        AND stop_hits >= 2 AS INT) AS gopher_pass
    FROM sig
    ORDER BY doc_id ASC
    """,
)
def q344_gopher_quality(spark, sf_dir):
    """operators/quality.gopher_quality_signals over documents with
    injected bullet/ellipsis/symbol structure: the non-repetition
    Gopher rules as one map-only wide profile per doc, per-rule flags
    and the composed verdict hash-gated."""
    from ..operators.quality import gopher_quality_signals

    d = T(spark, sf_dir, "documents")
    key = F.col("doc_id")
    docs = d.filter(
        F.col("text").isNotNull() & key.isNotNull()
    ).select(
        "doc_id",
        F.concat(
            F.when(
                key % 3 == 0,
                F.lit("- alpha beta\n- gamma delta\n"),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                key % 4 == 0,
                F.lit("\nto be continued...\nmore soon…"),
            ).otherwise(F.lit("")),
            F.when(key % 5 == 0, F.lit(" ## ## ## ####")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return gopher_quality_signals(docs).orderBy("doc_id")
