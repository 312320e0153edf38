"""Analytics batch 3: inferential statistics and sequence mining —
Welch's t-test, mutual information, Benford fraud screening, Markov
transition matrices, functional-dependency audits, Gini inequality.

Every statistic follows the determinism contract: exact integer /
DECIMAL sufficient statistics, transcendental terms floor-quantized
(stats.fquant) before sorted-fold reduction, one fixed IEEE
expression for the derived value, ROUND for output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.ids import dense_ids
from . import query
from ._helpers import T

# ---------------------------------------------------------------------------
# q171 — Welch's two-sample t-test: do urgent orders spend differently
# from low-priority ones? Conditional DECIMAL sums in ONE aggregate
# (no per-group second pass); everything after the sums is +-*/ and
# sqrt, all IEEE-correctly-rounded, so Spark and DuckDB produce the
# identical double before the final ROUND.
# ---------------------------------------------------------------------------
@query(
    "q171_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT
        CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
             AS BIGINT) AS n_a,
        CAST(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)
             AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
             AS DECIMAL(38,6)) AS sa,
        CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
             AS DECIMAL(38,6)) AS sb,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2)) END)
             AS DECIMAL(38,6)) AS ssa,
        CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2)) END)
             AS DECIMAL(38,6)) AS ssb
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        AND o_totalprice IS NOT NULL
    ),
    d AS (
      SELECT n_a, n_b,
        CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        CAST(sa AS DOUBLE) AS sa, CAST(sb AS DOUBLE) AS sb,
        CAST(ssa AS DOUBLE) AS ssa, CAST(ssb AS DOUBLE) AS ssb
      FROM s
    ),
    v AS (
      SELECT n_a, n_b, na, nb, sa / na AS ma, sb / nb AS mb,
        ((ssa - sa * sa / na) / (na - 1)) / na AS sea,
        ((ssb - sb * sb / nb) / (nb - 1)) / nb AS seb
      FROM d
    )
    SELECT n_a, n_b,
      CAST(ROUND(ma, 6) AS DOUBLE) AS mean_a,
      CAST(ROUND(mb, 6) AS DOUBLE) AS mean_b,
      CAST(ROUND(CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0
        THEN (ma - mb) / sqrt(sea + seb) END, 6) AS DOUBLE) AS t_stat,
      CAST(ROUND(CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0
        THEN ((sea + seb) * (sea + seb))
             / (sea * sea / (na - 1) + seb * seb / (nb - 1)) END, 6)
        AS DOUBLE) AS dof_welch
    FROM v
    """,
)
def q171_welch_ttest(spark, sf_dir):
    """operators/stats.welch_ttest — order totals, urgent vs low."""
    from ..operators.stats import welch_ttest

    return welch_ttest(
        T(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority",
        "1-URGENT", "5-LOW",
    )


# ---------------------------------------------------------------------------
# q172 — entropies + mutual information between customer segment and
# order priority (the effect-size companion to q153's chi-square on
# the same pair). ln terms floor-quantized at 1e-9 before the sorted
# fold — ln is the one non-correctly-rounded op in the chain.
# ---------------------------------------------------------------------------
@query(
    "q172_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS a, o.o_orderpriority AS b,
        CAST(COUNT(*) AS BIGINT) AS o
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY a),
    rb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS rb FROM cells GROUP BY b),
    tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM cells),
    mi AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
        CAST(ROUND(list_sum(list_sort(list(term))), 6) AS DOUBLE) AS mi
      FROM (
        SELECT t.n,
          CAST(FLOOR(((CAST(c.o AS DOUBLE) / t.n)
            * ln(t.n * CAST(c.o AS DOUBLE)
                 / (CAST(ra.ra AS DOUBLE) * CAST(rb.rb AS DOUBLE))))
            * 1000000000.0) AS DOUBLE) / 1000000000.0 AS term
        FROM cells c JOIN ra ON ra.a = c.a JOIN rb ON rb.b = c.b
        CROSS JOIN tot t
      )
    ),
    ha AS (
      SELECT CAST(ROUND(list_sum(list_sort(list(term))), 6) AS DOUBLE) AS h_a
      FROM (
        SELECT CAST(FLOOR((-(CAST(ra AS DOUBLE) / t.n)
            * ln(CAST(ra AS DOUBLE) / t.n)) * 1000000000.0) AS DOUBLE)
          / 1000000000.0 AS term
        FROM ra CROSS JOIN tot t
      )
    ),
    hb AS (
      SELECT CAST(ROUND(list_sum(list_sort(list(term))), 6) AS DOUBLE) AS h_b
      FROM (
        SELECT CAST(FLOOR((-(CAST(rb AS DOUBLE) / t.n)
            * ln(CAST(rb AS DOUBLE) / t.n)) * 1000000000.0) AS DOUBLE)
          / 1000000000.0 AS term
        FROM rb CROSS JOIN tot t
      )
    )
    SELECT mi.n, ha.h_a, hb.h_b, mi.mi,
      CAST(ROUND(CASE WHEN ha.h_a > 0 AND hb.h_b > 0
        THEN mi.mi / sqrt(ha.h_a * hb.h_b) END, 6) AS DOUBLE) AS nmi
    FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
)
def q172_mutual_information(spark, sf_dir):
    """operators/stats.mutual_information — segment × priority."""
    from ..operators.stats import mutual_information

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", "o_orderpriority"
    )
    return mutual_information(j, "c_mktsegment", "o_orderpriority")


# ---------------------------------------------------------------------------
# q173 — Benford first-digit screen on order totals. Leading digit
# from the DECIMAL string (exact, engine-identical) — never from
# log10 of the value; expected fractions log10(1+1/d) floor-quantized.
# ---------------------------------------------------------------------------
@query(
    "q173_benford_totals",
    oracle="""
    WITH d AS (
      SELECT regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 AS VARCHAR), '[1-9]') AS digit
      FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 0
    ),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS DOUBLE) AS n FROM c)
    SELECT CAST(digit AS INT) AS digit, n_obs,
      CAST(ROUND(CAST(n_obs AS DOUBLE) / t.n, 6) AS DOUBLE) AS obs_frac,
      CAST(ROUND(CAST(FLOOR(log10(1.0 + 1.0 / CAST(digit AS DOUBLE))
            * 1000000000.0) AS DOUBLE) / 1000000000.0, 6) AS DOUBLE)
        AS exp_frac,
      CAST(ROUND(ABS(CAST(n_obs AS DOUBLE) / t.n
        - CAST(FLOOR(log10(1.0 + 1.0 / CAST(digit AS DOUBLE))
            * 1000000000.0) AS DOUBLE) / 1000000000.0), 6) AS DOUBLE)
        AS abs_dev
    FROM c CROSS JOIN tot t
    ORDER BY digit ASC
    """,
)
def q173_benford_totals(spark, sf_dir):
    """operators/quality.benford_deviation on o_totalprice."""
    from ..operators.quality import benford_deviation

    return benford_deviation(
        T(spark, sf_dir, "orders"), "o_totalprice"
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# q174 — first-order Markov transition matrix over per-user event
# sequences. One lead window keyed by user (each event shuffles
# once), |types|² groups after; (ts, event_id) makes the order total
# so the pairing is deterministic under timestamp ties.
# ---------------------------------------------------------------------------
@query(
    "q174_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_state,
        LEAD(event_type) OVER (PARTITION BY user_id
          ORDER BY ts ASC, event_id ASC) AS to_state
      FROM events
    ),
    c AS (
      SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2
    ),
    t AS (
      SELECT from_state, CAST(SUM(n_transitions) AS BIGINT) AS tot
      FROM c GROUP BY 1
    )
    SELECT c.from_state, c.to_state, c.n_transitions,
      CAST(ROUND(CAST(c.n_transitions AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
           AS DOUBLE) AS prob
    FROM c JOIN t ON t.from_state = c.from_state
    ORDER BY c.from_state ASC, c.to_state ASC
    """,
)
def q174_event_transitions(spark, sf_dir):
    """operators/sequences.transition_matrix — user behavior model."""
    from ..operators.sequences import transition_matrix

    return transition_matrix(
        T(spark, sf_dir, "events"), ["user_id"], ["ts", "event_id"],
        "event_type",
    ).orderBy("from_state", "to_state")


# ---------------------------------------------------------------------------
# q175 — functional-dependency audit on lineitem: one key FD that
# holds ((orderkey, linenumber) → partkey) and two that fail. Each FD
# is one keyed aggregate + a tiny rollup; the report unions.
# ---------------------------------------------------------------------------
_FD_REPORT = """
      SELECT '{name}' AS fd,
        CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
        CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violating_lhs,
        CAST(MAX(k) AS BIGINT) AS max_distinct_rhs,
        CAST(SUM(CASE WHEN k > 1 THEN rows_ ELSE 0 END) AS BIGINT)
          AS violating_rows,
        CAST(ROUND(CAST(SUM(CASE WHEN k > 1 THEN rows_ ELSE 0 END) AS DOUBLE)
          / CAST(SUM(rows_) AS DOUBLE), 6) AS DOUBLE) AS violation_frac
      FROM (
        SELECT {lhs}, CAST(COUNT(*) AS BIGINT) AS rows_,
          CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS k
        FROM lineitem
        WHERE {rhs} IS NOT NULL AND {notnull}
        GROUP BY {lhs}
      )
"""


@query(
    "q175_fd_violations",
    oracle="SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        _FD_REPORT.format(
            name=name,
            lhs=lhs,
            rhs=rhs,
            notnull=" AND ".join(
                f"{c} IS NOT NULL" for c in lhs.split(", ")
            ),
        )
        for name, lhs, rhs in [
            ("l_orderkey,l_linenumber->l_partkey",
             "l_orderkey, l_linenumber", "l_partkey"),
            ("l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"),
            ("l_partkey->l_suppkey", "l_partkey", "l_suppkey"),
        ]
    )
    + "\n) ORDER BY fd ASC",
)
def q175_fd_violations(spark, sf_dir):
    """operators/quality.fd_violations — one holding key FD, two
    violated candidate FDs."""
    from ..operators.quality import fd_violations

    return fd_violations(
        T(spark, sf_dir, "lineitem"),
        [
            (["l_orderkey", "l_linenumber"], "l_partkey"),
            (["l_orderkey"], "l_returnflag"),
            (["l_partkey"], "l_suppkey"),
        ],
    ).orderBy("fd")


# ---------------------------------------------------------------------------
# q176 — Gini coefficient of per-customer revenue. Ranks via
# ids.dense_ids (range-partitioned numbering — no single-task sort
# even when the entity table is huge); oracle replays with the
# ROW_NUMBER equivalence q138 already proved for dense_ids.
# ---------------------------------------------------------------------------
@query(
    "q176_revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS id,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, id ASC) AS i
      FROM rev WHERE x IS NOT NULL AND x >= 0
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(x) AS DECIMAL(38,6)) AS sx,
        CAST(SUM(CAST(i * x AS DECIMAL(38,2))) AS DECIMAL(38,6)) AS six
      FROM ranked
    )
    SELECT n,
      CAST(ROUND(CAST(sx AS DOUBLE), 2) AS DOUBLE) AS total,
      CAST(ROUND(CASE WHEN n >= 2 AND CAST(sx AS DOUBLE) > 0
        THEN (2.0 * CAST(six AS DOUBLE)
              - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) END, 6) AS DOUBLE)
        AS gini
    FROM s
    """,
)
def q176_revenue_gini(spark, sf_dir):
    """operators/stats.gini_coefficient over per-customer revenue
    (the Lorenz companion to q156's Pareto contribution)."""
    from ..operators.stats import gini_coefficient
    from ._helpers import dec

    rev = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("id"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("x"))
    )
    return gini_coefficient(rev, "x", "id")


# ---------------------------------------------------------------------------
# q177 — Kaplan-Meier customer-lifetime curve. The cohort collapses
# to one row per 30-day duration bucket (the time grid — bounded by
# resolution, not cohort size); at-risk counts are an integer window
# sum over the grid; survival is the per-grid prefix product, folded
# left-to-right so both engines multiply the identical IEEE chain.
# ---------------------------------------------------------------------------
@query(
    "q177_km_customer_lifetime",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
        MIN(CAST(o_orderdate AS DATE)) AS f,
        MAX(CAST(o_orderdate AS DATE)) AS l
      FROM orders GROUP BY o_custkey
    ),
    coh AS (
      SELECT CAST(FLOOR(date_diff('day', f, l) / 30) AS BIGINT) AS t,
        CASE WHEN l < DATE '1998-01-01' THEN 1 ELSE 0 END AS ev
      FROM cust
    ),
    per AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS m
      FROM coh GROUP BY t
    ),
    r AS (
      SELECT t, d,
        CAST(SUM(m) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM per
    ),
    a AS (
      SELECT list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
        list(n_risk ORDER BY t) AS ns,
        list(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
             ORDER BY t) AS fs
      FROM r
    )
    SELECT ts[i] AS t, ns[i] AS n_risk, ds[i] AS n_events,
      CAST(ROUND(list_reduce(fs[1:i], (x, y) -> x * y), 6) AS DOUBLE)
        AS survival
    FROM a, unnest(generate_series(1, len(ts))) AS u(i)
    WHERE ds[i] > 0
    ORDER BY t ASC
    """,
)
def q177_km_customer_lifetime(spark, sf_dir):
    """operators/survival.kaplan_meier — duration = months between a
    customer's first and last order; churn (event) = last order
    before 1998, later actives censored."""
    from ..operators.survival import kaplan_meier

    cust = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(F.to_date("o_orderdate")).alias("f"),
            F.max(F.to_date("o_orderdate")).alias("l"),
        )
    )
    coh = cust.select(
        F.floor(F.datediff("l", "f") / 30).cast("bigint").alias("t"),
        F.when(F.col("l") < F.lit("1998-01-01").cast("date"), 1)
        .otherwise(0)
        .alias("ev"),
    )
    return kaplan_meier(coh, "t", "ev").orderBy("t")


# ---------------------------------------------------------------------------
# q178 — KMV distinct sketch: cardinality ESTIMATION inside the hash
# gate (md5-order k-minimums are engine-replayable where HLL is not).
# The '1-URGENT'-class priorities hold ~thousands of distinct
# customers against k=64 — a genuine estimate, not the exact branch.
# ---------------------------------------------------------------------------
@query(
    "q178_kmv_distinct_customers",
    oracle="""
    WITH h AS (
      SELECT DISTINCT o_orderpriority AS priority,
        ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
          ::UBIGINT::BIGINT AS hv
      FROM orders WHERE o_custkey IS NOT NULL
    ),
    r AS (
      SELECT priority, hv,
        ROW_NUMBER() OVER (PARTITION BY priority ORDER BY hv ASC) AS rn
      FROM h
    ),
    k AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_kept,
        MAX(CASE WHEN rn = 64 THEN hv END) AS kth
      FROM r WHERE rn <= 64 GROUP BY priority
    )
    SELECT priority, n_kept,
      CAST(CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
        ELSE FLOOR(63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)) END
        AS BIGINT) AS est_distinct
    FROM k ORDER BY priority ASC
    """,
)
def q178_kmv_distinct_customers(spark, sf_dir):
    """operators/sketch.kmv_sketch + kmv_estimate — distinct
    customers per priority, k=64."""
    from ..operators.sketch import kmv_estimate, kmv_sketch

    sk = kmv_sketch(
        T(spark, sf_dir, "orders"), "o_custkey", ["o_orderpriority"], k=64
    )
    return (
        kmv_estimate(sk, 64, ["o_orderpriority"])
        .withColumnRenamed("o_orderpriority", "priority")
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# q180 — item-item collaborative filtering: top-3 "also bought"
# neighbors per part by cosine over order-membership vectors. Counts
# are basket_pairs' exact integers; cosine rounds BEFORE the rank
# window so the selection is engine-deterministic.
# ---------------------------------------------------------------------------
@query(
    "q180_item_cf_neighbors",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem
    ),
    pairs AS (
      -- both orientations from ONE self-join (mirrors the Spark plan)
      SELECT a.item AS item_a, b.item AS item_b,
        CAST(COUNT(*) AS BIGINT) AS pair_count
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item <> b.item
      GROUP BY 1, 2
    ),
    per AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS item_count
      FROM items GROUP BY item
    ),
    j AS (
      SELECT b.item_a, b.item_b, b.pair_count,
        CAST(ROUND(CAST(b.pair_count AS DOUBLE)
          / sqrt(CAST(pa.item_count AS DOUBLE)
                 * CAST(pb.item_count AS DOUBLE)), 6) AS DOUBLE) AS cosine
      FROM pairs b
      JOIN per pa ON b.item_a = pa.item
      JOIN per pb ON b.item_b = pb.item
    ),
    r AS (
      SELECT item_a, item_b, pair_count, cosine,
        ROW_NUMBER() OVER (PARTITION BY item_a
          ORDER BY cosine DESC, item_b ASC) AS rn
      FROM j
    )
    SELECT item_a AS item, item_b AS neighbor, pair_count, cosine,
      CAST(rn AS INT) AS rank
    FROM r WHERE rn <= 3
    ORDER BY item ASC, rank ASC
    """,
)
def q180_item_cf_neighbors(spark, sf_dir):
    """operators/baskets.item_similarity on (order, part) baskets."""
    from ..operators.baskets import item_similarity

    li = T(spark, sf_dir, "lineitem")
    return item_similarity(li, "l_orderkey", "l_partkey", top_k=3).orderBy(
        "item", "rank"
    )


# ---------------------------------------------------------------------------
# q181 — LM-perplexity quality filter: score every document under
# the corpus's own bigram MLE model (the CCNet signal); surface the
# 20 most surprising documents. Per-gram −ln(p) terms floor-quantized
# then sorted-folded, so the score is engine-exact.
# ---------------------------------------------------------------------------
@query(
    "q181_lm_perplexity_filter",
    oracle=r"""
    WITH tok0 AS (
      SELECT doc_id,
        unnest(string_split_regex(text, '\s+')) AS word,
        unnest(generate_series(1, len(string_split_regex(text, '\s+'))))
          AS pos
      FROM documents
    ),
    tok AS (SELECT doc_id, pos, word FROM tok0 WHERE word <> ''),
    big AS (
      SELECT doc_id, word AS w1,
        LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    cnt AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS ngram_count
      FROM big WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    pre AS (
      SELECT w1, CAST(SUM(ngram_count) AS BIGINT) AS prefix_count
      FROM cnt GROUP BY w1
    ),
    cp AS (
      SELECT c.w1, c.w2,
        CAST(ROUND(CAST(c.ngram_count AS DOUBLE)
                   / CAST(p.prefix_count AS DOUBLE), 6) AS DOUBLE) AS cond_p
      FROM cnt c JOIN pre p USING (w1)
    ),
    terms AS (
      SELECT b.doc_id,
        CAST(FLOOR((-ln(cp.cond_p)) * 1000000000.0) AS DOUBLE)
          / 1000000000.0 AS term
      FROM big b JOIN cp ON cp.w1 = b.w1 AND cp.w2 = b.w2
      WHERE b.w2 IS NOT NULL
    ),
    per AS (
      SELECT doc_id AS doc, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        ROUND(list_sum(list_sort(list(term))), 9) AS s
      FROM terms GROUP BY doc_id
    )
    SELECT doc, n_ngrams,
      CAST(ROUND(s / CAST(n_ngrams AS DOUBLE), 6) AS DOUBLE) AS avg_nll
    FROM per
    ORDER BY avg_nll DESC, doc ASC
    LIMIT 20
    """,
)
def q181_lm_perplexity_filter(spark, sf_dir):
    """operators/ngram_lm.doc_avg_nll (n=2) over documents — the
    most-atypical-20 list a curation pass would drop or review."""
    from ..operators.ngram_lm import doc_avg_nll

    docs = T(spark, sf_dir, "documents")
    return doc_avg_nll(docs, "text", "doc_id", n=2).orderBy(
        F.desc("avg_nll"), F.asc("doc")
    ).limit(20)


# ---------------------------------------------------------------------------
# q182 — tokenizer fertility per language: tokens per 100 chars and
# bytes per token — the corpus-planning numbers behind tokenizer and
# mixture decisions. Pure counting (one wide aggregate per language).
# ---------------------------------------------------------------------------
@query(
    "q182_token_fertility",
    oracle=r"""
    SELECT lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
                               w -> w <> ''))) AS BIGINT) AS total_tokens,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      CAST(ROUND(CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
                                          w -> w <> ''))) AS DOUBLE)
        * 100.0 / CAST(SUM(n_chars) AS DOUBLE), 4) AS DOUBLE)
        AS tokens_per_100_chars,
      CAST(ROUND(CAST(SUM(octet_length(encode(text))) AS DOUBLE)
        / CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
                                   w -> w <> ''))) AS DOUBLE), 4) AS DOUBLE)
        AS bytes_per_token
    FROM documents
    GROUP BY lang
    ORDER BY lang ASC
    """,
)
def q182_token_fertility(spark, sf_dir):
    """Whitespace-token fertility stats per language over documents
    (tokens/chars/bytes — the suite/text tokenizer conventions)."""
    toks = F.filter(
        F.split(F.col("text"), r"\s+"), lambda w: w != ""
    )
    n_tok = F.size(toks).cast("bigint")
    n_bytes = F.octet_length("text").cast("bigint")
    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(n_tok).cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(n_bytes).cast("bigint").alias("total_bytes"),
            F.round(
                F.sum(n_tok).cast("double") * 100.0
                / F.sum("n_chars").cast("double"),
                4,
            )
            .cast("double")
            .alias("tokens_per_100_chars"),
            F.round(
                F.sum(n_bytes).cast("double")
                / F.sum(n_tok).cast("double"),
                4,
            )
            .cast("double")
            .alias("bytes_per_token"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q183 — KMV set algebra: union / intersection cardinality of two
# customer populations (urgent vs high priority) estimated purely
# from their sketches — the theta-sketch pattern, engine-replayable
# because every step is md5-order + FLOOR arithmetic.
# ---------------------------------------------------------------------------
@query(
    "q183_kmv_set_overlap",
    oracle="""
    WITH ha AS (
      SELECT list(hv ORDER BY hv) AS l FROM (
        SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
          1, 15))::UBIGINT::BIGINT AS hv
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_custkey IS NOT NULL
        ORDER BY hv ASC LIMIT 64
      )
    ),
    hb AS (
      SELECT list(hv ORDER BY hv) AS l FROM (
        SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
          1, 15))::UBIGINT::BIGINT AS hv
        FROM orders
        WHERE o_orderpriority = '2-HIGH' AND o_custkey IS NOT NULL
        ORDER BY hv ASC LIMIT 64
      )
    ),
    m AS (
      SELECT ha.l AS la, hb.l AS lb,
        list_sort(list_distinct(ha.l || hb.l))[1:64] AS mg
      FROM ha CROSS JOIN hb
    ),
    e AS (
      SELECT la, lb, mg,
        CASE WHEN len(mg) < 64 THEN CAST(len(mg) AS DOUBLE)
          ELSE FLOOR(63.0 * 1152921504606846976.0
                     / CAST(mg[64] AS DOUBLE)) END AS u,
        CAST(len(list_filter(mg, x -> list_contains(la, x)
                                      AND list_contains(lb, x))) AS DOUBLE)
          / CAST(LEAST(len(mg), 64) AS DOUBLE) AS rho
      FROM m
    )
    SELECT CAST(u AS BIGINT) AS union_est,
      CAST(FLOOR(rho * u) AS BIGINT) AS intersect_est,
      CAST(ROUND(rho, 6) AS DOUBLE) AS jaccard
    FROM e
    """,
)
def q183_kmv_set_overlap(spark, sf_dir):
    """operators/sketch.kmv_set_estimates over the urgent / high
    customer sketches (k=64)."""
    from ..operators.sketch import kmv_set_estimates, kmv_sketch

    o = T(spark, sf_dir, "orders")
    sk_a = kmv_sketch(
        o.filter(F.col("o_orderpriority") == "1-URGENT"), "o_custkey", k=64
    )
    sk_b = kmv_sketch(
        o.filter(F.col("o_orderpriority") == "2-HIGH"), "o_custkey", k=64
    )
    return kmv_set_estimates(sk_a, sk_b, 64)


# ---------------------------------------------------------------------------
# q184 — key-skew diagnostic on the lineitem supplier key: the report
# that decides salting before a 100 TB join. Count table is
# key-bounded; total rides as a broadcast 1-row aggregate; top-10
# compiles to TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@query(
    "q184_key_skew_report",
    oracle="""
    WITH c AS (
      SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_suppkey
    ),
    t AS (SELECT CAST(SUM(n_rows) AS DOUBLE) AS total FROM c)
    SELECT l_suppkey, n_rows,
      CAST(ROUND(CAST(n_rows AS DOUBLE) / t.total, 4) AS DOUBLE) AS share
    FROM c CROSS JOIN t
    ORDER BY n_rows DESC, l_suppkey ASC
    LIMIT 10
    """,
)
def q184_key_skew_report(spark, sf_dir):
    """operators/joins.skewed_key_stats — heaviest supplier keys."""
    from ..operators.joins import skewed_key_stats

    return skewed_key_stats(
        T(spark, sf_dir, "lineitem"), "l_suppkey", top=10
    )


# ---------------------------------------------------------------------------
# q185 — join-size prediction WITHOUT running the join: the exact
# output cardinality of the lineitem part-key self-join (the q134
# basket shape) from per-key count tables — key-cardinality work for
# a row-cardinality answer. max_key_output is the straggler bound.
# ---------------------------------------------------------------------------
@query(
    "q185_join_size_profile",
    oracle="""
    WITH lc AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cl
      FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY l_partkey
    ),
    rc AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cr
      FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY l_partkey
    ),
    j AS (
      SELECT lc.cl, rc.cr,
        CAST(COALESCE(lc.cl, 0) * COALESCE(rc.cr, 0) AS BIGINT) AS prod
      FROM lc FULL OUTER JOIN rc ON lc.k = rc.k
    )
    SELECT CAST(COUNT(cl) AS BIGINT) AS n_keys_left,
      CAST(COUNT(cr) AS BIGINT) AS n_keys_right,
      CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_matched_keys,
      CAST(SUM(prod) AS BIGINT) AS output_rows,
      CAST(MAX(prod) AS BIGINT) AS max_key_output,
      CAST(ROUND(CAST(SUM(prod) AS DOUBLE)
        / CAST(SUM(COALESCE(cl, 0)) AS DOUBLE), 6) AS DOUBLE)
        AS amplification
    FROM j
    """,
)
def q185_join_size_profile(spark, sf_dir):
    """operators/joins.join_size_profile on the lineitem part-key
    self-join."""
    from ..operators.joins import join_size_profile

    li = T(spark, sf_dir, "lineitem")
    return join_size_profile(li, li, "l_partkey", "l_partkey")


# ---------------------------------------------------------------------------
# q186 — day-of-week seasonal index of daily revenue per priority.
# ISO weekday (weekday()+1 == DuckDB isodow — the only dow numbering
# the engines share); exact decimal sums re-aggregated for the group
# mean (no second scan).
# ---------------------------------------------------------------------------
@query(
    "q186_seasonal_index",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS rev
      FROM orders GROUP BY 1, 2
    ),
    pd AS (
      SELECT priority, CAST(isodow(d) AS INT) AS isodow,
        CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS sd
      FROM s GROUP BY 1, 2
    ),
    pg AS (
      SELECT priority, CAST(SUM(n_days) AS BIGINT) AS na,
        CAST(SUM(sd) AS DECIMAL(38,6)) AS sa
      FROM pd GROUP BY priority
    )
    SELECT pd.priority, pd.isodow, pd.n_days,
      CAST(ROUND(CAST(sd AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS DOUBLE)
        AS dow_mean,
      CAST(ROUND((CAST(sd AS DOUBLE) / CAST(n_days AS DOUBLE))
        / (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)), 6) AS DOUBLE)
        AS seasonal_index
    FROM pd JOIN pg ON pg.priority = pd.priority
    ORDER BY pd.priority ASC, pd.isodow ASC
    """,
)
def q186_seasonal_index(spark, sf_dir):
    """operators/timeseries.seasonal_index over per-priority daily
    revenue."""
    from ..operators.timeseries import seasonal_index
    from .analytics2 import _daily_rev

    return seasonal_index(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev"
    ).orderBy("priority", "isodow")


# ---------------------------------------------------------------------------
# q187 — k-fold assignment audit: content-hash folds are exact set
# membership (md5 arithmetic DuckDB-replayable), so the oracle
# verifies EXACT per-fold composition, not just sizes — the q95
# train/test discipline extended to cross-validation.
# ---------------------------------------------------------------------------
@query(
    "q187_kfold_assignment",
    oracle="""
    SELECT
      CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::UBIGINT
           % 5 AS INT) AS fold,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY fold ASC
    """,
)
def q187_kfold_assignment(spark, sf_dir):
    """operators/sampling.kfold_assign — 5-fold CV splits keyed by
    customer (fold boundaries never split a customer's orders)."""
    from ..operators.sampling import kfold_assign
    from ._helpers import dec, dround

    o = kfold_assign(T(spark, sf_dir, "orders"), "o_custkey", k=5)
    return (
        o.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            dround(F.sum(dec("o_totalprice"))).alias("revenue"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# q188 — full pairwise correlation matrix of the four lineitem
# measures in ONE wide aggregate (p(p+1)/2 decimal product sums, one
# scan — never p² jobs). The oracle computes the same sums once and
# unions the six pair expressions.
# ---------------------------------------------------------------------------
_CM_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
_CM_PAIRS = [
    (a, b) for i, a in enumerate(_CM_COLS) for b in _CM_COLS[i + 1:]
]
_CM_SUMS = ",\n".join(
    [
        f"""        CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DECIMAL(38,6))
          AS s_{c},
        CAST(SUM(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2)))
          AS DECIMAL(38,6)) AS ss_{c}"""
        for c in _CM_COLS
    ]
    + [
        f"""        CAST(SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)))
          AS DECIMAL(38,6)) AS sp_{a}_{b}"""
        for a, b in _CM_PAIRS
    ]
)
_CM_PAIR_SELECT = "\nUNION ALL\n".join(
    f"""    SELECT '{a}' AS col_a, '{b}' AS col_b, n,
      CAST(ROUND(CASE WHEN
          (CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)
           - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE)) > 0
          AND (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)
           - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)) > 0
        THEN (CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)
              - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)
                     - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)
                       - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))
        END, 6) AS DOUBLE) AS corr
    FROM s"""
    for a, b in _CM_PAIRS
)


@query(
    "q188_corr_matrix",
    oracle=f"""
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
{_CM_SUMS}
      FROM lineitem
      WHERE l_discount IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_quantity IS NOT NULL AND l_tax IS NOT NULL
    )
{_CM_PAIR_SELECT}
    ORDER BY col_a ASC, col_b ASC
    """,
)
def q188_corr_matrix(spark, sf_dir):
    """operators/stats.corr_matrix over the four lineitem measures."""
    from ..operators.stats import corr_matrix

    return corr_matrix(
        T(spark, sf_dir, "lineitem"), _CM_COLS
    ).orderBy("col_a", "col_b")


# ---------------------------------------------------------------------------
# q189 — autocorrelation function of daily revenue per priority,
# lags 1-5: ONE lead window (series shuffles once) + ONE wide
# aggregate of all 30 conditional decimal sums; per-lag Pearson via
# the exact_corr expression; unioned lag selects on the oracle side.
# ---------------------------------------------------------------------------
_ACF_LAGS = [1, 2, 3, 4, 5]
_ACF_SUMS = ",\n".join(
    f"""        CAST(COUNT(CASE WHEN y{lag} IS NOT NULL THEN 1 END) AS BIGINT)
          AS n_{lag},
        CAST(SUM(CASE WHEN y{lag} IS NOT NULL THEN x END) AS DECIMAL(38,6))
          AS sx_{lag},
        CAST(SUM(CASE WHEN y{lag} IS NOT NULL THEN y{lag} END)
          AS DECIMAL(38,6)) AS sy_{lag},
        CAST(SUM(CASE WHEN y{lag} IS NOT NULL THEN x * y{lag} END)
          AS DECIMAL(38,6)) AS sxy_{lag},
        CAST(SUM(CASE WHEN y{lag} IS NOT NULL THEN x * x END)
          AS DECIMAL(38,6)) AS sxx_{lag},
        CAST(SUM(CASE WHEN y{lag} IS NOT NULL THEN y{lag} * y{lag} END)
          AS DECIMAL(38,6)) AS syy_{lag}"""
    for lag in _ACF_LAGS
)
_ACF_SELECTS = "\nUNION ALL\n".join(
    f"""    SELECT priority, CAST({lag} AS INT) AS lag, n_{lag} AS n_pairs,
      CAST(ROUND(CASE WHEN
          (CAST(n_{lag} AS DOUBLE) * CAST(sxx_{lag} AS DOUBLE)
           - CAST(sx_{lag} AS DOUBLE) * CAST(sx_{lag} AS DOUBLE)) > 0
          AND (CAST(n_{lag} AS DOUBLE) * CAST(syy_{lag} AS DOUBLE)
           - CAST(sy_{lag} AS DOUBLE) * CAST(sy_{lag} AS DOUBLE)) > 0
        THEN (CAST(n_{lag} AS DOUBLE) * CAST(sxy_{lag} AS DOUBLE)
              - CAST(sx_{lag} AS DOUBLE) * CAST(sy_{lag} AS DOUBLE))
             / sqrt((CAST(n_{lag} AS DOUBLE) * CAST(sxx_{lag} AS DOUBLE)
                     - CAST(sx_{lag} AS DOUBLE) * CAST(sx_{lag} AS DOUBLE))
                    * (CAST(n_{lag} AS DOUBLE) * CAST(syy_{lag} AS DOUBLE)
                       - CAST(sy_{lag} AS DOUBLE) * CAST(sy_{lag} AS DOUBLE)))
        END, 6) AS DOUBLE) AS acf
    FROM a"""
    for lag in _ACF_LAGS
)


@query(
    "q189_revenue_acf",
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS rev
      FROM orders GROUP BY 1, 2
    ),
    l AS (
      SELECT priority, CAST(rev AS DECIMAL(18,2)) AS x,
        {", ".join(f"CAST(LEAD(rev, {lag}) OVER w AS DECIMAL(18,2)) AS y{lag}" for lag in _ACF_LAGS)}
      FROM s WINDOW w AS (PARTITION BY priority ORDER BY d ASC)
    ),
    a AS (
      SELECT priority,
{_ACF_SUMS}
      FROM l GROUP BY priority
    )
{_ACF_SELECTS}
    ORDER BY priority ASC, lag ASC
    """,
)
def q189_revenue_acf(spark, sf_dir):
    """operators/timeseries.acf — lags 1-5 of daily revenue."""
    from ..operators.timeseries import acf
    from .analytics2 import _daily_rev

    return acf(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev", max_lag=5
    ).orderBy("priority", "lag")


# ---------------------------------------------------------------------------
# q190 — referential-integrity audit with INJECTED orphans: two
# synthetic part keys (-1, -2) union into the child so the detector's
# positive path runs inside the oracle gate, not just unit tests.
# ---------------------------------------------------------------------------
@query(
    "q190_ref_integrity",
    oracle="""
    WITH child AS (
      SELECT l_partkey AS fk FROM lineitem
      UNION ALL SELECT -1 UNION ALL SELECT -1 UNION ALL SELECT -2
      UNION ALL SELECT NULL
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_child_rows,
        CAST(SUM(CASE WHEN fk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null_fk
      FROM child
    ),
    orph AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_rows,
        CAST(COUNT(DISTINCT fk) AS BIGINT) AS n_orphan_keys
      FROM child WHERE fk IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = child.fk)
    )
    SELECT t.n_child_rows, t.n_null_fk, o.n_orphan_rows, o.n_orphan_keys,
      CAST(ROUND(CASE WHEN t.n_child_rows - t.n_null_fk > 0
        THEN CAST(o.n_orphan_rows AS DOUBLE)
             / CAST(t.n_child_rows - t.n_null_fk AS DOUBLE) END, 6)
        AS DOUBLE) AS orphan_frac
    FROM tot t CROSS JOIN orph o
    """,
)
def q190_ref_integrity(spark, sf_dir):
    """operators/quality.ref_integrity — lineitem part keys + three
    injected orphan rows and one NULL FK against the part table."""
    from ..operators.quality import ref_integrity

    spark_child = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("fk"))
        .unionByName(
            spark.createDataFrame([(-1,), (-1,), (-2,), (None,)], "fk long")
        )
    )
    return ref_integrity(
        spark_child, T(spark, sf_dir, "part"), "fk", "p_partkey"
    )


# ---------------------------------------------------------------------------
# q194 — top session entry paths: gaps-and-islands sessionization +
# first-3-states path strings, counted. One window pass computes the
# break flag AND the running session id; per-session lists are
# session-length-bounded.
# ---------------------------------------------------------------------------
@query(
    "q194_session_entry_paths",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM t
    ),
    heads AS (
      SELECT user_id, sid,
        list(event_type ORDER BY ts, event_id)[1:3] AS h
      FROM s GROUP BY user_id, sid
    )
    SELECT array_to_string(h, '>') AS path,
      CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM heads
    GROUP BY 1
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
)
def q194_session_entry_paths(spark, sf_dir):
    """operators/sequences.session_paths — 30-minute sessions, first
    three event types, top-20 paths."""
    from ..operators.sequences import session_paths

    return (
        session_paths(
            T(spark, sf_dir, "events"), ["user_id"], "ts", ["event_id"],
            "event_type", gap_minutes=30, max_steps=3,
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q195 — growth accounting: every period's actives decomposed into
# new / retained / resurrected, plus the previous period's churn-out
# (wau = new + retained + resurrected is the audit identity). Grid
# collapses to distinct (user, week) first; churn maps through a
# SHIFTED-period join, not a lag, so empty periods can't misalign it.
# ---------------------------------------------------------------------------
@query(
    "q195_growth_accounting",
    oracle="""
    WITH grid AS (
      SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS p
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    lab AS (
      SELECT p,
        CASE WHEN MIN(p) OVER (PARTITION BY u ORDER BY p
               ROWS UNBOUNDED PRECEDING) = p THEN 'new'
             WHEN LAG(p) OVER (PARTITION BY u ORDER BY p)
               = p - INTERVAL 7 DAY THEN 'retained'
             ELSE 'resurrected' END AS kind,
        (LEAD(p) OVER (PARTITION BY u ORDER BY p) IS NULL
         OR LEAD(p) OVER (PARTITION BY u ORDER BY p)
            <> p + INTERVAL 7 DAY) AS churns_after
      FROM grid
    ),
    per AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS wau,
        CAST(SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_new,
        CAST(SUM(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_retained,
        CAST(SUM(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_resurrected,
        CAST(SUM(CASE WHEN churns_after THEN 1 ELSE 0 END) AS BIGINT)
          AS co
      FROM lab GROUP BY p
    )
    SELECT CAST(per.p AS DATE) AS period_start, per.wau, per.n_new,
      per.n_retained, per.n_resurrected,
      CAST(COALESCE(sh.co, 0) AS BIGINT) AS n_churned_prev
    FROM per LEFT JOIN (
      SELECT p + INTERVAL 7 DAY AS p, co FROM per
    ) sh ON sh.p = per.p
    ORDER BY period_start ASC
    """,
)
def q195_growth_accounting(spark, sf_dir):
    """operators/cohorts.growth_accounting — weekly new/retained/
    resurrected/churned decomposition of the events user base."""
    from ..operators.cohorts import growth_accounting

    out = growth_accounting(
        T(spark, sf_dir, "events"), "user_id", "ts", period="week"
    )
    return out.select(
        F.to_date("period_start").alias("period_start"),
        "wau",
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_churned_prev",
    ).orderBy("period_start")


# ---------------------------------------------------------------------------
# q196 — the TPC-H Q22 shape (wealthy inactive customers): balance
# above the positive-balance average (broadcast scalar subquery) AND
# no URGENT orders (left-anti on the FILTERED fact — every customer
# in this corpus has some order, so the urgent-only anti-join keeps
# the detector's positive path live), grouped by the name's last
# digit.
# ---------------------------------------------------------------------------
@query(
    "q196_wealthy_inactive",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,6))
        AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT right(c.c_name, 1) AS code,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_bal
    FROM customer c CROSS JOIN avg_bal
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    ORDER BY code ASC
    """,
)
def q196_wealthy_inactive(spark, sf_dir):
    """TPC-H Q22 analog: above-average-balance customers with no
    urgent orders. The positive-balance average is an exact-decimal
    1-row aggregate broadcast into the filter; inactivity is a
    left-anti join on the filtered order keys (column-pruned)."""
    from ._helpers import dec, dround

    c = T(spark, sf_dir, "customer")
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg(dec("c_acctbal")).cast("decimal(18,6)").alias("_ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(dec("c_acctbal") > F.col("_ab"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.expr("right(c_name, 1)").alias("code"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dround(F.sum(dec("c_acctbal"))).alias("total_bal"),
        )
        .orderBy("code")
    )


# ---------------------------------------------------------------------------
# q197 — trailing 7-day rolling MEDIAN of daily revenue (robust
# smoother). Frame values collect into a window-bounded array; the
# median is positional (floor division spelled explicitly — Spark's
# int cast truncates where DuckDB's rounds).
# ---------------------------------------------------------------------------
@query(
    "q197_rolling_median",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS rev
      FROM orders GROUP BY 1, 2
    ),
    r AS (
      SELECT priority, d, rev,
        list_sort(list(rev) OVER (PARTITION BY priority ORDER BY d ASC
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
      FROM s
    )
    SELECT priority, d, rev,
      CAST(len(arr) AS BIGINT) AS n_window,
      CAST(ROUND(CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
        ELSE (arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1]) / 2.0 END,
        6) AS DOUBLE) AS roll_median
    FROM r
    ORDER BY priority ASC, d ASC
    """,
)
def q197_rolling_median(spark, sf_dir):
    """operators/timeseries.rolling_median — window 7 over the daily
    revenue series."""
    from ..operators.timeseries import rolling_median
    from .analytics2 import _daily_rev

    return rolling_median(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev", window=7
    ).orderBy("priority", "d")


# ---------------------------------------------------------------------------
# q198 — conversion rates with Wilson 95% intervals: purchase rate
# among viewers per customer nation. Exact integer numerators/
# denominators from two conditional distinct counts; the interval is
# one fixed IEEE expression (z constant), so even the CI bounds
# hash-match.
# ---------------------------------------------------------------------------
@query(
    "q198_conversion_wilson_ci",
    oracle="""
    WITH peruser AS (
      SELECT e.user_id, c.c_nationkey AS nation,
        MAX(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
        MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
          AS purchased
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT nation,
        CAST(SUM(viewed) AS BIGINT) AS n_viewers,
        CAST(SUM(CASE WHEN viewed = 1 AND purchased = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_converted
      FROM peruser GROUP BY nation
    ),
    w AS (
      SELECT nation, n_viewers, n_converted,
        CAST(n_converted AS DOUBLE) / CAST(n_viewers AS DOUBLE) AS p,
        CAST(n_viewers AS DOUBLE) AS n
      FROM agg WHERE n_viewers > 0
    )
    SELECT nation, n_viewers, n_converted,
      CAST(ROUND(p, 6) AS DOUBLE) AS rate,
      CAST(ROUND((p + 1.96 * 1.96 / (2 * n)
        - 1.96 * sqrt(p * (1 - p) / n + 1.96 * 1.96 / (4 * n * n)))
        / (1 + 1.96 * 1.96 / n), 6) AS DOUBLE) AS wilson_lo,
      CAST(ROUND((p + 1.96 * 1.96 / (2 * n)
        + 1.96 * sqrt(p * (1 - p) / n + 1.96 * 1.96 / (4 * n * n)))
        / (1 + 1.96 * 1.96 / n), 6) AS DOUBLE) AS wilson_hi
    FROM w
    ORDER BY nation ASC
    """,
)
def q198_conversion_wilson_ci(spark, sf_dir):
    """View→purchase conversion per customer nation with Wilson 95%
    bounds — the A/B-readout companion to q171's t-test."""
    e = T(spark, sf_dir, "events")
    c = T(spark, sf_dir, "customer")
    peruser = (
        e.join(F.broadcast(c), c["c_custkey"] == e["user_id"])
        .groupBy(e["user_id"], F.col("c_nationkey").alias("nation"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("viewed"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchased"),
        )
    )
    agg = peruser.groupBy("nation").agg(
        F.sum("viewed").cast("bigint").alias("n_viewers"),
        F.sum(
            F.when((F.col("viewed") == 1) & (F.col("purchased") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_converted"),
    ).filter(F.col("n_viewers") > 0)
    p = F.col("n_converted").cast("double") / F.col("n_viewers").cast("double")
    n = F.col("n_viewers").cast("double")
    z = F.lit(1.96)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    return agg.select(
        "nation",
        "n_viewers",
        "n_converted",
        F.round(p, 6).cast("double").alias("rate"),
        F.round((center - half) / denom, 6).cast("double").alias("wilson_lo"),
        F.round((center + half) / denom, 6).cast("double").alias("wilson_hi"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# q221 — Mann-Kendall trend + Theil-Sen slope on monthly revenue per
# priority (operators/stats.mann_kendall): the robust trend pair to
# q145's least-squares fit, oracle-replayed pair-for-pair.
# ---------------------------------------------------------------------------
@query(
    "q221_mann_kendall_trend",
    oracle="""
    WITH series AS (
      SELECT o_orderpriority AS pri,
        CAST(EXTRACT(YEAR FROM o_orderdate) * 12
             + EXTRACT(MONTH FROM o_orderdate) AS INT) AS t,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS y
      FROM orders GROUP BY 1, 2
    ), pairs AS (
      SELECT a.pri,
        CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn,
        (b.y - a.y) / (CAST(b.t AS DOUBLE) - CAST(a.t AS DOUBLE)) AS slope
      FROM series a JOIN series b ON a.pri = b.pri AND a.t < b.t
    ), pa AS (
      SELECT pri, CAST(SUM(sgn) AS BIGINT) AS s_stat,
        quantile_cont(slope, 0.5) AS sen
      FROM pairs GROUP BY 1
    ), na AS (
      SELECT pri, CAST(COUNT(*) AS BIGINT) AS n FROM series GROUP BY 1
    ), ties AS (
      SELECT pri,
        CAST(SUM(t_ * (t_ - 1) * (2 * t_ + 5)) AS BIGINT) AS tie_sum
      FROM (SELECT pri, y, COUNT(*) AS t_ FROM series GROUP BY 1, 2)
      GROUP BY 1
    ), fin AS (
      SELECT na.pri, na.n, pa.s_stat, pa.sen,
        (CAST(na.n AS DOUBLE) * (CAST(na.n AS DOUBLE) - 1.0)
          * (2.0 * CAST(na.n AS DOUBLE) + 5.0)
         - CAST(ties.tie_sum AS DOUBLE)) / 18.0 AS var_s
      FROM na JOIN pa USING (pri) JOIN ties USING (pri)
    )
    SELECT pri AS o_orderpriority, n, s_stat,
      FLOOR(CASE WHEN var_s > 0 THEN
          CASE WHEN CAST(s_stat AS DOUBLE) > 0
               THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
               WHEN CAST(s_stat AS DOUBLE) < 0
               THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
               ELSE 0.0 END
        END * 1000000.0) / 1000000.0 AS z,
      FLOOR(sen * 1000000.0) / 1000000.0 AS sen_slope
    FROM fin
    ORDER BY o_orderpriority ASC
    """,
)
def q221_mann_kendall_trend(spark, sf_dir):
    """Is monthly revenue trending, per priority? Nonparametric MK
    S/z plus the Theil-Sen slope — all from ONE within-group pair
    self-join over the ~80-point monthly series (series length is
    bounded by the calendar, not the corpus: the fact table reduces
    to the series first)."""
    from ..operators.stats import mann_kendall
    from ._helpers import dec, dround

    o = T(spark, sf_dir, "orders")
    series = (
        o.groupBy(
            F.col("o_orderpriority"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("int")
            .alias("t"),
        )
        .agg(dround(F.sum(dec("o_totalprice"))).alias("y"))
    )
    return mann_kendall(
        series, "t", "y", ["o_orderpriority"]
    ).orderBy(F.asc("o_orderpriority"))


# ---------------------------------------------------------------------------
# q225 — two-sample Kolmogorov-Smirnov (operators/stats.ks_test): did
# urgent orders' price DISTRIBUTION differ from low-priority ones,
# per order status? Exact integer CDFs on the distinct-value grid;
# p-value terms floor-quantized before the fixed-order sum (the
# transcendental discipline).
# ---------------------------------------------------------------------------
@query(
    "q225_ks_price_shift",
    oracle="""
    WITH base AS (
      SELECT o_orderstatus AS status,
             CAST(o_totalprice AS DOUBLE) AS v,
             o_orderpriority AS s
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        AND o_totalprice IS NOT NULL
    ), pv AS (
      SELECT status, v,
        CAST(SUM(CASE WHEN s = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
          AS ca,
        CAST(SUM(CASE WHEN s = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT)
          AS cb
      FROM base GROUP BY status, v
    ), cum AS (
      SELECT status,
        SUM(ca) OVER (PARTITION BY status ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum_a,
        SUM(cb) OVER (PARTITION BY status ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum_b,
        SUM(ca) OVER (PARTITION BY status) AS na,
        SUM(cb) OVER (PARTITION BY status) AS nb
      FROM pv
    ), d AS (
      SELECT status,
        CAST(MAX(na) AS BIGINT) AS n_a,
        CAST(MAX(nb) AS BIGINT) AS n_b,
        MAX(CASE WHEN na > 0 AND nb > 0 THEN
          ABS(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE)
            - CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE)) END) AS dd
      FROM cum GROUP BY status
    ), lamt AS (
      SELECT status, n_a, n_b, dd,
        (SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
              / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) + 0.12
         + 0.11 / SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
              / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))) * dd
          AS lam
      FROM d
    ), praw AS (
      SELECT status, n_a, n_b, dd,
          2.0 * (FLOOR(EXP(-2.0 * lam * lam) * 1e6) / 1e6)
        - 2.0 * (FLOOR(EXP(-8.0 * lam * lam) * 1e6) / 1e6)
        + 2.0 * (FLOOR(EXP(-18.0 * lam * lam) * 1e6) / 1e6)
        - 2.0 * (FLOOR(EXP(-32.0 * lam * lam) * 1e6) / 1e6)
        + 2.0 * (FLOOR(EXP(-50.0 * lam * lam) * 1e6) / 1e6) AS p_raw
      FROM lamt
    )
    SELECT status, n_a, n_b,
      FLOOR(dd * 1e6) / 1e6 AS d_stat,
      FLOOR(LEAST(1.0, GREATEST(0.0, p_raw)) * 1e6) / 1e6 AS p_value
    FROM praw
    ORDER BY status ASC
    """,
)
def q225_ks_price_shift(spark, sf_dir):
    """KS distribution-shift test of o_totalprice between urgent and
    low-priority orders within each order status. One per-value
    aggregate + one cumulative window over the DISTINCT value grid —
    raw rows collapse before the ordered pass."""
    from ..operators.stats import ks_test

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        "o_totalprice",
        "o_orderpriority",
    )
    return ks_test(
        o, "o_totalprice", "o_orderpriority", "1-URGENT", "5-LOW",
        ["status"],
    ).orderBy(F.asc("status"))


# ---------------------------------------------------------------------------
# q241 — Poisson-bootstrap CI for the per-priority mean order value:
# the streaming-scale bootstrap (Poisson(1) multiplicities per
# (row, replicate), md5-deterministic), B=201 so the 2.5/97.5
# percentiles are exact order statistics. Map-side amplification +
# partial agg: the only Exchange carries ≤ groups×B rows per
# partition. See operators/bootstrap.py for the published basis.
# ---------------------------------------------------------------------------
def _q241_oracle():
    from ..operators.bootstrap import poisson_bootstrap_oracle

    return (
        poisson_bootstrap_oracle(
            "orders",
            "o_orderkey",
            "o_totalprice",
            ["o_orderpriority"],
            replicates=201,
            salt="boot241",
        )
        + " ORDER BY o_orderpriority ASC"
    )


@query("q241_bootstrap_mean_ci", oracle=_q241_oracle())
def q241_bootstrap_mean_ci(spark, sf_dir):
    """operators/bootstrap.poisson_bootstrap_mean_ci over orders:
    95% CI on mean(o_totalprice) per order priority."""
    from ..operators.bootstrap import poisson_bootstrap_mean_ci

    o = T(spark, sf_dir, "orders")
    return poisson_bootstrap_mean_ci(
        o,
        "o_orderkey",
        "o_totalprice",
        ["o_orderpriority"],
        replicates=201,
        salt="boot241",
    ).orderBy(F.asc("o_orderpriority"))


# ---------------------------------------------------------------------------
# q242 — Markov stationary distribution of the event-type chain:
# q174's transition matrix taken to its equilibrium. One corpus pass
# (lead window + count agg) → states² bounded matrix → 15 power
# iterations over driver-bounded state (kmeans/pca precedent), every
# arithmetic step engine-replayable (see operators/markov.py).
# ---------------------------------------------------------------------------
_MARKOV_ITER = 15


def _q242_oracle() -> str:
    sql = """
    WITH seq AS MATERIALIZED (
      SELECT event_type AS src,
        LEAD(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS dst
      FROM events
    ),
    cnt AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    states AS MATERIALIZED (SELECT DISTINCT src AS state FROM cnt),
    trans AS MATERIALIZED (
      SELECT c.src, c.dst, c.n,
        CAST(c.n AS DOUBLE)
          / CAST(SUM(c.n) OVER (PARTITION BY c.src) AS DOUBLE) AS p
      FROM cnt c JOIN states s ON c.dst = s.state
    ),
    p0 AS MATERIALIZED (
      SELECT state,
        1.0 / CAST((SELECT COUNT(*) FROM states) AS DOUBLE) AS pi
      FROM states
    )"""
    for i in range(1, _MARKOV_ITER + 1):
        sql += f""",
    p{i} AS MATERIALIZED (
      SELECT s.state, COALESCE(c.pi, 0.0) AS pi
      FROM states s LEFT JOIN (
        SELECT t.dst AS state,
          CAST(ROUND(list_sum(list_sort(list(pp.pi * t.p))), 9) AS DOUBLE)
            AS pi
        FROM p{i - 1} pp JOIN trans t ON t.src = pp.state
        GROUP BY t.dst
      ) c ON c.state = s.state
    )"""
    sql += f"""
    SELECT s.state, o.n_out, CAST(ROUND(p.pi, 6) AS DOUBLE) AS pi
    FROM states s
    JOIN p{_MARKOV_ITER} p ON p.state = s.state
    JOIN (SELECT src AS o_state, CAST(SUM(n) AS BIGINT) AS n_out
          FROM trans GROUP BY src) o ON o.o_state = s.state
    ORDER BY s.state ASC
    """
    return sql


@query("q242_markov_stationary", oracle=_q242_oracle())
def q242_markov_stationary(spark, sf_dir):
    """operators/markov: event-type transition matrix + stationary
    distribution (15 power iterations, det-sum discipline)."""
    from ..operators.markov import event_transitions, stationary_distribution

    e = T(spark, sf_dir, "events")
    # eager localCheckpoint, not persist (r13 hygiene sweep): the
    # matrix feeds the stationary collect AND the n_out aggregate;
    # checkpointed blocks are invocation-scoped (freed on GC), where
    # the old never-unpersisted persist leaked a CacheManager entry
    # that would plan-match across repeated invocations
    trans = event_transitions(
        e, "user_id", "ts", "event_type", "event_id"
    ).localCheckpoint(eager=True)
    pi = stationary_distribution(trans, n_iter=_MARKOV_ITER, ndigits=9)
    n_out = trans.groupBy(F.col("src").alias("state")).agg(
        F.sum("n").cast("bigint").alias("n_out")
    )
    return (
        n_out.join(pi, "state")
        .select(
            "state",
            "n_out",
            F.round("pi", 6).cast("double").alias("pi"),
        )
        .orderBy(F.asc("state"))
    )


# ---------------------------------------------------------------------------
# q243 — one-way ANOVA: does mean order value differ across the five
# order priorities, within each order status? ONE corpus aggregate of
# exact decimal sufficient statistics; the only float reduction (the
# bounded per-level Σ s²/n) goes through the det_sum sorted fold.
# ---------------------------------------------------------------------------
@query(
    "q243_anova_priority",
    oracle="""
    WITH lvl AS (
      SELECT o_orderstatus AS status, o_orderpriority,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS s,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))
                      AS DECIMAL(38,4))) AS DECIMAL(38,6)) AS ss
      FROM orders
      WHERE o_totalprice IS NOT NULL
      GROUP BY o_orderstatus, o_orderpriority
    ),
    top AS (
      SELECT status,
        CAST(COUNT(*) AS BIGINT) AS k_groups,
        CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(SUM(s) AS DECIMAL(38,6)) AS sg,
        CAST(SUM(ss) AS DECIMAL(38,6)) AS ssg,
        CAST(list_sum(list_sort(list(
          CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        ))) AS DOUBLE) AS t1
      FROM lvl GROUP BY status
    ),
    d AS (
      SELECT status, k_groups, n_rows, t1,
        CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
          / CAST(n_rows AS DOUBLE) AS cf,
        CAST(ssg AS DOUBLE) AS ss_tot
      FROM top
    ),
    m AS (
      SELECT status, k_groups, n_rows,
        t1 - cf AS ssb, ss_tot - t1 AS ssw, ss_tot - cf AS sst,
        (k_groups >= 2 AND n_rows > k_groups AND ss_tot - t1 > 0) AS ok
      FROM d
    )
    SELECT status, k_groups, n_rows,
      CAST(ROUND(ssb / 1.0e9, 3) AS DOUBLE) AS ss_between_bn,
      CAST(ROUND(ssw / 1.0e9, 3) AS DOUBLE) AS ss_within_bn,
      CAST(ROUND(CASE WHEN ok THEN
        (ssb / (CAST(k_groups AS DOUBLE) - 1.0))
        / (ssw / (CAST(n_rows AS DOUBLE) - CAST(k_groups AS DOUBLE)))
      END, 6) AS DOUBLE) AS f_stat,
      CAST(ROUND(CASE WHEN ok AND sst > 0 THEN ssb / sst END, 6)
        AS DOUBLE) AS eta_sq
    FROM m
    ORDER BY status ASC
    """,
)
def q243_anova_priority(spark, sf_dir):
    """operators/stats.anova_f: mean o_totalprice across the five
    priorities, tested within each order status."""
    from ..operators.stats import anova_f

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        "o_orderpriority",
        "o_totalprice",
    )
    return anova_f(
        o, "o_totalprice", "o_orderpriority", outer_cols=["status"]
    ).orderBy(F.asc("status"))


# ---------------------------------------------------------------------------
# q246 — leave-one-out smoothed target encoding of customer nation by
# order value: the GBDT-feature workhorse. Category table + global
# mean broadcast back onto facts — the corpus never shuffles for the
# encode; output is one audit month, totally ordered.
# ---------------------------------------------------------------------------
@query(
    "q246_target_encoding",
    oracle="""
    WITH base AS (
      SELECT o.o_orderkey, c.c_nationkey AS nat,
        CAST(o.o_totalprice AS DECIMAL(18,2)) AS x,
        CAST(o.o_orderdate AS DATE) AS od
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cat AS (
      SELECT nat, CAST(COUNT(*) AS BIGINT) AS n_cat,
        CAST(SUM(x) AS DECIMAL(38,6)) AS s_cat
      FROM base GROUP BY nat
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
        CAST(SUM(x) AS DECIMAL(38,6)) AS s_all
      FROM base
    )
    SELECT b.o_orderkey, CAST(b.nat AS INT) AS nation_key,
      CAST(ROUND(
        (CAST(s_cat AS DOUBLE) - CAST(b.x AS DOUBLE)
         + 10.0 * (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)))
        / (CAST(n_cat AS DOUBLE) - 1.0 + 10.0), 6) AS DOUBLE) AS te_loo
    FROM base b JOIN cat USING (nat) CROSS JOIN g
    WHERE b.od >= DATE '1995-03-01' AND b.od < DATE '1995-04-01'
    ORDER BY b.o_orderkey ASC
    """,
)
def q246_target_encoding(spark, sf_dir):
    """operators/encoding.target_encode_loo: nation-by-order-value
    encode, March 1995 audit slice."""
    from ..operators.encoding import target_encode_loo

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    base = o.join(
        c, o["o_custkey"] == c["c_custkey"]
    ).select(
        "o_orderkey",
        F.col("c_nationkey").alias("nation_key"),
        "o_totalprice",
        F.to_date("o_orderdate").alias("od"),
    )
    enc = target_encode_loo(
        base, "nation_key", "o_totalprice", smoothing=10.0
    )
    return (
        enc.filter(
            (F.col("od") >= F.lit("1995-03-01"))
            & (F.col("od") < F.lit("1995-04-01"))
        )
        .select(
            "o_orderkey",
            F.col("nation_key").cast("int").alias("nation_key"),
            "te_loo",
        )
        .orderBy(F.asc("o_orderkey"))
    )


# ---------------------------------------------------------------------------
# q248 — Spearman rank correlation of customer account balance vs
# total spend per market segment: doubled average ranks (integers —
# the standard tie treatment made exact), then the q144 exact-decimal
# Pearson machinery. No float before the final expression.
# ---------------------------------------------------------------------------
@query(
    "q248_spearman_corr",
    oracle="""
    WITH base AS (
      SELECT c.c_mktsegment AS segment, c.c_acctbal AS x,
        CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2)
          AS DOUBLE) AS y
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
    ),
    ranked AS (
      SELECT segment,
        2 * RANK() OVER (PARTITION BY segment ORDER BY x ASC)
          + COUNT(*) OVER (PARTITION BY segment, x) - 1 AS rx,
        2 * RANK() OVER (PARTITION BY segment ORDER BY y ASC)
          + COUNT(*) OVER (PARTITION BY segment, y) - 1 AS ry
      FROM base
    ),
    s AS (
      SELECT segment,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(rx AS DECIMAL(18,0))) AS DECIMAL(38,6)) AS sx,
        CAST(SUM(CAST(ry AS DECIMAL(18,0))) AS DECIMAL(38,6)) AS sy,
        CAST(SUM(CAST(rx AS DECIMAL(18,0)) * CAST(ry AS DECIMAL(18,0)))
          AS DECIMAL(38,6)) AS sxy,
        CAST(SUM(CAST(rx AS DECIMAL(18,0)) * CAST(rx AS DECIMAL(18,0)))
          AS DECIMAL(38,6)) AS sxx,
        CAST(SUM(CAST(ry AS DECIMAL(18,0)) * CAST(ry AS DECIMAL(18,0)))
          AS DECIMAL(38,6)) AS syy
      FROM ranked GROUP BY segment
    )
    SELECT segment, n,
      CAST(ROUND(
        CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
              AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
          THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        END, 6) AS DOUBLE) AS spearman_rho
    FROM s
    ORDER BY segment ASC
    """,
)
def q248_spearman_corr(spark, sf_dir):
    """operators/stats.spearman_corr: acctbal vs lifetime spend,
    ranked within market segment."""
    from ..operators.stats import spearman_corr
    from ._helpers import dec, dround

    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    base = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(dround(F.sum(dec("o_totalprice"))).alias("y"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("x"),
            "y",
        )
    )
    return spearman_corr(base, "x", "y", ["segment"]).orderBy(
        F.asc("segment")
    )


# ---------------------------------------------------------------------------
# q249 — CUPED variance-reduced experiment readout: arms assigned by
# md5 of the customer key, metric = 1995+ spend, covariate =
# pre-1995 spend. θ and x̄ from pooled exact suffstats; per-arm
# adjusted means via aggregate identities — no per-row adjusted
# column ever materializes.
# ---------------------------------------------------------------------------
@query(
    "q249_cuped_experiment",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
        COALESCE(ROUND(SUM(CASE WHEN CAST(o_orderdate AS DATE)
            < DATE '1998-01-01'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 2), 0.0) AS x,
        COALESCE(ROUND(SUM(CASE WHEN CAST(o_orderdate AS DATE)
            >= DATE '1998-01-01'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 2), 0.0) AS y
      FROM orders GROUP BY o_custkey
    ),
    u AS (
      SELECT c.c_custkey,
        CASE WHEN CAST(('0x' || substr(md5('cuped'
            || CAST(c.c_custkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0
          THEN 'control' ELSE 'treatment' END AS arm,
        CAST(COALESCE(s.x, 0.0) AS DOUBLE) AS x,
        CAST(COALESCE(s.y, 0.0) AS DOUBLE) AS y
      FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS pn,
        CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS psx,
        CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS psy,
        CAST(SUM(CAST(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))
          AS DECIMAL(38,4))) AS DECIMAL(38,6)) AS psxy,
        CAST(SUM(CAST(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))
          AS DECIMAL(38,4))) AS DECIMAL(38,6)) AS psxx
      FROM u
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS asx,
        CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS asy
      FROM u GROUP BY arm
    ),
    d AS (
      SELECT arm, n,
        CAST(asx AS DOUBLE) AS asx, CAST(asy AS DOUBLE) AS asy,
        CAST(n AS DOUBLE) AS na,
        CAST(pn AS DOUBLE) AS nd,
        CAST(psx AS DOUBLE) AS sx, CAST(psy AS DOUBLE) AS sy,
        CAST(psxy AS DOUBLE) AS sxy, CAST(psxx AS DOUBLE) AS sxx
      FROM arms CROSS JOIN pooled
    ),
    t AS (
      SELECT arm, n, asx, asy, na,
        CASE WHEN nd * sxx - sx * sx > 0
          THEN (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
          ELSE 0.0 END AS theta,
        sx / nd AS xbar
      FROM d
    )
    SELECT arm, n,
      CAST(ROUND(asy / na, 4) AS DOUBLE) AS mean_y,
      CAST(ROUND((asy - theta * asx + theta * xbar * na) / na, 4)
        AS DOUBLE) AS mean_y_cuped
    FROM t
    ORDER BY arm ASC
    """,
)
def q249_cuped_experiment(spark, sf_dir):
    """operators/stats.cuped_adjust: md5-assigned arms, pre-period
    spend covariate."""
    from ..operators.sampling import hash_bucket
    from ..operators.stats import cuped_adjust
    from ._helpers import dec, dround

    o = T(spark, sf_dir, "orders").withColumn(
        "od", F.to_date("o_orderdate")
    )
    spend = o.groupBy("o_custkey").agg(
        F.coalesce(
            dround(
                F.sum(
                    F.when(F.col("od") < F.lit("1998-01-01"),
                           dec("o_totalprice"))
                )
            ),
            F.lit(0.0),
        ).alias("x"),
        F.coalesce(
            dround(
                F.sum(
                    F.when(F.col("od") >= F.lit("1998-01-01"),
                           dec("o_totalprice"))
                )
            ),
            F.lit(0.0),
        ).alias("y"),
    )
    c = T(spark, sf_dir, "customer").select("c_custkey")
    units = (
        c.join(spend, spend["o_custkey"] == c["c_custkey"], "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("x"), F.lit(0.0)).cast("double").alias("x"),
            F.coalesce(F.col("y"), F.lit(0.0)).cast("double").alias("y"),
        )
        .withColumn(
            "arm",
            F.when(
                hash_bucket("c_custkey", 2, salt="cuped") == 0, "control"
            ).otherwise("treatment"),
        )
    )
    return cuped_adjust(units, "x", "y", "arm").orderBy(F.asc("arm"))


# ---------------------------------------------------------------------------
# q251 — bootstrap uplift interval: percentile CI on the difference
# of arm means (md5-assigned arms), from the same map-side Poisson
# replicate machinery as q241. The diff distribution is B-bounded;
# exact order statistics, no interpolation arithmetic.
# ---------------------------------------------------------------------------
def _q251_oracle():
    from ..operators.bootstrap import poisson_bootstrap_diff_oracle

    arm = (
        "CASE WHEN CAST(('0x' || substr(md5('ab251' "
        "|| CAST(o_custkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0 "
        "THEN 'control' ELSE 'treatment' END"
    )
    return poisson_bootstrap_diff_oracle(
        "orders",
        "o_orderkey",
        "o_totalprice",
        arm,
        "treatment",
        "control",
        replicates=201,
        salt="boot251",
    )


@query("q251_bootstrap_uplift_ci", oracle=_q251_oracle())
def q251_bootstrap_uplift_ci(spark, sf_dir):
    """operators/bootstrap.poisson_bootstrap_diff_ci: uplift CI on
    mean order value between md5-assigned arms."""
    from ..operators.bootstrap import poisson_bootstrap_diff_ci
    from ..operators.sampling import hash_bucket

    o = T(spark, sf_dir, "orders").withColumn(
        "arm",
        F.when(
            hash_bucket("o_custkey", 2, salt="ab251") == 0, "control"
        ).otherwise("treatment"),
    )
    return poisson_bootstrap_diff_ci(
        o,
        "o_orderkey",
        "o_totalprice",
        "arm",
        "treatment",
        "control",
        replicates=201,
        salt="boot251",
    )


# ---------------------------------------------------------------------------
# q258 — approximate randomization test (Fisher-style) for the arm
# mean difference: md5 fair-coin relabels per (row, replicate) — a
# pure per-row hash, no permutation shuffle — with the Phipson-Smyth
# add-one p-value. Same map-side ×B plan as the bootstrap tier.
# ---------------------------------------------------------------------------
_Q258_B = 200


def _q258_oracle() -> str:
    arm = (
        "CASE WHEN CAST(('0x' || substr(md5('ab251' "
        "|| CAST(o_custkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0 "
        "THEN 'control' ELSE 'treatment' END"
    )
    return f"""
    WITH reps AS (SELECT unnest(range(0, {_Q258_B})) AS b),
    base AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(28,2)) AS x,
        {arm} AS arm
      FROM orders
    ),
    exact AS (
      SELECT
        CAST(COUNT(CASE WHEN arm = 'treatment' THEN 1 END) AS BIGINT)
          AS n_a,
        CAST(COUNT(CASE WHEN arm = 'control' THEN 1 END) AS BIGINT)
          AS n_b,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN x END) AS DOUBLE)
          / COUNT(CASE WHEN arm = 'treatment' THEN 1 END)
        - CAST(SUM(CASE WHEN arm = 'control' THEN x END) AS DOUBLE)
          / COUNT(CASE WHEN arm = 'control' THEN 1 END) AS d_obs
      FROM base
    ),
    d AS (
      SELECT b, x,
        (CAST(('0x' || substr(md5('perm258' || CAST(b AS VARCHAR) || '|'
          || CAST(k AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0)
          / 4294967297.0 < 0.5 AS heads
      FROM base CROSS JOIN reps
    ),
    rep AS (
      SELECT b,
        CAST(SUM(CASE WHEN heads THEN x END) AS DOUBLE)
          / COUNT(CASE WHEN heads THEN 1 END)
        - CAST(SUM(CASE WHEN NOT heads THEN x END) AS DOUBLE)
          / COUNT(CASE WHEN NOT heads THEN 1 END) AS dd
      FROM d GROUP BY b
      HAVING COUNT(CASE WHEN heads THEN 1 END) > 0
         AND COUNT(CASE WHEN NOT heads THEN 1 END) > 0
    ),
    counted AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
        CAST(SUM(CASE WHEN ABS(rep.dd) >= ABS(exact.d_obs)
                 THEN 1 ELSE 0 END) AS BIGINT) AS ge
      FROM rep CROSS JOIN exact
    )
    SELECT exact.n_a, exact.n_b,
      CAST(ROUND(exact.d_obs, 6) AS DOUBLE) AS diff_obs,
      counted.n_replicates,
      CAST(ROUND((CAST(counted.ge AS DOUBLE) + 1.0)
        / (CAST(counted.n_replicates AS DOUBLE) + 1.0), 6) AS DOUBLE)
        AS p_value
    FROM exact CROSS JOIN counted
    """


@query("q258_randomization_test", oracle=_q258_oracle())
def q258_randomization_test(spark, sf_dir):
    """operators/bootstrap.randomization_test_diff over the
    md5-assigned order arms."""
    from ..operators.bootstrap import randomization_test_diff
    from ..operators.sampling import hash_bucket

    o = T(spark, sf_dir, "orders").withColumn(
        "arm",
        F.when(
            hash_bucket("o_custkey", 2, salt="ab251") == 0, "control"
        ).otherwise("treatment"),
    )
    return randomization_test_diff(
        o,
        "o_orderkey",
        "o_totalprice",
        "arm",
        "treatment",
        "control",
        replicates=_Q258_B,
        salt="perm258",
    )


# ---------------------------------------------------------------------------
# q261 — log-rank (Mantel-Cox) survival comparison between md5 arms
# over the q177 customer-lifetime cohort: integer event/at-risk grid
# (reverse-cumulative window), O−E and hypergeometric variance summed
# with the sorted fold over the bounded time grid.
# ---------------------------------------------------------------------------
@query(
    "q261_log_rank_test",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
        MIN(CAST(o_orderdate AS DATE)) AS f,
        MAX(CAST(o_orderdate AS DATE)) AS l
      FROM orders GROUP BY o_custkey
    ),
    anchor AS (
      SELECT MAX(l) AS mx FROM cust
    ),
    coh AS (
      SELECT CAST(FLOOR(date_diff('day', f, l) / 30) AS BIGINT) AS t,
        CASE WHEN date_diff('day', l, (SELECT mx FROM anchor)) > 365
          THEN 1 ELSE 0 END AS ev,
        CASE WHEN CAST(('0x' || substr(md5('lr261'
            || CAST(o_custkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0
          THEN 'control' ELSE 'treatment' END AS arm
      FROM cust
    ),
    per AS (
      SELECT t,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN ev ELSE 0 END)
          AS BIGINT) AS d_a,
        CAST(SUM(CASE WHEN arm = 'control' THEN ev ELSE 0 END)
          AS BIGINT) AS d_b,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
          AS BIGINT) AS m_a,
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
          AS BIGINT) AS m_b
      FROM coh GROUP BY t
    ),
    r AS (
      SELECT t, d_a, d_b,
        CAST(SUM(m_a) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) AS n_a_t,
        CAST(SUM(m_b) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) AS n_b_t
      FROM per
    ),
    terms AS (
      SELECT
        CAST(d_a AS DOUBLE)
          - CAST(d_a + d_b AS DOUBLE) * CAST(n_a_t AS DOUBLE)
            / CAST(n_a_t + n_b_t AS DOUBLE) AS oe,
        CASE WHEN CAST(n_a_t + n_b_t AS DOUBLE) > 1.0 THEN
          CAST(d_a + d_b AS DOUBLE)
          * (CAST(n_a_t AS DOUBLE) / CAST(n_a_t + n_b_t AS DOUBLE))
          * (1.0 - CAST(n_a_t AS DOUBLE) / CAST(n_a_t + n_b_t AS DOUBLE))
          * (CAST(n_a_t + n_b_t AS DOUBLE) - CAST(d_a + d_b AS DOUBLE))
          / (CAST(n_a_t + n_b_t AS DOUBLE) - 1.0)
        ELSE 0.0 END AS v
      FROM r WHERE d_a + d_b > 0
    ),
    sums AS (
      SELECT COALESCE(CAST(list_sum(list_sort(list(oe))) AS DOUBLE),
          0.0) AS soe,
        COALESCE(CAST(list_sum(list_sort(list(v))) AS DOUBLE), 0.0) AS sv
      FROM terms
    ),
    counts AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_b,
        CAST(SUM(ev) AS BIGINT) AS n_events
      FROM coh
    )
    SELECT n_a, n_b, n_events,
      CAST(ROUND(soe, 6) AS DOUBLE) AS o_minus_e,
      CAST(ROUND(sv, 6) AS DOUBLE) AS var_o,
      CAST(ROUND(CASE WHEN sv > 0 THEN soe / sqrt(sv) END, 6)
        AS DOUBLE) AS z
    FROM counts CROSS JOIN sums
    """,
)
def q261_log_rank_test(spark, sf_dir):
    """operators/survival.log_rank over the customer-lifetime cohort
    with md5-assigned arms; churn = last order >365 days before the corpus max date."""
    from ..operators.sampling import hash_bucket
    from ..operators.survival import log_rank

    cust = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(F.to_date("o_orderdate")).alias("f"),
            F.max(F.to_date("o_orderdate")).alias("l"),
        )
    )
    anchor = cust.agg(F.max("l").alias("mx"))
    coh = cust.crossJoin(F.broadcast(anchor)).select(
        F.floor(F.datediff("l", "f") / 30).cast("bigint").alias("t"),
        F.when(F.datediff(F.col("mx"), F.col("l")) > 365, 1)
        .otherwise(0)
        .alias("ev"),
        F.when(
            hash_bucket("o_custkey", 2, salt="lr261") == 0, "control"
        )
        .otherwise("treatment")
        .alias("arm"),
    )
    return log_rank(coh, "t", "ev", "arm", "treatment", "control")


# ---------------------------------------------------------------------------
# q266 — rank-1 ALS factorization of the customer×part quantity
# matrix (operators/baskets.als_rank1): alternating closed-form
# least-squares rounds with the quantize-then-decimal-sum reduction
# (degree-safe), fixed init, unrolled-CTE oracle. Top-15 each side.
# ---------------------------------------------------------------------------
_ALS_ITER = 4


def _q266_oracle() -> str:
    sql = """
    WITH x AS MATERIALIZED (
      SELECT o.o_custkey AS u, l.l_partkey AS i,
        CAST(SUM(l.l_quantity) AS DOUBLE) AS x
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    v0 AS MATERIALIZED (
      SELECT DISTINCT i AS id, CAST(1.0 AS DOUBLE) AS v FROM x
    )"""
    for t in range(1, _ALS_ITER + 1):
        sql += f""",
    u{t} AS MATERIALIZED (
      SELECT x.u AS id,
        FLOOR(
          CAST(SUM(CAST(FLOOR(x.x * v.v * 1e9) / 1e9
            AS DECIMAL(28,9))) AS DOUBLE)
          / CAST(SUM(CAST(FLOOR(v.v * v.v * 1e9) / 1e9
            AS DECIMAL(28,9))) AS DOUBLE) * 1e9) / 1e9 AS u
      FROM x JOIN v{t - 1} v ON v.id = x.i GROUP BY x.u
    ),
    v{t} AS MATERIALIZED (
      SELECT x.i AS id,
        FLOOR(
          CAST(SUM(CAST(FLOOR(x.x * u.u * 1e9) / 1e9
            AS DECIMAL(28,9))) AS DOUBLE)
          / CAST(SUM(CAST(FLOOR(u.u * u.u * 1e9) / 1e9
            AS DECIMAL(28,9))) AS DOUBLE) * 1e9) / 1e9 AS v
      FROM x JOIN u{t} u ON u.id = x.u GROUP BY x.i
    )"""
    sql += f"""
    SELECT role, CAST(id AS BIGINT) AS id, CAST(score AS DOUBLE) AS score
    FROM (
      (SELECT 'item' AS role, id, v AS score FROM v{_ALS_ITER}
       ORDER BY v DESC, id ASC LIMIT 15)
      UNION ALL
      (SELECT 'user' AS role, id, u AS score FROM u{_ALS_ITER}
       ORDER BY u DESC, id ASC LIMIT 15)
    )
    ORDER BY role ASC, score DESC, id ASC
    """
    return sql


@query("q266_als_rank1", oracle=_q266_oracle())
def q266_als_rank1(spark, sf_dir):
    """operators/baskets.als_rank1 over the customer×part quantity
    matrix: top-15 factor scores per side after 4 rounds."""
    from ..operators.baskets import als_rank1

    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    x = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.sum("l_quantity").cast("double").alias("x"))
    )
    users, items = als_rank1(x, "u", "i", "x", iters=_ALS_ITER)
    top_i = (
        items.select(
            F.lit("item").alias("role"),
            F.col("id").cast("bigint").alias("id"),
            F.col("score").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(15)
    )
    top_u = (
        users.select(
            F.lit("user").alias("role"),
            F.col("id").cast("bigint").alias("id"),
            F.col("score").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(15)
    )
    return top_i.unionByName(top_u).orderBy(
        F.asc("role"), F.desc("score"), F.asc("id")
    )


# ---------------------------------------------------------------------------
# q272 — revenue-concentration (Lorenz) deciles: customers ranked by
# lifetime revenue, bucketed with integer arithmetic (ceil(rn·10/n) —
# no NTILE: the explicit form is engine-exact and documents the
# global-sort cost), exact-decimal bucket revenue, cumulative share
# over the 10-row result. The table behind "the top decile drives
# X% of revenue" (the Lorenz companion to q176's Gini scalar).
# ---------------------------------------------------------------------------
@query(
    "q272_revenue_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
          AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT r,
        ROW_NUMBER() OVER (ORDER BY r DESC, o_custkey ASC) AS rn,
        COUNT(*) OVER () AS n
      FROM rev
    ),
    b AS (
      SELECT CAST(CEIL(CAST(rn AS DOUBLE) * 10.0 / CAST(n AS DOUBLE))
        AS INT) AS decile, r
      FROM ranked
    ),
    agg AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
        CAST(SUM(r) AS DECIMAL(38,2)) AS revenue
      FROM b GROUP BY decile
    ),
    tot AS (SELECT CAST(SUM(revenue) AS DECIMAL(38,2)) AS t FROM agg)
    SELECT decile, n_customers,
      CAST(revenue AS DOUBLE) AS revenue,
      CAST(ROUND(CAST(revenue AS DOUBLE) / CAST(t AS DOUBLE), 6)
        AS DOUBLE) AS share,
      CAST(ROUND(
        CAST(SUM(revenue) OVER (ORDER BY decile ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        / CAST(t AS DOUBLE), 6) AS DOUBLE) AS cum_share
    FROM agg CROSS JOIN tot
    ORDER BY decile ASC
    """,
)
def q272_revenue_concentration(spark, sf_dir):
    """Lorenz decile table of customer lifetime revenue.

    Scale shape (r6 VERDICT fix): the old form ranked ALL customers
    through one un-partitioned ``row_number`` window plus a
    ``COUNT(*) OVER ()`` — two SinglePartition funnels of the full
    customer dimension. Now the global rank comes from the
    range-partitioned two-pass numbering (``operators.ids.dense_ids``
    on (−r, custkey) — decimal negation is exact, so DESC order is
    an ASC sort), the total is a 1-row broadcast aggregate, and the
    10-row decile cumulative is a broadcast triangular self-join —
    zero Window operators anywhere in the plan.
    """
    from ._helpers import dec

    rev = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("r"))
    )
    ranked = dense_ids(
        rev.withColumn("_nr", (-F.col("r")).cast("decimal(19,2)")),
        ["_nr", "o_custkey"],
        id_col="rn",
    )
    cnt = rev.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    b = ranked.crossJoin(F.broadcast(cnt)).select(
        F.ceil(
            F.col("rn").cast("double") * 10.0 / F.col("n").cast("double")
        )
        .cast("int")
        .alias("decile"),
        "r",
    )
    agg = b.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("r").cast("decimal(38,2)").alias("revenue"),
    )
    tot = agg.agg(F.sum("revenue").cast("decimal(38,2)").alias("t"))
    cum_dim = agg.select(
        F.col("decile").alias("_d2"), F.col("revenue").alias("_r2")
    )
    cum = (
        agg.join(F.broadcast(cum_dim), F.col("_d2") <= F.col("decile"))
        .groupBy("decile", "n_customers", "revenue")
        .agg(F.sum("_r2").cast("decimal(38,2)").alias("_cumrev"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.col("revenue").cast("double").alias("revenue"),
            F.round(
                F.col("revenue").cast("double") / F.col("t").cast("double"),
                6,
            )
            .cast("double")
            .alias("share"),
            F.round(
                F.col("_cumrev").cast("double") / F.col("t").cast("double"),
                6,
            )
            .cast("double")
            .alias("cum_share"),
        )
        .orderBy(F.asc("decile"))
    )


# ---------------------------------------------------------------------------
# q273 — geometric & harmonic means per priority: the corpus-scale
# transcendental aggregation pattern on a plain report — ln/reciprocal
# terms floor-quantize then sum as exact DECIMAL (associative at any
# group size), one exp/division at the end.
# ---------------------------------------------------------------------------
@query(
    "q273_pythagorean_means",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority AS priority,
        FLOOR(ln(CAST(o_totalprice AS DOUBLE)) * 1e9) / 1e9 AS lx,
        FLOOR(1.0 / CAST(o_totalprice AS DOUBLE) * 1e12) / 1e12 AS rx,
        CAST(o_totalprice AS DECIMAL(18,2)) AS x
      FROM orders WHERE o_totalprice > 0
    )
    SELECT priority,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 4) AS DOUBLE)
        AS mean_arith,
      CAST(FLOOR(exp(CAST(SUM(CAST(lx AS DECIMAL(28,9)))
        AS DOUBLE) / COUNT(*)) * 1e4) / 1e4 AS DOUBLE) AS mean_geom,
      CAST(ROUND(CAST(COUNT(*) AS DOUBLE)
        / CAST(SUM(CAST(rx AS DECIMAL(28,12))) AS DOUBLE), 4)
        AS DOUBLE) AS mean_harm
    FROM t GROUP BY priority
    ORDER BY priority ASC
    """,
)
def q273_pythagorean_means(spark, sf_dir):
    """Arithmetic/geometric/harmonic means of order value per
    priority — AM >= GM >= HM, each deterministic at corpus scale."""
    from ..operators.stats import fquant

    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    x = F.col("o_totalprice").cast("double")
    lx = fquant(F.log(x), 9).cast("decimal(28,9)")
    rx = fquant(1.0 / x, 12).cast("decimal(28,12)")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1)),
                4,
            )
            .cast("double")
            .alias("mean_arith"),
            # exp is transcendental — FLOOR-quantize its output
            # (plain ROUND would ride any cross-engine ulp)
            (
                F.floor(
                    F.exp(
                        F.sum(lx).cast("double") / F.count(F.lit(1))
                    )
                    * F.lit(1e4)
                ).cast("double")
                / F.lit(1e4)
            )
            .cast("double")
            .alias("mean_geom"),
            F.round(
                F.count(F.lit(1)).cast("double")
                / F.sum(rx).cast("double"),
                4,
            )
            .cast("double")
            .alias("mean_harm"),
        )
        .orderBy(F.asc("priority"))
    )


# ---------------------------------------------------------------------------
# q277 — Kruskal-Wallis rank test across order priorities: the
# nonparametric one-way ANOVA, exact via doubled average ranks
# (integers end to end; H is one fixed IEEE expression with the tie
# correction from an exact integer tie table).
# ---------------------------------------------------------------------------
@query(
    "q277_kruskal_wallis",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    ranked AS (
      SELECT g,
        2 * RANK() OVER (ORDER BY v ASC)
          + COUNT(*) OVER (PARTITION BY v) - 1 AS r2
      FROM base
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(r2) AS BIGINT) AS sr2
      FROM ranked GROUP BY g
    ),
    top AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
        CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(list_sum(list_sort(list(
          CAST(sr2 AS DOUBLE) * CAST(sr2 AS DOUBLE)
          / (4.0 * CAST(n AS DOUBLE))
        ))) AS DOUBLE) AS t1
      FROM per_g
    ),
    ties AS (
      SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY v
      )
    )
    SELECT k_groups, n_rows,
      CAST(ROUND(CASE WHEN k_groups >= 2
          AND 1.0 - CAST(tie AS DOUBLE)
            / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)
               * CAST(n_rows AS DOUBLE) - CAST(n_rows AS DOUBLE)) > 0
        THEN (12.0 / (CAST(n_rows AS DOUBLE)
                      * (CAST(n_rows AS DOUBLE) + 1.0)) * t1
              - 3.0 * (CAST(n_rows AS DOUBLE) + 1.0))
             / (1.0 - CAST(tie AS DOUBLE)
                / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)
                   * CAST(n_rows AS DOUBLE) - CAST(n_rows AS DOUBLE)))
      END, 6) AS DOUBLE) AS h_stat
    FROM top CROSS JOIN ties
    """,
)
def q277_kruskal_wallis(spark, sf_dir):
    """operators/stats.kruskal_wallis: order values across the five
    priorities."""
    from ..operators.stats import kruskal_wallis

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").alias("v"),
    )
    return kruskal_wallis(o, "v", "g")
