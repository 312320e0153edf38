"""ML-adjacent relational operators: distributed k-means under the
oracle gate.

The oracle is Lloyd's algorithm UNROLLED into SQL — init, then
(assign, update) × n_iter as chained CTEs — which DuckDB replays
bit-exactly because every step of the Spark implementation is
deterministic by construction (hash-order init, tie-broken argmin,
rounded exact-decimal centroid means). Iterative ML on an engine
usually gets a rows-only check at best; the determinism contract
makes it hash-checkable like any relational query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T, dec, dround

_K = 4
_ITER = 3


def _kmeans_oracle() -> str:
    """Unrolled Lloyd iterations as CTEs (assign aN → mean uN →
    carry-forward cN), mirroring operators/kmeans.kmeans exactly."""
    sql = """
    WITH pts AS (
      SELECT c.c_custkey AS pid, c.c_acctbal AS x,
        CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS y
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ),
    c0 AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY
                md5('kmeans' || CAST(pid AS VARCHAR)) ASC, pid ASC)) - 1
             AS cid, x, y
      FROM pts
      ORDER BY md5('kmeans' || CAST(pid AS VARCHAR)) ASC, pid ASC
      LIMIT {k}
    )"""
    for i in range(1, _ITER + 1):
        sql += f""",
    a{i} AS (
      SELECT pid, x, y, cid FROM (
        SELECT p.pid, p.x, p.y, c.cid,
          ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY
            (p.x-c.x)*(p.x-c.x) + (p.y-c.y)*(p.y-c.y) ASC, c.cid ASC) AS rn
        FROM pts p CROSS JOIN c{i - 1} c
      ) WHERE rn = 1
    ),
    u{i} AS (
      SELECT cid,
        ROUND(CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE), 6) AS x,
        ROUND(CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE), 6) AS y
      FROM a{i} GROUP BY cid
    ),
    c{i} AS (
      SELECT p.cid, COALESCE(u.x, p.x) AS x, COALESCE(u.y, p.y) AS y
      FROM c{i - 1} p LEFT JOIN u{i} u ON u.cid = p.cid
    )"""
    sql += f"""
    SELECT CAST(c.cid AS BIGINT) AS cluster_id,
      n.n_points, c.x AS cx, c.y AS cy
    FROM c{_ITER} c
    JOIN (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_points
          FROM a{_ITER} GROUP BY cid) n ON n.cid = c.cid
    ORDER BY cluster_id ASC
    """
    return sql.format(k=_K)


# ---------------------------------------------------------------------------
# q159 — customer segmentation: k-means over (account balance, total
# spend). Per iteration: one codegen-fused assignment pass (argmin
# over k literal centroids — no join) + one k·d-row keyed aggregate.
# Driver state is k·d doubles — scale-independent.
# ---------------------------------------------------------------------------
@query("q159_kmeans_segments", oracle=_kmeans_oracle())
def q159_kmeans_segments(spark, sf_dir):
    """operators/kmeans.kmeans — 3 Lloyd iterations, k=4,
    hash-order init, exact-decimal centroid means."""
    from ..operators.kmeans import kmeans

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    spend = o.groupBy(F.col("o_custkey").alias("pid")).agg(
        dround(F.sum(dec("o_totalprice"))).alias("y")
    )
    # kmeans runs n_iter+2 actions (seed + per-round aggregate +
    # final counts) and each would replay the orders aggregate +
    # customer join from parquet — materialize the 3-column feature
    # frame once (localCheckpoint, not persist: no CacheManager
    # entry, so repeated bench invocations recompute honestly —
    # measured 4.67 -> 2.84 s noop median at sf0.1; the q257 caller
    # uses persist for the same reason)
    pts = (
        c.select(F.col("c_custkey").alias("pid"), F.col("c_acctbal").alias("x"))
        .join(spend, "pid")
        .localCheckpoint(eager=True)
    )
    assigned, cents = kmeans(
        pts, ["x", "y"], "pid", k=_K, n_iter=_ITER, salt="kmeans"
    )
    counts = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    cent_df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(cents)],
        "cid int, cx double, cy double",
    )
    return (
        cent_df.join(counts, "cid")
        .select(
            F.col("cid").cast("bigint").alias("cluster_id"),
            "n_points",
            "cx",
            "cy",
        )
        .orderBy("cluster_id")
    )


_LR_ITER = 3


def _logreg_oracle() -> str:
    """Unrolled full-batch GD: per iteration one gradient CTE (gN)
    and one weight CTE (wN), mirroring operators/logreg.logreg_fit
    expression-for-expression (same rounding points, same
    left-associated z)."""
    feats = ["x1", "x2"]
    sql = """
    WITH d AS (
      SELECT o_totalprice / 100000.0 AS x1,
        CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS x2,
        CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END AS y
      FROM orders
    ),
    w0 AS (SELECT 0.0 AS b, 0.0 AS wx1, 0.0 AS wx2)"""
    wcols = ["b", "wx1", "wx2"]
    for i in range(1, _LR_ITER + 1):
        z = f"(w.b + w.wx1*x1 + w.wx2*x2)"
        p = f"1.0/(1.0+exp(-{z}))"
        terms = ["1.0"] + feats
        gsel = ", ".join(
            f"ROUND(CAST(SUM(CAST(ROUND(({p} - y) * {t}, 6)"
            f" AS DECIMAL(28,6))) AS DOUBLE)"
            f" / CAST(COUNT(*) AS DOUBLE), 6) AS g{j}"
            for j, t in enumerate(terms)
        )
        wsel = ", ".join(
            f"ROUND(w.{c} - 1.0*g.g{j}, 6) AS {c}"
            for j, c in enumerate(wcols)
        )
        sql += f""",
    g{i} AS (SELECT {gsel} FROM d CROSS JOIN w{i - 1} w),
    w{i} AS (SELECT {wsel} FROM w{i - 1} w CROSS JOIN g{i} g)"""
    z = "(w.b + w.wx1*x1 + w.wx2*x2)"
    sql += f"""
    SELECT w.b AS bias, w.wx1 AS w_x1, w.wx2 AS w_x2,
      CAST(SUM(CASE WHEN (CASE WHEN ROUND(1.0/(1.0+exp(-{z})), 6) >= 0.5
                          THEN 1.0 ELSE 0.0 END) = y
               THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
      CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM d CROSS JOIN w{_LR_ITER} w
    GROUP BY w.b, w.wx1, w.wx2
    """
    return sql


# ---------------------------------------------------------------------------
# q165 — logistic regression: 3 full-batch GD steps, quantized
# sigmoid, exact-decimal gradient sums; one aggregate pass per
# iteration, driver state = d+1 doubles.
# ---------------------------------------------------------------------------
@query("q165_logreg_urgent", oracle=_logreg_oracle())
def q165_logreg_urgent(spark, sf_dir):
    """operators/logreg — predict 1-URGENT priority from scaled
    price + fulfilled-status; reports weights and training accuracy
    counts (bit-deterministic, see module docstring)."""
    from ..operators.logreg import logreg_fit, logreg_score

    d = T(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") / F.lit(100000.0)).alias("x1"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("x2"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    w = logreg_fit(d, ["x1", "x2"], "y", n_iter=_LR_ITER, lr=1.0)
    scored = logreg_score(d, ["x1", "x2"], w)
    pred = F.when(F.col("prob") >= 0.5, 1.0).otherwise(0.0)
    return scored.agg(
        F.lit(w[0]).alias("bias"),
        F.lit(w[1]).alias("w_x1"),
        F.lit(w[2]).alias("w_x2"),
        F.sum(F.when(pred == F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# q257 — vector clustering of hashing-trick document features: the
# q247 vectorizer composed with the q159 deterministic k-means, 16
# dims, k=4. Distances on INTEGER-valued features are exact; centroid
# means follow the rounded exact-decimal contract, so the unrolled
# 16-dim oracle replays every round.
# ---------------------------------------------------------------------------
_Q257_K = 4
_Q257_ITER = 2
_Q257_DIMS = 16


def _q257_oracle() -> str:
    dims = [f"f{i}" for i in range(_Q257_DIMS)]
    pivot = ", ".join(
        f"CAST(MAX(CASE WHEN i = {i} THEN v END) AS DOUBLE) AS f{i}"
        for i in range(_Q257_DIMS)
    )
    sql = f"""
    WITH tok0 AS MATERIALIZED (
      SELECT doc_id,
        unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
      FROM documents
    ),
    t AS MATERIALIZED (
      SELECT doc_id, md5('fh' || tok) AS h FROM tok0 WHERE tok <> ''
    ),
    pb AS MATERIALIZED (
      SELECT doc_id,
        CAST(CAST(('0x' || substr(h, 1, 8)) AS UBIGINT) % 16 AS INT) AS b,
        SUM(CASE WHEN CAST(('0x' || substr(h, 9, 1)) AS UBIGINT) % 2 = 0
                 THEN 1 ELSE -1 END) AS v
      FROM t GROUP BY 1, 2
    ),
    grid AS MATERIALIZED (
      SELECT d.doc_id, gi.i
      FROM (SELECT DISTINCT doc_id FROM pb) d
      CROSS JOIN (SELECT unnest(range({_Q257_DIMS})) AS i) gi
    ),
    dense AS MATERIALIZED (
      SELECT g.doc_id, g.i, COALESCE(pb.v, 0) AS v
      FROM grid g LEFT JOIN pb ON pb.doc_id = g.doc_id AND pb.b = g.i
    ),
    pts AS MATERIALIZED (
      SELECT doc_id AS pid, {pivot}
      FROM dense GROUP BY doc_id
    ),
    c0 AS MATERIALIZED (
      SELECT (ROW_NUMBER() OVER (ORDER BY
                md5('km257' || CAST(pid AS VARCHAR)) ASC, pid ASC)) - 1
             AS cid, {", ".join(dims)}
      FROM pts
      ORDER BY md5('km257' || CAST(pid AS VARCHAR)) ASC, pid ASC
      LIMIT {_Q257_K}
    )"""
    dist = " + ".join(
        f"(p.{d} - c.{d}) * (p.{d} - c.{d})" for d in dims
    )
    for it in range(1, _Q257_ITER + 1):
        means = ", ".join(
            f"ROUND(CAST(SUM(CAST({d} AS DECIMAL(28,2))) AS DOUBLE)"
            f" / CAST(COUNT(*) AS DOUBLE), 6) AS {d}"
            for d in dims
        )
        carry = ", ".join(
            f"COALESCE(u.{d}, p.{d}) AS {d}" for d in dims
        )
        sql += f""",
    a{it} AS MATERIALIZED (
      SELECT pid, {", ".join(dims)}, cid FROM (
        SELECT p.pid, {", ".join(f"p.{d}" for d in dims)}, c.cid,
          ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY
            {dist} ASC, c.cid ASC) AS rn
        FROM pts p CROSS JOIN c{it - 1} c
      ) WHERE rn = 1
    ),
    u{it} AS MATERIALIZED (
      SELECT cid, {means} FROM a{it} GROUP BY cid
    ),
    c{it} AS MATERIALIZED (
      SELECT p.cid, {carry}
      FROM c{it - 1} p LEFT JOIN u{it} u ON u.cid = p.cid
    )"""
    cents = ", ".join(f"c.{d} AS c{d}" for d in dims)
    sql += f"""
    SELECT CAST(c.cid AS BIGINT) AS cluster_id, n.n_points, {cents}
    FROM c{_Q257_ITER} c
    JOIN (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_points
          FROM a{_Q257_ITER} GROUP BY cid) n ON n.cid = c.cid
    ORDER BY cluster_id ASC
    """
    return sql


@query("q257_hashed_feature_clusters", oracle=_q257_oracle())
def q257_hashed_feature_clusters(spark, sf_dir):
    """operators/encoding.feature_hash ∘ operators/kmeans.kmeans:
    16-dim hashing-trick vectors clustered with deterministic Lloyd
    rounds (integer features → exact distances)."""
    from ..operators.encoding import feature_hash
    from ..operators.kmeans import kmeans

    d = T(spark, sf_dir, "documents")
    dims = [f"f{i}" for i in range(_Q257_DIMS)]
    pts = feature_hash(d, "doc_id", "text", k=_Q257_DIMS, salt="fh").select(
        F.col("doc_id").alias("pid"),
        *[
            F.col("features")[i].cast("double").alias(f"f{i}")
            for i in range(_Q257_DIMS)
        ],
    ).localCheckpoint(eager=True)  # kmeans scans n_iter+1 times —
    # vectorize once; eager localCheckpoint, not persist (r13 hygiene
    # sweep): no CacheManager entry to plan-match across invocations,
    # blocks freed when the frame is garbage collected
    assigned, cents = kmeans(
        pts, dims, "pid", k=_Q257_K, n_iter=_Q257_ITER, salt="km257"
    )
    counts = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    cent_df = spark.createDataFrame(
        [
            tuple([i] + [float(v) for v in c])
            for i, c in enumerate(cents)
        ],
        "cid int, " + ", ".join(f"c{d} double" for d in dims),
    )
    return (
        cent_df.join(counts, "cid")
        .select(
            F.col("cid").cast("bigint").alias("cluster_id"),
            "n_points",
            *[f"c{d}" for d in dims],
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# q264 — decision-stump split search (operators/encoding.
# decision_stump): best Gini threshold per feature for predicting
# urgent orders, candidates = interior deciles. Map-side ×cuts
# amplification with partial aggregation — the bootstrap plan shape.
# ---------------------------------------------------------------------------
_Q264_FRACS = ", ".join(repr(i / 10) for i in range(1, 10))


@query(
    "q264_decision_stump",
    oracle=f"""
    WITH basej AS (
      SELECT o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS price,
        CAST(COUNT(*) AS DOUBLE) AS items,
        (o.o_orderpriority = '1-URGENT') AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderpriority
    ),
    cuts AS (
      SELECT
        list_distinct(list_transform(quantile_cont(price, [{_Q264_FRACS}]),
          c -> ROUND(c, 6))) AS cp,
        list_distinct(list_transform(quantile_cont(items, [{_Q264_FRACS}]),
          c -> ROUND(c, 6))) AS ci
      FROM basej
    ),
    expl AS (
      SELECT 'price' AS feature, b.price AS x, b.y, unnest(cuts.cp) AS cut
      FROM basej b CROSS JOIN cuts
      UNION ALL
      SELECT 'items' AS feature, b.items AS x, b.y, unnest(cuts.ci) AS cut
      FROM basej b CROSS JOIN cuts
    ),
    agg AS (
      SELECT feature, cut,
        CAST(SUM(CASE WHEN x <= cut THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
        CAST(SUM(CASE WHEN x <= cut AND y THEN 1 ELSE 0 END) AS BIGINT)
          AS p_l,
        CAST(SUM(CASE WHEN x > cut THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        CAST(SUM(CASE WHEN x > cut AND y THEN 1 ELSE 0 END) AS BIGINT)
          AS p_r
      FROM expl GROUP BY 1, 2
    ),
    scored AS (
      SELECT feature, cut, n_l, n_r, p_l, p_r,
        ROUND(
          (CASE WHEN n_l > 0 THEN
            (CAST(n_l AS DOUBLE) / CAST(n_l + n_r AS DOUBLE))
            * (1.0
               - (CAST(p_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                 * (CAST(p_l AS DOUBLE) / CAST(n_l AS DOUBLE))
               - ((CAST(n_l AS DOUBLE) - CAST(p_l AS DOUBLE))
                  / CAST(n_l AS DOUBLE))
                 * ((CAST(n_l AS DOUBLE) - CAST(p_l AS DOUBLE))
                    / CAST(n_l AS DOUBLE)))
          ELSE 0.0 END)
          + (CASE WHEN n_r > 0 THEN
            (CAST(n_r AS DOUBLE) / CAST(n_l + n_r AS DOUBLE))
            * (1.0
               - (CAST(p_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                 * (CAST(p_r AS DOUBLE) / CAST(n_r AS DOUBLE))
               - ((CAST(n_r AS DOUBLE) - CAST(p_r AS DOUBLE))
                  / CAST(n_r AS DOUBLE))
                 * ((CAST(n_r AS DOUBLE) - CAST(p_r AS DOUBLE))
                    / CAST(n_r AS DOUBLE)))
          ELSE 0.0 END), 6) AS g
      FROM agg
    ),
    best AS (
      SELECT feature, cut, g, n_l, n_r, p_l, p_r,
        ROW_NUMBER() OVER (PARTITION BY feature
                           ORDER BY g ASC, cut ASC) AS rn
      FROM scored
    )
    SELECT feature, CAST(cut AS DOUBLE) AS best_cut,
      CAST(g AS DOUBLE) AS gini,
      n_l AS n_left, n_r AS n_right, p_l AS pos_left, p_r AS pos_right
    FROM best WHERE rn = 1
    ORDER BY feature ASC
    """,
)
def q264_decision_stump(spark, sf_dir):
    """operators/encoding.decision_stump: best urgent-order split on
    order value and basket size."""
    from ..operators.encoding import decision_stump

    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    base = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_totalprice", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("double").alias("items"))
        .select(
            F.col("o_totalprice").cast("double").alias("price"),
            "items",
            (F.col("o_orderpriority") == "1-URGENT").alias("y"),
        )
    )
    return decision_stump(
        base, ["price", "items"], "y", n_cuts=10
    ).orderBy(F.asc("feature"))
