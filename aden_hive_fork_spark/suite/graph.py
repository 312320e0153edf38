"""Graph-analytics declared queries (§2.D extension family).

q104 runs fixed-iteration PageRank over the customer→supplier
purchase graph (who buys from whom, via orders⋈lineitem). The oracle
UNROLLS the same power iterations as chained DuckDB CTEs — each round
is plain SQL (contribution sum + dangling scalar), so the iterative
operator is verified exactly at rounded precision, the same way the
clustering tier is verified by a recursive-CTE closure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T

_ITER = 5
_D = 0.85
# suppliers share the integer key space with customers; offset them
_SUPP_OFFSET = 1_000_000


def _oracle_sql(iterations: int) -> str:
    head = f"""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src,
        l.l_suppkey + {_SUPP_OFFSET} AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS (
      SELECT src AS id FROM edges UNION SELECT dst FROM edges
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS (
      SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src
    ),
    r0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)
    """
    steps = []
    for k in range(1, iterations + 1):
        p = k - 1
        steps.append(
            f"""
    d{k} AS (
      SELECT COALESCE(SUM(r.rank), 0) AS dangling
      FROM r{p} r LEFT JOIN outdeg o ON r.id = o.src
      WHERE o.src IS NULL
    ),
    m{k} AS (
      SELECT e.dst AS id, SUM(r.rank / o.outdeg) AS in_mass
      FROM edges e JOIN r{p} r ON e.src = r.id
                   JOIN outdeg o ON e.src = o.src
      GROUP BY e.dst
    ),
    r{k} AS (
      SELECT n.id,
        ((1 - {_D}) / nn.n + ({_D} * d{k}.dangling) / nn.n)
          + {_D} * COALESCE(m{k}.in_mass, 0) AS rank
      FROM nodes n CROSS JOIN nn CROSS JOIN d{k}
      LEFT JOIN m{k} ON n.id = m{k}.id
    )"""
        )
        # r_{k+1}'s formula groups EXACTLY like pagerank's float
        # arithmetic: Spark computes base = (1-d)/n + (d*dangling)/n
        # driver-side, then adds d*in_mass — the parenthesisation here
        # mirrors that association so the two engines agree bit-for-bit
        # at every iteration, not just to ulps.
    tail = f"""
    SELECT CAST(id AS BIGINT) AS id, ROUND(rank, 8) AS rank
    FROM r{iterations}
    ORDER BY rank DESC, id ASC
    LIMIT 25
    """
    return head + "," + ",".join(steps) + tail


@query("q104_purchase_pagerank", oracle=_oracle_sql(_ITER))
def q104_purchase_pagerank(spark, sf_dir):
    """Top-25 nodes of the purchase graph by 5-iteration PageRank
    (operators/graph_rank.pagerank) — link-based importance as a
    quality/weighting signal. The distinct edge projection is an
    aggregate of the fact join, each iteration is two keyed shuffles
    plus a one-double dangling scalar, and lineage is checkpoint-
    truncated per round."""
    from ..operators.graph_rank import pagerank

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
    )
    ranks = pagerank(edges, iterations=_ITER, damping=_D)
    return (
        ranks.select(
            F.col("id").cast("bigint").alias("id"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q125 — exact triangle count (operators/graph_rank.triangle_count)
# over the part co-order graph. The Spark side uses degree-ordered
# orientation (O(|E|^1.5) intermediate); the oracle counts the same
# triangles with the canonical a<b<c three-way join — any correct
# algorithm agrees on the number.
# ---------------------------------------------------------------------------
@query(
    "q125_triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                      GREATEST(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), nodes AS (
      SELECT COUNT(DISTINCT v) AS n_nodes FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e
      )
    )
    SELECT
      CAST((SELECT n_nodes FROM nodes) AS BIGINT) AS n_nodes,
      CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
      CAST((
        SELECT COUNT(*)
        FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3
          ON e3.a = e1.a AND e3.b = e2.b
      ) AS BIGINT) AS n_triangles
    """,
)
def q125_triangle_count(spark, sf_dir):
    """Triangles in the part co-order graph (edges = part pairs that
    appear in the same order — per-order item counts are bounded, so
    the pair explode is constant-factor). Degree-ordered orientation
    keeps the path join's intermediate O(|E|^1.5) even with hub
    parts."""
    from ..operators.graph_rank import triangle_count

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # per-order pair generation as ONE keyed aggregate + a map-side
    # array comprehension (orders are bounded baskets, so the pair
    # fan-out is a constant factor) — one shuffle, vs the self-join
    # formulation's two; the operator's canonicalizing distinct is
    # the only other shuffle of the edge list
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.expr(
                        "transform(ps, x ->"
                        " transform(ps, y -> struct(x AS a, y AS b)))"
                    )
                ),
                lambda s: s.getField("a") < s.getField("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
    return triangle_count(pairs)


# ---------------------------------------------------------------------------
# q166 — multi-source BFS over the (thinned, undirected) purchase
# graph: hop histogram from the nation-0 customer seed set. Each
# round is frontier⋈edges + anti-join vs visited (volume tracks the
# frontier); integer hop labels make the oracle a bounded recursive
# CTE with no float anywhere.
# ---------------------------------------------------------------------------
@query(
    "q166_bfs_hops",
    oracle=f"""
    WITH RECURSIVE edges0 AS (
      SELECT DISTINCT o.o_custkey AS src,
        l.l_suppkey + {_SUPP_OFFSET} AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_totalprice > 480000
    ),
    edges AS (
      SELECT src, dst FROM edges0
      UNION SELECT dst AS src, src AS dst FROM edges0
    ),
    srcs AS (
      SELECT DISTINCT c_custkey AS id FROM customer WHERE c_nationkey = 0
    ),
    w(id, hops) AS (
      SELECT id, 0 FROM srcs
      UNION
      SELECT e.dst, w.hops + 1 FROM w JOIN edges e ON e.src = w.id
      WHERE w.hops < 4
    ),
    d AS (SELECT id, MIN(hops) AS hops FROM w GROUP BY id)
    SELECT CAST(hops AS INT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
    FROM d GROUP BY hops ORDER BY hops ASC
    """,
)
def q166_bfs_hops(spark, sf_dir):
    """operators/graph_rank.bfs_hops — 4-hop frontier BFS, seeds =
    nation-0 customers, purchase edges with totalprice > 480k."""
    from ..operators.graph_rank import bfs_hops

    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000)
    li = T(spark, sf_dir, "lineitem")
    fwd = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").alias("id"))
    )
    d = bfs_hops(edges, seeds, max_hops=4)
    return (
        d.groupBy(F.col("hops").cast("int").alias("hops"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("id").cast("bigint").alias("min_id"),
            F.max("id").cast("bigint").alias("max_id"),
        )
        .orderBy("hops")
    )


# ---------------------------------------------------------------------------
# q179 — label-propagation communities over the symmetrized purchase
# graph. Deterministic LPA (most-frequent neighbor label, smallest-
# label tie-break, synchronous rounds) so the oracle can unroll the
# identical 3 rounds as chained CTEs — the same verification pattern
# as PageRank (q104) and BFS (q166).
# ---------------------------------------------------------------------------
_LPA_ITER = 3


def _lpa_oracle(iterations: int) -> str:
    head = f"""
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS src,
        l.l_suppkey + {_SUPP_OFFSET} AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    und AS (
      SELECT src AS s, dst AS d FROM e0
      UNION
      SELECT dst AS s, src AS d FROM e0
    ),
    l0 AS (
      SELECT s AS id, s AS label FROM (SELECT DISTINCT s FROM und)
    )
    """
    steps = []
    for k in range(1, iterations + 1):
        p = k - 1
        steps.append(
            f"""
    c{k} AS (
      SELECT u.s AS id, l.label, COUNT(*) AS c
      FROM und u JOIN l{p} l ON l.id = u.d
      GROUP BY 1, 2
    ),
    p{k} AS (
      SELECT id, label FROM (
        SELECT id, label,
          ROW_NUMBER() OVER (PARTITION BY id
            ORDER BY c DESC, label ASC) AS rn
        FROM c{k}
      ) WHERE rn = 1
    ),
    l{k} AS (
      SELECT n.id, COALESCE(p.label, n.label) AS label
      FROM l{p} n LEFT JOIN p{k} p ON p.id = n.id
    )"""
        )
    tail = f"""
    SELECT CAST(label AS BIGINT) AS community,
      CAST(COUNT(*) AS BIGINT) AS n_members
    FROM l{iterations}
    GROUP BY label
    ORDER BY n_members DESC, community ASC
    LIMIT 25
    """
    return head + "," + ",".join(steps) + tail


@query("q179_purchase_communities", oracle=_lpa_oracle(_LPA_ITER))
def q179_purchase_communities(spark, sf_dir):
    """Top-25 communities (by size) after 3 deterministic LPA rounds
    (operators/graph_rank.label_propagation) on the customer-supplier
    purchase graph — the domain-clustering companion to PageRank's
    importance ranking."""
    from ..operators.graph_rank import label_propagation

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
    ).distinct()
    labels = label_propagation(edges, iterations=_LPA_ITER)
    return (
        labels.groupBy(F.col("label").cast("bigint").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q250 — weighted shortest paths over the purchase graph: Bellman-
# Ford relaxation rounds (the Pregel SSSP shape), integer ship-delay
# weights so min-plus arithmetic is exact in both engines. Output:
# the 25 closest supplier-side nodes from the nation-0 seed set.
# ---------------------------------------------------------------------------
_SSSP_ROUNDS = 3


def _q250_oracle() -> str:
    sql = f"""
    WITH edges0 AS MATERIALIZED (
      SELECT o.o_custkey AS src, l.l_suppkey + {_SUPP_OFFSET} AS dst,
        CAST(MIN(date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE))) AS BIGINT) AS w
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_totalprice > 480000
      GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (
      SELECT src, dst, w FROM edges0
      UNION ALL SELECT dst AS src, src AS dst, w FROM edges0
    ),
    d0 AS MATERIALIZED (
      SELECT DISTINCT c_custkey AS id, CAST(0 AS BIGINT) AS dist
      FROM customer WHERE c_nationkey = 0
    )"""
    for i in range(1, _SSSP_ROUNDS + 1):
        sql += f""",
    c{i} AS MATERIALIZED (
      SELECT e.dst AS id, MIN(d{i - 1}.dist + e.w) AS dist
      FROM d{i - 1} JOIN edges e ON e.src = d{i - 1}.id
      GROUP BY e.dst
    ),
    d{i} AS MATERIALIZED (
      SELECT id, MIN(dist) AS dist
      FROM (SELECT * FROM d{i - 1} UNION ALL SELECT * FROM c{i})
      GROUP BY id
    )"""
    sql += f"""
    SELECT CAST(id AS BIGINT) AS id, dist
    FROM d{_SSSP_ROUNDS}
    WHERE id > {_SUPP_OFFSET}
    ORDER BY dist ASC, id ASC
    LIMIT 25
    """
    return sql


@query("q250_sssp_weighted", oracle=_q250_oracle())
def q250_sssp_weighted(spark, sf_dir):
    """operators/graph_rank.sssp_weighted — 3 Bellman-Ford rounds,
    ship-delay-day weights, nation-0 customer seeds."""
    from ..operators.graph_rank import sssp_weighted

    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000)
    li = T(spark, sf_dir, "lineitem")
    fwd = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .agg(
            F.min(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            )
            .cast("bigint")
            .alias("w")
        )
    )
    edges = fwd.unionByName(
        fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    seeds = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").alias("id"))
    )
    d = sssp_weighted(edges, seeds, rounds=_SSSP_ROUNDS)
    return (
        d.filter(F.col("id") > _SUPP_OFFSET)
        .select(F.col("id").cast("bigint").alias("id"), "dist")
        .orderBy(F.asc("dist"), F.asc("id"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q259 — local clustering coefficients over the part co-order graph:
# per-node triangle credit from the degree-ordered triangle listing
# (O(|E|^1.5) bounded), lcc = 2·tri/(deg·(deg−1)). The oracle lists
# the same triangles with the canonical a<b<c three-way join and
# credits all three endpoints.
# ---------------------------------------------------------------------------
@query(
    "q259_local_clustering",
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                      GREATEST(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS MATERIALIZED (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e
      ) GROUP BY v
    ),
    tri AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    credit AS MATERIALIZED (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
        SELECT x AS v FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY v
    )
    SELECT CAST(deg.v AS BIGINT) AS id, deg.deg,
      CAST(COALESCE(credit.triangles, 0) AS BIGINT) AS triangles,
      CAST(ROUND(CASE WHEN deg.deg >= 2 THEN
        2.0 * CAST(COALESCE(credit.triangles, 0) AS DOUBLE)
        / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0))
      END, 6) AS DOUBLE) AS lcc
    FROM deg LEFT JOIN credit ON credit.v = deg.v
    WHERE deg.deg >= 5
    ORDER BY lcc DESC, id ASC
    LIMIT 20
    """,
)
def q259_local_clustering(spark, sf_dir):
    """operators/graph_rank.local_clustering over the part co-order
    graph: top-20 most clustered parts with degree >= 5."""
    from ..operators.graph_rank import local_clustering

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.expr(
                        "transform(ps, x ->"
                        " transform(ps, y -> struct(x AS a, y AS b)))"
                    )
                ),
                lambda s: s.getField("a") < s.getField("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
    lcc = local_clustering(pairs)
    return (
        lcc.filter(F.col("deg") >= 5)
        .select(F.col("id").cast("bigint").alias("id"), "deg", "triangles", "lcc")
        .orderBy(F.desc("lcc"), F.asc("id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q265 — HITS hubs & authorities over the directed purchase graph
# (operators/graph_rank.hits): 4 mutual-reinforcement rounds with the
# quantize-then-decimal-sum reduction (associative — safe at any
# in-degree, unlike bounded folds), L2 norms per round, top-10 each
# side. The oracle unrolls the identical rounds.
# ---------------------------------------------------------------------------
_HITS_ITER = 4


def _q265_oracle() -> str:
    sql = f"""
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS src,
        l.l_suppkey + {_SUPP_OFFSET} AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_totalprice > 480000
    ),
    h0 AS MATERIALIZED (
      SELECT DISTINCT src AS id, CAST(1.0 AS DOUBLE) AS h FROM edges
    )"""
    for t in range(1, _HITS_ITER + 1):
        sql += f""",
    ar{t} AS MATERIALIZED (
      SELECT e.dst AS id,
        CAST(SUM(CAST(h.h AS DECIMAL(28,9))) AS DOUBLE) AS ar
      FROM edges e JOIN h{t - 1} h ON h.id = e.src GROUP BY e.dst
    ),
    an{t} AS MATERIALIZED (
      SELECT FLOOR(sqrt(CAST(SUM(CAST(FLOOR(ar * ar * 1e9) / 1e9
        AS DECIMAL(28,9))) AS DOUBLE)) * 1e9) / 1e9 AS nn
      FROM ar{t}
    ),
    a{t} AS MATERIALIZED (
      SELECT id, FLOOR(ar / nn * 1e9) / 1e9 AS a
      FROM ar{t} CROSS JOIN an{t}
    ),
    hr{t} AS MATERIALIZED (
      SELECT e.src AS id,
        CAST(SUM(CAST(a.a AS DECIMAL(28,9))) AS DOUBLE) AS hr
      FROM edges e JOIN a{t} a ON a.id = e.dst GROUP BY e.src
    ),
    hn{t} AS MATERIALIZED (
      SELECT FLOOR(sqrt(CAST(SUM(CAST(FLOOR(hr * hr * 1e9) / 1e9
        AS DECIMAL(28,9))) AS DOUBLE)) * 1e9) / 1e9 AS nn
      FROM hr{t}
    ),
    h{t} AS MATERIALIZED (
      SELECT id, FLOOR(hr / nn * 1e9) / 1e9 AS h
      FROM hr{t} CROSS JOIN hn{t}
    )"""
    sql += f"""
    SELECT role, CAST(id AS BIGINT) AS id, CAST(score AS DOUBLE) AS score
    FROM (
      (SELECT 'authority' AS role, id, a AS score FROM a{_HITS_ITER}
       ORDER BY a DESC, id ASC LIMIT 10)
      UNION ALL
      (SELECT 'hub' AS role, id, h AS score FROM h{_HITS_ITER}
       ORDER BY h DESC, id ASC LIMIT 10)
    )
    ORDER BY role ASC, score DESC, id ASC
    """
    return sql


@query("q265_hits_ranking", oracle=_q265_oracle())
def q265_hits_ranking(spark, sf_dir):
    """operators/graph_rank.hits — 4 rounds over the directed
    customer→supplier purchase graph, top-10 hubs and authorities."""
    from ..operators.graph_rank import hits

    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000)
    li = T(spark, sf_dir, "lineitem")
    fwd = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    res = hits(fwd, iters=_HITS_ITER)
    top_a = (
        res.select(
            F.lit("authority").alias("role"),
            F.col("id").cast("bigint").alias("id"),
            F.col("authority").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(10)
    )
    top_h = (
        res.select(
            F.lit("hub").alias("role"),
            F.col("id").cast("bigint").alias("id"),
            F.col("hub").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(10)
    )
    return top_a.unionByName(top_h).orderBy(
        F.asc("role"), F.desc("score"), F.asc("id")
    )


# ---------------------------------------------------------------------------
# q267 — frequent triple itemsets over order baskets: per-basket
# 3-combinations generated map-side (baskets are bounded — C(n,3)
# per order is a constant factor, so no Apriori candidate pruning is
# needed; that machinery exists for unbounded baskets), one count
# aggregate, support filter, top-20. The oracle counts the same
# triples with the canonical a<b<c three-way join.
# ---------------------------------------------------------------------------
@query(
    "q267_frequent_triples",
    oracle="""
    WITH bp AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    tri AS (
      SELECT a.p AS p1, b.p AS p2, c.p AS p3,
        CAST(COUNT(*) AS BIGINT) AS support
      FROM bp a
      JOIN bp b ON b.o = a.o AND b.p > a.p
      JOIN bp c ON c.o = a.o AND c.p > b.p
      GROUP BY 1, 2, 3
    )
    SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
      CAST(p3 AS BIGINT) AS p3, support
    FROM tri
    WHERE support >= 2
    ORDER BY support DESC, p1 ASC, p2 ASC, p3 ASC
    LIMIT 20
    """,
)
def q267_frequent_triples(spark, sf_dir):
    """Frequent 3-itemsets from order baskets, map-side combination
    generation (bounded baskets), support >= 2, top-20."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    triples = baskets.select(
        F.explode(
            F.expr(
                """
                flatten(flatten(
                  transform(ps, (x, i) ->
                    transform(slice(ps, i + 2, size(ps)), (y, j) ->
                      transform(slice(ps, i + j + 3, size(ps)), z ->
                        struct(x AS p1, y AS p2, z AS p3))))))
                """
            )
        ).alias("t")
    ).select("t.p1", "t.p2", "t.p3")
    return (
        triples.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= 2)
        .select(
            F.col("p1").cast("bigint").alias("p1"),
            F.col("p2").cast("bigint").alias("p2"),
            F.col("p3").cast("bigint").alias("p3"),
            "support",
        )
        .orderBy(
            F.desc("support"), F.asc("p1"), F.asc("p2"), F.asc("p3")
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q268 — association rules {A,B}→C from the frequent triples:
# confidence = supp(ABC)/supp(AB), lift = confidence / (supp(C)/N).
# All supports are one aggregate each over map-side basket
# combinations; 3 candidate rules per triple; exact-count ratios.
# ---------------------------------------------------------------------------
@query(
    "q268_association_rules",
    oracle="""
    WITH bp AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n_orders AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM bp),
    item AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS s1 FROM bp GROUP BY p
    ),
    pair AS (
      SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS s2
      FROM bp a JOIN bp b ON b.o = a.o AND b.p > a.p
      GROUP BY 1, 2
    ),
    tri AS (
      SELECT a.p AS p1, b.p AS p2, c.p AS p3,
        CAST(COUNT(*) AS BIGINT) AS s3
      FROM bp a
      JOIN bp b ON b.o = a.o AND b.p > a.p
      JOIN bp c ON c.o = a.o AND c.p > b.p
      GROUP BY 1, 2, 3
      HAVING COUNT(*) >= 2
    ),
    rules AS (
      SELECT p1 AS a, p2 AS b, p3 AS c, s3 FROM tri
      UNION ALL SELECT p1, p3, p2, s3 FROM tri
      UNION ALL SELECT p2, p3, p1, s3 FROM tri
    ),
    scored AS (
      SELECT r.a, r.b, r.c, r.s3, pair.s2,
        CAST(ROUND(CAST(r.s3 AS DOUBLE) / CAST(pair.s2 AS DOUBLE), 6)
          AS DOUBLE) AS confidence,
        CAST(ROUND(
          (CAST(r.s3 AS DOUBLE) / CAST(pair.s2 AS DOUBLE))
          / (CAST(item.s1 AS DOUBLE) / CAST(n_orders.n AS DOUBLE)), 6)
          AS DOUBLE) AS lift
      FROM rules r
      JOIN pair ON pair.pa = LEAST(r.a, r.b)
              AND pair.pb = GREATEST(r.a, r.b)
      JOIN item ON item.p = r.c
      CROSS JOIN n_orders
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
      CAST(c AS BIGINT) AS c, s3 AS support, confidence, lift
    FROM scored
    ORDER BY confidence DESC, lift DESC, a ASC, b ASC, c ASC
    LIMIT 20
    """,
)
def q268_association_rules(spark, sf_dir):
    """{A,B}→C rules from support-2 triples: exact-count confidence
    and lift, totally-ordered top-20."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = li.agg(
        F.countDistinct("o").cast("bigint").alias("n")
    )
    item = li.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("s1")
    )
    a, b = li.alias("a"), li.alias("b")
    pair = (
        a.join(
            b,
            (F.col("b.o") == F.col("a.o"))
            & (F.col("b.p") > F.col("a.p")),
        )
        .groupBy(
            F.col("a.p").alias("pa"), F.col("b.p").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("s2"))
    )
    c = li.alias("c")
    tri = (
        a.join(
            b,
            (F.col("b.o") == F.col("a.o"))
            & (F.col("b.p") > F.col("a.p")),
        )
        .join(
            c,
            (F.col("c.o") == F.col("a.o"))
            & (F.col("c.p") > F.col("b.p")),
        )
        .groupBy(
            F.col("a.p").alias("p1"),
            F.col("b.p").alias("p2"),
            F.col("c.p").alias("p3"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("s3"))
        .filter(F.col("s3") >= 2)
    )
    rules = (
        tri.select(
            F.col("p1").alias("ra"), F.col("p2").alias("rb"),
            F.col("p3").alias("rc"), "s3",
        )
        .unionByName(
            tri.select(
                F.col("p1").alias("ra"), F.col("p3").alias("rb"),
                F.col("p2").alias("rc"), "s3",
            )
        )
        .unionByName(
            tri.select(
                F.col("p2").alias("ra"), F.col("p3").alias("rb"),
                F.col("p1").alias("rc"), "s3",
            )
        )
    )
    conf = F.col("s3").cast("double") / F.col("s2").cast("double")
    lift = conf / (
        F.col("s1").cast("double") / F.col("n").cast("double")
    )
    return (
        rules.join(
            pair,
            (pair["pa"] == F.least(F.col("ra"), F.col("rb")))
            & (pair["pb"] == F.greatest(F.col("ra"), F.col("rb"))),
        )
        .join(item, item["p"] == F.col("rc"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("ra").cast("bigint").alias("a"),
            F.col("rb").cast("bigint").alias("b"),
            F.col("rc").cast("bigint").alias("c"),
            F.col("s3").alias("support"),
            F.round(conf, 6).cast("double").alias("confidence"),
            F.round(lift, 6).cast("double").alias("lift"),
        )
        .orderBy(
            F.desc("confidence"), F.desc("lift"),
            F.asc("a"), F.asc("b"), F.asc("c"),
        )
        .limit(20)
    )
