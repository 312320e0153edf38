"""PageRank — fixed-iteration power method over an edge DataFrame
(§2.D extension family with connected_components: graph analytics for
corpus quality weighting — link-based document importance is a
standard training-data quality signal).

Design for scale, mirroring `connected_components`' discipline:

- Every iteration is two keyed shuffles (contribution join on src,
  contribution sum on dst) — AQE handles skew (a hub page is a hot
  key); no cartesian, no driver-side edge processing.
- The dangling-mass term (nodes with no out-edges leak rank mass) is
  ONE scalar aggregate per iteration, collected to the driver — a
  single double per round, not data.
- Lineage is truncated per round with an eager checkpoint (local by
  default, reliable via ``checkpoint_dir`` exactly like
  connected_components), so the iterated plan stays constant-size.
- FIXED iteration count, not convergence detection: deterministic
  output (same input → same ranks bit-for-bit up to float summation
  order), which is what makes the operator oracle-checkable by an
  unrolled-CTE DuckDB twin at rounded precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, rank) after ``iterations`` rounds of the power method.

    rank_{k+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_k(u)/outdeg(u)
                                   + dangling_k / N)

    where dangling_k is the total rank mass on nodes without
    out-edges. Ranks sum to 1 every round (mass-conserving).
    """
    _restore_ckpt_dir = None
    if checkpoint_dir is not None:
        sc = edges.sparkSession.sparkContext
        try:  # remember the previous dir (internal accessor, Option)
            prev = sc._jsc.sc().getCheckpointDir()
            _restore_ckpt_dir = prev.get() if prev.isDefined() else None
        except Exception:
            _restore_ckpt_dir = None
        sc.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    e = _ckpt(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    nodes = _ckpt(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:  # empty graph: empty ranks, not a ZeroDivisionError
        return nodes.select("id", F.lit(0.0).alias("rank"))
    if e.count() <= _GRAPH_DRIVER_MAX_EDGES:
        out = _pagerank_driver(e, n, iterations, damping)
        if out is not None:
            if _restore_ckpt_dir is not None:
                try:
                    edges.sparkSession.sparkContext.setCheckpointDir(
                        _restore_ckpt_dir
                    )
                except Exception:
                    pass
            return out
    # outdeg is reused by every iteration: checkpoint it once instead
    # of re-shuffling e per round
    outdeg = _ckpt(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")))
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    # rank/contribution tables are |V| rows — KNOWN (n was counted).
    # When the measured size fits, broadcast them so each iteration's
    # joins are map-side over the (checkpointed) edge list instead of
    # re-shuffling it; checkpointed RDDs carry no stats, so AQE can't
    # make this call itself. Above the cap, plain shuffle joins.
    small_v = 48 * n < 64 * 1024 * 1024

    def _mb(df_side):
        return F.broadcast(df_side) if small_v else df_side
    for _ in range(iterations):
        # dangling mass as a ONE-ROW aggregate cross-joined into the
        # update plan: the whole iteration is a single Spark job (the
        # eager checkpoint), not scalar-collect + update. Arithmetic
        # association matches the q104 oracle exactly:
        # ((1-d)/n + (d*dangling)/n) + d*in_mass, all double ops.
        dangling_df = (
            ranks.join(outdeg, ranks["id"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling"))
        )
        contribs = (
            e.join(_mb(ranks), e["src"] == ranks["id"])
            .join(_mb(outdeg), "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = _ckpt(
            nodes.join(_mb(contribs), "id", "left")
            .crossJoin(dangling_df)  # 1 row: broadcast nested loop
            .select(
                "id",
                (
                    (
                        F.lit((1.0 - damping) / n)
                        + (F.lit(damping) * F.col("__dangling")) / F.lit(float(n))
                    )
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
        )
    # every checkpoint was EAGER, so nothing writes after this point —
    # safe to put the session's previous checkpoint dir back (mirrors
    # connected_components).
    if _restore_ckpt_dir is not None:
        try:
            edges.sparkSession.sparkContext.setCheckpointDir(_restore_ckpt_dir)
        except Exception:
            pass
    return ranks


def _pagerank_driver(
    e: DataFrame, n: int, iterations: int, damping: float
) -> DataFrame | None:
    """Driver replay of the power rounds for a gate-sized edge list
    (r13, the CC/BFS/SSSP precedent). The per-element arithmetic is
    the distributed plan's exactly — rank/outdeg (binary64 divide),
    base = (1−d)/n + (d·dangling)/n, then + d·in_mass, same
    association — and the only difference is the ORDER of the two
    float SUMS (per-dst in-mass, dangling), which Spark itself does
    not fix (partial aggregation order) and DuckDB's unrolled-CTE
    oracle already sums differently: the q104 contract compares at
    ROUND(rank, 8), which absorbs the summation-order ulps (verified
    by the rounded differential test and the oracle gate at three
    scales). Returns None on NULL endpoints — SQL null-join
    semantics stay with the distributed path."""
    import numpy as np

    # Arrow transfer, not collect(): half a million Row objects cost
    # seconds of pure Python; the columnar path is ~ms
    pdf = e.toPandas()
    if pdf["src"].isna().any() or pdf["dst"].isna().any():
        return None
    srcs = pdf["src"].to_numpy()
    dsts = pdf["dst"].to_numpy()
    ids_arr = np.unique(np.concatenate([srcs, dsts]))
    ids = [v.item() for v in ids_arr]
    src_i = np.searchsorted(ids_arr, srcs)
    dst_i = np.searchsorted(ids_arr, dsts)
    idx = {v: i for i, v in enumerate(ids)}
    outdeg = np.zeros(n, dtype=np.float64)
    np.add.at(outdeg, src_i, 1.0)
    ranks = np.full(n, 1.0 / n, dtype=np.float64)
    dangling_mask = outdeg == 0.0
    for _ in range(iterations):
        dangling = float(ranks[dangling_mask].sum())
        contrib = ranks[src_i] / outdeg[src_i]
        in_mass = np.zeros(n, dtype=np.float64)
        np.add.at(in_mass, dst_i, contrib)
        base = (1.0 - damping) / n + (damping * dangling) / float(n)
        ranks = base + damping * in_mass
    # id type == the distributed path's (the src∪dst union coercion)
    id_dt = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .schema[0]
        .dataType.simpleString()
    )
    return e.sparkSession.createDataFrame(
        [(v, float(ranks[idx[v]])) for v in ids],
        f"id {id_dt}, rank double",
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst"
                   ) -> DataFrame:
    """Exact triangle count via degree-ordered edge orientation (the
    MapReduce scheme of Suri & Vassilvitskii, WWW'11), computed
    edge-iterator style: orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, then for each
    oriented edge (u,w) count the common oriented out-neighbors
    |N⁺(u) ∩ N⁺(w)| — each triangle is counted exactly once, at the
    edge between its two lowest-ordered vertices.

    Orientation bounds every out-degree at O(sqrt(|E|)), so the
    per-edge intersection work is O(|E|^1.5) total — hub-safe. The
    intersection form never MATERIALIZES the length-2 path relation
    the naive three-join plan shuffles (O(|E|^1.5) rows through two
    Exchanges): adjacency arrays are built with one aggregate (output
    = |V| rows, Σ|array| = |E|) and joined back to the edge list by
    node id; the intersection itself is a codegen'd array expression.
    Measured 11.4 s → 4.9 s at sf0.1 on the 1.2M-edge part
    co-occurrence graph, identical counts.

    ``edges`` must be undirected-deduped (one row per pair, any
    orientation). Returns a 1-row DataFrame: ``n_nodes, n_edges,
    n_triangles``, computed EAGERLY — the oriented edge list is
    persisted for its three consumers and unpersisted the moment the
    row is collected, so repeated calls never accumulate cache.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # three consumers (degree union scans it twice, orientation
        # once) across several actions — without this the caller's
        # edge-construction plan re-executes per consumer
        .persist()
    )
    n_edges = e.count()  # materializes e; ed below is 1:1 with it
    # deg has THREE consumers (the node count and both orientation
    # broadcast builds) — materialize it once (r13; it was re-derived
    # from e per consumer). |V| rows of state, checkpoint-truncated.
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # |V| is exact and cheap off the checkpointed degree table; the
    # degree table is 16 bytes/node of payload, so broadcast it for
    # the two orientation joins whenever the MEASURED size fits —
    # they become pure map-side passes over e. Same rule guards the
    # adjacency joins below. Above the bound, plain joins (AQE still
    # upgrades at runtime when its stats allow) — never a forced
    # unbounded broadcast.
    n_nodes = deg.count()
    bcast_cap = 64 * 1024 * 1024

    def _maybe_bcast(df_side, est_bytes):
        return F.broadcast(df_side) if est_bytes < bcast_cap else df_side

    deg_bytes = 48 * n_nodes
    # orient low (deg, id) -> high (deg, id)
    ed = (
        e.join(
            _maybe_bcast(
                deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"),
                deg_bytes,
            ),
            "a",
        )
        .join(
            _maybe_bcast(
                deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"),
                deg_bytes,
            ),
            "b",
        )
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("o")
        )
        .select(F.col("o.u").alias("u"), F.col("o.w").alias("w"))
        .persist()
    )
    # adj feeds BOTH adjacency joins — one materialization (r13; the
    # two broadcast builds each re-ran the collect_list aggregate).
    # The eager checkpoint also materializes the persisted ed.
    adj = (
        ed.groupBy("u")
        .agg(F.collect_list("w").alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    # The adjacency joins attach a ~outdeg-length array to every edge
    # row; as shuffle joins they'd move O(|E|·avg_deg) longs twice,
    # but the adjacency table itself is only O(|E| + |V|) — broadcast
    # under the same measured-size rule (11.5 s → 2.5 s at sf0.1 on
    # the 1.2M-edge co-order graph for this phase alone).
    adj_bytes = 24 * n_edges + 48 * n_nodes

    def _adj(node_col: str, nbr_col: str):
        return _maybe_bcast(
            adj.withColumnRenamed("u", node_col).withColumnRenamed(
                "nbrs", nbr_col
            ),
            adj_bytes,
        )

    per_edge = (
        ed.join(_adj("_a", "na"), F.col("u") == F.col("_a"))
        .join(_adj("_b", "nb"), F.col("w") == F.col("_b"))
        .select(F.size(F.array_intersect("na", "nb")).alias("c"))
    )
    out = per_edge.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_triangles")
    ).select(
        F.lit(n_nodes).cast("bigint").alias("n_nodes"),
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
    )
    # the result is ONE row — compute eagerly so the persisted edge
    # list can be released immediately instead of pinning executor
    # storage until the caller's (arbitrary-later) action
    rows = out.collect()
    ed.unpersist(blocking=False)
    e.unpersist(blocking=False)
    return edges.sparkSession.createDataFrame(rows, out.schema)


# Driver fast-path gate shared by the iterative frontier operators
# (bfs_hops, sssp_weighted — the CC/BPE/PCA precedent): an edge list
# at or under this many rows (~64-96 MB of longs) labels faster with
# ONE collect + a Python frontier loop than with 2-3 fixed-overhead
# Spark jobs per round. The laws are exact-integer (min-hop /
# min-plus), so the replay is bit-identical by construction; above
# the gate the distributed rounds run unchanged. Tests force the
# distributed path by monkeypatching the gate to 0.
_GRAPH_DRIVER_MAX_EDGES = 1 << 22


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Multi-source BFS: (id, hops) = minimum hop distance from the
    source set, bounded by ``max_hops`` (unreached nodes are absent).

    Frontier-relaxation rounds — the scalable shape for huge sparse
    graphs (each round is one keyed equi-join frontier⋈edges plus one
    anti-join against the visited set; per-round volume tracks the
    frontier, not the graph). The edge projection is materialized
    ONCE up front (r13 — every round's join previously re-ran the
    caller's whole edge-construction plan), lineage is truncated with
    an eager localCheckpoint every round (the connected-components
    discipline — without it the plan doubles per iteration), and an
    empty frontier short-circuits. Integer hop labels — no float
    anywhere — so the result is trivially engine-exact (DuckDB:
    bounded recursive CTE with UNION dedup).

    Below ``_GRAPH_DRIVER_MAX_EDGES`` the rounds replay driver-side
    (r13): same layered expansion, same integer min-hop law, so the
    output rows are bit-identical; NULL endpoints/sources fall back
    to the distributed path (SQL null-join semantics differ from
    Python dict equality, so the replay refuses rather than guesses).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    dist = (
        sources.select(F.col(id_col).cast("long").alias(id_col))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    e = edges.select(
        F.col(src).cast("long").alias("_s"), F.col(dst).cast("long").alias("_d")
    ).localCheckpoint(eager=True)
    if e.count() + dist.count() <= _GRAPH_DRIVER_MAX_EDGES:
        erows = e.collect()
        srows = dist.collect()
        if all(
            r["_s"] is not None and r["_d"] is not None for r in erows
        ) and all(r[id_col] is not None for r in srows):
            adj: dict[int, list[int]] = {}
            for r in erows:
                adj.setdefault(int(r["_s"]), []).append(int(r["_d"]))
            hops: dict[int, int] = {int(r[id_col]): 0 for r in srows}
            frontier_ids = list(hops)
            for h in range(1, max_hops + 1):
                nxt_ids: list[int] = []
                for u in frontier_ids:
                    for v in adj.get(u, ()):
                        if v not in hops:
                            hops[v] = h
                            nxt_ids.append(v)
                if not nxt_ids:
                    break
                frontier_ids = nxt_ids
            return edges.sparkSession.createDataFrame(
                list(hops.items()), f"{id_col} long, hops int"
            )
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier[id_col] == e["_s"])
            .select(F.col("_d").alias(id_col))
            .distinct()
            .join(dist.select(id_col), id_col, "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def label_propagation(
    edges: DataFrame,
    iterations: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection: every node
    starts as its own community; each round it adopts the most
    frequent label among its neighbors (ties broken by SMALLEST
    label — the tie-break is what makes the algorithm, and therefore
    the oracle replay, deterministic; free-running LPA is famously
    run-order-dependent). Returns ``(id, label)`` after exactly
    ``iterations`` rounds over the SYMMETRIZED edge set.

    Per-round cost: one keyed join (edges ⋈ labels, keyed by node),
    one (node, label) aggregate, one per-node rank window bounded by
    the node's distinct neighbor-label count (≤ degree — hub-safe the
    same way triangle_count's orientation is). Lineage truncated with
    an eager localCheckpoint per round (the pagerank/bfs discipline).
    Fixed iteration count, not convergence polling: the number of
    driver round-trips is known up front, and the DuckDB oracle can
    unroll the identical rounds as chained CTEs.
    """
    e0 = edges.select(
        F.col(src).cast("long").alias("_s"), F.col(dst).cast("long").alias("_d")
    )
    und = (
        e0.unionByName(
            e0.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("_s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        msgs = und.join(labels, und["_d"] == labels["id"]).select(
            F.col("_s").alias("id"), "label"
        )
        counts = msgs.groupBy("id", "label").agg(
            F.count(F.lit(1)).alias("_c")
        )
        w = Window.partitionBy("id").orderBy(
            F.desc("_c"), F.asc("label")
        )
        pick = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", F.col("label").alias("_new"))
        )
        labels = (
            labels.join(pick, "id", "left")
            .select(
                "id", F.coalesce("_new", "label").alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels


def sssp_weighted(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    id_col: str = "id",
) -> DataFrame:
    """Single/multi-source shortest paths with non-negative INTEGER
    edge weights: synchronous Bellman-Ford relaxation,

        dist_{k+1}(v) = min(dist_k(v), min_u dist_k(u) + w(u,v)),

    run for exactly ``rounds`` rounds (distances are hop-bounded by
    the round count — the fixed-iteration contract every iterative
    operator here shares, so the oracle can unroll the rounds).

    Per round: one keyed equi-join (dist ⋈ edges) + one MIN
    aggregate over (old dist ∪ candidates) — node-bounded state,
    min-plus arithmetic on BIGINTs (no float anywhere, trivially
    engine-exact). Lineage truncated per round with an eager
    localCheckpoint (the bfs/pagerank discipline). Dijkstra's
    priority queue is inherently sequential; synchronous relaxation
    is the published distributed form (Pregel/GraphX SSSP).
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    dist = (
        sources.select(F.col(id_col).cast("long").alias(id_col))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    # materialize the edge projection once (r13): each round's join
    # previously re-ran the caller's whole edge-construction plan
    e = edges.select(
        F.col(src).cast("long").alias("_s"),
        F.col(dst).cast("long").alias("_d"),
        F.col(weight).cast("bigint").alias("_w"),
    ).localCheckpoint(eager=True)
    if e.count() + dist.count() <= _GRAPH_DRIVER_MAX_EDGES:
        # driver replay (r13, the bfs_hops/CC pattern): min-plus on
        # Python ints IS the BIGINT law — bit-identical rounds; NULL
        # endpoints/weights/sources use the distributed path instead
        # (SQL null semantics: a NULL never joins, a NULL sum is
        # skipped by MIN — not worth mirroring)
        erows = e.collect()
        srows = dist.collect()
        if all(
            r["_s"] is not None
            and r["_d"] is not None
            and r["_w"] is not None
            for r in erows
        ) and all(r[id_col] is not None for r in srows):
            adj: dict[int, list[tuple[int, int]]] = {}
            for r in erows:
                adj.setdefault(int(r["_s"]), []).append(
                    (int(r["_d"]), int(r["_w"]))
                )
            d: dict[int, int] = {int(r[id_col]): 0 for r in srows}
            for _ in range(rounds):
                nxt = dict(d)
                for u, du in d.items():
                    for v, w_uv in adj.get(u, ()):
                        cand_d = du + w_uv
                        if v not in nxt or cand_d < nxt[v]:
                            nxt[v] = cand_d
                d = nxt
            return edges.sparkSession.createDataFrame(
                list(d.items()), f"{id_col} long, dist bigint"
            )
    for _ in range(rounds):
        cand = dist.join(e, dist[id_col] == e["_s"]).select(
            F.col("_d").alias(id_col),
            (F.col("dist") + F.col("_w")).alias("dist"),
        )
        dist = (
            dist.unionByName(cand)
            .groupBy(id_col)
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def local_clustering(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient
    lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the node-level
    companion to :func:`triangle_count` (which only totals).

    Same degree-ordered orientation (Suri & Vassilvitskii): every
    triangle appears exactly once as (u, w, x) with x a common
    oriented out-neighbor of the edge (u, w), and CREDITS ALL THREE
    endpoints. Unlike the count-only operator this one must
    materialize the triangle list (that's what per-node credit
    means), but orientation still bounds it at O(|E|^1.5) rows —
    hub-safe. Integer counts everywhere; lcc is one final division.
    NULL lcc for deg < 2.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    try:
        # The triangle_count treatment (r12): measured-size broadcast
        # of the degree and adjacency tables (they are O(|V|) and
        # O(|E|+|V|) while the edge relation they join is the big
        # side), a persisted oriented edge list for its three
        # consumers, and ONE credit pass. Before: the adjacency joins
        # shuffled ed twice, and the three credit branches replayed
        # the whole intersect join three times — 15.6 -> ~4 s noop at
        # sf0.1 on the co-order graph, identical rows.
        n_edges = e.count()
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
            .persist()
        )
        n_nodes = deg.count()
        # 64 MB cap with DELIBERATELY conservative per-row byte
        # estimates below (48 B/node row, 24 B/edge entry — raw
        # UnsafeRow payloads; the built hash relation / collect_list
        # arrays carry object overhead that can multiply these
        # severalfold on skewed graphs). The estimates underestimate
        # the payload, not the cap: a forced broadcast near the cap
        # may really occupy a few hundred MB in executor memory,
        # which the cap's 64 MB margin (vs the 8 GB broadcast hard
        # limit) deliberately absorbs.
        bcast_cap = 64 * 1024 * 1024

        def _maybe_bcast(df_side, est_bytes):
            return (
                F.broadcast(df_side) if est_bytes < bcast_cap else df_side
            )

        deg_bytes = 48 * n_nodes
        da = deg.select(
            F.col("v").alias("a"), F.col("deg").alias("_dega")
        )
        db = deg.select(
            F.col("v").alias("b"), F.col("deg").alias("_degb")
        )
        lower_is_a = (F.col("_dega") < F.col("_degb")) | (
            (F.col("_dega") == F.col("_degb")) & (F.col("a") < F.col("b"))
        )
        ed = (
            e.join(_maybe_bcast(da, deg_bytes), "a")
            .join(_maybe_bcast(db, deg_bytes), "b")
            .select(
                F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
                F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("w"),
            )
            .persist()
        )
        adj = ed.groupBy(F.col("u").alias("v")).agg(
            F.sort_array(F.collect_list("w")).alias("nb")
        )
        adj_bytes = 24 * n_edges + 48 * n_nodes
        j = (
            ed.join(
                _maybe_bcast(
                    adj.select(F.col("v").alias("u"), F.col("nb").alias("_nu")),
                    adj_bytes,
                ),
                "u",
            )
            .join(
                _maybe_bcast(
                    adj.select(F.col("v").alias("w"), F.col("nb").alias("_nw")),
                    adj_bytes,
                ),
                "w",
                "left",
            )
            .select(
                "u",
                "w",
                F.array_intersect(
                    F.col("_nu"), F.coalesce(F.col("_nw"), F.array())
                ).alias("_common"),
            )
            .filter(F.size("_common") > 0)
        )
        # one credit pass: each triangle row credits u, w, and every
        # common neighbor via a single explode — the same multiset
        # the three union branches produced, without replaying j
        t_sz = F.size("_common").cast("bigint")
        credits = (
            j.select(
                F.explode(
                    F.concat(
                        F.array(
                            F.struct(
                                F.col("u").alias("v"), t_sz.alias("t")
                            ),
                            F.struct(
                                F.col("w").alias("v"), t_sz.alias("t")
                            ),
                        ),
                        F.transform(
                            "_common",
                            lambda x: F.struct(
                                x.alias("v"),
                                F.lit(1).cast("bigint").alias("t"),
                            ),
                        ),
                    )
                ).alias("c")
            )
            .select(F.col("c.v").alias("v"), F.col("c.t").alias("t"))
            .groupBy("v")
            .agg(F.sum("t").cast("bigint").alias("triangles"))
        )
        d = F.col("deg").cast("double")
        out = (
            deg.join(credits, "v", "left")
            .select(
                F.col("v").alias("id"),
                "deg",
                F.coalesce(F.col("triangles"), F.lit(0))
                .cast("bigint")
                .alias("triangles"),
                F.round(
                    F.when(
                        F.col("deg") >= 2,
                        2.0
                        * F.coalesce(F.col("triangles"), F.lit(0)).cast("double")
                        / (d * (d - 1.0)),
                    ),
                    6,
                )
                .cast("double")
                .alias("lcc"),
            )
        )
        # eager checkpoint so the persisted inputs can release now
        out = out.localCheckpoint(eager=True)
        ed.unpersist()
        deg.unpersist()
    finally:
        e.unpersist()
    return out


def hits(
    edges: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a directed edge
    list: ``(id, hub, authority)`` after a fixed number of mutual-
    reinforcement rounds — a(v) ∝ Σ_{u→v} h(u), h(u) ∝ Σ_{u→v} a(v),
    each side L2-normalized per round.

    Corpus-scale float discipline: per-node sums use QUANTIZE-THEN-
    DECIMAL-SUM (scores are floor-quantized to 9 digits and summed as
    exact DECIMAL — associative, so deterministic under any
    partitioning and any in-degree, where a sorted fold would
    materialize per-node neighbor lists). Norms go through the same
    reduction. Node-sized state stays distributed (it scales with
    the graph); lineage is checkpoint-truncated per round.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(
        F.col(src).cast("long").alias("_s"),
        F.col(dst).cast("long").alias("_d"),
    ).distinct().persist()
    fq = lambda c: F.floor(c * F.lit(1e9)).cast("double") / F.lit(1e9)  # noqa: E731
    dsum = lambda c: F.sum(c.cast("decimal(28,9)")).cast("double")  # noqa: E731
    hubs = e.select(F.col("_s").alias("id")).distinct().withColumn(
        "h", F.lit(1.0)
    ).localCheckpoint(eager=True)
    auths = None
    try:
        for _ in range(int(iters)):
            araw = (
                e.join(hubs, e["_s"] == hubs["id"])
                .groupBy(F.col("_d").alias("id"))
                .agg(dsum(F.col("h")).alias("_ar"))
            )
            an = araw.agg(
                fq(F.sqrt(dsum(fq(F.col("_ar") * F.col("_ar"))))).alias("_n")
            )
            auths = (
                araw.crossJoin(F.broadcast(an))
                .select("id", fq(F.col("_ar") / F.col("_n")).alias("a"))
                .localCheckpoint(eager=True)
            )
            hraw = (
                e.join(auths, e["_d"] == auths["id"])
                .groupBy(F.col("_s").alias("id"))
                .agg(dsum(F.col("a")).alias("_hr"))
            )
            hn = hraw.agg(
                fq(F.sqrt(dsum(fq(F.col("_hr") * F.col("_hr"))))).alias("_n")
            )
            hubs = (
                hraw.crossJoin(F.broadcast(hn))
                .select("id", fq(F.col("_hr") / F.col("_n")).alias("h"))
                .localCheckpoint(eager=True)
            )
        out = hubs.join(auths, "id", "full").select(
            "id",
            F.coalesce(F.col("h"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("a"), F.lit(0.0)).alias("authority"),
        ).localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return out
