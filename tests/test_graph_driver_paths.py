"""Round-13: bfs_hops / sssp_weighted driver fast paths.

Edge lists at or under _GRAPH_DRIVER_MAX_EDGES collect to the driver
and the frontier rounds replay in Python — exact-integer laws
(min-hop / min-plus BIGINT), so the replay must be BIT-IDENTICAL to
the distributed rounds. These tests pin that on seeded random
graphs, chains, unreachable nodes, and the null-edge fallback (the
distributed path forced via the module gate, the CC test pattern)."""

import random

from aden_hive_fork_spark.operators import graph_rank as gr
from aden_hive_fork_spark.operators.graph_rank import bfs_hops, sssp_weighted


def _rand_graph(seed, n, m, weighted=False):
    rng = random.Random(seed)
    if weighted:
        return [
            (rng.randrange(n), rng.randrange(n), rng.randrange(0, 9))
            for _ in range(m)
        ]
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def test_bfs_driver_equals_distributed(spark, monkeypatch):
    cases = [
        _rand_graph(7, 25, 40),
        [(i, i + 1) for i in range(30)],  # chain
        [(1, 2), (2, 1), (5, 5)],  # cycle + self-loop + unreachable 9
    ]
    for edges in cases:
        e = spark.createDataFrame(edges, "src long, dst long")
        seeds = spark.createDataFrame(
            [(r,) for r in {edges[0][0], 9}], "id long"
        )
        for hops in (0, 3):
            fast = {
                r["id"]: r["hops"]
                for r in bfs_hops(e, seeds, max_hops=hops).collect()
            }
            monkeypatch.setattr(gr, "_GRAPH_DRIVER_MAX_EDGES", 0)
            slow = {
                r["id"]: r["hops"]
                for r in bfs_hops(e, seeds, max_hops=hops).collect()
            }
            monkeypatch.undo()
            assert fast == slow, (edges, hops)


def test_sssp_driver_equals_distributed(spark, monkeypatch):
    cases = [
        _rand_graph(3, 25, 60, weighted=True),
        [(i, i + 1, 2) for i in range(25)],  # weighted chain
        [(1, 2, 0), (2, 3, 0), (3, 1, 5)],  # zero weights + cycle
    ]
    for edges in cases:
        e = spark.createDataFrame(edges, "src long, dst long, w long")
        seeds = spark.createDataFrame([(edges[0][0],), (7,)], "id long")
        for rounds in (0, 3):
            fast = {
                r["id"]: r["dist"]
                for r in sssp_weighted(e, seeds, rounds=rounds).collect()
            }
            monkeypatch.setattr(gr, "_GRAPH_DRIVER_MAX_EDGES", 0)
            slow = {
                r["id"]: r["dist"]
                for r in sssp_weighted(e, seeds, rounds=rounds).collect()
            }
            monkeypatch.undo()
            assert fast == slow, (edges, rounds)


def test_schemas_match_distributed(spark, monkeypatch):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    ew = spark.createDataFrame([(1, 2, 3)], "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "id long")
    fast_b = bfs_hops(e, seeds, max_hops=1)
    fast_s = sssp_weighted(ew, seeds, rounds=1)
    monkeypatch.setattr(gr, "_GRAPH_DRIVER_MAX_EDGES", 0)
    slow_b = bfs_hops(e, seeds, max_hops=1)
    slow_s = sssp_weighted(ew, seeds, rounds=1)
    for fast, slow in [(fast_b, slow_b), (fast_s, slow_s)]:
        assert [(f.name, f.dataType) for f in fast.schema.fields] == [
            (f.name, f.dataType) for f in slow.schema.fields
        ]


def test_null_endpoints_fall_back_to_distributed(spark):
    """A NULL edge endpoint must not be driver-replayed (SQL null-join
    semantics) — the operator silently takes the distributed path and
    the NULL row never expands the frontier."""
    e = spark.createDataFrame(
        [(1, 2), (2, None), (None, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {r["id"]: r["hops"] for r in bfs_hops(e, seeds, 3).collect()}
    # 1 -> 2 -> NULL (a labeled null node appears once via distinct)
    assert got[1] == 0 and got[2] == 1
    assert 3 not in got  # NULL src never joins
    ew = spark.createDataFrame(
        [(1, 2, None), (1, 2, 4)], "src long, dst long, w long"
    )
    gotd = {
        r["id"]: r["dist"]
        for r in sssp_weighted(ew, seeds, rounds=2).collect()
    }
    assert gotd[1] == 0 and gotd[2] == 4  # NULL weight skipped by MIN


def test_pagerank_driver_equals_distributed_at_contract_precision(
    spark, monkeypatch
):
    """r13: the pagerank driver replay uses the distributed plan's
    per-element float arithmetic; only the two SUM orders differ
    (in-mass, dangling) — an order Spark itself does not fix across
    partitions and the DuckDB oracle already sums differently. The
    operator's contract surface is ROUND(rank, 8) (q104), so the pin
    compares there, on graphs with hubs, dangling nodes, and
    rank-concentrating chains."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(5)
    cases = [
        [(rng.randrange(40), rng.randrange(40)) for _ in range(120)],
        [(i, 39) for i in range(39)],  # a pure hub + dangling sink
        [(i, i + 1) for i in range(30)],  # chain
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")

        def ranks():
            return {
                r["id"]: r["rank"]
                for r in gr.pagerank(df, iterations=5, damping=0.85)
                .select("id", F.round("rank", 8).alias("rank"))
                .collect()
            }

        fast = ranks()
        monkeypatch.setattr(gr, "_GRAPH_DRIVER_MAX_EDGES", 0)
        slow = ranks()
        monkeypatch.undo()
        assert fast == slow, edges
