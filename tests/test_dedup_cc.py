"""Round-12: connected_components driver union-find fast path.

Small pair tables (<= _CC_DRIVER_MAX_EDGES canonical edges) are
labeled on the driver with one collect + union-find instead of 3-5
distributed large-star/small-star rounds. These tests pin that the
fast path is BIT-IDENTICAL to the distributed path — same (id, comp)
rows, same min-id label law — by running both on the same graphs
(the distributed path forced via the module gate)."""

from aden_hive_fork_spark.operators import dedup as dedup_mod
from aden_hive_fork_spark.operators.dedup import connected_components


def _labels(df, max_iter=25, checkpoint_dir=None):
    return {
        r.id: r.comp
        for r in connected_components(
            df, max_iter=max_iter, checkpoint_dir=checkpoint_dir
        ).collect()
    }


def test_driver_fast_path_equals_distributed(spark, monkeypatch):
    """fast path (gate at default) == distributed path (gate forced
    to 0) on seeded random graphs, a chain, and self-loops."""
    import random

    rng = random.Random(12)
    cases = []
    for n, m in [(30, 15), (60, 40), (80, 120), (200, 300)]:
        cases.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        )
    cases.append([(i, i + 1) for i in range(40)])  # chain
    cases.append([(5, 5), (9, 2)])  # self-loop
    from concurrent.futures import ThreadPoolExecutor

    dfs = [
        spark.createDataFrame(edges, "id_a long, id_b long")
        for edges in cases
    ]
    # each case is an independent Spark chain — overlap them (r13;
    # this test was 18 s serial, all fixed job overhead)
    with ThreadPoolExecutor(max_workers=4) as pool:
        fasts = list(pool.map(_labels, dfs))
    monkeypatch.setattr(dedup_mod, "_CC_DRIVER_MAX_EDGES", 0)
    with ThreadPoolExecutor(max_workers=4) as pool:
        slows = list(pool.map(_labels, dfs))
    monkeypatch.undo()
    for fast, slow in zip(fasts, slows):
        assert fast == slow
        # label law: every component's label is its minimum node id
        for node, comp in fast.items():
            assert comp <= node
            assert fast[comp] == comp


def test_fast_path_schema_matches_distributed(spark, monkeypatch):
    """Column names AND types are identical across both paths."""
    df = spark.createDataFrame([(3, 1), (7, 9)], "id_a long, id_b long")
    fast = connected_components(df)
    monkeypatch.setattr(dedup_mod, "_CC_DRIVER_MAX_EDGES", 0)
    slow = connected_components(df)
    assert [(f.name, f.dataType) for f in fast.schema.fields] == [
        (f.name, f.dataType) for f in slow.schema.fields
    ]


def test_fast_path_empty_input(spark):
    """Zero edges -> zero label rows, no crash (count()==0 takes the
    fast path)."""
    df = spark.createDataFrame([], "id_a long, id_b long")
    out = connected_components(df)
    assert out.count() == 0
    assert out.columns == ["id", "comp"]


def test_fast_path_restores_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir callers get the session checkpoint dir restored
    even when the fast path returns early (the canon projection was
    already reliably checkpointed before the gate)."""
    import os

    ckdir = os.path.join(tmp_path, "cc_ck")
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    got = _labels(df, checkpoint_dir=ckdir)
    want = _labels(df)
    assert got == want
    assert any(os.scandir(ckdir))  # canon materialized reliably
