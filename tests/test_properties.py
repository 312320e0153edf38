"""Property-based tests (hypothesis) — the §5 upgrade over the
reference's example-only test style.

The flagship property: the safe_eval->Column compiler agrees with
plain Python evaluation of the same expression over the same rows,
for randomized expressions drawn from the whitelisted grammar.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aden_hive_fork_spark.canonical import canon_rows, result_hash
from aden_hive_fork_spark.functions import compile_expr
from aden_hive_fork_spark.guard import SqlGuardError, ensure_read_only

# ---------------------------------------------------------------------------
# canonical hashing: order-insensitive, value-sensitive
# ---------------------------------------------------------------------------
row_strategy = st.fixed_dictionaries(
    {
        "a": st.one_of(st.none(), st.integers(-10**9, 10**9)),
        "b": st.one_of(st.none(), st.text(max_size=12)),
        "c": st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)),
    }
)


@given(st.lists(row_strategy, max_size=20), st.randoms())
@settings(max_examples=60, deadline=None)
def test_hash_order_insensitive(rows, rnd):
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    assert result_hash(rows) == result_hash(shuffled)


@given(st.lists(row_strategy, min_size=1, max_size=20))
@settings(max_examples=60, deadline=None)
def test_hash_value_sensitive(rows):
    mutated = [dict(r) for r in rows]
    old = mutated[0]["a"]
    mutated[0]["a"] = (old or 0) + 1
    assert result_hash(rows) != result_hash(mutated)


# ---------------------------------------------------------------------------
# guard: SELECT wrappers never pass write statements
# ---------------------------------------------------------------------------
WRITES = ["INSERT INTO t VALUES (1)", "DELETE FROM t", "DROP TABLE t",
          "UPDATE t SET x=1", "CREATE TABLE t(x INT)"]


@given(st.sampled_from(WRITES), st.text(alphabet=" \t\n", max_size=5))
@settings(max_examples=40, deadline=None)
def test_guard_rejects_writes_with_whitespace(stmt, pad):
    with pytest.raises(SqlGuardError):
        ensure_read_only(pad + stmt + pad)


@given(st.text(max_size=30))
@settings(max_examples=60, deadline=None)
def test_guard_allows_keywords_inside_literals(payload):
    # any payload inside a single-quoted literal must be irrelevant
    safe = payload.replace("'", "''").replace("\\", "")
    ensure_read_only(f"SELECT '{safe}' AS x")


# ---------------------------------------------------------------------------
# compiler vs python eval (differential testing)
# ---------------------------------------------------------------------------
# grammar-restricted random expressions over int columns x, y
_int_expr = st.deferred(
    lambda: st.one_of(
        st.sampled_from(["x", "y"]),
        st.integers(-5, 5).map(str),
        st.tuples(_int_expr, st.sampled_from(["+", "-", "*"]), _int_expr).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(_int_expr, _int_expr).map(lambda t: f"min({t[0]}, {t[1]})"),
        st.tuples(_int_expr, _int_expr).map(lambda t: f"max({t[0]}, {t[1]})"),
        st.tuples(_int_expr).map(lambda t: f"abs({t[0]})"),
    )
)
_bool_expr = st.one_of(
    st.tuples(_int_expr, st.sampled_from(["<", "<=", ">", ">=", "==", "!="]), _int_expr).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    ),
)
_expr = st.one_of(
    _int_expr,
    _bool_expr,
    st.tuples(_bool_expr, st.sampled_from(["and", "or"]), _bool_expr).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    ),
    st.tuples(_bool_expr, _int_expr, _int_expr).map(
        lambda t: f"({t[1]} if {t[0]} else {t[2]})"
    ),
)


@pytest.fixture(scope="module")
def xy_df(spark):
    rows = [(x, y) for x in (-3, -1, 0, 2, 7) for y in (-2, 0, 1, 5)]
    return spark.createDataFrame(rows, "x long, y long"), rows


@given(expr=_expr)
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_compiler_matches_python_eval(xy_df, expr):
    df, rows = xy_df
    got = [r.v for r in df.select(compile_expr(expr, df.schema).alias("v")).collect()]
    expected = [eval(expr, {"__builtins__": {}}, # noqa: S307 - grammar-restricted
                     {"x": x, "y": y, "min": min, "max": max, "abs": abs})
                for x, y in rows]
    for g, e in zip(got, expected):
        if isinstance(e, bool):
            assert bool(g) == e, expr
        else:
            assert g == e, expr


# ---------------------------------------------------------------------------
# dialect shim: literals are inviolable, rewrites are targeted
# ---------------------------------------------------------------------------
_DUCK_NAMES = ["string_split", "list_sort", "list_distinct", "list_contains",
               "array_to_string", "regexp_matches", "epoch_ms"]


@given(
    st.text(
        alphabet=st.characters(blacklist_characters="'\"", min_codepoint=32, max_codepoint=126),
        max_size=40,
    )
)
@settings(max_examples=80)
def test_dialect_preserves_string_literals(payload):
    from aden_hive_fork_spark.functions.dialect import duckdb_to_spark_sql as d2s

    lit = "'" + payload.replace("'", "''") + "'"
    out = d2s(f"SELECT {lit} FROM t")
    assert lit in out  # the literal survives byte-identical


@given(st.sampled_from(_DUCK_NAMES), st.sampled_from(_DUCK_NAMES))
@settings(max_examples=40)
def test_dialect_rewrite_is_idempotent(f1, f2):
    from aden_hive_fork_spark.functions.dialect import duckdb_to_spark_sql as d2s

    q = f"SELECT {f1}(a, 'x'), {f2}(b) FROM t WHERE c // 2 = 1"
    once = d2s(q)
    assert d2s(once) == once  # already-translated SQL is a fixed point
    assert f1 not in once and f2 not in once


# ---------------------------------------------------------------------------
# canonical hashing properties (the oracle gate's comparator — ADVICE r1
# flagged a cell-boundary collision class; these pin the fixed contract)
# ---------------------------------------------------------------------------
def test_canonical_hash_order_insensitive():
    from aden_hive_fork_spark.canonical import result_hash

    rows_a = [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]
    rows_b = [{"y": "b", "x": 2}, {"y": "a", "x": 1}]  # row + key order permuted
    assert result_hash(rows_a) == result_hash(rows_b)


def test_canonical_hash_cell_boundaries_distinct():
    from aden_hive_fork_spark.canonical import result_hash

    # ('ab','c') must not collide with ('a','bc') — the class the
    # CELL_SEP delimiter exists to prevent
    assert result_hash([{"a": "ab", "b": "c"}]) != result_hash([{"a": "a", "b": "bc"}])


def test_canonical_hash_properties_random():
    import random

    from aden_hive_fork_spark.canonical import canon_rows, result_hash

    rng = random.Random(7)
    for _ in range(50):
        n_cols = rng.randint(1, 4)
        cols = [f"c{i}" for i in range(n_cols)]
        rows = [
            {c: rng.choice([None, rng.randint(-5, 5), "x" * rng.randint(0, 3), 1.5]) for c in cols}
            for _ in range(rng.randint(0, 6))
        ]
        shuffled = list(rows)
        rng.shuffle(shuffled)
        shuffled = [dict(reversed(list(r.items()))) for r in shuffled]
        assert result_hash(rows) == result_hash(shuffled)
        if rows:
            # mutating any single cell changes the hash
            victim = [dict(r) for r in rows]
            victim[0][cols[0]] = "MUTATED"
            assert result_hash(victim) != result_hash(rows)
        assert canon_rows(rows) == sorted(canon_rows(rows))
