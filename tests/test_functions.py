"""Tests for the scalar-function surface: safe_eval compiler, JSON
repair, weighted scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.functions import (
    CompileError,
    compile_expr,
    find_json_object,
    repair_json,
    weighted_score,
)


@pytest.fixture(scope="module")
def ctx(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "success", ["a", "b"], {"k": "v", "n": "5"}, (3, "x")),
            (2, -4.5, "failure", ["c"], {"k": "w"}, (7, "y")),
            (3, None, "success", [], {}, (0, "z")),
        ],
        "id long, score double, status string, tags array<string>, "
        "meta map<string,string>, nested struct<a:int, b:string>",
    )
    return df


def _eval(ctx, expr):
    col = compile_expr(expr, ctx.schema)
    return [r.v for r in ctx.select(col.alias("v")).orderBy("id").collect()]


def test_arithmetic_and_comparison(ctx):
    assert _eval(ctx, "id * 2 + 1") == [3, 5, 7]
    assert _eval(ctx, "score > 0") == [True, False, None]
    assert _eval(ctx, "1 <= id < 3") == [True, True, False]  # chained
    assert _eval(ctx, "id ** 2") == [1.0, 4.0, 9.0]
    assert _eval(ctx, "7 // id") == [7.0, 3.0, 2.0]


def test_bool_and_ternary(ctx):
    assert _eval(ctx, "status == 'success' and id < 3") == [True, False, False]
    assert _eval(ctx, "'big' if id >= 2 else 'small'") == ["small", "big", "big"]
    assert _eval(ctx, "not (id == 2)") == [True, False, True]


def test_in_operator(ctx):
    assert _eval(ctx, "status in ['success', 'pending']") == [True, False, True]
    assert _eval(ctx, "'a' in tags") == [True, False, False]
    assert _eval(ctx, "'ail' in status") == [False, True, False]  # substring
    assert _eval(ctx, "'k' in meta") == [True, True, False]  # dict keys
    assert _eval(ctx, "id not in [1, 3]") == [False, True, False]


def test_functions(ctx):
    assert _eval(ctx, "len(tags)") == [2, 1, 0]
    assert _eval(ctx, "len(status)") == [7, 7, 7]
    assert _eval(ctx, "abs(score)") == [10.0, 4.5, None]
    assert _eval(ctx, "round(score / 3, 2)") == [3.33, -1.5, None]
    assert _eval(ctx, "min(id, 2)") == [1, 2, 2]
    assert _eval(ctx, "max(id, 2)") == [2, 2, 3]
    assert _eval(ctx, "int(score)") == [10, -4, None]
    assert _eval(ctx, "str(id)") == ["1", "2", "3"]


def test_methods_and_access(ctx):
    assert _eval(ctx, "status.upper()") == ["SUCCESS", "FAILURE", "SUCCESS"]
    assert _eval(ctx, "meta.get('k', 'missing')") == ["v", "w", "missing"]
    assert _eval(ctx, "meta.get('n')") == ["5", None, None]
    assert _eval(ctx, "nested.a + 1") == [4, 8, 1]
    assert _eval(ctx, "nested['b']") == ["x", "y", "z"]
    assert _eval(ctx, "tags[0]") == ["a", "c", None]
    assert _eval(ctx, "status.split('c')") == [
        ["su", "", "ess"], ["failure"], ["su", "", "ess"]
    ]


def test_is_none(ctx):
    assert _eval(ctx, "score is None") == [False, False, True]
    assert _eval(ctx, "score is not None") == [True, True, False]


def test_rejects_disallowed():
    for bad in [
        "__import__('os')",
        "open('/etc/passwd')",
        "x.delete()",
        "lambda: 1",
        "[x for x in y]",
        "x := 1",
        "f'{x}'",
    ]:
        with pytest.raises(CompileError):
            compile_expr(bad)


def test_edge_condition_realistic(ctx):
    # a realistic reference-style edge condition
    expr = "status == 'success' and score is not None and score > 5 and 'a' in tags"
    assert _eval(ctx, expr) == [True, False, False]


def test_find_json_object():
    assert find_json_object('junk {"a": {"b": 1}} tail') == '{"a": {"b": 1}}'
    assert find_json_object('{"s": "with } brace"}') == '{"s": "with } brace"}'
    assert find_json_object("no json here") is None
    assert find_json_object('broken { "a": 1 then {"b": 2}') == '{"b": 2}'


def test_repair_json():
    assert repair_json('prefix {"a": 1,} suffix') == {"a": 1}
    assert repair_json('{"a": "line\nbreak"}') == {"a": "line\nbreak"}
    assert repair_json("{'a': True, \"b\": None}") == {"a": True, "b": None}
    assert repair_json("nothing") is None


def test_repair_json_udf(spark):
    from aden_hive_fork_spark.functions.json_repair import repair_json_udf

    df = spark.createDataFrame(
        [("ok {\"x\": 1}",), ("garbage",), (None,)], "raw string"
    )
    out = [r.j for r in df.select(repair_json_udf()(F.col("raw")).alias("j")).collect()]
    assert out == ['{"x": 1}', None, None]


def test_weighted_score(spark):
    df = spark.createDataFrame(
        [(80.0, 60.0), (100.0, None), (None, None)], "a double, b double"
    )
    out = [r.s for r in df.select(weighted_score({"a": 2, "b": 1}).alias("s")).collect()]
    assert out[0] == pytest.approx(73.33)
    assert out[1] == 100.0  # b drops out of numerator AND denominator
    assert out[2] is None


def test_tool_registry(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from aden_hive_fork_spark.functions.registry import RegistryError, ToolRegistry

    reg = ToolRegistry()
    reg.register("double_it", lambda c: (F.col(c) * 2), kind="expr")
    reg.register("shout", lambda s: s.str.upper(), kind="pandas", return_type="string")
    reg.allow("node_a", ["double_it"])

    df = spark.createDataFrame([(3, "hi")], "x long, s string")
    assert df.select(reg.get("double_it")("x").alias("v")).first().v == 6
    assert df.select(reg.get("shout")(F.col("s")).alias("v")).first().v == "HI"
    # allowlist enforcement: unknown node = deny-all; wrong tool denied
    reg.get("double_it", node="node_a")
    import pytest as _pt
    with _pt.raises(RegistryError):
        reg.get("shout", node="node_a")
    with _pt.raises(RegistryError):
        reg.get("double_it", node="node_b")
    with _pt.raises(RegistryError):
        reg.get("nope")
    # SQL exposure
    reg.register_sql(spark, "shout")
    assert spark.sql("SELECT shout('ok') AS v").first().v == "OK"
    # listing
    assert [t["name"] for t in reg.list_tools()] == ["double_it", "shout"]


def test_enforce_schema(spark):
    from aden_hive_fork_spark.functions.validate import enforce_schema

    df = spark.createDataFrame(
        [
            ("1", "2.5", "ok"),        # valid
            ("x", "3.0", "bad_int"),   # uncastable a
            (None, "1.0", "null_a"),   # required null
            ("4", None, "null_b_ok"),  # b not required -> valid
        ],
        "a string, b string, note string",
    )
    valid, rejects = enforce_schema(df, "a long, b double, note string", required=["a"])
    got = {r.note: (r.a, r.b) for r in valid.collect()}
    assert got == {"ok": (1, 2.5), "null_b_ok": (4, None)}
    rej = {r.note: list(r._reasons) for r in rejects.collect()}
    assert rej == {"bad_int": ["uncastable:a"], "null_a": ["null:a"]}
    # missing required column
    v2, r2 = enforce_schema(df.select("b", "note"), "a long, b double, note string",
                            required=["a"])
    assert v2.count() == 0 and r2.count() == 4


# ---------------------------------------------------------------------------
# DuckDB -> Spark dialect shim
# ---------------------------------------------------------------------------
def test_dialect_rewrites():
    from aden_hive_fork_spark.functions.dialect import duckdb_to_spark_sql as d2s

    assert d2s("SELECT string_split(x, ' ') FROM t") == "SELECT split(x, ' ') FROM t"
    assert d2s("SELECT list_sort(list_distinct(a))") == (
        "SELECT array_sort(array_distinct(a))"
    )
    assert d2s("SELECT array_to_string(a, ',')") == "SELECT array_join(a, ',')"
    assert d2s("SELECT date_diff('day', a, b)") == "SELECT timestampdiff(day, a, b)"
    assert d2s("SELECT datediff('hour', a, b)") == "SELECT timestampdiff(hour, a, b)"
    assert d2s("SELECT x // 7") == "SELECT x  div  7"
    assert d2s("SELECT * EXCLUDE (secret) FROM t") == "SELECT * EXCEPT(secret) FROM t"
    assert d2s("SELECT regexp_matches(s, 'a+')") == "SELECT regexp_like(s, 'a+')"
    # literals and quoted identifiers are untouched
    assert d2s("SELECT 'string_split(x) // y'") == "SELECT 'string_split(x) // y'"
    assert d2s('SELECT "list_sort" FROM t') == 'SELECT "list_sort" FROM t'
    assert d2s("SELECT 'it''s // fine'") == "SELECT 'it''s // fine'"


def test_dialect_end_to_end_matches_duckdb(spark, duck):
    """The same DuckDB-dialect query text, run on DuckDB natively and
    on Spark through the shim, produces identical results."""
    import duckdb

    from aden_hive_fork_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    q = """
      SELECT o_orderpriority,
        CAST(o_orderkey // 100 AS BIGINT) AS bucket,
        len(o_orderpriority) AS plen
      FROM orders
      WHERE o_orderkey <= 50 AND regexp_matches(o_orderpriority, '^[0-9]-')
      ORDER BY o_orderkey ASC
    """
    # len() is polymorphic in DuckDB and deliberately unmapped; use a
    # string arg where both engines agree (Spark resolves len->length)
    res = eng.sql(q, dialect="duckdb")
    assert res["success"], res.get("error")
    d = duck.execute(q).fetchall()
    s = [(r["o_orderpriority"], r["bucket"], r["plen"]) for r in res["rows"]]
    assert s == d


def test_dialect_tokenizer_query(spark, duck):
    from aden_hive_fork_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    q = """
      SELECT doc_id,
        array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), '|') AS vocab
      FROM documents
      WHERE doc_id < 20
      ORDER BY doc_id ASC
    """
    res = eng.sql(q, dialect="duckdb")
    assert res["success"], res.get("error")
    d = duck.execute(q).fetchall()
    assert [(r["doc_id"], r["vocab"]) for r in res["rows"]] == d


def test_time_info_deterministic():
    import datetime as dt

    from aden_hive_fork_spark.functions.timeinfo import time_info

    at = dt.datetime(2024, 6, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    ny = time_info("America/New_York", at)
    assert ny["hour"] == 8 and ny["utc_offset_s"] == -4 * 3600  # EDT
    assert ny["iso"].startswith("2024-06-01T08:00:00")
    assert ny["unix"] == at.timestamp()
    assert ny["day_of_week"] == "Saturday"
    utc = time_info("UTC", at)
    assert utc["hour"] == 12 and utc["utc_offset_s"] == 0
    import pytest as _pytest

    with _pytest.raises(KeyError):
        time_info("Not/AZone", at)


def test_dialect_new_mappings_match_duckdb(spark, duck):
    """Round-2 mappings (starts_with/strpos/list_value/list_extract/
    array_length/quantile_cont/arg_max/arg_min/printf): the same
    DuckDB-dialect text produces identical values on both engines."""
    from aden_hive_fork_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    q = """
      SELECT c_mktsegment,
        CAST(arg_max(c_custkey, c_acctbal) AS BIGINT) AS richest_key,
        CAST(arg_min(c_custkey, c_acctbal) AS BIGINT) AS poorest_key,
        CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE) AS median_bal,
        CAST(SUM(CASE WHEN starts_with(c_name, 'Customer#0000000') THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        CAST(MAX(strpos(c_name, '1')) AS BIGINT) AS max_one_pos,
        printf('%s:%d', MIN(c_mktsegment), COUNT(*)) AS tag,
        CAST(array_length(list_value(1, 2, 3)) AS BIGINT) AS three,
        CAST(list_extract(list_value(10, 20, 30), -1) AS BIGINT) AS last_elem
      FROM customer
      WHERE c_custkey <= 400
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment ASC
    """
    res = eng.sql(q, dialect="duckdb")
    assert res["success"], res.get("error")

    def norm(v):
        from decimal import Decimal

        return float(v) if isinstance(v, (float, Decimal)) else v

    got = [tuple(norm(r[c]) for c in res["columns"]) for r in res["rows"]]
    want = [tuple(norm(v) for v in row) for row in duck.execute(q).fetchall()]
    assert got == want
