"""Engine facade: result envelope parity with the reference's csv_sql
(tools/src/aden_tools/tools/csv_tool/csv_tool.py:368-376) and catalog
ops (postgres_tool.py:358-475)."""

from __future__ import annotations

import pytest

from aden_hive_fork_spark.engine import Engine, SqlGuardError
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, sf_dir=SF_SMALL)


def test_sql_envelope(engine):
    res = engine.sql("SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment")
    assert res["success"] is True
    assert res["columns"] == ["c_mktsegment", "n"]
    assert res["row_count"] == len(res["rows"]) == 5
    assert all(isinstance(r, dict) for r in res["rows"])
    assert res["truncated"] is False


def test_sql_truncation_flag(engine):
    res = engine.sql("SELECT l_orderkey FROM lineitem", max_rows=10)
    assert res["truncated"] is True
    assert res["row_count"] == 10


def test_sql_error_envelope(engine):
    res = engine.sql("SELECT nonexistent_col FROM lineitem")
    assert res["success"] is False
    assert "error" in res


def test_sql_guard_raises(engine):
    with pytest.raises(SqlGuardError):
        engine.sql("DROP TABLE lineitem")


def test_known_answer_filter(engine):
    # reference-style golden test (test_csv_tool.py:730-745 pattern)
    res = engine.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderkey IN (1, 2, 3) ORDER BY o_orderkey"
    )
    assert [r["o_orderkey"] for r in res["rows"]] == [1, 2, 3]


def test_list_tables(engine):
    tables = engine.list_tables()
    assert {"lineitem", "orders", "customer", "events"} <= set(tables)


def test_table_info(engine):
    info = engine.table_info("nation")
    assert info["row_count"] == 25
    cols = {c["name"]: c["type"] for c in info["columns"]}
    assert cols["n_nationkey"] == "int"
    assert cols["n_name"] == "string"


def test_events_ts_is_timestamp(engine):
    info = engine.table_info("events", with_count=False)
    cols = {c["name"]: c["type"] for c in info["columns"]}
    assert cols["ts"] == "timestamp_ntz"
