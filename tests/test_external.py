"""External-DB SQL passthrough (sources/external.py) — the reference's
pg_query/run_bigquery_query surface exercised against an embedded
DuckDB database (the same engine the reference delegates its SQL to).
Covers: query envelope + row cap + truncation flag, read-only guard,
catalog ops (list/describe), distributed partitioned fetch, and the
multi-source join contract.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from aden_hive_fork_spark.sources.external import (
    external_describe_table,
    external_list_schemas,
    external_list_tables,
    external_query,
    external_read,
    jdbc_read,
    register_external,
)

import functools

_DB_PATH = None  # set by fixture for driver-side duckdb cross-checks


def _make_db(path: str) -> None:
    con = duckdb.connect(path)
    con.execute("CREATE TABLE users (id BIGINT, name VARCHAR, score DOUBLE)")
    con.execute(
        "INSERT INTO users SELECT i, 'user_' || i, i * 1.5 FROM range(100) t(i)"
    )
    con.execute("CREATE TABLE tags (user_id BIGINT, tag VARCHAR)")
    con.execute(
        "INSERT INTO tags SELECT i % 100, 'tag_' || (i % 7) FROM range(300) t(i)"
    )
    con.close()


@pytest.fixture(scope="module")
def extdb(tmp_path_factory):
    """Picklable connection factory (partial over duckdb.connect — a
    by-reference picklable callable, so executor tasks can open their
    own read-only connections to the same DuckDB file)."""
    global _DB_PATH
    path = str(tmp_path_factory.mktemp("extdb") / "ext.duckdb")
    _make_db(path)
    _DB_PATH = path
    # lambda: cloudpickle serializes it BY VALUE (a module-level def or
    # functools.partial over the C-level duckdb.connect is not
    # executor-picklable), so each task re-imports duckdb and opens its
    # own read-only connection.
    yield lambda: __import__("duckdb").connect(path, read_only=True)
    _DB_PATH = None


# ---------------------------------------------------------------------------
# envelope tier
# ---------------------------------------------------------------------------
def test_query_envelope(extdb):
    env = external_query(extdb, "SELECT id, name FROM users WHERE id < 3 ORDER BY id")
    assert env["success"] is True
    assert env["columns"] == ["id", "name"]
    assert env["rows"] == [[0, "user_0"], [1, "user_1"], [2, "user_2"]]
    assert env["row_count"] == 3
    assert env["query_truncated"] is False
    assert env["duration_ms"] >= 0


def test_query_row_cap_and_truncation_flag(extdb):
    env = external_query(extdb, "SELECT id FROM users ORDER BY id", max_rows=10)
    assert env["row_count"] == 10
    assert env["max_rows"] == 10
    assert env["query_truncated"] is True


def test_query_rejects_writes(extdb):
    env = external_query(extdb, "DELETE FROM users")
    assert env["success"] is False
    assert "error" in env


def test_query_max_rows_validation(extdb):
    assert external_query(extdb, "SELECT 1", max_rows=0)["success"] is False
    assert external_query(extdb, "SELECT 1", max_rows=10_001)["success"] is False


def test_query_db_error_envelope(extdb):
    env = external_query(extdb, "SELECT nope FROM users")
    assert env["success"] is False
    assert "error" in env


# ---------------------------------------------------------------------------
# catalog ops
# ---------------------------------------------------------------------------
def test_list_schemas(extdb):
    out = external_list_schemas(extdb)
    assert out["success"] and "main" in out["result"]


def test_list_tables(extdb):
    out = external_list_tables(extdb, schema="main")
    names = {t["table"] for t in out["result"]}
    assert {"users", "tags"} <= names


def test_describe_table(extdb):
    out = external_describe_table(extdb, "users")
    assert out["success"]
    cols = {c["column"]: c for c in out["result"]}
    assert cols["id"]["type"].upper() == "BIGINT"
    assert cols["name"]["nullable"] is True


def test_describe_rejects_bad_identifier(extdb):
    assert external_describe_table(extdb, "users; DROP")["success"] is False


# ---------------------------------------------------------------------------
# DataFrame tier (distributed fetch)
# ---------------------------------------------------------------------------
def test_external_read_single_partition(spark, extdb):
    df = external_read(spark, extdb, "SELECT id, name, score FROM users")
    assert df.count() == 100
    assert df.schema["id"].dataType.simpleString() == "bigint"


def test_external_read_partitioned_matches_single(spark, extdb):
    df = external_read(
        spark,
        extdb,
        "SELECT id, score FROM users",
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert len(rows) == 100  # no dupes, no gaps across slice boundaries
    assert rows[99] == 99 * 1.5


def test_external_read_bounds_do_not_lose_rows(spark, extdb):
    """Rows OUTSIDE [lower, upper) must still appear (first/last slices
    are unbounded) — the spark.read.jdbc contract."""
    df = external_read(
        spark,
        extdb,
        "SELECT id FROM users",
        partition_column="id",
        lower_bound=20,
        upper_bound=80,
        num_partitions=3,
    )
    assert df.count() == 100


def test_external_read_rejects_writes(spark, extdb):
    with pytest.raises(Exception):
        external_read(spark, extdb, "DROP TABLE users")


def test_register_external_and_join_local(spark, extdb):
    """Multi-source join: external tables registered as views join a
    Spark-local DataFrame in one SQL statement."""
    register_external(spark, extdb, ["users", "tags"], view_prefix="ext_")
    out = spark.sql(
        """
        SELECT t.tag, COUNT(*) AS n, SUM(u.score) AS total
        FROM ext_users u JOIN ext_tags t ON u.id = t.user_id
        GROUP BY t.tag ORDER BY t.tag
        """
    ).collect()
    assert len(out) == 7
    con = duckdb.connect(_DB_PATH, read_only=True)
    expected = con.execute(
        "SELECT tag, COUNT(*), SUM(score) FROM users u JOIN tags t"
        " ON u.id = t.user_id GROUP BY tag ORDER BY tag"
    ).fetchall()
    con.close()
    got = [(r["tag"], r["n"], r["total"]) for r in out]
    assert got == [(t, n, pytest.approx(s)) for t, n, s in expected]


def test_jdbc_read_reports_missing_driver(spark):
    """No JDBC jar in this sandbox: jdbc_read must fail with the
    descriptive gate error, not a bare ClassNotFoundException."""
    with pytest.raises((RuntimeError, Exception)) as exc:
        jdbc_read(spark, "jdbc:postgresql://localhost/x", "users")
    assert "driver" in str(exc.value).lower()


def test_external_explain(extdb):
    from aden_hive_fork_spark.sources.external import external_explain

    out = external_explain(extdb, "SELECT id FROM users WHERE id < 10")
    assert out["success"] and "users" in out["result"].lower()
    bad = external_explain(extdb, "DELETE FROM users")
    assert bad["success"] is False
