"""Read-only guard contract (mirrors reference csv_tool write-keyword
blocking tests, tools/tests/tools/test_csv_tool.py:823-843)."""

import pytest

from aden_hive_fork_spark.guard import SqlGuardError, ensure_read_only


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT * FROM lineitem",
        "select 1",
        "WITH t AS (SELECT 1 AS x) SELECT * FROM t",
        "EXPLAIN SELECT 1",
        "  -- leading comment\nSELECT 1",
        "SELECT 'insert' AS word",  # keyword inside a string literal is fine
        "SELECT \"delete\" FROM lineitem",  # quoted identifier is fine
    ],
)
def test_allows_read_only(sql):
    ensure_read_only(sql)


@pytest.mark.parametrize(
    "sql",
    [
        "INSERT INTO t VALUES (1)",
        "UPDATE t SET x = 1",
        "DELETE FROM t",
        "DROP TABLE t",
        "CREATE TABLE t (x INT)",
        "ALTER TABLE t ADD COLUMN y INT",
        "TRUNCATE TABLE t",
        "MERGE INTO t USING s ON t.id = s.id",
        "SELECT 1; DROP TABLE t",  # multi-statement
        "SELECT * FROM t WHERE EXISTS (SELECT 1) UNION SELECT x FROM (DELETE FROM t)",
        "",
        "   ",
    ],
)
def test_blocks_writes(sql):
    with pytest.raises(SqlGuardError):
        ensure_read_only(sql)
