"""The local twin of the driver's CORRECTNESS gate: every declared
query runs on Spark AND DuckDB at sf0.001; row count, column names,
and order-insensitive canonical value hash must match exactly.
"""

from __future__ import annotations

import pytest

from aden_hive_fork_spark import suite
from aden_hive_fork_spark.canonical import result_hash

QUERIES = suite.get_queries()
ORACLES = suite.get_oracle_sql()


def _spark_rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def _duck_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return [dict(zip(cols, row)) for row in cur.fetchall()]


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    from conftest import SF_SMALL

    s_rows = _spark_rows(QUERIES[name](spark, SF_SMALL))
    d_rows = _duck_rows(duck, ORACLES[name])
    assert len(s_rows) == len(d_rows), f"{name}: row count mismatch"
    if s_rows:
        assert sorted(s_rows[0]) == sorted(d_rows[0]), f"{name}: column mismatch"
    assert result_hash(s_rows) == result_hash(d_rows), f"{name}: value hash mismatch"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    from conftest import SF_SMALL

    rows = QUERIES[name](spark, SF_SMALL)
    assert rows.columns  # stable schema
    assert rows.count() >= 0
