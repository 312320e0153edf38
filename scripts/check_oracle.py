#!/usr/bin/env python
"""Local oracle harness — mirrors the driver's CORRECTNESS check.

Runs every declared query through Spark AND its DuckDB oracle SQL on
the same parquet tables, compares row count, column names, and the
order-insensitive canonical value hash (aden_hive_fork_spark.canonical).

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

from aden_hive_fork_spark import suite
from aden_hive_fork_spark.canonical import canon_rows, result_hash
from aden_hive_fork_spark.catalog import TABLES, table_path
from aden_hive_fork_spark.session import build_session


def duck_rows(con, sql: str) -> list[dict]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return [dict(zip(cols, row)) for row in cur.fetchall()]


def spark_rows(df) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import os

    hostile = os.environ.get("ORACLE_HOSTILE_TZ", "").strip()
    if hostile:
        # simulate the DRIVER's session: one the engine did NOT
        # configure, with a non-UTC timezone (verify-skill probe) —
        # catches any query that round-trips NTZ through session time
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-hostile")
            .master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.session.timeZone", hostile)
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        print(f"HOSTILE session timezone: {hostile}")
    else:
        spark = build_session(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()

    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = suite.get_queries()
    oracles = suite.get_oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            s_rows = spark_rows(fn(spark, sf_dir))
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only, {spark_t:.1f}s)")
            n_rows_only += 1
            continue
        try:
            d_rows = duck_rows(con, oracles[name])
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {e}")
            n_fail += 1
            continue
        s_cols = sorted(s_rows[0]) if s_rows else None
        d_cols = sorted(d_rows[0]) if d_rows else None
        ok_count = len(s_rows) == len(d_rows)
        ok_cols = s_cols == d_cols or not s_rows or not d_rows
        ok_hash = result_hash(s_rows) == result_hash(d_rows)
        if ok_count and ok_cols and ok_hash:
            print(f"PASS  {name}: {len(s_rows)} rows ({spark_t:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(
                f"FAIL  {name}: rows {len(s_rows)}/{len(d_rows)}"
                f" cols_ok={ok_cols} hash_ok={ok_hash}"
            )
            if not ok_cols:
                print(f"      spark cols: {s_cols}\n      duck  cols: {d_cols}")
            if ok_cols and not ok_hash:
                sl, dl = canon_rows(s_rows), canon_rows(d_rows)
                shown = 0
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"      spark: {a[:160]}\n      duck : {b[:160]}")
                        shown += 1
                        if shown >= 3:
                            break
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
