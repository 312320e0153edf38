#!/usr/bin/env python
"""Round-12 optimization profiler.

Times individual declared queries with the noop sink (guide §1.4) and
optionally captures .explain("formatted") to plans/r13/.

Usage:
  python scripts/profile_r13.py [--sf DIR] [--runs N] [--explain TAG] q336_... q337_...

TAG is 'before' or 'after'; when given, plans/r13/<query>_<TAG>.txt is
written. Timing uses df.write.format("noop") so the computation is
timed, not the sink, after one warm run per query (codegen compile).
"""

from __future__ import annotations

import argparse
import io
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from aden_hive_fork_spark import suite
from aden_hive_fork_spark.session import build_session


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default="")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = build_session(app_name="r13-profile")
    qs = suite.get_queries()
    sc = spark.sparkContext

    for name in args.queries:
        fn = qs[name]
        if args.explain:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(
                "/root/repo/plans/r13", f"{name}_{args.explain}.txt"
            )
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}", flush=True)
        if not args.no_warm:
            sc.setJobDescription(f"{name}: warm")
            noop(fn(spark, args.sf))
        runs = []
        for i in range(args.runs):
            sc.setJobDescription(f"{name}: run {i}")
            t0 = time.time()
            noop(fn(spark, args.sf))
            runs.append(time.time() - t0)
        sc.setJobDescription(None)
        med = statistics.median(runs)
        print(
            f"{name}: median {med:.3f}s  runs="
            + ",".join(f"{r:.3f}" for r in runs),
            flush=True,
        )


if __name__ == "__main__":
    main()
