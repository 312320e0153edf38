"""CLI: guarded SQL over the testdata catalog.

    python -m aden_hive_fork_spark --sql "SELECT ..." [--sf-dir DIR]
        [--explain] [--max-rows N] [--json]

The SURVEY §7.2 minimum-slice entry point: load the catalog, run one
read-only query, print rows (or the formatted physical plan).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="aden_hive_fork_spark")
    ap.add_argument("--sql", required=True, help="read-only SQL over the catalog views")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--max-rows", type=int, default=100)
    ap.add_argument("--explain", action="store_true", help="print the physical plan instead")
    ap.add_argument("--json", action="store_true", help="print the full result envelope as JSON")
    args = ap.parse_args(argv)

    from .engine import Engine, SqlGuardError
    from .session import build_session

    eng = Engine(build_session(app_name="aden-hive-fork-spark-cli"), sf_dir=args.sf_dir)
    try:
        if args.explain:
            print(eng.explain(args.sql))
            return 0
        res = eng.sql(args.sql, max_rows=args.max_rows)
    except SqlGuardError as exc:
        print(f"rejected: {exc}", file=sys.stderr)
        return 2
    if args.json:
        print(json.dumps(res, default=str))
    else:
        if not res["success"]:
            print(f"error: {res['error']}", file=sys.stderr)
            return 1
        print("\t".join(res["columns"]))
        for row in res["rows"]:
            print("\t".join(str(row[c]) for c in res["columns"]))
        if res.get("truncated"):
            print(f"... truncated at {args.max_rows} rows", file=sys.stderr)
    return 0 if res["success"] else 1


if __name__ == "__main__":
    sys.exit(main())
