#!/usr/bin/env python
"""Stage-by-stage wall-clock profile of pretrain_pipeline_stages
(q336/q337's chain) at a given SF. Each stage is eagerly
localCheckpointed inside the operator, so timing the construction of
each stage frame measures that stage's materialization.

Usage: python scripts/profile_pipeline_r12.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from aden_hive_fork_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="r12-pipeline-profile")
    from pyspark.sql.classic.dataframe import DataFrame

    from aden_hive_fork_spark.suite._helpers import T
    from aden_hive_fork_spark.operators import pretrain_pipeline as pp

    # Time every eager localCheckpoint (= each stage materialization),
    # attributed to the caller's source line.
    import traceback

    orig_ckpt = DataFrame.localCheckpoint

    def timed_ckpt(self, eager=True):
        t0 = time.time()
        out = orig_ckpt(self, eager=eager)
        dt = time.time() - t0
        caller = traceback.extract_stack()[-2]
        print(
            f"  ckpt eager={eager} {dt:6.2f}s  "
            f"{caller.filename.rsplit('/', 1)[-1]}:{caller.lineno}",
            flush=True,
        )
        return out

    DataFrame.localCheckpoint = timed_ckpt

    sc = spark.sparkContext
    for rep in range(2):  # rep 0 warms codegen; rep 1 is the measurement
        docs = T(spark, sf_dir, "documents")
        t_all = time.time()
        sc.setJobDescription(f"pipeline rep{rep}")
        stages = pp.pretrain_pipeline_stages(docs)
        now = time.time()
        print(f"rep{rep}: stages construction {now - t_all:.2f}s", flush=True)
        # the 9_packed frame is lazy; time its materialization
        t0 = time.time()
        stages["9_packed"].write.format("noop").mode("overwrite").save()
        print(f"rep{rep}: 9_packed noop {time.time() - t0:.2f}s", flush=True)
        t0 = time.time()
        cen = pp.pretrain_pipeline_census(docs, stages=stages)
        cen.write.format("noop").mode("overwrite").save()
        print(f"rep{rep}: census-from-stages noop {time.time() - t0:.2f}s", flush=True)
        print(f"rep{rep}: TOTAL {time.time() - t_all:.2f}s", flush=True)


if __name__ == "__main__":
    main()
