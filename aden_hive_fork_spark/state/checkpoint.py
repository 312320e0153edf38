"""Versioned checkpoint snapshots (SURVEY.md §2.B row 50).

Reference: full memory snapshot + execution path, save/load/list/prune
(core/framework/storage/checkpoint_store.py:44-238,
schemas/checkpoint.py:14-44). Batch analog: versioned parquet
directories (``<dir>/v=N``) written through Spark's atomic job-commit
protocol; streaming pipelines use Structured Streaming's own
checkpointLocation instead (streaming module).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^v=(\d+)$")


def _versions(checkpoint_dir: str) -> list[int]:
    if not os.path.isdir(checkpoint_dir):
        return []
    out = []
    for name in os.listdir(checkpoint_dir):
        m = _VERSION_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def save_checkpoint(df: DataFrame, checkpoint_dir: str, meta: dict | None = None) -> int:
    """Write the next version; returns the version number. The parquet
    job commit is atomic — readers never observe a partial snapshot."""
    version = (_versions(checkpoint_dir)[-1] + 1) if _versions(checkpoint_dir) else 1
    path = os.path.join(checkpoint_dir, f"v={version}")
    df.write.mode("errorifexists").parquet(path)
    if meta:
        import json

        with open(os.path.join(path, "_meta.json"), "w") as fh:
            json.dump(meta, fh)
    return version


def list_checkpoints(checkpoint_dir: str) -> list[int]:
    return _versions(checkpoint_dir)


def load_checkpoint(
    spark: SparkSession, checkpoint_dir: str, version: int | None = None
) -> DataFrame:
    """Load a specific version, or the latest."""
    versions = _versions(checkpoint_dir)
    if not versions:
        raise FileNotFoundError(f"no checkpoints under {checkpoint_dir}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise FileNotFoundError(f"checkpoint v={v} not found (have {versions})")
    return spark.read.parquet(os.path.join(checkpoint_dir, f"v={v}"))


def prune_checkpoints(checkpoint_dir: str, keep_last: int = 3) -> list[int]:
    """Delete all but the newest ``keep_last`` versions; returns the
    pruned version numbers (reference prune_checkpoints)."""
    versions = _versions(checkpoint_dir)
    to_prune = versions[:-keep_last] if keep_last > 0 else versions
    for v in to_prune:
        shutil.rmtree(os.path.join(checkpoint_dir, f"v={v}"))
    return to_prune
