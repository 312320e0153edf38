"""Dataset manifests: per-file content checksums + row counts, and
the audit that replays them — the reproducibility layer for
published datasets.

A training run must be able to state *exactly* which bytes it read;
a replication must be able to prove it read the same ones. The
manifest is itself a small DataFrame (persist it next to the data,
version it with ``layout.publish_version``), and verification is a
keyed diff — ``operators/diff.diff_tables`` semantics over file
paths.

Distributed by construction: checksums come from a ``binaryFile``
scan (each executor hashes its own files — bounded memory because
compaction bounds file size), row counts from one
``input_file_name()`` aggregate; the join of the two is tiny
(#files rows). Nothing touches the driver but the report.
"""

from __future__ import annotations

import re
import urllib.parse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEME = r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/*"


def _norm_base(path: str) -> str:
    """The dataset root in the same normal form ``_rel_path`` puts
    file URIs in: URL-decoded, scheme stripped to a single leading
    slash, duplicate slashes collapsed."""
    b = urllib.parse.unquote(path)
    b = re.sub(_SCHEME, "/", b)
    return re.sub(r"/+", "/", b).rstrip("/")


def _rel_path(c: Column, norm_base: str) -> Column:
    """Path column → path relative to the dataset root. binaryFile
    and input_file_name render the same file differently (file:/ vs
    file:///, URL-encoding), so both sides normalize identically
    before the root prefix is stripped. Relative — not basename —
    because nested/partitioned layouts repeat basenames across
    subdirectories, and a basename join would go many-to-many."""
    n = F.url_decode(c)
    n = F.regexp_replace(n, _SCHEME, "/")
    n = F.regexp_replace(n, "/+", "/")
    prefix = norm_base + "/"
    return F.when(
        n.startswith(prefix), F.substring(n, len(prefix) + 1, 2**31 - 1)
    ).otherwise(n)


def dataset_manifest(
    spark: SparkSession, path: str, pattern: str = "*.parquet"
) -> DataFrame:
    """(file_name, n_bytes, content_md5, n_rows) per data file under
    ``path`` (recursively — partitioned layouts included).
    ``file_name`` is root-relative — manifests survive dataset
    relocation (bucket migration must not read as corruption)."""
    base = path.rstrip("/")
    nb = _norm_base(base)

    def _rel(c):
        return _rel_path(c, nb)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(base)
        .select(
            _rel(F.col("path")).alias("file_name"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        )
    )
    rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(base)
        .groupBy(_rel(F.input_file_name()).alias("file_name"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    return (
        binary.join(rows, "file_name", "left")
        .select(
            "file_name",
            "n_bytes",
            "content_md5",
            F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        )
    )


def verify_manifest(
    spark: SparkSession, path: str, manifest: DataFrame
) -> DataFrame:
    """Re-hash the dataset and diff against the recorded manifest:
    (file_name, change_type, changed_cols) for added / removed /
    changed files — empty output ⟺ byte-identical dataset."""
    from .diff import diff_tables

    current = dataset_manifest(spark, path)
    return diff_tables(
        manifest,
        current,
        ["file_name"],
        compare_cols=["n_bytes", "content_md5", "n_rows"],
    )


def save_manifest(manifest: DataFrame, target: str) -> None:
    """Persist the manifest as a single parquet next to the data (it
    is #files rows — one file is the right layout)."""
    manifest.coalesce(1).write.mode("overwrite").parquet(target)


def load_manifest(spark: SparkSession, target: str) -> DataFrame:
    # no local-FS existence probe: target may be any URI the reader
    # understands — a missing manifest surfaces as the reader's own
    # AnalysisException (path does not exist)
    return spark.read.parquet(target)
