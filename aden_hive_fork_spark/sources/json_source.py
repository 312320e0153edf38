"""JSONL source with corrupt-line tolerance.

The reference appends JSONL and skips corrupt lines on read
(core/framework/runtime/runtime_log_store.py:265-288). Spark's
PERMISSIVE JSON mode is the distributed analog: bad lines land in a
corrupt-record column instead of failing the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Read JSON-lines; corrupt lines are skipped (reference parity)
    or kept in ``_corrupt_record`` when ``drop_corrupt=False``."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        # PERMISSIVE corrupt capture requires the column in the schema.
        schema = schema.add("_corrupt_record", "string")
        reader = reader.schema(schema)
    df = reader.json(path)
    if drop_corrupt and "_corrupt_record" in df.columns:
        # cache() before the corrupt-record filter: Spark disallows
        # filtering on the corrupt column over a raw scan.
        df = df.cache().filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df
