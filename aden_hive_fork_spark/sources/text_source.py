"""Text-file scan + grep (SURVEY.md §2.A row 25).

Reference grep_search (tools/src/aden_tools/tools/file_system_toolkits/
grep_search/grep_search.py:1-100): regex over files with an include
pattern and case-insensitivity flag, returning file/line matches.
Spark analog: ``spark.read.text`` + ``input_file_name`` + ``rlike`` —
a distributed grep that scales to any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def grep_files(
    spark: SparkSession,
    path_glob: str,
    pattern: str,
    case_insensitive: bool = False,
    max_matches: int | None = None,
) -> DataFrame:
    """Distributed grep: (file, line_number, line) for matching lines.

    line_number is per-file via a window over the file ordering —
    exact for line-split text sources.
    """
    from pyspark.sql.window import Window

    pat = f"(?i){pattern}" if case_insensitive else pattern
    lines = (
        spark.read.text(path_glob)
        .withColumn("file", F.input_file_name())
        .withColumn(
            "line_number",
            F.row_number().over(
                Window.partitionBy("file").orderBy(F.monotonically_increasing_id())
            ),
        )
    )
    out = lines.filter(F.col("value").rlike(pat)).select(
        "file", "line_number", F.col("value").alias("line")
    )
    if max_matches is not None:
        out = out.orderBy("file", "line_number").limit(max_matches)
    return out
