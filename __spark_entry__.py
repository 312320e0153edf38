"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the declared suite from
``aden_hive_fork_spark.suite`` (one entry per implemented operator
from SURVEY.md §2; oracle SQL present for every hash-matchable one).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Defensive: the driver may import this file by path, in which case
# the repo root is not necessarily on sys.path for the package import.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from aden_hive_fork_spark import suite  # noqa: E402

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    suite.load_all()
    return suite.QUERIES["q01_pricing_summary"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return suite.get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every hash-matchable query.
    Approximate operators (MinHash/SimHash/LSH candidates) are
    intentionally absent → driver records a rows-only check."""
    return suite.get_oracle_sql()
