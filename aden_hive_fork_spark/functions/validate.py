"""Output validation / cleansing (SURVEY.md §2.B row 52).

Reference: node outputs are schema-checked; failures go through
heuristic repair, then revalidation (core/framework/graph/
executor.py:1716-1760, output_cleaner.py:64-338). Distributed analog:
split a DataFrame into (valid, rejects) against a target schema by
ANSI-safe try_cast — a row is valid iff every non-null source value
survives the cast and required fields are present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def enforce_schema(
    df: DataFrame,
    schema: StructType | str,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (valid, rejects).

    valid:   rows cast to the target schema (try_cast semantics),
             with every ``required`` column non-null and no value
             lost by casting;
    rejects: original rows that failed, with a ``_reasons``
             array<string> column naming each offending field.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    required = required if required is not None else [f.name for f in schema.fields]

    reasons = []
    casts = []
    for f_def in schema.fields:
        name, dtype = f_def.name, f_def.dataType
        if name not in df.columns:
            if name in required:
                reasons.append(F.lit(f"missing:{name}"))
            casts.append(F.lit(None).cast(dtype).alias(name))
            continue
        src = F.col(name)
        tried = src.try_cast(dtype)
        casts.append(tried.alias(name))
        # cast lost a present value -> invalid
        reasons.append(
            F.when(src.isNotNull() & tried.isNull(), F.lit(f"uncastable:{name}"))
        )
        if name in required:
            reasons.append(F.when(src.isNull(), F.lit(f"null:{name}")))

    reason_arr = F.array_compact(F.array(*[r.cast("string") for r in reasons]))
    marked = df.withColumn("_reasons", reason_arr)
    valid = marked.filter(F.size("_reasons") == 0).select(*casts)
    rejects = marked.filter(F.size("_reasons") > 0)
    return valid, rejects
