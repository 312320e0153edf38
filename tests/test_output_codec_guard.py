"""Suite-wide output-codec guard (VERDICT r7 task 2).

CORRECTNESS_r07 adjudicated the 4-round q150 mystery via the
pre-registered q278/q279 A/B: the driver's DuckDB environment hashes
DECIMAL output columns derived from DOUBLE sources differently from
this Spark build (q279 epoch+stable_round6-DOUBLE GREEN, q278
string+DECIMAL(18,2) RED alongside q150). Round 8 therefore bans
DecimalType from every declared query's OUTPUT schema: exact decimal
arithmetic stays welcome INSIDE plans (sums, comparisons, signs), but
the emitted columns must be DOUBLE (stable_round6-quantized), integer,
string, boolean, date, or timestamp.

This test walks all ~305 declared queries and resolves each output
schema lazily (Catalyst analysis only — no job runs for most queries),
so any future query that reintroduces a DECIMAL output column fails CI
with a pointer at this adjudication. Exemptions require a driver-green
CORRECTNESS row citation in ALLOWLIST; as of round 8 the list is empty
because no DECIMAL output site has ever been driver-sampled green.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, DataType, DecimalType, MapType, StructType

from tests.conftest import SF_SMALL

# query name -> citation of the driver-green CORRECTNESS row that
# proves this specific DECIMAL output site hashes identically in the
# driver environment. Empty on purpose — see module docstring.
ALLOWLIST: dict[str, str] = {}


def _contains_decimal(dt: DataType) -> bool:
    if isinstance(dt, DecimalType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_decimal(dt.elementType)
    if isinstance(dt, MapType):
        return _contains_decimal(dt.keyType) or _contains_decimal(dt.valueType)
    if isinstance(dt, StructType):
        return any(_contains_decimal(f.dataType) for f in dt.fields)
    return False


def test_no_decimal_output_columns_suite_wide(spark):
    from concurrent.futures import ThreadPoolExecutor

    from aden_hive_fork_spark import suite

    suite.load_all()
    offenders: dict[str, list[str]] = {}
    failures: dict[str, str] = {}

    def _schema_of(item):
        # most queries resolve lazily (Catalyst analysis only), but a
        # handful are eager at construction (pipeline checkpoints,
        # collect-driven operators) and run real jobs — resolving
        # across a driver thread pool overlaps those (guide §2.6;
        # r13: this single test was 200 s serial, ~3 min of the
        # driver's verify window)
        name, fn = item
        try:
            return name, fn(spark, SF_SMALL).schema, None
        except Exception as e:
            return name, None, f"{type(e).__name__}: {e}"[:200]

    items = [
        (n, f) for n, f in sorted(suite.QUERIES.items())
        if n not in ALLOWLIST
    ]
    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, schema, err in pool.map(_schema_of, items):
            if err is not None:
                failures[name] = err
                continue
            bad = [
                f.name for f in schema.fields
                if _contains_decimal(f.dataType)
            ]
            if bad:
                offenders[name] = bad
    assert not failures, f"schema resolution failed: {failures}"
    assert not offenders, (
        "DECIMAL output columns are driver-red by the CORRECTNESS_r07 "
        "q278/q279 adjudication — emit stable_round6 DOUBLEs (or "
        "integers) instead, or add a driver-green citation to "
        f"ALLOWLIST: {offenders}"
    )
