"""Connector roundtrip queries: CSV and Excel sinks/scans under the
driver's DuckDB oracle gate.

These rows of SURVEY.md §2 (CSV scan/sink rows 1-2, Excel rows 4-5)
previously had pytest evidence only, because the driver testdata is
parquet. The roundtrip trick puts the CONNECTOR inside an
oracle-checked query: Spark writes a deterministic slice through the
connector, reads it back through the same connector, and aggregates;
the oracle computes the same aggregate straight from parquet. Any
loss, duplication, or type corruption in the connector shows up as a
hash mismatch.

Roundtrip-safety notes:
- doubles survive CSV/xlsx text both ways (Java's Double.toString and
  Python's repr are shortest-roundtrip representations);
- aggregates follow the suite determinism contract (DECIMAL sums,
  ROUND→DOUBLE, total ORDER BY);
- writes go under /tmp keyed by the sf name — re-runs overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import query
from ._helpers import T, dec, dround


def _rt_dir(sf_dir: str, name: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join("/tmp", "spark_graft_roundtrip", sf)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


@query(
    "q82_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment AS segment,
      COUNT(*) AS n_customers,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal,
      CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM customer
    WHERE c_custkey % 3 = 0
    GROUP BY c_mktsegment
    ORDER BY segment ASC
    """,
)
def q82_csv_roundtrip(spark, sf_dir):
    """CSV SINK + SCAN inside the oracle gate: a customer slice is
    written to CSV (df.write, header, distributed) and read back with
    an explicit schema (no inference nondeterminism); the aggregate
    must hash-match the oracle computed from the original parquet.
    Proves §2.A rows 1-2 end-to-end, not just in unit tests."""
    out = _rt_dir(sf_dir, "csv_customer")
    (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite")
        .option("header", True)
        .csv(out)
    )
    back = (
        spark.read.schema("c_custkey bigint, c_mktsegment string, c_acctbal double")
        .option("header", True)
        .csv(out)
    )
    return (
        back.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dround(F.sum(dec("c_acctbal"))).alias("total_bal"),
            F.min("c_custkey").cast("bigint").alias("min_key"),
        )
        .orderBy("segment")
    )


@query(
    "q83_excel_roundtrip",
    oracle="""
    SELECT n.n_name AS nation,
      COUNT(*) AS n_suppliers,
      CAST(ROUND(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation ASC
    """,
)
def q83_excel_roundtrip(spark, sf_dir):
    """EXCEL SINK + SCAN + cross-source join inside the oracle gate:
    the nation dimension goes out through the stdlib xlsx writer, comes
    back through the stdlib parser (typed cells), and joins the
    Spark-local supplier table — the excel_sql multi-sheet contract
    with one side living in a real workbook file. Proves §2.A rows 4-5
    under the driver gate."""
    from ..sources.excel_source import excel_write_df, read_sheets

    path = _rt_dir(sf_dir, "nation.xlsx")
    excel_write_df(path, {"Nations": T(spark, sf_dir, "nation")})
    nations = read_sheets(spark, path)["Nations"]
    supplier = T(spark, sf_dir, "supplier")
    return (
        supplier.join(
            F.broadcast(nations),
            supplier.s_nationkey == nations.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dround(F.sum(dec("s_acctbal"))).alias("total_bal"),
        )
        .orderBy("nation")
    )


@query(
    "q84_jsonl_roundtrip",
    oracle="""
    SELECT event_type,
      COUNT(*) AS n_events,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value,
      CAST(MIN(event_id) AS BIGINT) AS min_event_id
    FROM events
    WHERE user_id % 5 = 0
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def q84_jsonl_roundtrip(spark, sf_dir):
    """JSONL SINK + corrupt-tolerant SCAN inside the oracle gate
    (§2.C row 69): an events slice goes out as JSON-lines, a corrupt
    line is INJECTED into the directory, and the read must skip it
    (PERMISSIVE corrupt-record drop) while every valid row survives
    byte-exactly — hash-checked against the oracle over the original
    parquet. Timestamps are excluded from the projection (JSON text
    round-trips doubles/longs/strings losslessly; the ts column has
    its own oracle coverage in q20/q22)."""
    from ..sources.json_source import read_jsonl

    out = _rt_dir(sf_dir, "jsonl_events")
    (
        T(spark, sf_dir, "events")
        .filter(F.col("user_id") % 5 == 0)
        .select("event_id", "event_type", "value", "user_id")
        .write.mode("overwrite")
        .json(out)
    )
    # inject a corrupt line the scan must survive and drop
    with open(os.path.join(out, "part-corrupt.json"), "w") as fh:
        fh.write('{"event_id": 1, "event_type": "broken"\n')  # unterminated
    back = read_jsonl(
        spark,
        out,
        schema="event_id bigint, event_type string, value double, user_id bigint",
        drop_corrupt=True,
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum(dec("value"))).alias("total_value"),
            F.min("event_id").cast("bigint").alias("min_event_id"),
        )
        .orderBy("event_type")
    )


@query(
    "q85_salted_skew_join",
    oracle="""
    SELECT o.o_orderpriority,
      COUNT(*) AS n_lineitems,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity >= 40
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority ASC
    """,
)
def q85_salted_skew_join(spark, sf_dir):
    """SALTED skew join under the oracle gate: the fact side carries a
    content-hash salt, the dimension side is replicated salt ways, and
    the (key, salt) join must produce EXACTLY the plain-join result —
    the manual skew-mitigation technique (for when AQE's runtime skew
    split isn't available, e.g. non-AQE engines or deliberate
    pre-partitioning) proven value-identical, not just row-identical."""
    from ..operators.joins import salted_join

    li = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 40)
        .select("l_orderkey", "l_extendedprice")
    )
    orders = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, on="l_orderkey", salt=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dround(F.sum(dec("l_extendedprice"))).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q90_compacted_scan",
    oracle="""
    SELECT l_returnflag,
      COUNT(*) AS n_items,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
      CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
      CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC
    """,
)
def q90_compacted_scan(spark, sf_dir):
    """LAYOUT MAINTENANCE inside the oracle gate (SCALING §9): the
    lineitem table is deliberately fragmented into many small files,
    then compacted with a sort-clustered rewrite
    (``operators.layout.compact`` — repartitionByRange on l_orderkey +
    sortWithinPartitions), and the aggregate over the COMPACTED copy
    must hash-match the oracle over the original parquet. Proves the
    rewrite is loss- and duplication-free, not just smaller; the
    clustering itself (disjoint per-file ranges, prunable row groups)
    is asserted in tests/test_layout.py."""
    import shutil as _sh

    from ..operators.layout import compact

    frag = _rt_dir(sf_dir, "lineitem_frag")
    _sh.rmtree(frag, ignore_errors=True)
    (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
        .repartition(48)
        .write.mode("overwrite")
        .parquet(frag)
    )
    compact(spark, frag, target_bytes=1 * 1024 * 1024, sort_cols=["l_orderkey"])
    back = spark.read.parquet(frag)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dround(F.sum(dec("l_extendedprice"))).alias("total_price"),
            F.min("l_orderkey").cast("bigint").alias("min_orderkey"),
            F.max("l_orderkey").cast("bigint").alias("max_orderkey"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q91_upsert_resolution",
    oracle="""
    WITH upd AS (
      SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
    ),
    resolved AS (
      SELECT c.c_custkey,
             COALESCE(u.c_acctbal, c.c_acctbal) AS bal,
             c.c_mktsegment
      FROM customer c LEFT JOIN upd u ON u.c_custkey = c.c_custkey
      WHERE c.c_custkey % 11 <> 0
    )
    SELECT c_mktsegment AS segment,
      COUNT(*) AS n_customers,
      CAST(ROUND(SUM(CAST(bal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
    FROM resolved
    GROUP BY c_mktsegment
    ORDER BY segment ASC
    """,
)
def q91_upsert_resolution(spark, sf_dir):
    """MUTATION SEMANTICS inside the oracle gate: the customer table
    becomes a merge-on-read keyed table (operators.table), one delta
    batch upserts +1000 to every 7th custkey, a LATER batch tombstones
    every 11th (so keys divisible by 77 are updated then deleted —
    delete wins by seq order), and the resolved read must hash-match
    the oracle's pure-SQL resolution. Exercises create/upsert/delete/
    latest-wins exactly as a pipeline would re-score and prune
    documents."""
    import shutil as _sh

    from ..operators.table import create_table, read_table, upsert

    root = _rt_dir(sf_dir, "cust_mor")
    _sh.rmtree(root, ignore_errors=True)
    base = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    create_table(base, root, ["c_custkey"])
    upsert(
        base.filter(F.col("c_custkey") % 7 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 1000.0
        ),
        root,
        ["c_custkey"],
    )
    upsert(
        base.filter(F.col("c_custkey") % 11 == 0).withColumn(
            "_op", F.lit("delete")
        ),
        root,
        ["c_custkey"],
    )
    return (
        read_table(spark, root)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dround(F.sum(dec("c_acctbal"))).alias("total_bal"),
        )
        .orderBy("segment")
    )


@query(
    "q92_streaming_rollup_serve",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
      COUNT(*) AS n_events,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start ASC, event_type ASC
    """,
)
def q92_streaming_rollup_serve(spark, sf_dir):
    """INCREMENTAL ROLLUP MAINTENANCE inside the oracle gate: events
    stream through the foreachBatch maintenance sink
    (streaming.rollup_stream), and the MAINTAINED rollup's mergeable
    aggregates must hash-match the oracle's direct scan — proving the
    streamed merge path (partials + versioned atomic publish +
    pointer-carried batch-id guard) is exact, not just internally
    consistent. Same nanos/NTZ discipline as q60."""
    import shutil as _sh

    from ..catalog import open_events_stream
    from ..streaming.rollup_stream import maintain_rollup, read_rollup

    stream, ts_ntz, _ = open_events_stream(spark, sf_dir)
    ev = stream.withColumn("ts", ts_ntz).select(
        "ts", "event_type", "user_id", "value"
    )
    root = _rt_dir(sf_dir, "rollup_mor")
    _sh.rmtree(root, ignore_errors=True)
    rollup_path, ckpt = os.path.join(root, "rollup"), os.path.join(root, "ckpt")
    q = maintain_rollup(ev, rollup_path, ckpt)
    q.awaitTermination(300)
    return (
        read_rollup(spark, rollup_path)
        .select(
            "hour_start",
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )


@query(
    "q86_pdf_roundtrip",
    oracle="""
    SELECT doc_id,
      length(text) AS n_chars,
      sha256(text) AS text_sha256
    FROM documents
    WHERE doc_id < 40
    ORDER BY doc_id ASC
    """,
)
def q86_pdf_roundtrip(spark, sf_dir):
    """PDF SINK + distributed SCAN inside the oracle gate (§2.A row
    34): 40 document texts become 40 pages of one PDF (stdlib writer,
    FlateDecode streams), the file is re-ingested via binaryFile and
    the stdlib content-stream parser, and every page's recovered text
    must be BYTE-EXACT (sha-256 against the original parquet text).
    Page order is the deterministic doc_id order, so page N maps back
    to the N-th doc_id."""
    from ..sources.binary import read_binary_dir
    from ..sources.pdf_source import pdf_read, pdf_write

    docs = [
        (int(r["doc_id"]), r["text"])
        for r in T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    ]
    out_dir = _rt_dir(sf_dir, "pdf_docs")
    os.makedirs(out_dir, exist_ok=True)
    pdf_write(os.path.join(out_dir, "docs.pdf"), [t for _, t in docs])

    mapping = spark.createDataFrame(
        [(i + 1, doc_id) for i, (doc_id, _) in enumerate(docs)],
        "page int, doc_id bigint",
    )
    pages = pdf_read(read_binary_dir(spark, out_dir, glob="*.pdf"))
    return (
        pages.join(F.broadcast(mapping), "page")
        .select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.sha2(F.col("text"), 256).alias("text_sha256"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q110 — SCHEMA EVOLUTION read (the 100 TB lake reality: files written
# by different producer generations coexist). Generation 1 has the
# original orders columns; generation 2 adds a column and drops
# another. A mergeSchema scan reads BOTH with NULL-filled gaps, and
# the oracle replays it with union_by_name — proving the evolved read
# is exact, not best-effort.
# ---------------------------------------------------------------------------
@query(
    "q110_schema_evolution",
    oracle="""
    WITH g1 AS (
      SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        NULL AS o_channel
      FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey <= 2000
    ),
    g2 AS (
      SELECT o_orderkey, o_custkey, NULL AS o_totalprice,
        CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END AS o_channel
      FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey <= 2000
    ),
    unioned AS (
      SELECT * FROM g1 UNION ALL BY NAME SELECT * FROM g2
    )
    SELECT
      COALESCE(o_channel, 'legacy') AS channel,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(COUNT(o_totalprice) AS BIGINT) AS n_priced,
      ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_priced
    FROM unioned
    GROUP BY 1
    ORDER BY channel ASC
    """,
)
def q110_schema_evolution(spark, sf_dir):
    """Two parquet generations with EVOLVED schemas written side by
    side, then ONE mergeSchema scan over the directory. Generation
    boundaries disappear at read time: missing columns are NULL, and
    the rollup over the merged view hash-matches the oracle's
    union-by-name. At 100 TB this is how a table survives producer
    upgrades without a rewrite."""
    import shutil as _sh

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    root = _rt_dir(sf_dir, "schema_evo")
    _sh.rmtree(root, ignore_errors=True)
    g1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double")
    )
    g2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 3 == 0, "web").otherwise("store").alias(
            "o_channel"
        ),
    )
    g1.write.mode("overwrite").parquet(os.path.join(root, "gen=1"))
    g2.write.mode("overwrite").parquet(os.path.join(root, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "gen=1"), os.path.join(root, "gen=2")
    )
    return (
        merged.groupBy(
            F.coalesce("o_channel", F.lit("legacy")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("o_totalprice").alias("n_priced"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_priced"
            ),
        )
        .orderBy("channel")
    )


@query(
    "q118_orc_roundtrip",
    oracle="""
    SELECT o_orderpriority AS priority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_price,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY priority ASC
    """,
)
def q118_orc_roundtrip(spark, sf_dir):
    """ORC SINK + SCAN inside the oracle gate: orders written to ORC
    PARTITIONED BY o_orderstatus (hive-style dirs), read back with a
    partition-pruning filter, aggregated — must hash-match the oracle
    computed from the original parquet. Exercises Spark's native ORC
    connector (predicate pushdown + partition pruning work the same
    as parquet: the 'O' filter prunes to one partition directory);
    types survive because ORC is a typed columnar format, no
    text-roundtrip hazards."""
    out = _rt_dir(sf_dir, "orc_orders")
    (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority",
                "o_totalprice")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .orc(out)
    )
    back = spark.read.orc(out).filter(F.col("o_orderstatus") == "O")
    return (
        back.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dround(F.sum(dec("o_totalprice"))).alias("total_price"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
        )
        .orderBy("priority")
    )


@query(
    "q275_orc_roundtrip",
    oracle="""
    SELECT l_returnflag AS flag, l_linestatus AS status,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
        AS DOUBLE) AS total_price,
      CAST(MIN(l_orderkey) AS BIGINT) AS min_key
    FROM lineitem
    WHERE l_orderkey % 5 = 0
    GROUP BY l_returnflag, l_linestatus
    ORDER BY flag ASC, status ASC
    """,
)
def q275_orc_roundtrip(spark, sf_dir):
    """ORC SINK + SCAN inside the oracle gate: a lineitem slice goes
    out through Spark's native columnar ORC writer and comes back
    through the ORC reader (schema preserved in the file footer — no
    inference); the aggregate must hash-match the oracle computed
    from the original parquet. Adds a second columnar interchange
    format beside parquet to the connector matrix (Avro is not
    bundled in this runtime; ORC is built in)."""
    out = _rt_dir(sf_dir, "orc_lineitem")
    (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select(
            "l_orderkey", "l_returnflag", "l_linestatus",
            "l_extendedprice",
        )
        .write.mode("overwrite")
        .orc(out)
    )
    back = spark.read.orc(out)
    return (
        back.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_linestatus").alias("status"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dround(F.sum(dec("l_extendedprice"))).alias("total_price"),
            F.min("l_orderkey").cast("bigint").alias("min_key"),
        )
        .orderBy(F.asc("flag"), F.asc("status"))
    )


# ---------------------------------------------------------------------------
# q330 — Z-order (Morton) layout census (round 9): the
# operators/layout.zorder_value bit interleave under the value-hash
# gate. 16 equal-width z-buckets over distinct (l_partkey,
# l_suppkey): every bucket covers a NARROW RECTANGLE of both
# dimensions at once — the min/max-pruning property a lexicographic
# sort only gives its leading column. All-integer bit arithmetic
# after the min/max scaling (identical IEEE division + floor).
# ---------------------------------------------------------------------------
_Z_BITS = 16
_Z_TOP = (1 << _Z_BITS) - 1


def _z_scaled_duck(c: str, lo: str, hi: str) -> str:
    return (
        f"CAST(LEAST({_Z_TOP}, FLOOR((CAST({c} AS DOUBLE) - {lo}) / "
        f"(CASE WHEN {hi} = {lo} THEN 1.0 ELSE {hi} - {lo} END)"
        f" * {_Z_TOP})) AS BIGINT)"
    )


def _z_terms_duck() -> str:
    terms = []
    for j, (c, lo, hi) in enumerate(
        [("x", "lox", "hix"), ("y", "loy", "hiy")]
    ):
        s = _z_scaled_duck(c, lo, hi)
        for i in range(_Z_BITS):
            terms.append(f"((({s} >> {i}) & 1) << {i * 2 + j})")
    return " + ".join(terms)


@query(
    "q330_zorder_layout_census",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT l_partkey AS x, l_suppkey AS y FROM lineitem
    ),
    b AS (
      SELECT MIN(CAST(x AS DOUBLE)) AS lox, MAX(CAST(x AS DOUBLE)) AS hix,
             MIN(CAST(y AS DOUBLE)) AS loy, MAX(CAST(y AS DOUBLE)) AS hiy
      FROM e
    ),
    z AS (SELECT x, y, ({_z_terms_duck()}) AS z FROM e CROSS JOIN b)
    SELECT CAST(z >> 28 AS INT) AS zbucket,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
      CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
    FROM z GROUP BY 1 ORDER BY 1
    """,
)
def q330_zorder_layout_census(spark, sf_dir):
    """operators/layout.zorder_value over distinct (l_partkey,
    l_suppkey): per-z-bucket extent census — each of the 16 buckets
    pins a narrow rectangle of BOTH key dimensions."""
    from ..operators.layout import zorder_value

    e = (
        T(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("x"), F.col("l_suppkey").alias("y")
        )
        .distinct()
    )
    z = e.withColumn("z", zorder_value(e, ["x", "y"], bits=_Z_BITS))
    return (
        z.groupBy(
            F.shiftright("z", 28).cast("int").alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# q331 — rendezvous (HRW) shard assignment census (round 9):
# operators/layout.hrw_assign over documents, 8 shards. The argmax
# md5 weight is map-side GREATEST over (weight, shard) structs — no
# explode, no shuffle before the census aggregate; the md5 tier
# keeps the whole placement engine-replayable.
# ---------------------------------------------------------------------------
@query(
    "q331_hrw_shard_census",
    oracle="""
    WITH w AS (
      SELECT doc_id, n_chars, s.s AS shard,
        CAST(('0x' || substr(md5(CAST(s.s AS VARCHAR) || ':' ||
          CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT AS h
      FROM documents CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
    ),
    pick AS (
      SELECT doc_id, n_chars, shard,
        ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY h DESC, shard DESC) AS rn
      FROM w
    )
    SELECT CAST(shard AS INT) AS shard,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM pick WHERE rn = 1 GROUP BY shard ORDER BY shard
    """,
)
def q331_hrw_shard_census(spark, sf_dir):
    """operators/layout.hrw_assign over documents (8 shards):
    per-shard census of the rendezvous placement."""
    from ..operators.layout import hrw_assign

    docs = T(spark, sf_dir, "documents")
    assigned = hrw_assign(docs, "doc_id", 8)
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("shard")
    )
