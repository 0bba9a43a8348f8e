"""Sources & sinks — SURVEY.md §2.1.

Parquet is the primary format (io.table). This module covers the
other connector surfaces: CSV and JSON-lines ingest with explicit
schemas (never inferSchema in production — it's an extra full scan),
and the partitioned parquet sink. No CSV/JSON fixtures exist, so each
gate query round-trips fixture data through the format into
``.tmp/`` inside the repo and verifies the re-read against the
source-of-truth parquet via the oracle — which checks BOTH the writer
and the reader.

JDBC: no database exists in this environment; the connector surface
is documented here for completeness —
``spark.read.format("jdbc").option("url", ...).option("dbtable", ...)
.option("partitionColumn"/"lowerBound"/"upperBound"/"numPartitions",
...)`` is the parallel-read shape (never omit partitionColumn: a
single-connection JDBC scan is a driver bottleneck at any scale).
"""

from __future__ import annotations

import atexit
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_flight_spark.io import table
from big_data_flight_spark.registry import DSUM, dsum, gate_query

# Per-process scratch dir: round-trip gates write under
# .tmp/s<pid> so concurrent sessions (e.g. pytest + compare.py
# running side by side) never clobber each other's in-flight
# _temporary commit dirs. Cleaned up at interpreter exit; stale
# dirs from killed processes are swept on next import.
_TMP_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".tmp"
)
_TMP = os.path.join(_TMP_ROOT, f"s{os.getpid()}")
atexit.register(lambda: shutil.rmtree(_TMP, ignore_errors=True))


def _pid_alive(pid: int) -> bool:
    """Portable liveness probe: signal 0 delivers nothing but performs
    the full permission/existence check. ProcessLookupError = dead;
    PermissionError = alive but owned by someone else (still alive —
    must protect its dir). Unlike an ``os.path.exists('/proc/<pid>')``
    probe this works on non-/proc platforms, where the old form read
    every peer as dead (ADVICE r3)."""
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return True  # unknown -> assume alive (safe direction)


def _sweep_stale_scratch(min_age_sec: float = 600.0) -> None:
    """Remove scratch dirs of dead sessions. Two guards, BOTH required:
    the owning PID must be gone AND the dir must have been idle for a
    while. The age gate protects against sweeping a dir whose owner
    exited moments ago mid-handoff; a LIVE pid always protects its dir
    — a long-running idle session must never lose its scratch (PID
    reuse can at worst *retain* a stale dir until the recycled pid
    exits, which is the safe direction)."""
    if not os.path.isdir(_TMP_ROOT):
        return
    now = time.time()
    for entry in os.listdir(_TMP_ROOT):
        if not entry.startswith("s") or not entry[1:].isdigit():
            continue
        if entry[1:] == str(os.getpid()):
            continue
        path = os.path.join(_TMP_ROOT, entry)
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue
        if not _pid_alive(int(entry[1:])) and age > min_age_sec:
            shutil.rmtree(path, ignore_errors=True)


_sweep_stale_scratch()


_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@gate_query(
    "scan_csv",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n, {DSUM("o_totalprice", "sum_price")},
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key, CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders WHERE o_orderkey < 1000
    GROUP BY o_orderstatus
    """,
    tags=("source",),
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip: write an orders slice as headered CSV, read it
    back with an EXPLICIT schema (the flight-CSV ingest shape), and
    aggregate. The oracle aggregates the original parquet — a value
    match proves the CSV writer/reader preserved every value (doubles
    survive via Spark's shortest-roundtrip formatting)."""
    out = os.path.join(_TMP, "csv_orders")
    src = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    )
    src.write.mode("overwrite").option("header", True).csv(out)
    df = spark.read.schema(_CSV_SCHEMA).option("header", True).csv(out)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "sum_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@gate_query(
    "scan_json",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {DSUM("value", "sum_value")},
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events WHERE event_id < 2000
    GROUP BY event_type
    """,
    tags=("source",),
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round-trip with explicit schema; the nested-JSON
    props column survives as a string and is re-extracted after the
    round trip — covering writer, reader, and schema-on-read."""
    out = os.path.join(_TMP, "json_events")
    src = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "event_type", "value", "props")
    )
    src.write.mode("overwrite").json(out)
    df = spark.read.schema(_JSON_SCHEMA).json(out)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
    )


@gate_query(
    "sink_parquet",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n, {DSUM("l_extendedprice", "sum_price")}
    FROM lineitem WHERE l_orderkey < 2000
    GROUP BY l_returnflag
    """,
    tags=("source", "sink"),
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink: write a lineitem slice partitioned by
    l_returnflag (hive-style directories), re-read, aggregate by the
    partition column. At scale partitionBy enables partition PRUNING
    on read — filters on l_returnflag skip whole directories
    (visible as 'PartitionFilters' in explain)."""
    out = os.path.join(_TMP, "parquet_lineitem")
    src = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 2000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
    )
    src.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    df = spark.read.parquet(out)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "sum_price")
    )


@gate_query(
    "scan_orc",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n, {DSUM("c_acctbal", "sum_bal")},
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key,
           CAST(SUM(length(c_name)) AS BIGINT) AS wide_len_sum
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("source",),
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: write customer as ORC (Spark's second native
    columnar format — same predicate-pushdown + column-pruning path as
    parquet), read it back, aggregate. The oracle aggregates the
    original parquet, so a value match proves lossless ORC encode/
    decode for long/int/double/string columns — including the string
    column c_name, whose round-trip the wide_len_sum length checksum
    audits (r6 review: it was written and read but never verified; the
    fixture's customer has no other wide string columns)."""
    out = os.path.join(_TMP, "orc_customer")
    table(spark, sf_dir, "customer").write.mode("overwrite").orc(out)
    df = spark.read.orc(out)
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("c_acctbal", "sum_bal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        F.sum(F.length("c_name")).cast("long").alias("wide_len_sum"),
    )


@gate_query(
    "sink_compaction",
    oracle=f"""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           {DSUM("l_extendedprice", "sum_price")},
           CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_key
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("source", "sink"),
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a fragmented table (64 shards here; in
    production, thousands of streaming micro-batch files) is rewritten
    into size-targeted files via repartition, then re-read and audited
    against the source — row counts, sums, and key bounds must all
    survive. At 100 TB this is the maintenance job that keeps scan
    task counts sane: target files of 128-512 MB so a 1000-executor
    read schedules O(data/128MB) tasks, not O(micro-batches)."""
    src = table(spark, sf_dir, "lineitem")
    fragmented = os.path.join(_TMP, "fragmented_lineitem")
    compacted = os.path.join(_TMP, "compacted_lineitem")
    src.repartition(64).write.mode("overwrite").parquet(fragmented)
    frag_df = spark.read.parquet(fragmented)
    # Size-targeted rewrite with NO driver-side count: maxRecordsPerFile
    # makes the writer roll a new file every 300k records, so the file
    # count tracks data size by construction. coalesce (not repartition)
    # merges the 64 fragment splits without a shuffle; at 100 TB pick
    # the coalesce factor from the file listing (bytes/target) and let
    # maxRecordsPerFile enforce the per-file bound.
    (
        frag_df.coalesce(4)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 300_000)
        .parquet(compacted)
    )
    out = spark.read.parquet(compacted)
    return out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice", "sum_price"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


@gate_query(
    "scan_binary_files",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) + 1 AS BIGINT) AS n_bytes,
           md5(text || chr(10)) AS content_md5,
           TRUE AS len_matches
    FROM documents WHERE doc_id < 50
    """,
    tags=("source", "multimodal"),
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source — the real ingest path for image/audio/video
    assets (path, modificationTime, length, content).

    STRONG oracle: the gate first materializes one deterministic file
    per document (the doc's text via the text sink — file bytes are
    exactly utf8(text) + 0x0A, partitioned by doc_id so the partition
    directory carries the key), then binaryFile-scans them back and
    digests the raw contents. DuckDB reproduces the digest as
    md5(text || chr(10)) and the size as octet_length(utf8) + 1, so a
    hash match proves the full write→list→read-binary cycle is
    byte-lossless. At scale: pathGlobFilter + recursiveFileLookup
    partition the listing, and content NEVER shuffles — project
    metadata/digests before any exchange, exactly as multimodal.py
    does."""
    out = os.path.join(_TMP, "binary_docs")
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(F.col("text").alias("value"), "doc_id")
    )
    docs.repartition(4, "doc_id").write.mode("overwrite").partitionBy("doc_id").text(out)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(out)
    )
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        (F.length("content") == F.col("length")).alias("len_matches"),
    )


@gate_query(
    "scan_text",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {DSUM("o_totalprice", "sum_price")}
    FROM orders WHERE o_orderkey < 1000
    GROUP BY o_orderstatus
    """,
    tags=("source",),
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unstructured text-line round-trip — the log-file ingest shape:
    rows serialized to pipe-delimited lines, written with the text
    source (one string column, no schema), read back and re-parsed
    with split(). The oracle aggregates the original parquet, so a
    match proves the serialize→parse cycle is lossless (doubles
    survive via shortest-roundtrip formatting). This is the pattern
    for raw server logs before they are promoted to columnar."""
    out = os.path.join(_TMP, "text_orders")
    src = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    lines = src.select(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out)
    parts = F.split(F.col("value"), "\\|")
    parsed = spark.read.text(out).select(
        parts.getItem(0).cast("long").alias("o_orderkey"),
        parts.getItem(1).alias("o_orderstatus"),
        parts.getItem(2).cast("double").alias("o_totalprice"),
    )
    return parsed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price")
    )


_XML_SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_size", T.LongType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)


@gate_query(
    "scan_xml",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n, {DSUM("p_retailprice", "sum_price")},
           CAST(SUM(p_size) AS BIGINT) AS sum_size,
           CAST(MIN(p_partkey) AS BIGINT) AS min_key
    FROM part WHERE p_partkey < 1000
    GROUP BY p_brand
    """,
    tags=("source",),
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip on Spark 4's built-in XML source (merged
    spark-xml): write a part slice as <part> row elements, read back
    with an EXPLICIT schema (schema-on-read, no inference job), and
    aggregate. The oracle aggregates the original parquet — a value
    match proves element encoding/escaping and double formatting
    survived the trip. Same distributed properties as the CSV/JSON
    round-trips: splittable writes, per-file parallel reads, and the
    explicit schema keeps the read single-pass at 100 TB (inference
    would scan twice)."""
    out = os.path.join(_TMP, "xml_part")
    src = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 1000)
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
    )
    src.write.mode("overwrite").format("xml").option("rowTag", "part").save(out)
    df = spark.read.schema(_XML_SCHEMA).format("xml").option("rowTag", "part").load(out)
    return df.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("p_retailprice", "sum_price"),
        F.sum("p_size").alias("sum_size"),
        F.min("p_partkey").alias("min_key"),
    )


@gate_query(
    "scan_schema_evolution",
    oracle=f"""
    SELECT CASE WHEN o_orderkey < 500 THEN NULL ELSE o_orderpriority END
             AS priority,
           COUNT(*) AS n,
           {DSUM("o_totalprice", "sum_price")},
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM orders
    WHERE o_orderkey < 1000
    GROUP BY priority
    """,
    tags=("source", "etl"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift ingest: two parquet batches of the same logical
    table where the OLDER batch predates a column (orders < 500
    written without o_orderpriority, >= 500 with it), read back as one
    dataset with mergeSchema=true — the reader unions the footers and
    nulls the missing column for old files, exactly what a 100 TB
    directory accumulated across pipeline versions needs. The oracle
    reproduces the drift declaratively on the source table (the
    round-trip-oracle trick of scan_csv: a value match proves the
    merged read preserved every row and nulled exactly the pre-drift
    slice). Plan note: mergeSchema is a footer-only driver-side merge
    — the data path stays parallel scans; keep it OFF for stable-
    schema tables (footer merge is O(files)) and evolve via explicit
    schema where possible."""
    out = os.path.join(_TMP, "schema_evolution")
    src = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    src.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(out, "b1"))
    src.filter(F.col("o_orderkey") >= 500).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(out, "b2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "b1"), os.path.join(out, "b2")
    )
    return merged.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "sum_price"),
        F.min("o_orderkey").alias("min_key"),
    )


@gate_query(
    "sink_sorted_layout",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {DSUM("value", "sum_value")},
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-17 00:00:00'
    GROUP BY event_type
    """,
    tags=("sink", "source"),
)
def sink_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series write layout: repartitionByRange(ts) +
    sortWithinPartitions(ts) → parquet, then read back with a week
    predicate and aggregate. Range partitioning puts disjoint time
    spans in separate files and the in-file sort makes row-group
    min/max statistics tight, so a time predicate prunes whole files
    AND whole row groups at plan time — the layout every append-only
    event store needs at 100 TB (there: partitionBy(date) for
    directory pruning + this sort for row-group pruning within each
    date). The oracle runs the same week filter on the source table —
    a value match proves the re-layout lost and duplicated nothing
    while making the scan prunable."""
    out = os.path.join(_TMP, "sorted_events")
    src = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    (
        src.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-17").cast("timestamp"))
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@gate_query(
    "sink_partitioned_layout",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {DSUM("value", "sum_value")},
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
    tags=("sink", "source"),
)
def sink_partitioned_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned table layout: partitionBy(event_type) →
    one directory per partition value, then read back with a partition
    predicate. The predicate is satisfied by DIRECTORY pruning — the
    scan lists only event_type=click/ and event_type=purchase/, reading
    zero bytes of any other partition (PartitionFilters in the plan,
    pinned in the snapshot) — which is THE table layout for 100 TB
    append-only stores: partitionBy(low-cardinality key, usually date)
    for directory pruning, plus sink_sorted_layout's in-file sort for
    row-group pruning within each directory. The oracle runs the same
    predicate over the source table — a value match proves the
    re-layout lost and duplicated nothing (the partition column itself
    round-trips through the directory name, exercising partition-value
    encode/decode)."""
    out = os.path.join(_TMP, "part_events")
    src = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@gate_query(
    "join_partition_pruned_runtime",
    oracle=f"""
    WITH tc AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n
      FROM events GROUP BY event_type
    ),
    top2 AS (
      SELECT event_type, type_n FROM (
        SELECT event_type, type_n,
               row_number() OVER (ORDER BY type_n DESC, event_type) AS rk
        FROM tc
      ) WHERE rk <= 2
    )
    SELECT e.event_type, t.type_n,
           CAST(COUNT(*) AS BIGINT) AS n,
           {DSUM("e.value", "sum_value")},
           MIN(e.event_id) AS min_id,
           MAX(e.event_id) AS max_id
    FROM events e JOIN top2 t ON e.event_type = t.event_type
    GROUP BY e.event_type, t.type_n
    """,
    tags=("join", "sink", "source"),
)
def join_partition_pruned_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the runtime companion of
    sink_partitioned_layout's static directory pruning and THE star-
    schema optimization at 100 TB: the fact table is partitioned on
    the join key, the dimension's predicate (top-2 event types by
    popularity — an aggregate-derived attribute Catalyst cannot
    statically push through the join) is evaluated at runtime, and the
    fact SCAN lists only the directories whose keys survive —
    ``dynamicpruningexpression`` inside PartitionFilters, reusing the
    broadcast exchange as the filter (no extra fact pass). The builder
    ASSERTS the pruning subquery actually planned (the loud
    join_bloom_pruned convention — a gate failure, not just a snapshot
    diff); the oracle computes the same top-2 join over the source
    table, so the partitioned round-trip must also be lossless."""
    out = os.path.join(_TMP, "dpp_events")
    src = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src.write.mode("overwrite").partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    counts = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("type_n"))
    )
    w = Window.orderBy(F.col("type_n").desc(), "event_type")
    top2 = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .drop("rk")
    )
    joined = fact.join(F.broadcast(top2), "event_type").groupBy(
        "event_type", "type_n"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan:
        raise RuntimeError(
            "dynamic partition pruning did NOT plan — the fact scan "
            "would read every partition; check the dim filter shape "
            "and spark.sql.optimizer.dynamicPartitionPruning.enabled"
        )
    return joined


@gate_query(
    "sink_bucketed_join",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_items,
           {DSUM("l_extendedprice", "sum_price")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("sink", "source", "join"),
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: both fact tables written
    bucketBy(8, key) + sortBy(key) as EXTERNAL tables (explicit paths
    under the session scratch dir — the in-memory catalog holds only
    metadata), then joined on the bucket key. Bucketing is the
    pay-the-shuffle-once mechanism for repeated fact-fact joins at
    100 TB: both sides hash-place rows into matching bucket files at
    WRITE time, so every later join on that key is exchange-free
    (asserted with broadcast disabled in tests/test_bucketing.py; at
    fixture scale the optimizer may still prefer a broadcast — also
    exchange-free). The oracle joins the original parquet — a value
    match proves the bucketed layout preserved every row and the
    bucket-pruned join matched them all."""
    for t in ("li_bucketed_gate", "o_bucketed_gate"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", os.path.join(_TMP, "li_bucketed_gate"))
        .mode("overwrite").format("parquet").saveAsTable("li_bucketed_gate")
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", os.path.join(_TMP, "o_bucketed_gate"))
        .mode("overwrite").format("parquet").saveAsTable("o_bucketed_gate")
    )
    j = spark.table("li_bucketed_gate").join(
        spark.table("o_bucketed_gate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice", "sum_price"),
    )


# ---------------------------------------------------------------------------
# Z-order clustered layout — multi-dimension file skipping
# ---------------------------------------------------------------------------

Z_BITS = 8  # per-dimension resolution after min/max normalization


def _z_interleave(u: str, d: str, shr, shl) -> str:
    """Bit-interleave expression for a 2-D Z-value, generated from the
    SAME Python constants for both engines (only the shift syntax
    differs: Spark has shiftright/shiftleft functions, DuckDB the
    >>/<< operators). u's bit i lands at position 2i+1, d's at 2i;
    the terms touch disjoint bits so integer + is bitwise OR."""
    terms = []
    for i in range(Z_BITS):
        terms.append(shl(f"({shr(u, i)} & 1)", 2 * i + 1))
        terms.append(shl(f"({shr(d, i)} & 1)", 2 * i))
    return " + ".join(terms)


_Z_SPARK = _z_interleave(
    "un", "dn",
    lambda x, i: f"shiftright({x}, {i})",
    lambda x, i: f"shiftleft({x}, {i})",
)
_Z_DUCK = _z_interleave(
    "un", "dn",
    lambda x, i: f"(({x}) >> {i})",
    lambda x, i: f"(({x}) << {i})",
)
_Z_SCALE = 2**Z_BITS - 1
# Scale-free query box on the NORMALIZED coordinates (≈38% of the user
# span × ≈36% of the day span), so the same slice is selected at every
# sf — AND at every Z_BITS: the bounds derive from _Z_SCALE fractions
# (r6 review: hardcoded 0-255 literals would silently shrink the box
# to ~9%x9% if Z_BITS were ever widened, weakening the file-skipping
# coverage this gate exists to pin). At Z_BITS=8 these evaluate to the
# historical 64/160/80/170.
_Z_BOX = (
    f"un BETWEEN {int(0.2510 * _Z_SCALE)} AND {int(0.6275 * _Z_SCALE)} "
    f"AND dn BETWEEN {int(0.3138 * _Z_SCALE)} AND {int(0.6667 * _Z_SCALE)}"
)


def write_zorder_layout(spark: SparkSession, sf_dir: str, out: str) -> None:
    """Write events Z-clustered on (user_id, day): normalize both
    dimensions to Z_BITS-bit ranks via their min/max (the step naive
    interleaving skips — with mismatched bit widths the wider column's
    high bits dominate every split and the narrow dimension never
    prunes; measured on this fixture: un-normalized interleave gave 16
    of 16 files the FULL day span), interleave, then
    repartitionByRange + sortWithinPartitions on z. The min/max bounds
    ride a 1-row broadcast cross join (the sanctioned
    evt_late_data shape — no driver scalar)."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    e = e.withColumn(
        "day",
        F.expr("datediff(to_date(ts), DATE '2024-01-01')").cast("long"),
    )
    bounds = e.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min("day").alias("dmin"),
        F.max("day").alias("dmax"),
    )
    e = (
        e.crossJoin(F.broadcast(bounds))
        .withColumn(
            "un",
            F.expr(f"((user_id - umin) * {_Z_SCALE}) DIV greatest(umax - umin, 1)"),
        )
        .withColumn(
            "dn",
            F.expr(f"((day - dmin) * {_Z_SCALE}) DIV greatest(dmax - dmin, 1)"),
        )
        .withColumn("z", F.expr(_Z_SPARK).cast("long"))
        .drop("umin", "umax", "dmin", "dmax")
    )
    (
        e.repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(out)
    )


@gate_query(
    "sink_zorder_layout",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT event_id, user_id, event_type, value,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
      FROM events
    ),
    b AS (
      SELECT MIN(user_id) AS umin, MAX(user_id) AS umax,
             MIN(day) AS dmin, MAX(day) AS dmax
      FROM base
    ),
    norm AS MATERIALIZED (
      SELECT event_id, event_type, value,
             ((user_id - umin) * {_Z_SCALE}) // greatest(umax - umin, 1) AS un,
             ((day - dmin) * {_Z_SCALE}) // greatest(dmax - dmin, 1) AS dn
      FROM base CROSS JOIN b
    ),
    zd AS (
      SELECT event_id, event_type, value, un, dn,
             CAST({_Z_DUCK} AS BIGINT) AS z
      FROM norm
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           {DSUM("value", "sum_value")},
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           CAST(SUM(z) AS BIGINT) AS z_checksum
    FROM zd
    WHERE {_Z_BOX}
    GROUP BY event_type
    """,
    tags=("sink", "source"),
)
def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered table layout: events written range-partitioned
    and sorted on the bit-interleaved Z-value of (user_id, day), then
    read back with a 2-D box predicate on the normalized coordinates.
    Z-ordering is THE layout for multi-dimension file skipping at
    100 TB — a 1-D sort gives tight parquet min/max stats on one
    column only, while the Z-curve bounds EVERY file in BOTH
    dimensions (verified from parquet footer statistics in
    tests/test_scale_patterns.py: 16/16 files tight in user, 15/16
    tight in day on this fixture), so a (user × time) box skips files
    on either predicate alone or both combined. The box filter lands
    as PushedFilters on the persisted un/dn columns (plan-pinned); the
    z_checksum column recomputes the interleave closed-form in the
    oracle, proving the Z computation itself round-tripped through the
    layout. The normalization cross join is the sanctioned 1-row
    broadcast shape."""
    out = os.path.join(_TMP, "zorder_events")
    write_zorder_layout(spark, sf_dir, out)
    back = spark.read.parquet(out).filter(_Z_BOX)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.sum("z").cast("long").alias("z_checksum"),
    )


@gate_query(
    "sink_dynamic_partition_overwrite",
    oracle=f"""
    WITH eff AS (
      SELECT ts, event_type, value FROM events
      WHERE strftime(ts, '%Y-%m-%d') <> '2024-01-05'
      UNION ALL
      SELECT ts, event_type, value * 2 AS value FROM events
      WHERE strftime(ts, '%Y-%m-%d') = '2024-01-05'
        AND event_type = 'click'
    )
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           COUNT(*) AS n,
           {DSUM("value", "sum_value")},
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM eff GROUP BY dt
    """,
    tags=("sink", "source", "etl"),
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the incremental-reload primitive
    of every partitioned 100 TB table: a backfill job rewrites ONLY
    the partitions present in its output, leaving the other N-1
    untouched (static overwrite mode would truncate the whole table
    first — the classic production incident). The gate loads events
    partitioned by day, then overwrites day 2024-01-05 with a
    CORRECTED slice (clicks only, values doubled) under
    spark.sql.sources.partitionOverwriteMode=dynamic, scoped and
    restored in a finally per the scoped-conf sink-gate pattern. The
    readback proves BOTH halves of the contract: the target day
    contains only the delta (old rows gone — replacement, not
    append: n_types drops to 1) and every other day is bit-identical
    (untouched directories). The partition column round-trips through
    directory names and is re-CAST to string on output (partition
    type inference reads it back as DATE; bare DATE outputs are
    banned by the parity rules)."""
    out = os.path.join(_TMP, "dyn_overwrite_events")
    src = (
        table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    )
    src.write.mode("overwrite").partitionBy("dt").parquet(out)
    delta = src.filter(
        (F.col("dt") == "2024-01-05") & (F.col("event_type") == "click")
    ).withColumn("value", F.col("value") * 2)
    # Loud precondition, not a mystery red row (r6 review): an EMPTY
    # delta makes dynamic overwrite a silent no-op (no partitions in
    # the output -> nothing replaced), while the oracle still models
    # the day as corrected. Data-dependent on the fixture having
    # clicks that day (7/68/660 rows at the three sfs today); O(1)
    # limit(1) probe, the loop-control-scalar class.
    if not delta.limit(1).count():
        raise RuntimeError(
            "sink_dynamic_partition_overwrite: correction delta is empty "
            "(no 'click' events on 2024-01-05 in this fixture) — dynamic "
            "overwrite would silently replace nothing"
        )
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "dynamic")
        delta.write.mode("overwrite").partitionBy("dt").parquet(out)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    back = spark.read.parquet(out)
    return back.groupBy(F.col("dt").cast("string").alias("dt")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


@gate_query(
    "scan_csv_malformed",
    oracle="""
    SELECT CASE WHEN doc_id % 7 = 0 THEN 'corrupt' ELSE 'ok' END AS status,
           COUNT(*) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS sum_a,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN doc_id * 3 END)
                AS BIGINT) AS sum_b,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_raw
    FROM documents
    GROUP BY status
    """,
    tags=("source",),
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-row CSV ingest under PERMISSIVE mode — the
    quarantine-don't-crash contract every production loader needs:
    rows whose column fails the declared schema keep their VALID
    fields (verified on this build: the long a column still parses on
    a row whose b is garbage), the failing field nulls, and the raw
    line lands in columnNameOfCorruptRecord for quarantine. The gate
    deterministically renders one CSV line per doc (every 7th doc
    gets an unparseable b plus a trailing extra field), round-trips
    it through a text sink + schema'd CSV read, and aggregates per
    status: row counts, the still-parsed a sums on BOTH sides of the
    quarantine, the null'd b sum (NULL for the corrupt group in both
    engines — SUM over all-NULL), and the corrupt-payload count from
    the raw-record column. The oracle regenerates the same closed
    form from doc_id arithmetic — a mismatch means rows were dropped
    (FAILFAST-style), mis-quarantined, or partially-parsed fields
    were thrown away.

    Scale: malformed handling is per-row inside the scan task — no
    extra pass, no shuffle; the corrupt column prunes away unless
    selected."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    line = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat_ws(",", "doc_id", F.lit("notanumber"), F.lit("bad"), F.lit("x")),
    ).otherwise(
        F.concat_ws(",", "doc_id", (F.col("doc_id") * 3).cast("string"), F.lit("ok"))
    )
    out = os.path.join(_TMP, "csv_malformed")
    docs.select(line.alias("value")).write.mode("overwrite").text(out)
    back = (
        spark.read.schema("a long, b long, note string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    return (
        back.groupBy(
            F.when(F.col("_corrupt_record").isNotNull(), "corrupt")
            .otherwise("ok")
            .alias("status")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a").cast("long").alias("sum_a"),
            F.sum("b").cast("long").alias("sum_b"),
            F.count("_corrupt_record").cast("long").alias("n_raw"),
        )
    )


@gate_query(
    "sink_nested_roundtrip",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           COUNT(*) AS n_items,
           {DSUM("l_extendedprice", "sum_price")},
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_lineno,
           CAST(floor(MAX(l_quantity)) AS BIGINT) AS max_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("sink", "source"),
)
def sink_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data modeling round-trip — the document-shaped table
    layout (order + its line items as one row) that co-locates a
    parent with its children so point lookups read ONE row instead of
    running a join: orders⋈lineitem shredded into
    array<struct<...>> per order (sort_array for a deterministic
    child order), written as NESTED parquet, read back, exploded, and
    re-aggregated. The oracle aggregates the FLAT join directly — a
    value match proves the nest → parquet (Dremel
    repetition/definition encoding) → unnest chain lost and
    duplicated nothing, field-for-field. Complex types stay strictly
    INTERNAL (the nested table on disk); the gate output is flat per
    the driver canonicalization rules.

    Scale: the nest is one groupBy(o_orderkey) shuffle — the same
    cost as the join it replaces forever after; per-order child
    arrays are bounded (≤7 line items in TPC-H); the read-back scan
    prunes nested FIELDS like columns (ReadSchema shows the struct
    projection)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity",
        "l_extendedprice",
    )
    nested = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderstatus")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "l_linenumber", "l_suppkey", "l_quantity",
                        "l_extendedprice",
                    )
                )
            ).alias("items")
        )
    )
    out = os.path.join(_TMP, "nested_orders")
    nested.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    flat = back.select(
        "o_orderkey", "o_orderstatus", F.explode("items").alias("it")
    )
    return flat.groupBy("o_orderstatus").agg(
        F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
        F.count(F.lit(1)).alias("n_items"),
        dsum("it.l_extendedprice", "sum_price"),
        F.sum("it.l_linenumber").cast("long").alias("sum_lineno"),
        F.floor(F.max("it.l_quantity")).cast("long").alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# scan_python_datasource — the Spark 4 Python DataSource (connector SDK)
# ---------------------------------------------------------------------------

_PYDS_PARTS = 4
_PYDS_ROWS = 500
_PYDS_MOD = 1000003


def _register_flightgen(spark: SparkSession) -> None:
    """Define + register the custom Python data source. Defined inside
    the call (executor-picklable closure over module constants) and
    re-registered idempotently — registration overwrites by name."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _FlightGenReader(DataSourceReader):
        def __init__(self, options):
            self.parts = int(options.get("parts", _PYDS_PARTS))
            self.rows = int(options.get("rows", _PYDS_ROWS))

        def partitions(self):
            return [InputPartition(p) for p in range(self.parts)]

        def read(self, partition):
            p = partition.value
            for i in range(self.rows):
                gid = p * self.rows + i
                val = (gid * gid * 31 + 7) % _PYDS_MOD
                yield (p, gid, val, f"c{gid % 5}")

    class FlightGenDataSource(DataSource):
        @classmethod
        def name(cls):
            return "flightgen"

        def schema(self):
            return "part int, gid bigint, val bigint, cat string"

        def reader(self, schema):
            return _FlightGenReader(self.options)

    spark.dataSource.register(FlightGenDataSource)


@gate_query(
    "scan_python_datasource",
    oracle=f"""
    WITH g AS (
      SELECT r AS gid,
             r // {_PYDS_ROWS} AS part,
             (r * r * 31 + 7) % {_PYDS_MOD} AS val,
             'c' || (r % 5) AS cat
      FROM range(0, {_PYDS_PARTS * _PYDS_ROWS}) t(r)
    )
    SELECT cat,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           CAST(SUM(gid) AS BIGINT) AS sum_gid,
           CAST(COUNT(DISTINCT part) AS BIGINT) AS n_parts
    FROM g GROUP BY cat
    """,
    tags=("source", "udf"),
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON DATA SOURCE (the Spark-4 connector SDK — the
    API a user would implement to scan a bespoke feed Spark has no
    built-in reader for): a DataSource subclass declares the schema,
    its reader PLANS partitions (one InputPartition per generator
    shard — the unit of scan parallelism), and each partition's
    read() streams tuples from a deterministic closed form. The gate
    aggregates per category and keeps COUNT(DISTINCT part) as the
    audit that rows really arrived from every planned partition (a
    reader that silently collapsed to one partition still produces
    the rows but is the wrong scan shape — at 100 TB partition
    planning IS the connector's scalability). The oracle regenerates
    the closed form with range(); sf_dir is deliberately unused —
    the source is the connector itself.

    Documented skip alongside: the built-in avro format is an
    external jar not shippable into this offline env (same
    scan_jdbc rationale, connectors.py:12)."""
    _register_flightgen(spark)
    df = spark.read.format("flightgen").load()
    return df.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("val").cast("long").alias("sum_val"),
        F.sum("gid").cast("long").alias("sum_gid"),
        F.countDistinct("part").cast("long").alias("n_parts"),
    )


@gate_query(
    "sink_retention_expire",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           COUNT(*) AS n,
           {DSUM("value", "sum_value")},
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-08'
    GROUP BY dt
    """,
    tags=("sink", "etl"),
)
def sink_retention_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level retention expiry (TTL) — the warehouse
    maintenance job every regulated 100 TB table runs: partitions
    older than the retention horizon are dropped WHOLESALE by
    deleting their directories, never by a filter-rewrite of the
    table (a rewrite reads and rewrites 100 TB to delete 7 days; the
    directory drop is O(expired partitions) metadata work — the same
    asymmetry that motivates partitionBy in the first place, and the
    exact mechanism of SQL ALTER TABLE DROP PARTITION / Delta VACUUM
    after retention). The gate lands events partitioned by day (30
    directories), enumerates partitions from the directory layout
    (the Hive-catalog view of the table), expires every day before
    2024-01-08, and aggregates the readback. The oracle recomputes
    the surviving week's stats straight from the source: a hash match
    proves the expired days are GONE (any surviving expired row adds
    a group or inflates n) and the surviving 23 days are
    bit-identical (min/max ids + exact decimal sums per day).

    The directory deletes are deterministic filesystem metadata ops
    (the foreachBatch epoch-sink convention); the partition column
    re-CASTs to string on readback per the parity rules."""
    out = os.path.join(_TMP, "retention_events")
    src = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "value")
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    )
    # static overwrite truncates the whole directory first, so no
    # pre-clean of a previous run's expired layout is needed
    src.write.mode("overwrite").partitionBy("dt").parquet(out)
    cutoff = "2024-01-08"
    for entry in sorted(os.listdir(out)):
        if entry.startswith("dt=") and entry[3:] < cutoff:
            shutil.rmtree(os.path.join(out, entry))
    back = spark.read.parquet(out)
    return back.groupBy(F.col("dt").cast("string").alias("dt")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# sink_python_datasource — the WRITE side of the Spark 4 Python
# DataSource SDK (r7; the read side is scan_python_datasource above)
# ---------------------------------------------------------------------------


def _register_flightsink(spark: SparkSession) -> None:
    """Custom Python data-source WRITER with a real two-phase commit:
    each task writes its rows to a `.tmp` file and returns the name in
    its WriterCommitMessage; the DRIVER-side commit() publishes every
    temp file by renaming it to its final `.csv` name (and abort()
    deletes temps). The read-back path lists only final `.csv` files,
    so a row can only be seen if BOTH phases ran — the same
    visibility contract a real object-store committer provides."""
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Msg(WriterCommitMessage):
        def __init__(self, tmp_name):
            self.tmp_name = tmp_name

    class _FlightSinkWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]
            # test hook: fail the task that sees this key, AFTER it
            # already wrote some temp rows — proves abort() makes
            # partial task output invisible (the 2PC contract).
            self.fail_on = int(options.get("fail_on_key", -1))

        def write(self, it):
            os.makedirs(self.path, exist_ok=True)
            tmp = os.path.join(self.path, f"task-{_uuid.uuid4().hex}.tmp")
            n = 0
            with open(tmp, "w") as fh:
                for row in it:
                    if row[0] == self.fail_on:
                        raise RuntimeError(f"injected failure at key {row[0]}")
                    fh.write(f"{row[0]},{row[1]}\n")
                    n += 1
            if n == 0:  # empty task: nothing to publish
                os.remove(tmp)
                return _Msg(None)
            return _Msg(tmp)

        def commit(self, messages):
            for m in messages:
                if m.tmp_name is not None:
                    os.rename(m.tmp_name, m.tmp_name[: -len(".tmp")] + ".csv")

        def abort(self, messages):
            for m in messages:
                if m.tmp_name is not None and os.path.exists(m.tmp_name):
                    os.remove(m.tmp_name)

    class FlightSinkDataSource(DataSource):
        @classmethod
        def name(cls):
            return "flightsink"

        def writer(self, schema, overwrite):
            return _FlightSinkWriter(self.options)

    spark.dataSource.register(FlightSinkDataSource)


@gate_query(
    "sink_python_datasource",
    oracle="""
    SELECT o_custkey % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    WHERE o_orderkey < 4000
    GROUP BY o_custkey % 10
    """,
    tags=("sink", "udf"),
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a custom PYTHON DATA SOURCE WRITER (the
    Spark-4 connector SDK's write side, completing the pair with
    scan_python_datasource): an orders slice is written through
    format("flightsink") — per-task temp files, WriterCommitMessages,
    driver-side commit that RENAMES temps to their final names — then
    read back from the committed files only and aggregated. A writer
    that skipped commit, dropped a task's message, or published
    before commit changes the read-back set; the oracle aggregates
    the same slice straight from the source table, so a hash match
    proves the whole write→commit→read chain lossless. All-integer
    output. Scale posture: the commit protocol is O(tasks) driver
    metadata work (rename-only publish), the shape object-store
    committers use; payload bytes stay in executor tasks."""
    _register_flightsink(spark)
    out = os.path.join(_TMP, "pyds_sink")
    if os.path.exists(out):
        shutil.rmtree(out)
    src = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 4000)
        .select("o_orderkey", "o_custkey")
    )
    src.write.format("flightsink").mode("append").option("path", out).save()
    back = spark.read.schema("o_orderkey long, o_custkey long").csv(
        os.path.join(out, "*.csv")
    )
    return back.groupBy((F.col("o_custkey") % 10).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )
