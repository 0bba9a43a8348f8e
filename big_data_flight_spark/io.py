"""Fixture-table catalog and loaders (SURVEY.md §1, FIXTURES.md).

The data model is the ten driver-provisioned parquet tables: a TPC-H-ish
star schema (region→nation→{customer,supplier}, part, orders→lineitem),
an append-only ``events`` stream table, a ``documents`` text corpus and
an ``embeddings`` vector store. Parquet is self-describing, so loaders
trust the footers — no schema inference, no casts at scan time (casting
at scan would defeat parquet predicate pushdown).

Scale note: each table is one parquet file at fixture scale; at 100 TB
these become partitioned directories. ``table()`` takes any path Spark
can scan, so nothing here changes — partition pruning and row-group
pushdown come from Catalyst for free when filters are declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (they grow
# slowly or not at all with sf); used by join builders as hint targets.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. SURVEY.md §2.1 `scan_parquet`.

    ``events.ts`` precision varies by fixture generation: TIMESTAMP
    (NANOS) in driver rounds 1-2 (surfaces as int64 under
    ``spark.sql.legacy.parquet.nanosAsLong``, floor-divided here to a
    µs TimestampType — exactly matching the DuckDB oracle's ns→µs
    truncating cast), plain µs TIMESTAMP since round 3 (used as-is;
    both engines read it identically). The dtype guard handles either.
    The ns conversion is a cheap codegen'd projection; min/max
    row-group pruning on ts still works because the int64 ordering
    equals the timestamp ordering.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = ts_guard(df)
    return df


def ts_guard(df: DataFrame) -> DataFrame:
    """THE one events.ts dtype guard, shared by the batch reader above
    and streaming/twins.events_stream (r6 review: two verbatim copies
    risked patching the next fixture physical-type change in only one
    place). ts has already changed representation once across driver
    rounds (TIMESTAMP(NANOS) in r1-r2, µs TIMESTAMP_NTZ since r3):

    - int64 nanos (nanosAsLong): truncating ns→µs convert;
    - TIMESTAMP_NTZ: cast to TIMESTAMP(LTZ) — the session tz is
      pinned UTC (session.configure), so the cast is value-preserving,
      keeps the output schema every gate and the driver's schema hash
      have always seen, and satisfies watermarks (which require ltz).
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def fan_out(df: DataFrame, min_ratio: int = 2) -> DataFrame:
    """Round-robin repartition a narrow-split scan up to the session's
    default parallelism so CPU-heavy downstream work (wide decimal
    partial aggregates, per-row array building) uses every core.

    Scale-correct by construction: the repartition fires only when the
    source yields fewer than ``cores / min_ratio`` splits — the fixture
    case (single-row-group parquet file → ONE scan task doing all the
    partial-aggregate CPU). On a real cluster the same scan arrives in
    ~input/128MB splits ≥ cores, the condition is false, and this is a
    no-op — no extra shuffle at 100 TB. Measured at sf0.1: flagship Q1
    1.10 s → 0.53 s (8 DECIMAL(38,6) partial aggs parallelized 1→32
    tasks; the 600 k-row exchange costs far less than it frees).
    Only worth it when per-row work dominates: shuffle-ALL-values
    shapes (collect_list percentiles, count-distinct expands) lose
    more to the added exchange than they gain — measured, not assumed.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // min_ratio):
        return df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table (lazy — just plan nodes, no IO yet)."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for the SQL entry path
    (SURVEY.md §2.1 `table_register`, §3.3) — mirrors the DuckDB
    oracle's pre-registered view names."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
