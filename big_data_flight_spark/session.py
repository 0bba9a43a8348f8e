"""SparkSession factory and runtime configuration.

Two entry paths (SURVEY.md §3): the driver hands us an existing
SparkSession (entry/queries), while tests and bench build their own.
``configure()`` applies the runtime-settable knobs to *any* session so
both paths behave identically; ``get_session()`` builds one with the
static knobs too.

Scale notes (100 TB design point):
  - shuffle partitions: locally ~cores; on a real cluster the rule is
    ``max(2 * total_cores, input_bytes / 128MB)`` — AQE coalescing makes
    over-provisioning cheap, under-provisioning causes spills.
  - AQE on: runtime broadcast conversion, partition coalescing, and
    skew-join splitting are the main levers that keep the §2 join/agg
    plans healthy when one key is hot.
  - UTC session timezone: fixture timestamps are UTC-naive; the DuckDB
    oracle is UTC-naive. Any other tz silently shifts date_trunc/window
    boundaries and breaks the value-hash.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs — safe to apply to a session the driver owns.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE on by default (runtime broadcast/coalesce/skew-split — the
    # 100 TB posture). Env-overridable so bench.py can measure the
    # sub-second-query re-planning overhead at tiny SF.
    "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "true"),
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local[32] / sf<=0.1: ~cores beats the 200 default; AQE coalesces down.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's reader
    # rejects by default. Read as int64 nanos; io.table() converts to a
    # µs timestamp with floor-division — matching DuckDB's ns→µs cast.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs idempotently (cheap; called per gate query)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable at runtime on this build — static default wins
    return spark


def get_session(app_name: str = "big_data_flight_spark", cores: int | None = None) -> SparkSession:
    """Build (or fetch) a local session with the static knobs set too."""
    n = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
