"""big_data_flight_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference project ``pLOPeGG/Big-Data-Flight``
(flight-style batch analytics: scans, star-schema joins, grouped
aggregation, rankings, time-bucketed trends), extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) mandated by BASELINE.json.

NOTE on reference citations: the reference checkout at /root/reference
is empty (verified — SURVEY.md §0), so per-operator docstrings cite
SURVEY.md §2 rows (the audited capability inventory) instead of
reference file:line.

Architecture: there is deliberately *no* custom parser / optimizer /
executor. Operators are declarative DataFrame builders; Catalyst +
Tungsten + AQE provide optimization and physical execution. Custom
work is confined to DataFrame-level patterns Spark lacks natively
(as-of join, batch session windows, MinHash/LSH blocking, tf-idf).

Layout:
    session.py    SparkSession factory + runtime configuration
    io.py         fixture-table catalog and loaders
    registry.py   gate-query registry (queries() + oracle_sql() source)
    operators/    relational / window / event-time / text / similarity ops
    functions/    scalar function family surface
    sources/      csv / json / parquet connectors & sinks
    streaming/    Structured Streaming twins of the event-time ops
    plans/        plan inspection & regression helpers (.explain snapshots)
"""

from big_data_flight_spark.registry import all_oracles, all_queries, get_query

__all__ = ["all_oracles", "all_queries", "get_query"]

__version__ = "0.1.0"
