"""Projection / filter / predicate operators — SURVEY.md §2.2.

Everything here is pure Catalyst surface: filters and projections are
declarative, so predicate pushdown and column pruning reach the
parquet scan with zero custom work (`.explain()` shows PushedFilters
and a narrow ReadSchema). At 100 TB these ops cost exactly what the
scan costs — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_flight_spark.io import table
from big_data_flight_spark.registry import gate_query


@gate_query(
    "scan_parquet",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    tags=("source",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare parquet scan (the primary source). Column projection here
    reaches the reader: ReadSchema lists exactly these columns."""
    return table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@gate_query(
    "sql_entry",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        AS revenue,
      o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    """,
    tags=("relational", "sql"),
)
def sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string entry path (SURVEY.md §3.3): register temp views,
    run a TPC-H-Q3-shaped query via spark.sql. Catalyst produces the
    same plan as the DataFrame form — this gate proves the façade."""
    from big_data_flight_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          l_orderkey,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
            AS revenue,
          o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        """
    )


@gate_query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("relational", "sql"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (|> operators — the linear
    FROM-first query form): one statement chaining |> WHERE,
    |> EXTEND (computed revenue column), |> AGGREGATE ... GROUP BY,
    and |> ORDER BY over the fact table. Catalyst lowers pipes to the
    identical logical plan as the classic form, so the gate proves the
    SURFACE parses and resolves — the oracle is the standard-SQL
    equivalent, and the DECIMAL(38,6) sum discipline applies inside
    the AGGREGATE op exactly as anywhere else. The pipe form matters
    for generated queries: each |> stage appends without rewriting the
    statement's nesting structure."""
    from big_data_flight_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |> EXTEND l_extendedprice * (1 - l_discount) AS revenue
        |> AGGREGATE
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE) AS sum_revenue
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@gate_query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
    tags=("relational", "sql"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL — the injection-safe templated-query surface
    (Spark 3.4+ named args + the IDENTIFIER() clause for table/column
    names): the query text carries only placeholders; values AND the
    grouping column arrive via `args`. IDENTIFIER(:col) is the
    supported way to parameterize an identifier — string-formatting a
    column name into SQL is the injection anti-pattern this API
    exists to replace (generated dashboards / multi-tenant templates).
    Values bind as typed literals (the timestamp binds as a real
    TIMESTAMP, not a string cast), so the plan is identical to the
    inlined form — Catalyst folds parameters before optimization,
    meaning pushdown still reaches the scan."""
    from big_data_flight_spark.io import register_views

    register_views(spark, sf_dir)
    import datetime

    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS sum_price
        FROM IDENTIFIER(:tbl)
        WHERE o_orderdate >= :since AND o_totalprice > :min_price
        GROUP BY IDENTIFIER(:grp)
        """,
        args={
            "grp": "o_orderpriority",
            "tbl": "orders",
            "since": datetime.datetime(1997, 1, 1),
            "min_price": 150000.0,
        },
    )


@gate_query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE chain (cur, depth, bal) AS (
      SELECT c_custkey, 0, c_acctbal FROM customer
      UNION ALL
      SELECT cur // 10, depth + 1, bal FROM chain WHERE cur >= 10
    )
    SELECT
      cur AS root,
      depth,
      CAST(COUNT(*) AS BIGINT) AS n_nodes,
      CAST(SUM(CAST(bal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
    FROM chain
    WHERE cur < 10
    GROUP BY cur, depth
    ORDER BY root, depth
    """,
    tags=("relational", "sql"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 RECURSIVE CTE (`WITH RECURSIVE ... UNION ALL`) — the
    iterative-closure surface inside one SQL statement, no driver
    loop. Sibling of graph.sql_recursive_bfs (r7), with a deliberate
    division of labor: BFS exercises recursion over a JOINED working
    table with per-step DISTINCT/first-reach semantics; this gate
    exercises the other half of the surface — a carried PAYLOAD column
    riding the recursion unchanged (the double balance) plus a
    closed-form integer chain the tests recompute in plain Python.
    Each customer key walks its ancestor chain (parent = key DIV 10,
    an integer-arithmetic forest with depth <= 5 at any fixture SF),
    and the final aggregate groups subtree members by (root, depth).
    The recursion step is pure integer math carried with an unchanged
    double payload, so both engines produce bit-identical rows; the
    money sum applies the DECIMAL(38,6) discipline at the end.

    Scale note: Spark executes each recursion level as one
    distributed step over the previous level's output (a UNION-loop
    plan, level N+1 scans only level N — rows leave the recursion as
    soon as `cur < 10` stops re-deriving them); bounded-depth integer
    chains like this converge in O(log key-range) levels regardless of
    row count, the same shape as graph_bfs_layers' oracle but here
    Spark-side. DuckDB's oracle runs the identical WITH RECURSIVE
    (`//` is its integer division; `DIV` is Spark's)."""
    from big_data_flight_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE chain (cur, depth, bal) AS (
          SELECT c_custkey, 0, c_acctbal FROM customer
          UNION ALL
          SELECT cur DIV 10, depth + 1, bal FROM chain WHERE cur >= 10
        )
        SELECT
          cur AS root,
          depth,
          CAST(COUNT(*) AS BIGINT) AS n_nodes,
          CAST(SUM(CAST(bal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        FROM chain
        WHERE cur < 10
        GROUP BY cur, depth
        ORDER BY root, depth
        """
    )


@gate_query(
    "sql_udf",
    oracle="""
    SELECT
      l_linestatus,
      CAST(COUNT(*) AS BIGINT) AS n_lines,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                    AS DECIMAL(38,6))) AS DOUBLE) AS sum_net
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("relational", "sql"),
)
def sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs — both shapes in one statement: a scalar
    `CREATE TEMPORARY FUNCTION ... RETURNS DOUBLE RETURN <expr>` and a
    table-valued `... RETURNS TABLE(...) RETURN SELECT ...` (the
    SQL-macro surface: reusable logic that stays INSIDE Catalyst).
    Unlike a Python UDF, a SQL UDF is inlined into the calling plan at
    analysis time, so the scan under the TVF still gets predicate
    pushdown and the scalar body participates in whole-stage codegen —
    zero serialization boundary, which is why this is the preferred
    form for shared business logic at 100 TB. Function names are FIXED
    (`CREATE OR REPLACE`) so repeated gate runs re-register
    idempotently instead of leaking catalog entries (the r8 UDTF
    lesson). The oracle inlines both bodies by hand — net price is
    left-associated double math in both engines, then the DECIMAL sum
    discipline on top."""
    from big_data_flight_spark.io import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION bdf_net_price(
          p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DOUBLE
        RETURN p * (1.0 - d) * (1.0 + t)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION bdf_flagged_lines(flag STRING)
        RETURNS TABLE(
          l_linestatus STRING,
          l_extendedprice DOUBLE,
          l_discount DOUBLE,
          l_tax DOUBLE)
        RETURN SELECT l_linestatus, l_extendedprice, l_discount, l_tax
               FROM lineitem WHERE l_returnflag = flag
        """
    )
    return spark.sql(
        """
        SELECT
          l_linestatus,
          CAST(COUNT(*) AS BIGINT) AS n_lines,
          CAST(SUM(CAST(bdf_net_price(l_extendedprice, l_discount, l_tax)
                        AS DECIMAL(38,6))) AS DOUBLE) AS sum_net
        FROM bdf_flagged_lines('R')
        GROUP BY l_linestatus
        ORDER BY l_linestatus
        """
    )


@gate_query(
    "project_select",
    oracle="""
    SELECT
      p_partkey,
      upper(p_brand) AS brand_uc,
      p_retailprice,
      CAST(p_retailprice * 1.1 AS DOUBLE) AS price_with_tax,
      p_size % 10 AS size_mod,
      concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
    tags=("relational",),
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection + computed columns + aliasing. Catalyst prunes
    the parquet scan to exactly the referenced columns."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        "p_retailprice",
        (F.col("p_retailprice") * 1.1).alias("price_with_tax"),
        (F.col("p_size") % 10).alias("size_mod"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )


@gate_query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND (l_returnflag = 'R' OR l_returnflag = 'A')
      AND NOT (l_discount < 0.02)
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    tags=("relational",),
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicates (AND/OR/NOT, BETWEEN, comparison) — all
    pushed into the parquet row-group filter by Catalyst."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & ((F.col("l_returnflag") == "R") | (F.col("l_returnflag") == "A"))
        & ~(F.col("l_discount") < 0.02)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@gate_query(
    "filter_null",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'P') AS status_or_null,
             o_totalprice
      FROM orders
    )
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN status_or_null IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(SUM(CASE WHEN status_or_null IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
      CAST(SUM(CASE WHEN status_or_null IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_nullsafe_eq_null
    FROM t
    """,
    tags=("relational",),
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: IS [NOT] NULL and null-safe equality. The
    fixtures carry no NULLs, so nulls are synthesized with nullif —
    the three-valued-logic behavior is what's under test."""
    o = table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    )
    s = F.col("status_or_null")
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(s.isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(s.isNotNull(), 1).otherwise(0)).alias("n_not_null"),
        F.sum(F.when(s.eqNullSafe(F.lit(None).cast("string")), 1).otherwise(0)).alias(
            "n_nullsafe_eq_null"
        ),
    )


@gate_query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%ROMO%'
       OR p_name LIKE 'b%'
       OR regexp_matches(p_type, '^(SMALL|MEDIUM)$')
    """,
    tags=("relational",),
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern predicates: LIKE, prefix LIKE, and full regex (Spark
    rlike and DuckDB regexp_matches are both unanchored searches;
    the pattern anchors itself).

    Re-parameterized r8: the original TPC-H-vocabulary patterns
    ('%BRASS%', 'a%', '^ECONOMY.*(TIN|COPPER)$') matched NOTHING in
    the fixture (p_type is a single word from {ECONOMY..STANDARD},
    p_name starts with b/c/h/l/n/o/r/s) — found by the new
    registry-wide non-vacuity guard (VERDICT r7 #2). The patterns now
    select 1135 rows at sf0.01 / 11211 at sf0.1 while keeping all
    three predicate kinds: infix LIKE, prefix LIKE (pushdown-friendly
    StartsWith), and an anchored alternation regex."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%ROMO%")
        | F.col("p_name").like("b%")
        | F.col("p_type").rlike("^(SMALL|MEDIUM)$")
    ).select("p_partkey", "p_name", "p_type")


@gate_query(
    "filter_in_subquery",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
    )
    """,
    tags=("relational",),
)
def filter_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — expressed as a left-semi join, which is exactly
    what Catalyst's RewritePredicateSubquery produces for the SQL
    form. Semi-join never duplicates or widens rows."""
    li = table(spark, sf_dir, "lineitem")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return li.join(big, li.l_orderkey == big.o_orderkey, "left_semi").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@gate_query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    tags=("relational",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate elimination — Spark plans distinct as a groupBy on all
    columns (partial+final hash agg, one shuffle on the distinct key)."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
