"""TPC-H-style analytical query pack — the reference-class workload.

Classic decision-support queries adapted to the fixture subset of the
TPC-H schema (no partsupp / l_shipmode / l_commitdate / l_receiptdate
columns exist — predicates on missing columns are substituted with
shape-preserving equivalents, noted per query). Q1 lives in
aggregates.flagship; Q3 in relational.sql_entry.

These are the multi-join + aggregate patterns the star schema exists
for; each one's plan is the scale template: broadcast dims, single
fact shuffle, partial aggregation before exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_flight_spark.io import table
from big_data_flight_spark.registry import DSUM, dsum, gate_query


@gate_query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("tpch",),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (EXISTS → left-semi join). Adapted:
    `l_commitdate < l_receiptdate` → `l_shipdate > o_orderdate`
    (columns absent from fixtures)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = o.join(
        li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@gate_query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, {DSUM("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("tpch",),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: revenue from orders where customer and
    supplier share a nation, per nation, one year. Adapted: region
    filter dropped (only 5 regions and few suppliers — keeping all
    regions keeps the result non-trivial). The n-way join broadcasts
    every dimension; lineitem is the only shuffled input."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@gate_query(
    "tpch_q6",
    oracle=f"""
    SELECT {DSUM("l_extendedprice * l_discount", "revenue")}, COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("tpch",),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting-revenue change: pure filter + global aggregate —
    the pushdown showcase (every predicate reaches the parquet
    row-group filter; zero shuffle beyond the 1-row final agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@gate_query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {DSUM("l_extendedprice * (1 - l_discount)", "revenue")},
           MAX(c_acctbal) AS acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch",),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by lost revenue in
    a quarter (deterministic tie-break on c_custkey for the LIMIT)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.max("c_acctbal").alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@gate_query(
    "tpch_q14",
    oracle="""
    SELECT
      ROUND(
        100.0 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                   AS DECIMAL(38,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE),
        6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-09-01 00:00:00'
    """,
    tags=("tpch",),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: promo revenue share over a window
    (conditional aggregate ratio; part is broadcast)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-09-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        F.round(
            100.0
            * F.sum(promo.cast("decimal(38,6)")).cast("double")
            / F.sum(rev.cast("decimal(38,6)")).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


@gate_query(
    "tpch_q17",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("tpch",),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: correlated scalar aggregate
    subquery (below half the part's average quantity). Expressed via
    spark.sql so Catalyst's RewriteCorrelatedScalarSubquery does the
    decorrelation (→ aggregate + join, no per-row subquery execution —
    the only scalable plan). Adapted: container predicate dropped
    (no p_container column); avg(l_quantity) is integral-valued ÷
    exact count → deterministic double on both engines."""
    from big_data_flight_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
            SELECT 0.5 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        """
    )


@gate_query(
    "filter_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
    """,
    tags=("relational", "sql"),
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries, both flavors: uncorrelated (global average
    threshold — computed once, broadcast as a literal) and correlated
    in the SELECT list (per-order item count — decorrelated by
    Catalyst into a left join on a pre-aggregated counts table)."""
    from big_data_flight_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
        """
    )


@gate_query(
    "tpch_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           {DSUM("l_quantity", "total_qty")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch",),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds
    a threshold (HAVING subquery → semi-join), top-100 by price with
    orderkey tie-break. The `big` aggregate is tiny → broadcast semi."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = table(spark, sf_dir, "customer")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return (
        joined.groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
