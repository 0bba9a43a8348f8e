"""Sorts / limits / top-k (§2.6) and set operations (§2.7).

Top-k queries order by a TOTAL key (tie-break on the primary key):
the driver's value-hash is order-insensitive but LIMIT changes the
row *set*, so ties must resolve identically on both engines.
Spark plans orderBy().limit(k) as TakeOrderedAndProject — per-
partition heaps + driver merge, no global sort. That IS the 100 TB
top-k algorithm."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_flight_spark.io import table
from big_data_flight_spark.registry import DSUM, dsum, gate_query


@gate_query(
    "sort_order",
    oracle="""
    SELECT c_custkey, c_mktsegment, bal_or_null,
           row_number() OVER (
             ORDER BY c_mktsegment ASC, bal_or_null DESC NULLS LAST, c_custkey ASC
           ) AS pos
    FROM (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
      FROM customer
    )
    """,
    tags=("sort",),
)
def sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with asc/desc and NULLS LAST (nulls synthesized
    from negative balances). The sort is made hash-observable via a
    row_number over the same total order."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal_or_null"),
    )
    w = Window.orderBy(
        F.col("c_mktsegment").asc(),
        F.col("bal_or_null").desc_nulls_last(),
        F.col("c_custkey").asc(),
    )
    return c.select("c_custkey", "c_mktsegment", "bal_or_null", F.row_number().over(w).cast("long").alias("pos"))


@gate_query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort",),
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price (TakeOrderedAndProject; o_orderkey
    tie-break keeps the row set stable across engines)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@gate_query(
    "sample_rows",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS total_rows, TRUE AS sample_within_tol
    FROM lineitem
    """,
    tags=("sort", "approx"),
)
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sample (seeded). The sampled row SET is RNG- and
    partition-layout-specific (engine-irreproducible), so the STRONG
    oracle uses the deterministic-audit pattern: output the exact total
    row count plus a boolean that the sampled fraction landed within
    ±2% absolute of the requested 10% (binomial σ at sf0.01 is ~0.1%
    of N — the bound is ~16σ, stable across partition layouts, yet a
    broken sampler still flips it). For the fully deterministic,
    engine-portable sample see sample_hash_deterministic below."""
    li = table(spark, sf_dir, "lineitem")
    sampled_n = li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("sampled_rows")
    )
    total_n = li.agg(F.count(F.lit(1)).alias("total_rows"))
    return sampled_n.crossJoin(F.broadcast(total_n)).select(
        "total_rows",
        (
            F.abs(F.col("sampled_rows") - 0.1 * F.col("total_rows"))
            <= 0.02 * F.col("total_rows")
        ).alias("sample_within_tol"),
    )


@gate_query(
    "unpivot_stack",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, ROUND(val, 6) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax
      FROM lineitem WHERE l_orderkey < 100
    )
    """,
    tags=("relational",),
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack() — the inverse of agg_pivot.
    One pass over the input, no shuffle; rows multiply by the number
    of unpivoted measures."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax) "
            "AS (metric, raw)"
        ),
    ).select("l_orderkey", "l_linenumber", "metric", F.round("raw", 6).alias("val"))


# ---------------------------------------------------------------------------
# Set operations — customer vs supplier nation footprints
# ---------------------------------------------------------------------------

@gate_query(
    "set_union_all",
    oracle="""
    SELECT nationkey, kind, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    )
    GROUP BY nationkey, kind
    """,
    tags=("set",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (unionByName) — no dedup, counts add up."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s).groupBy("nationkey", "kind").agg(F.count(F.lit(1)).alias("n"))


@gate_query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("set",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: nations having customers or suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@gate_query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("set",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@gate_query(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) >= 2000
    """,
    tags=("set",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics — subtract() dedups): churned customers —
    active in 1995 but silent since 2000. exceptAll would be wrong
    here: it subtracts per-occurrence, leaving keys that merely appear
    more often on the left.

    Re-parameterized r8: the original form (customer nations EXCEPT
    supplier nations) was vacuous — all 25 nations have both customers
    and suppliers at both SFs (measured); found by the new
    registry-wide non-vacuity guard. The churn form keeps identical
    set semantics and yields 108 rows at sf0.01 / 1064 at sf0.1."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.year("o_orderdate") >= 2000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)


@gate_query(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           {DSUM("value", "sum_value")}
    FROM events
    WHERE ('0x' || substring(md5(event_id || ''), 1, 8))::BIGINT % 100 < 10
    GROUP BY event_type
    """,
    tags=("sort", "sample"),
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% hash sample: a row is in the sample iff
    md5(event_id) lands in the first 10 of 100 hash slots. Unlike
    seeded Bernoulli sampling (engine-specific RNG → weak check), hash
    sampling is reproducible across engines, stable under re-runs and
    repartitioning, and consistent across tables sharing the key — the
    property that matters when sampling a 100 TB corpus for eval
    splits. Pure scan-side filter: no shuffle before the aggregate."""
    e = table(spark, sf_dir, "events")
    slot = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return (
        e.filter(slot < 10)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"), dsum("value", "sum_value"))
    )


# Morton (Z-order) interleave of two 6-bit keys, generated once for
# both dialects so the bit math cannot drift between engines.
_Z_BITS = 6
_Z_SPARK = " + ".join(
    f"(shiftleft(shiftright(p_size, {i}) & 1, {2 * i})"
    f" + shiftleft(shiftright(price_bucket, {i}) & 1, {2 * i + 1}))"
    for i in range(_Z_BITS)
)
_Z_DUCK = " + ".join(
    f"((((p_size >> {i}) & 1) << {2 * i})"
    f" + (((price_bucket >> {i}) & 1) << {2 * i + 1}))"
    for i in range(_Z_BITS)
)


@gate_query(
    "sort_zorder",
    oracle=f"""
    WITH keyed AS (
      SELECT p_partkey, p_size,
             CAST(FLOOR(p_retailprice / 100.0) AS INTEGER) AS price_bucket
      FROM part WHERE p_partkey < 1000
    ),
    coded AS (
      SELECT p_partkey, p_size, price_bucket,
             CAST({_Z_DUCK} AS BIGINT) AS zorder
      FROM keyed
    )
    SELECT p_partkey, p_size, price_bucket, zorder,
           CAST(ROW_NUMBER() OVER (ORDER BY zorder, p_partkey) AS BIGINT) AS zrank
    FROM coded
    """,
    tags=("sort",),
)
def sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (size, price-bucket): bit-
    interleaving makes rows close in BOTH dimensions adjacent in ONE
    sort order, so file-level min/max stats prune scans filtered on
    either dimension — the multi-dimensional data-skipping layout
    (Delta/Iceberg OPTIMIZE ZORDER shape) built from plain bit ops.
    The gate checks the code AND the resulting total order (zrank);
    at scale the sort feeds repartitionByRange + sortWithinPartitions
    before the write."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 1000)
    keyed = p.select(
        "p_partkey",
        "p_size",
        F.floor(F.col("p_retailprice") / 100.0).cast("int").alias("price_bucket"),
    )
    coded = keyed.withColumn("zorder", F.expr(_Z_SPARK).cast("long"))
    w = Window.orderBy("zorder", "p_partkey")
    return coded.withColumn("zrank", F.row_number().over(w).cast("long"))


SAMPLE_PER_GROUP_K = 5


@gate_query(
    "sample_reservoir_per_group",
    oracle=f"""
    SELECT lang, rk, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    WHERE rk <= {SAMPLE_PER_GROUP_K}
    """,
    tags=("sort", "sample"),
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir sample: exactly K docs per
    language, chosen by md5-hash rank (the curation primitive for
    per-domain / per-language subsampling of a training corpus — a
    global sample over-represents the head stratum). Hash-rank
    replaces RNG (the repo-wide no-RNG rule): the 'reservoir' is the
    K smallest md5(doc_id) values per group, stable across engines,
    runs, and partitionings — and REFRESHABLE: new documents displace
    old picks exactly when their hash is smaller, so an incremental
    re-run moves the minimum set, never reshuffles it wholesale.
    Spark plans the rank-K filter as WindowGroupLimit (running top-K
    per key on both sides of the exchange, like etl_cdc_latest), so
    at 100 TB only ~K rows per group survive each map task — never a
    full per-group sort. doc_id breaks the (theoretical) hash tie for
    a total order; integer→string rendering inside md5 is
    engine-identical (the fingerprint gate's bridge)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_PER_GROUP_K)
        .select("lang", "rk", "doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# sample_weighted_systematic — RNG-free weighted sampling with replacement
# ---------------------------------------------------------------------------

_SWS_N = 50        # sample size (grid points over the cumulative axis)
_SWS_SHARDS = 16   # prefix-sum shards (the distributed two-pass form)


@gate_query(
    "sample_weighted_systematic",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars AS w, doc_id % {_SWS_SHARDS} AS shard
      FROM documents
    ),
    l AS (
      SELECT doc_id, w, shard,
             COALESCE(SUM(w) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lc
      FROM d
    ),
    st AS (
      SELECT shard, CAST(SUM(w) AS BIGINT) AS stw FROM d GROUP BY shard
    ),
    o AS (
      SELECT shard,
             COALESCE(SUM(stw) OVER (ORDER BY shard
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM st
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM d),
    c AS (
      SELECT l.doc_id, CAST(l.w AS BIGINT) AS w,
             CAST(l.lc + o.off AS BIGINT) AS cum
      FROM l JOIN o USING (shard)
    ),
    m AS (
      SELECT doc_id, w AS weight, cum,
             CAST(((cum + w) * {_SWS_N} + tw - 1) // tw
                  - (cum * {_SWS_N} + tw - 1) // tw AS BIGINT) AS multiplicity
      FROM c, tot
    )
    SELECT doc_id, weight, cum, multiplicity
    FROM m WHERE multiplicity > 0
    """,
    tags=("sample", "sort"),
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITH replacement, RNG-free — the corpus-mixing
    primitive that allocates a fixed token/example budget across
    documents proportionally to weight (here n_chars) with zero
    randomness: lay every document's weight on a cumulative axis and
    take every (total/{_SWS_N})-th point (systematic/low-discrepancy
    sampling: each doc's multiplicity is floor-exact, multiplicities
    always sum to EXACTLY {_SWS_N}, and a doc with weight ≥ one grid
    stride is guaranteed selected — none of the variance of A-ES
    exponential keys, and no float pow() parity surface).

    The prefix sum is the DISTRIBUTED two-pass form, not a global
    window: per-shard running sums (hash shards of doc_id), shard
    totals aggregated, exclusive shard offsets broadcast back, global
    position = offset + local prefix — the standard scan-at-scale
    construction (the only global window runs over {_SWS_SHARDS}
    shard-total rows). All-integer: multiplicity = ceil((cum+w)·N/W) −
    ceil(cum·N/W) with (a+b−1) DIV b ceils — identical floors in both
    engines; products stay ≪ 2^53."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        (F.col("doc_id") % _SWS_SHARDS).alias("shard"),
    )
    w_local = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.select(
        "doc_id",
        "w",
        "shard",
        F.coalesce(F.sum("w").over(w_local), F.lit(0)).cast("long").alias("lc"),
    )
    shard_tot = d.groupBy("shard").agg(F.sum("w").cast("long").alias("stw"))
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_tot.select(
        "shard",
        F.coalesce(F.sum("stw").over(w_off), F.lit(0)).cast("long").alias("off"),
    )
    total = shard_tot.agg(F.sum("stw").cast("long").alias("tw"))
    c = (
        local.join(F.broadcast(offsets), "shard")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.col("w").alias("weight"),
            (F.col("lc") + F.col("off")).cast("long").alias("cum"),
            "tw",
        )
    )
    m = c.select(
        "doc_id",
        "weight",
        "cum",
        (
            F.expr(f"(( cum + weight ) * {_SWS_N}L + tw - 1) DIV tw")
            - F.expr(f"(cum * {_SWS_N}L + tw - 1) DIV tw")
        )
        .cast("long")
        .alias("multiplicity"),
    )
    return m.filter(F.col("multiplicity") > 0)
