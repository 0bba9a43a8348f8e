"""Plan-property regression tests (fast twin of plans/snapshot.py)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from tests.conftest import SF_SMOKE


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    plan = _plan(_REGISTRY["filter_pred"].builder(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThanOrEqual" in plan


def test_projection_prunes_read_schema(spark):
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    plan = _plan(_REGISTRY["scan_parquet"].builder(spark, SF_SMOKE))
    # nation has 3 read columns here; no other columns may be read
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "n_nationkey" in read and "n_comment" not in read


def test_dimension_join_broadcasts(spark):
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    plan = _plan(_REGISTRY["join_broadcast"].builder(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark):
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    plan = _plan(_REGISTRY["limit_topk"].builder(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """With broadcast disabled (the 100 TB fact-fact regime), Spark
    injects a runtime bloom filter built from the selective side into
    the probe-side scan — rows that cannot join are dropped before the
    shuffle. Thresholds are tuned down because the fixture is small;
    on a real cluster the defaults (10 MB creation side) take over."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_totalprice") > 500000
        )
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("l_returnflag").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_tightens_file_bounds(spark, tmp_path):
    """Data-skipping evidence: range-partitioning by the Morton code
    yields per-file min/max rectangles (size × price_bucket) several
    times tighter than partitioning by primary key — which is exactly
    what lets file-stat pruning skip scans filtered on EITHER
    dimension."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from big_data_flight_spark.operators.sorts_sets import _Z_SPARK

    p = spark.read.parquet(f"{SF_SMOKE}/part.parquet").select(
        "p_partkey",
        "p_size",
        F.floor(F.col("p_retailprice") / 100.0).cast("int").alias("price_bucket"),
    )
    coded = p.withColumn("zorder", F.expr(_Z_SPARK).cast("long"))

    def mean_bound_area(path: str) -> float:
        areas = []
        for f in glob.glob(path + "/*.parquet"):
            t = pq.read_table(f, columns=["p_size", "price_bucket"])
            s = t.column("p_size").to_pylist()
            b = t.column("price_bucket").to_pylist()
            if s:
                areas.append((max(s) - min(s) + 1) * (max(b) - min(b) + 1))
        return sum(areas) / len(areas)

    z_dir, base_dir = str(tmp_path / "z"), str(tmp_path / "base")
    coded.repartitionByRange(8, "zorder").sortWithinPartitions("zorder").write.parquet(z_dir)
    coded.repartitionByRange(8, "p_partkey").write.parquet(base_dir)
    assert mean_bound_area(z_dir) < 0.5 * mean_bound_area(base_dir)


def test_pagerank_iteration_broadcasts_scores(spark):
    """One un-checkpointed PageRank round must broadcast the small
    score table against the edge list (never shuffle edges on src) —
    the gated plan can't show this because each round's
    localCheckpoint cuts lineage (the snapshot asserts ExistingRDD
    instead), so the per-iteration shape is pinned here."""
    from pyspark.sql import functions as F

    from big_data_flight_spark.operators.graph import _degrees, _trading_edges

    edges = _trading_edges(spark, SF_SMOKE)
    deg = _degrees(edges)
    sd = deg.select("node", F.lit(1_000_000).cast("long").alias("score"), "d")
    contrib = (
        edges.join(F.broadcast(sd), edges.src == sd.node)
        .groupBy("dst")
        .agg(F.sum(F.floor(F.col("score") / F.col("d"))).alias("contrib"))
    )
    plan = _plan(contrib)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_scores_conserve_mass(spark):
    """Sanity invariant of the integer formulation: every node's score
    stays positive and total mass stays within the floor-loss bound of
    N * SCALE (each of the 3 rounds can only lose to floor(), never
    create mass)."""
    from big_data_flight_spark.operators.graph import _SCALE, graph_pagerank

    rows = graph_pagerank(spark, SF_SMOKE).collect()
    n = len(rows)
    total = sum(r.score for r in rows)
    assert n > 0 and all(r.score > 0 for r in rows)
    assert total <= n * _SCALE
    # floor-loss across 3 rounds is tiny relative to total mass
    assert total > 0.95 * n * _SCALE

def test_pagerank_converged_terminates_early(spark):
    """The convergence-gated variant must actually exercise its gate:
    on the fixture the geometric 0.85 contraction crosses the integer
    eps tolerance BEFORE the round cap, and every row carries the same
    audited rounds_executed (the oracle independently recomputes both
    the stop round and that round's scores)."""
    from big_data_flight_spark.operators.graph import (
        _CONV_EPS,
        _MAX_ROUNDS,
        graph_pagerank_converged,
    )

    rows = graph_pagerank_converged(spark, SF_SMOKE).collect()
    assert rows
    executed = {r.rounds_executed for r in rows}
    assert len(executed) == 1
    k = executed.pop()
    assert 1 <= k < _MAX_ROUNDS, f"expected early stop, ran {k}/{_MAX_ROUNDS}"
    assert _CONV_EPS > 0
