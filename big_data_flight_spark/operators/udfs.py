"""UDF / UDAF / UDTF surface — SURVEY.md §2.10.

The Python boundary is the engine's slow path: everything crossing it
here is Arrow-batched (pandas_udf / applyInPandas), never row-at-a-
time. Each UDF gate query computes something ALSO expressible in SQL,
so the oracle isolates UDF-mechanism bugs from logic bugs.

Ordering discipline: Spark gives no row-order guarantee into grouped
UDFs, so any order-sensitive computation sorts INSIDE the function on
a total key. The oracles sort the same way — both engines then fold
float64 in the identical sequence.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_flight_spark.io import table
from big_data_flight_spark.registry import gate_query


# -- scalar pandas UDF -------------------------------------------------------

@F.pandas_udf(T.DoubleType())
def _logistic_score(v: pd.Series) -> pd.Series:
    """Vectorized logistic squash (Arrow in, numpy math, Arrow out)."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-v / 100.0))


@gate_query(
    "udf_scalar_arrow",
    oracle="""
    SELECT event_id, value,
           ROUND(1.0 / (1.0 + exp(-value / 100.0)), 6) AS score
    FROM events
    WHERE event_id < 2000
    """,
    tags=("udf",),
)
def udf_scalar_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF vs the same formula in SQL.
    Rounded to 6dp: numpy's and DuckDB's exp may differ by 1 ulp.

    Accepted residual risk (documented, not fixed): unlike the
    rounded-cosine gates (both engines round the SAME bit-identical
    double), here the pre-round values can differ by ~1 ulp, so a
    value landing within ~1e-12 of a 6dp rounding boundary could
    round apart. P(per row) ≈ 2e-7 · 1e-12/1e-6 ≈ 1e-12; at sf0.01
    (2k rows) ≈ 2e-9 per run — negligible, and a flap would be a
    one-row value diff, trivially diagnosed. Same reasoning for
    udaf_grouped_agg below (150 groups)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id", "value", F.round(_logistic_score(F.col("value")), 6).alias("score")
    )


# -- grouped-aggregate pandas UDF (UDAF) ------------------------------------

@F.pandas_udf(T.DoubleType())
def _geo_mean(v: pd.Series) -> float:
    """Geometric mean of |v|+1 — a custom aggregate Spark lacks."""
    import numpy as np

    x = v.abs() + 1.0
    return float(np.exp(np.log(x).mean()))


@gate_query(
    "udaf_grouped_agg",
    oracle="""
    SELECT event_type,
           ROUND(exp(AVG(ln(abs(value) + 1.0))), 6) AS geo_mean_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("udf",),
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate (geometric mean) as a grouped-agg
    pandas UDF, usable in groupBy().agg() — the UDAF surface. The
    log-sum is order-dependent in the last ulps; 6dp rounding
    absorbs it (error ~1e-12, granularity 1e-6)."""
    e = table(spark, sf_dir, "events")
    # Grouped-agg pandas UDFs can't mix with JVM aggregates in one
    # agg() (INVALID_PANDAS_UDF_PLACEMENT) — compute counts separately
    # and join (both aggs share the same shuffle key).
    geo = e.groupBy("event_type").agg(
        F.round(_geo_mean(F.col("value")), 6).alias("geo_mean_value")
    )
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return geo.join(counts, "event_type")


# -- grouped-map applyInPandas ----------------------------------------------

def _per_user_running(pdf: pd.DataFrame) -> pd.DataFrame:
    # Total-order sort INSIDE the UDF — input order is not guaranteed.
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    pdf["running_value"] = pdf["value"].cumsum().round(6)
    pdf["seq"] = range(1, len(pdf) + 1)
    return pdf[["user_id", "event_id", "seq", "running_value"]]


@gate_query(
    "udf_grouped_map",
    oracle="""
    SELECT user_id, event_id,
           row_number() OVER w AS seq,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("udf",),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group pandas transform (applyInPandas): per-user running sum
    + sequence number. pandas cumsum and the SQL running window both
    add float64 sequentially in the same (ts, event_id) order —
    bit-compatible, rounded anyway. This grouped-map shape is also the
    as-of-join fallback (pd.merge_asof per group)."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return e.groupBy("user_id").applyInPandas(
        _per_user_running,
        schema="user_id long, event_id long, seq long, running_value double",
    )


# -- UDTF (table function) ---------------------------------------------------

@gate_query(
    "udtf_explode_like",
    oracle="""
    SELECT doc_id, i - 1 AS pos, w[i] AS token
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
          FROM documents WHERE doc_id < 50)
    CROSS JOIN range(1, 1000) t(i)
    WHERE i <= len(w)
    """,
    tags=("udf",),
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function: one row in → N rows out (doc → positioned
    tokens). The gate uses the built-in posexplode (Spark's native
    UDTF of this shape — always prefer it); a real Python @udtf
    twin is registered by :func:`register_python_udtf` and exercised
    in tests/test_udfs.py."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


def register_python_udtf(spark: SparkSession) -> None:
    """Register a genuine Python UDTF (Spark 3.5+/4.x) named
    ``split_tokens`` for the SQL surface:
    ``SELECT t.* FROM documents, LATERAL split_tokens(text) t``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):  # noqa: D401 - Spark UDTF protocol
            if text is None:
                return
            for pos, tok in enumerate(text.lower().split(" ")):
                yield pos, tok

    spark.udtf.register("split_tokens", SplitTokens)


# -- as-of join, pandas fallback --------------------------------------------

def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library twin of joins.join_asof using per-user applyInPandas +
    pd.merge_asof — the grouped-map fallback for when the window-rank
    form's intermediate (all past candidates per row) is too wide.
    Equality with join_asof is asserted in tests/test_udfs.py."""
    from big_data_flight_spark.io import table

    e = table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf[pdf.event_type == "purchase"].sort_values(["ts", "event_id"])
        c = pdf[pdf.event_type == "click"].sort_values(["ts", "event_id"])
        if p.empty or c.empty:
            return pd.DataFrame(
                columns=["purchase_id", "user_id", "p_ts", "click_ts", "click_id"]
            ).astype(
                {
                    "purchase_id": "int64",
                    "user_id": "int64",
                    "p_ts": "datetime64[us]",
                    "click_ts": "datetime64[us]",
                    "click_id": "int64",
                }
            )
        m = pd.merge_asof(
            p[["event_id", "user_id", "ts"]].rename(
                columns={"event_id": "purchase_id", "ts": "p_ts"}
            ),
            c[["event_id", "ts"]].rename(columns={"event_id": "click_id", "ts": "click_ts"}),
            left_on="p_ts",
            right_on="click_ts",
            direction="backward",
        )
        m = m.dropna(subset=["click_id"]).astype({"click_id": "int64"})
        return m[["purchase_id", "user_id", "p_ts", "click_ts", "click_id"]]

    return e.groupBy("user_id").applyInPandas(
        per_user,
        schema="purchase_id long, user_id long, p_ts timestamp, click_ts timestamp, click_id long",
    )


# -- haversine: the flight-analytics classic, as a pandas UDF ----------------

@F.pandas_udf(T.DoubleType())
def haversine_km(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Great-circle distance (km) — the canonical flight-data scalar.
    No coordinate columns exist in the fixtures, so this ships as API
    surface with unit tests (tests/test_udfs.py) rather than a gate
    query; synthetic coordinates are derived there from keys."""
    import numpy as np

    rlat1, rlat2 = np.radians(lat1), np.radians(lat2)
    dlat = rlat2 - rlat1
    dlon = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2) ** 2
    return 2 * 6371.0088 * np.arcsin(np.sqrt(a))


def _norm_batches(batches):
    """mapInArrow kernel: squared L2 norm per embedding, accumulated as
    an explicit left fold in float64 — the same summation order as the
    oracle's list_sum, so values are bit-identical (numpy's pairwise
    sum would NOT be)."""
    import pyarrow as pa

    for batch in batches:
        vec_ids = batch.column("vec_id").to_pylist()
        embs = batch.column("embedding").to_pylist()
        norms = []
        for emb in embs:
            acc = 0.0
            for x in emb:
                xd = float(x)  # float32 → float64 BEFORE arithmetic
                acc += xd * xd
            norms.append(acc)
        yield pa.RecordBatch.from_arrays(
            [pa.array(vec_ids, pa.int64()), pa.array(norms, pa.float64())],
            names=["vec_id", "norm2"],
        )


@gate_query(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm2
    FROM embeddings
    """,
    tags=("udf",),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python batch path (raw Arrow
    RecordBatches, no pandas conversion): squared L2 norms over the
    embedding column. Completes the Python-integration surface next to
    pandas_udf / grouped-agg / grouped-map / UDTF. Per-batch work only,
    no shuffle; at 100 TB this is the shape for vectorized feature
    kernels that need numpy/pyarrow but not per-group state."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("norm2", T.DoubleType()),
        ]
    )
    normed = e.mapInArrow(_norm_batches, out_schema)
    return normed.select("vec_id", F.round("norm2", 6).alias("norm2"))


def _cogroup_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Per-user two-sided kernel: backward pd.merge_asof of this
    user's purchases (left) against their clicks (right). Either side
    may arrive empty — cogroup calls the kernel for keys present in
    EITHER input."""
    import numpy as np

    if left.empty:
        return pd.DataFrame(
            {
                "user_id": pd.array([], dtype="Int64"),
                "purchase_id": pd.array([], dtype="Int64"),
                "click_id": pd.array([], dtype="Int64"),
                "delta_us": pd.array([], dtype="Int64"),
            }
        )
    left = left.sort_values(["ts", "event_id"]).reset_index(drop=True)
    if right.empty:
        m = left.copy()
        m["click_id"] = pd.array([pd.NA] * len(m), dtype="Int64")
        m["delta_us"] = pd.array([pd.NA] * len(m), dtype="Int64")
        return pd.DataFrame(
            {
                "user_id": m["user_id"],
                "purchase_id": m["event_id"],
                "click_id": m["click_id"],
                "delta_us": m["delta_us"],
            }
        )
    # Right columns arrive PRE-RENAMED (c_ts/c_eid): both cogroup
    # sides derive from the same events scan, and duplicate attribute
    # names across the sides trip Spark's cogroup column pruning under
    # count()-only consumers — the right frame reaches the kernel
    # stripped to the key (measured on this build; collect() is
    # unaffected). Distinct names keep the attributes apart.
    right = right.sort_values(["c_ts", "c_eid"]).reset_index(drop=True)
    right = right.rename(columns={"c_eid": "click_id"})
    right["ts"] = right["c_ts"]
    m = pd.merge_asof(
        left,
        right[["ts", "click_id", "c_ts"]],
        on="ts",
        direction="backward",
        allow_exact_matches=True,
    )
    p_us = m["ts"].astype("datetime64[ns]").to_numpy(dtype="int64") // 1000
    c_us = m["c_ts"].astype("datetime64[ns]").to_numpy(dtype="int64") // 1000
    delta = pd.array((c_us - p_us), dtype="Int64")
    miss = m["c_ts"].isna().to_numpy()
    delta[miss] = pd.NA
    click = m["click_id"].astype("Int64")
    click[miss] = pd.NA
    return pd.DataFrame(
        {
            "user_id": m["user_id"],
            "purchase_id": m["event_id"],
            "click_id": click,
            "delta_us": delta,
        }
    )


@gate_query(
    "udf_cogrouped_map",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, event_id AS click_id, ts
      FROM events WHERE event_type = 'click'
    ),
    back AS (
      SELECT purchase_id, click_id, delta FROM (
        SELECT p.purchase_id, c.click_id,
               epoch_us(c.ts) - epoch_us(p.ts) AS delta,
               row_number() OVER (PARTITION BY p.purchase_id
                 ORDER BY c.ts DESC, c.click_id DESC) AS rn
        FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
      ) WHERE rn = 1
    )
    SELECT p.user_id, p.purchase_id, back.click_id,
           back.delta AS delta_us
    FROM p LEFT JOIN back USING (purchase_id)
    """,
    tags=("udf", "join", "event"),
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED map — the last Python-integration surface
    (groupBy().cogroup().applyInPandas): both inputs co-partition on
    the key in ONE exchange each, and the kernel receives the user's
    purchases AND clicks as two aligned pandas frames — the API for
    custom two-sided merges the built-in join family can't express
    (here pd.merge_asof backward, the library-native as-of that
    join_asof reimplements declaratively; the oracle is the same
    last-click-at-or-before-purchase SQL, so the two surfaces are
    pinned to each other). pandas nullable Int64 carries the
    no-match rows (plain int64 would poison NULLs with NaN casts);
    deltas are computed on integer microseconds, never float
    seconds. merge_asof picks the positionally-last tie among
    equal-ts clicks of the (ts, event_id)-sorted right frame = max
    event_id, matching the oracle's DESC/DESC rank.

    Scale: the cogroup is exactly two hash exchanges (one per side)
    + per-key Arrow batches; per-user state is that user's history,
    the same boundedness argument as every events-family window."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_eid"),
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            _cogroup_asof,
            "user_id long, purchase_id long, click_id long, delta_us long",
        )
    )


# ---------------------------------------------------------------------------
# udtf_table_args — Python UDTF over a TABLE argument (Spark 4 surface)
# ---------------------------------------------------------------------------

@gate_query(
    "udtf_table_args",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS pus,
             COUNT(*) OVER (PARTITION BY user_id) AS total
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_purchases,
           MIN(CASE WHEN rn = 1 THEN event_id END) AS first_id,
           MIN(CASE WHEN rn = total THEN event_id END) AS last_id,
           CAST(COALESCE(MAX((us - pus) // 1000000), 0) AS BIGINT) AS max_gap_s
    FROM o GROUP BY user_id
    """,
    tags=("udf",),
)
def udtf_table_args(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF consuming a TABLE ARGUMENT with PARTITION BY /
    ORDER BY — the Spark-4 polymorphic-table-function surface (the
    SQL-standard PTF shape: the ENGINE partitions and orders the
    input, the UDTF sees one user's rows in event-time order and
    emits one summary row from terminate()). This is the last
    Python-integration surface next to scalar-Arrow / grouped-agg /
    grouped-map / cogrouped-map / mapInPandas / plain @udtf: state
    accumulates ACROSS eval() calls within a partition, something the
    LATERAL-join UDTF shape cannot express. All-integer output (gap
    in whole seconds via exact integer µs arithmetic — no float
    timedelta), total-ordered by (ts, event_id) so first/last/gap are
    deterministic under ties.

    Scale: the TABLE argument plans as one hash exchange on user_id +
    per-partition sort — identical cost to a window — with the Python
    worker streaming each group (Arrow batches); state is O(1) per
    group, never O(rows)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "user_id bigint, n_events bigint, n_purchases bigint, "
            "first_id bigint, last_id bigint, max_gap_s bigint"
        )
    )
    class UserEventSummary:
        def __init__(self):
            self.user = None
            self.n = 0
            self.n_purch = 0
            self.first = None
            self.last = None
            self.prev_us = None
            self.max_gap_us = 0

        @staticmethod
        def _us(dt) -> int:
            # Exact integer microseconds since epoch: datetime ->
            # timedelta fields are ints (no float total_seconds()).
            import datetime as _dt

            delta = dt - _dt.datetime(1970, 1, 1, tzinfo=dt.tzinfo)
            return (
                (delta.days * 86400 + delta.seconds) * 1_000_000
                + delta.microseconds
            )

        def eval(self, row):
            if self.user is None:
                self.user = row["user_id"]
                self.first = row["event_id"]
            self.n += 1
            self.last = row["event_id"]
            if row["event_type"] == "purchase":
                self.n_purch += 1
            us = self._us(row["ts"])
            if self.prev_us is not None and us - self.prev_us > self.max_gap_us:
                self.max_gap_us = us - self.prev_us
            self.prev_us = us

        def terminate(self):
            yield (
                self.user,
                self.n,
                self.n_purch,
                self.first,
                self.last,
                self.max_gap_us // 1_000_000,
            )

    spark.udtf.register("user_event_summary", UserEventSummary)
    table(spark, sf_dir, "events").createOrReplaceTempView("udtf_events_src")
    return spark.sql(
        """
        SELECT * FROM user_event_summary(
          TABLE(SELECT user_id, event_id, ts, event_type
                FROM udtf_events_src)
          PARTITION BY user_id ORDER BY (ts, event_id))
        """
    )


def _arrow_group_stats(tbl):
    """applyInArrow kernel: one pyarrow.Table in, one out, per group —
    exact integer reductions (values quantized to micro-units row-side
    before any arithmetic, so every sum is a BIGINT)."""
    import math

    import pyarrow as pa

    vals = tbl.column("value").to_pylist()
    ids = tbl.column("event_id").to_pylist()
    micro = [int(math.floor(v * 1_000_000 + 0.5)) for v in vals]
    return pa.table(
        {
            "event_type": [tbl.column("event_type")[0].as_py()],
            "n": [len(ids)],
            "sum_value_micro": [sum(micro)],
            "min_id": [min(ids)],
            "max_id": [max(ids)],
        },
        schema=pa.schema(
            [
                ("event_type", pa.string()),
                ("n", pa.int64()),
                ("sum_value_micro", pa.int64()),
                ("min_id", pa.int64()),
                ("max_id", pa.int64()),
            ]
        ),
    )


@gate_query(
    "udf_grouped_map_arrow",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_value_micro,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    GROUP BY event_type
    """,
    tags=("udf",),
)
def udf_grouped_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow — the Arrow-native grouped-map surface
    (Spark 4), completing the Python-integration matrix: pandas
    grouped-map (udf_grouped_map) and cogrouped-map
    (udf_cogrouped_map) now have their zero-pandas sibling gated too.
    The kernel receives each event_type group as ONE pyarrow.Table
    and reduces it to exact integers (micro-unit quantization happens
    per row BEFORE summation, so the oracle's SUM(floor(v*1e6+0.5))
    matches bit-for-bit — no float fold anywhere). Scale: one hash
    exchange on the group key, per-group Arrow batches; the shape for
    group-local kernels that want pyarrow/numpy without pandas
    conversion overhead."""
    e = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return e.groupBy("event_type").applyInArrow(
        _arrow_group_stats,
        schema=(
            "event_type string, n long, sum_value_micro long, "
            "min_id long, max_id long"
        ),
    )


# ---------------------------------------------------------------------------
# udtf_polymorphic — Python UDTF with an analyze() static method (r8)
# ---------------------------------------------------------------------------

_POLY_N_TOKENS = 3  # output arity requested at the gate's call site


@gate_query(
    "udtf_polymorphic",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           {', '.join(f"t[{i + 1}] AS token_{i}" for i in range(_POLY_N_TOKENS))}
    FROM w
    """,
    tags=("udf",),
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF — the Spark 4 `analyze()` protocol: the
    UDTF's output schema is computed AT ANALYSIS TIME from its call
    arguments (here `first_tokens(text, 3)` produces columns token_0..
    token_2; a different literal would produce a different schema —
    asserted in tests/test_r8_ops.py with arity 2). This is the API
    that makes UDTFs schema-flexible without a registry of fixed
    variants: AnalyzeResult carries the StructType, eval() then yields
    matching tuples. The oracle pins the n=3 instance's values
    (DuckDB list indexing replays the padding semantics: out-of-range
    list access yields NULL on both engines).

    Scale: per-row arity-bounded projection inside a Python UDTF —
    fine for surface coverage; the built-in slice+explode form is the
    JVM path for bulk work (udtf_explode_like's docstring rule)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or not (1 <= n.value <= 16):
                raise ValueError("n must be a literal int in [1, 16]")
            fields = [StructField("n_tokens", LongType())]
            fields += [
                StructField(f"token_{i}", StringType()) for i in range(n.value)
            ]
            return AnalyzeResult(StructType(fields))

        def eval(self, text: str, n: int):
            if text is None:
                # Match the oracle's NULL propagation (string_split ->
                # list_filter -> len all yield NULL): n_tokens NULL,
                # not 0 — the _cdc_chunks fixture-drift lesson.
                yield (None, *[None] * n)
                return
            toks = [t for t in text.lower().split(" ") if t != ""]
            yield (len(toks), *[
                toks[i] if i < len(toks) else None for i in range(n)
            ])

    first_tokens = udtf(FirstTokens)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return _poly_apply(spark, d, first_tokens)


def _poly_apply(spark: SparkSession, d: DataFrame, first_tokens):
    """Apply the polymorphic UDTF via the SQL LATERAL surface (the
    supported call form — UDTFs are table functions, not projections):
    register under a FIXED name (registration is idempotent —
    re-registering replaces the entry, so repeated gate runs in one
    session don't accumulate catalog functions; ADVICE r8), lateral-
    join, drop the uuid view (only the VIEW needs a per-run name)."""
    import uuid as _uuid

    name = "bdf_poly_first_tokens"
    spark.udtf.register(name, first_tokens)
    view = f"poly_docs_{_uuid.uuid4().hex[:12]}"
    d.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT v.doc_id, t.n_tokens,
                   {', '.join(f"t.token_{i}" for i in range(_POLY_N_TOKENS))}
            FROM {view} v, LATERAL {name}(v.text, {_POLY_N_TOKENS}) t
            """
        )
    finally:
        spark.catalog.dropTempView(view)
