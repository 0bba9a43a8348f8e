"""One-off 10x scale-stress rehearsal (VERDICT r9 #6).

Every 100 TB verdict so far is plan-shape reasoning; this grounds one
of them empirically. It synthesizes ~10x copies of the sf0.1 fixture
tables in a TEMP dir (never /root/testdata) by unioning key-shifted
copies — 10 disjoint id-spaces, so the graph gets 10x nodes+edges and
the corpus gets 10x docs with near-duplicate text across copies (each
copy appends a distinct marker token, so cross-copy pairs are
NEAR-dups, not byte-dups — the harder dedup load) — then runs the
three heaviest iterative/dedup gates once each, builder-inclusive,
and prints one JSON line with wall-times + output row counts. The
numbers go into BASELINE.md's round-10 section by hand; the artifact
of interest is "did the lineage/memory discipline (localCheckpoint per
round, checkpointed loop-invariants, bounded inverted-index fan-out)
hold one order of magnitude off the fixture ladder", not a record.

Usage:  python tools/scale_rehearsal.py [gate ...]
        SCALE_K=10 SCALE_DIR=/tmp/rehearsal python tools/scale_rehearsal.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

GATES = [
    "graph_pagerank_converged",    # iterative loop: lineage + checkpoint behavior
    "text_dedup_clusters_sliced",  # sliced label-propagation dedup
    "text_substring_dedup_clean",  # 8-gram inverted index, one shuffle
    "evt_sessionize_stats",        # events-table representative (cheap control)
]

# r11 extension (VERDICT r10 #3): the embedding/ANN family, whose
# 100 TB verdicts until now rested on plan shape alone. Run with
#   python tools/scale_rehearsal.py --ann
# (synthesizes 10x embeddings alongside the other tables). The dedup
# cap-saturation sweep is the same tool at increasing duplication:
#   SCALE_K=30 SCALE_DIR=/tmp/scale_rehearsal_30x SCALE_TABLES=documents \
#       python tools/scale_rehearsal.py text_near_dedup_jaccard
# (SCALE_TABLES limits synthesis to the tables the swept gates read —
# without it the 30x run also writes 45M lineitem rows for nothing).
ANN_GATES = [
    "sim_ivf_pq",                 # composed IVF-PQ ANN stack
    "sim_kmeans_lloyd",           # bit-exact Lloyd iterations
    "sim_semdedup_clustered",     # pairs only within k-means cells
    "text_near_dedup_jaccard",    # shingle inverted index (cap gate)
]

# r12 extension (VERDICT r11 #3): the streaming family — the last
# 10x-uncovered family. The three heaviest drains run availableNow
# over a 10x events stream; a StreamingQueryListener records PEAK
# STATE ROWS per drain (the 100 TB state-boundedness claim, finally
# load-tested: dq's keyed-uniqueness state grows with distinct
# event_ids — 1M keys at 10x — while windowed-agg and drift hold
# O(windows) / O(types x halves x bins) rows regardless of input).
# The drains' built-in conservation audits raise on any lost or
# double-counted micro-batch, so a clean run IS the audit. Run with
#   SCALE_TABLES=events python tools/scale_rehearsal.py --stream
STREAM_GATES = [
    "stream_windowed_agg",        # event-time tumbling windows
    "stream_drift_tv",            # incremental fixed-edge histogram
    "stream_dq_expectations",     # keyed-uniqueness contract state
]

# r12 extension: the relational/TPC-H join family — the last heavy
# family with no 10x empirical rehearsal (its 100 TB verdicts rest on
# the 111 pinned plans). Facts (lineitem/orders/customer/supplier)
# k-fold with FK-coherent shared key spans; nation/region stay FIXED
# (25/5 rows — dimension tables don't grow with corpus size; this is
# the realistic 100 TB shape, and it keeps every broadcast-dim
# verdict honest: the dims stay broadcastable at any fact scale).
# Run with
#   SCALE_TABLES=lineitem,orders,customer,supplier,nation,region \
#       python tools/scale_rehearsal.py --relational
REL_GATES = [
    "tpch_q5",                    # 6-table join incl both fixed dims
    "tpch_q18",                   # HAVING carry-forward single fact scan
    "tpch_q21",                   # 4-table join + per-group distinct-set
    "agg_groupby",                # flagship lineitem aggregation
]

# r12 extension 2: the ETL/sink maintenance family — merge-upsert,
# SCD2 interval building, CDC latest-snapshot, small-file compaction,
# Z-order layout. These are the jobs that RUN the 100 TB lakehouse
# day to day; until now their scale verdicts were plan-shape only.
# The sink gates write to their own temp dirs, so a k-fold run also
# load-tests the write path. Run with
#   SCALE_TABLES=customer,events,lineitem \
#       python tools/scale_rehearsal.py --etl
ETL_GATES = [
    "etl_merge_upsert",           # keyed upsert (full-outer + coalesce)
    "etl_scd2_intervals",         # event-history -> validity intervals
    "etl_cdc_latest_snapshot",    # latest-per-key CDC compaction
    "sink_compaction",            # small-file maintenance rewrite
    "sink_zorder_layout",         # 2-D clustered layout + box read-back
]

SRC = "/root/testdata/sf0.1"

# Written into every synthesized dir; rmtree refuses without it
# (unless the dir is under /tmp) — see main()'s guard (ADVICE r10).
MARKER = "_SCALE_REHEARSAL_MARKER"


def synthesize(spark, out: str, k: int) -> dict[str, int]:
    """Write k key-shifted copies of the tables the rehearsal gates
    read. Shifts keep every copy in a disjoint id space (graph grows
    by nodes, not degree); document text gets a per-copy marker token
    so cross-copy pairs are near-dups under shingle Jaccard."""
    from pyspark.sql import functions as F

    counts: dict[str, int] = {}
    _span_memo: dict[str, int] = {}

    def shared_span(key: str, sites: list[tuple[str, str]]) -> int:
        # FK coherence across copies (ADVICE r11): every table carrying
        # the same logical key must shift by the SAME span, or any
        # future rehearsal gate joining them gets dangling cross-copy
        # keys with no error. Derive the span ONCE from the max over
        # ALL sites (memoized; one 1-row agg per site).
        if key not in _span_memo:
            _span_memo[key] = 1 + max(
                int(
                    spark.read.parquet(f"{SRC}/{t}.parquet")
                    .agg(F.max(c))
                    .collect()[0][0]
                )
                for t, c in sites
            )
        return _span_memo[key]

    def orderkey_span() -> int:
        return shared_span(
            "orderkey", [("lineitem", "l_orderkey"), ("orders", "o_orderkey")]
        )

    def custkey_span() -> int:
        return shared_span(
            "custkey", [("orders", "o_custkey"), ("customer", "c_custkey")]
        )

    def suppkey_span() -> int:
        return shared_span(
            "suppkey", [("lineitem", "l_suppkey"), ("supplier", "s_suppkey")]
        )

    def stack(df, shift_cols: list[str], text_marker: bool = False,
              span_overrides: dict[str, int] | None = None):
        # id spans read off the data (max+1), one 1-row agg per table —
        # except columns in span_overrides (shared FK spans).
        own = [c for c in shift_cols if c not in (span_overrides or {})]
        spans = dict(span_overrides or {})
        if own:
            row = df.agg(*[F.max(c) for c in own]).collect()[0]
            spans.update({c: int(row[j]) + 1 for j, c in enumerate(own)})
        parts = []
        for i in range(k):
            p = df
            for c, span in spans.items():
                p = p.withColumn(c, (F.col(c) + F.lit(i * span)).cast(df.schema[c].dataType))
            if text_marker and i > 0:
                p = p.withColumn("text", F.concat(F.col("text"), F.lit(f" copymark{i}")))
            parts.append(p)
        out_df = parts[0]
        for p in parts[1:]:
            out_df = out_df.unionByName(p)
        return out_df

    def stack_embeddings():
        """k id-shifted copies of the embeddings table. Copy i's
        vectors are circularly ROTATED by i % dim positions and SIGN-
        FLIPPED every dim copies (r11, VERDICT r10 #3; review-hardened):
        a key-shifted verbatim copy would plant k exact-duplicate
        vectors (degenerate cosine ties, unrepresentative top-k);
        rotation preserves norms and within-copy geometry but
        decorrelates copies, and the sign flip keeps copy dim (rotation
        0 again) from being a verbatim duplicate up to k = 2*dim. The
        dimension is read off the data, never hardcoded.
        Deterministic, no randomness needed."""
        emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
        first = emb.select(F.size("embedding")).first()
        dim = int(first[0])
        vec_span = int(emb.agg(F.max("vec_id")).collect()[0][0]) + 1
        if k > 2 * dim:
            print(f"WARNING: SCALE_K={k} > 2*dim={2*dim}: copies beyond "
                  f"{2*dim} repeat earlier copies' vectors verbatim",
                  file=sys.stderr)
        parts = []
        for i in range(k):
            r = i % dim
            p = emb.withColumn(
                "vec_id",
                (F.col("vec_id") + F.lit(i * vec_span)).cast(
                    emb.schema["vec_id"].dataType
                ),
            )
            if r:
                p = p.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", r + 1, dim - r),
                        F.slice("embedding", 1, r),
                    ),
                )
            if (i // dim) % 2 == 1:
                p = p.withColumn(
                    "embedding", F.transform("embedding", lambda x: -x)
                )
            parts.append(p)
        out_df = parts[0]
        for p in parts[1:]:
            out_df = out_df.unionByName(p)
        return out_df

    # Thunks, not DataFrames: span/dim scalars are read inside each
    # builder, so a SCALE_TABLES-filtered table costs NOTHING — no
    # scan, no 1-row collect (r11 review; the spans for all five
    # tables used to run regardless of the filter).
    jobs = {
        "lineitem": lambda: stack(
            spark.read.parquet(f"{SRC}/lineitem.parquet"),
            ["l_orderkey", "l_suppkey"],
            span_overrides={
                "l_orderkey": orderkey_span(),
                "l_suppkey": suppkey_span(),
            },
        ),
        "orders": lambda: stack(
            spark.read.parquet(f"{SRC}/orders.parquet"),
            ["o_orderkey", "o_custkey"],
            span_overrides={
                "o_orderkey": orderkey_span(),
                "o_custkey": custkey_span(),
            },
        ),
        "customer": lambda: stack(
            spark.read.parquet(f"{SRC}/customer.parquet"),
            ["c_custkey"],
            span_overrides={"c_custkey": custkey_span()},
        ),
        "supplier": lambda: stack(
            spark.read.parquet(f"{SRC}/supplier.parquet"),
            ["s_suppkey"],
            span_overrides={"s_suppkey": suppkey_span()},
        ),
        # Dimension tables stay FIXED-SIZE across copies (25/5 rows):
        # c_nationkey/s_nationkey are NOT shifted, so every copy's
        # customers and suppliers land on the same real nations — the
        # realistic shape (at 100 TB the fact tables grow, the
        # geography doesn't), and it keeps the broadcast-dim plan
        # verdicts honest at any k.
        "nation": lambda: spark.read.parquet(f"{SRC}/nation.parquet"),
        "region": lambda: spark.read.parquet(f"{SRC}/region.parquet"),
        "documents": lambda: stack(
            spark.read.parquet(f"{SRC}/documents.parquet"),
            ["doc_id"], text_marker=True,
        ),
        "events": lambda: stack(
            spark.read.parquet(f"{SRC}/events.parquet"),
            ["event_id", "user_id"],
        ),
        "embeddings": stack_embeddings,
    }
    # Optional table filter (r11): the 30x dedup-cap saturation sweep
    # only reads documents — synthesizing 45M lineitem rows for it
    # would triple the setup cost for nothing.
    only = os.environ.get("SCALE_TABLES")
    if only:
        keep = {t.strip() for t in only.split(",")}
        jobs = {n: fn for n, fn in jobs.items() if n in keep}
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, MARKER), "w") as fh:
        fh.write("synthesized by tools/scale_rehearsal.py — safe to delete\n")
    for name, build in jobs.items():
        df = build()
        path = f"{out}/{name}.parquet"
        if name == "events":
            # events must be a single FILE named events.parquet, like
            # the real fixture (r12): the streaming twins' source is
            # readStream.option(pathGlobFilter, "events.parquet") over
            # sf_dir — part files inside an events.parquet/ DIRECTORY
            # match no glob and the stream drains zero rows. 10x sf0.1
            # is ~20 MB; parquet row groups keep the batch scan
            # splittable anyway.
            stage = f"{out}/_events_stage"
            df.coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(
                f for f in os.listdir(stage)
                if f.startswith("part-") and f.endswith(".parquet")
            )
            if os.path.exists(path):
                (shutil.rmtree if os.path.isdir(path) else os.remove)(path)
            shutil.move(os.path.join(stage, part), path)
            shutil.rmtree(stage)
        else:
            # 16 output files per table: at 10x sf0.1 this keeps scan
            # splits near maxPartitionBytes instead of one giant file
            # (the single-file fixture pathology, CLAUDE.md invariant 4).
            df.repartition(16).write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    return counts


class _StatePeakListener:
    """StreamingQueryListener capturing max state rows per progress.
    Defined lazily (real base class needs an active session import);
    instantiated via make() to keep module import Spark-free."""

    @staticmethod
    def make():
        from pyspark.sql.streaming.listener import StreamingQueryListener

        class _L(StreamingQueryListener):
            def __init__(self) -> None:
                self.progress_rows: list[tuple[str, int, int]] = []
                self.started_ids: list[str] = []

            def onQueryStarted(self, event) -> None:  # noqa: N802
                self.started_ids.append(str(event.id))

            def onQueryProgress(self, event) -> None:  # noqa: N802
                p = event.progress
                for so in p.stateOperators:
                    self.progress_rows.append(
                        (str(p.id), int(so.numRowsTotal), int(so.numRowsUpdated))
                    )

            def onQueryIdle(self, event) -> None:  # noqa: N802
                pass

            def onQueryTerminated(self, event) -> None:  # noqa: N802
                pass

        return _L()


def main() -> int:
    k = int(os.environ.get("SCALE_K", "10"))
    out = os.environ.get("SCALE_DIR", "/tmp/scale_rehearsal_10x")
    args = sys.argv[1:]
    # Strict argument validation (ADVICE r11): an unrecognized flag
    # used to be silently dropped (a '--annn' typo ran the default
    # sweep), and a misspelled gate name only raised KeyError AFTER
    # the expensive synthesize() step.
    known_flags = {"--ann", "--stream", "--relational", "--etl"}
    bad_flags = [a for a in args if a.startswith("--") and a not in known_flags]
    if bad_flags:
        print(f"unknown flags: {bad_flags} (known: {sorted(known_flags)})",
              file=sys.stderr)
        return 2
    names = [a for a in args if not a.startswith("--")]
    gates = list(names)
    if "--ann" in args:
        gates += ANN_GATES
    if "--stream" in args:
        gates += STREAM_GATES
    if "--relational" in args:
        gates += REL_GATES
    if "--etl" in args:
        gates += ETL_GATES
    if not gates:
        gates = GATES

    from big_data_flight_spark.registry import (
        _REGISTRY,
        _load_all_operator_modules,
    )
    from big_data_flight_spark.session import get_session

    _load_all_operator_modules()
    unknown = [g for g in gates if g not in _REGISTRY]
    if unknown:
        print(f"unknown gates (not in registry): {unknown}", file=sys.stderr)
        return 2
    spark = get_session("scale-rehearsal")

    if os.path.isdir(out) and os.environ.get("SCALE_REUSE") != "1":
        # Destructive-path guard (ADVICE r10): SCALE_DIR is env-provided,
        # so refuse to rmtree anything that is not clearly ours — either
        # under /tmp or carrying the marker file synthesize() writes.
        # Without this, SCALE_DIR=/root/testdata/sf0.1 would delete real
        # fixtures despite the docstring's "never /root/testdata" promise.
        real = os.path.realpath(out)
        if not (real.startswith("/tmp/") or os.path.exists(os.path.join(out, MARKER))):
            print(
                f"refusing to rmtree {out!r}: not under /tmp and no "
                f"{MARKER} marker — not a rehearsal dir", file=sys.stderr,
            )
            return 2
        shutil.rmtree(out)
    if not os.path.isdir(out):
        t0 = time.perf_counter()
        counts = synthesize(spark, out, k)
        synth_sec = round(time.perf_counter() - t0, 1)
    else:
        counts, synth_sec = {"reused": 1}, 0.0

    listener = None
    if "--stream" in args:
        listener = _StatePeakListener.make()
        spark.streams.addListener(listener)

    results: dict[str, dict] = {}
    for name in gates:
        q = _REGISTRY[name]
        smark = len(listener.started_ids) if listener else 0
        t0 = time.perf_counter()
        try:
            df = q.builder(spark, out)
            n = df.count()
            results[name] = {
                "wall_sec": round(time.perf_counter() - t0, 1),
                "rows": n,
                "status": "OK" if n > 0 else "EMPTY",
            }
        except Exception as exc:  # noqa: BLE001
            results[name] = {
                "wall_sec": round(time.perf_counter() - t0, 1),
                "rows": -1,
                "status": f"ERROR: {exc}"[:300],
            }
        if listener is not None and name.startswith("stream_"):
            # listener events arrive async; give the bus a moment
            time.sleep(3)
            # attribute by the QUERY IDS this gate started, never by
            # list position: on a stall-wave box a previous gate's
            # late progress event can land after the next gate's mark
            # and a positional slice would misattribute its state
            # rows (r12 review finding)
            gate_ids = set(listener.started_ids[smark:])
            window = [
                row for row in listener.progress_rows if row[0] in gate_ids
            ]
            results[name]["peak_state_rows"] = max(
                (r for _, r, _ in window), default=0
            )
            results[name]["state_rows_updated"] = sum(u for _, _, u in window)
        print(f"rehearsal {name}: {results[name]}", file=sys.stderr, flush=True)

    print(json.dumps({
        "k": k,
        "dir": out,
        "synth_sec": synth_sec,
        "table_rows": counts,
        "gates": results,
    }))
    return 0 if all(r["status"] == "OK" for r in results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
