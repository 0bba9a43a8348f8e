"""Session-6 operator semantics on SYNTHETIC fixtures — the pagerank
convention: the sf-fixture oracle proves cross-engine agreement, these
tests pin the semantics against hand-computed / independently-coded
references that share no code (and no constants) with the gates.

Synthetic tables are written as parquet into tmp dirs shaped like an
sf_dir, so every test drives the REAL registered gate end-to-end
through io.table's dtype guard — not a re-implementation."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def _write_events(dirpath, rows: list[dict]) -> str:
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df = df[["event_id", "ts", "user_id", "event_type", "value"]]
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{dirpath}/events.parquet")
    return str(dirpath)


T0 = pd.Timestamp("2024-01-01 00:00:00")


def _ev(eid, ts, uid, etype, value=1.0):
    return {"event_id": eid, "ts": ts, "user_id": uid,
            "event_type": etype, "value": value}


class TestAsofNearest:
    def test_hand_case(self, spark, tmp_path):
        from big_data_flight_spark.operators.joins import join_asof_nearest

        rows = [
            # user 1: two same-ts clicks (max id must win, delta 0)
            _ev(1, T0, 1, "click"),
            _ev(2, T0, 1, "click"),
            _ev(3, T0, 1, "purchase"),
            # equal |delta| both sides -> back wins
            _ev(4, T0 + pd.Timedelta(minutes=10), 1, "click"),
            _ev(5, T0 + pd.Timedelta(minutes=20), 1, "purchase"),
            _ev(6, T0 + pd.Timedelta(minutes=30), 1, "click"),
            # nothing within the 1 h horizon -> NULL match
            _ev(7, T0 + pd.Timedelta(hours=5), 1, "purchase"),
            # user 2: forward-only candidate
            _ev(8, T0, 2, "purchase"),
            _ev(9, T0 + pd.Timedelta(minutes=5), 2, "click"),
        ]
        sf = _write_events(tmp_path, rows)
        got = {
            r["purchase_id"]: (r["click_id"], r["delta_us"], r["direction"])
            for r in join_asof_nearest(spark, sf).collect()
        }
        assert got == {
            3: (2, 0, "back"),
            5: (4, -600_000_000, "back"),
            7: (None, None, None),
            8: (9, 300_000_000, "fwd"),
        }


class TestEwma:
    def test_hand_case(self, spark, tmp_path):
        from big_data_flight_spark.operators.events import evt_ewma

        rows = [
            _ev(1, T0, 7, "click", 1.0),
            _ev(2, T0 + pd.Timedelta(seconds=1), 7, "click", 2.0),
            _ev(3, T0 + pd.Timedelta(seconds=2), 7, "click", 10.0),
        ]
        sf = _write_events(tmp_path, rows)
        [r] = evt_ewma(spark, sf).collect()
        # s1=1_000_000; s2=(1e6+2e6)//2=1_500_000; s3=(1.5e6+10e6)//2
        assert (r["user_id"], r["n_events"], r["last_value_micro"],
                r["ewma_micro"]) == (7, 3, 10_000_000, 5_750_000)

    def test_random_against_python_reference(self, spark, tmp_path):
        from big_data_flight_spark.operators.events import evt_ewma

        rng = np.random.default_rng(20260815)
        rows, expected = [], {}
        eid = 0
        for uid in range(1, 9):
            n = int(rng.integers(1, 30))
            # deliberately shuffled insertion order; same-ts collisions
            # forced so the (ts, event_id) tie-break matters
            ts_offsets = rng.integers(0, 20, size=n)
            vals = np.round(rng.uniform(0, 500, size=n), 2)
            per_user = []
            for k in range(n):
                eid += 1
                t = T0 + pd.Timedelta(seconds=int(ts_offsets[k]))
                rows.append(_ev(eid, t, uid, "click", float(vals[k])))
                per_user.append((t, eid, float(vals[k])))
            per_user.sort(key=lambda p: (p[0], p[1]))
            s = None
            for _, _, v in per_user:
                x = math.floor(v * 1_000_000 + 0.5)
                s = x if s is None else (s + x) // 2
            expected[uid] = (n, math.floor(per_user[-1][2] * 1_000_000 + 0.5), s)
        sf = _write_events(tmp_path, rows)
        got = {
            r["user_id"]: (r["n_events"], r["last_value_micro"], r["ewma_micro"])
            for r in evt_ewma(spark, sf).collect()
        }
        assert got == expected


class TestRollingMedian:
    def test_hand_case(self, spark, tmp_path):
        from big_data_flight_spark.operators.windows import win_rolling_median

        vals = [5.0, 1.0, 3.0, 2.0, 4.0]
        rows = [
            _ev(i + 1, T0 + pd.Timedelta(seconds=i), 1, "click", v)
            for i, v in enumerate(vals)
        ]
        sf = _write_events(tmp_path, rows)
        got = {r["event_id"]: r["rolling_median_7"]
               for r in win_rolling_median(spark, sf).collect()}
        assert got == {1: 5.0, 2: 3.0, 3: 3.0, 4: 2.5, 5: 3.0}


class TestCommonNeighbors:
    def test_brute_force_with_hot_customer_cap(self, spark, tmp_path):
        # r8 orientation (gate re-keyed out of vacuity): supplier pairs
        # via shared customers, cap on the per-customer supplier degree.
        from big_data_flight_spark.operators.graph import (
            _CN_HUB_CAP,
            _SUPPLIER_OFFSET,
            graph_common_neighbors,
        )

        rng = np.random.default_rng(42)
        # customer 0 is a mega-hub linked to _CN_HUB_CAP + 3 suppliers:
        # it must contribute NO pair evidence.
        links = {(0, s) for s in range(1, _CN_HUB_CAP + 4)}
        for c in range(1, 41):
            for s in rng.choice(np.arange(1, 13), size=4, replace=False):
                links.add((c, int(s)))
        links = sorted(links)
        orders = pd.DataFrame(
            {"o_orderkey": range(len(links)),
             "o_custkey": [c for c, _ in links]}
        )
        lineitem = pd.DataFrame(
            {"l_orderkey": range(len(links)),
             "l_suppkey": [s for _, s in links]}
        )
        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                       f"{tmp_path}/orders.parquet")
        pq.write_table(pa.Table.from_pandas(lineitem, preserve_index=False),
                       f"{tmp_path}/lineitem.parquet")

        # independent python reference (node ids carry the offset)
        from collections import Counter, defaultdict

        cust_deg = Counter(c for c, _ in links)
        kept = [
            (c, s + _SUPPLIER_OFFSET)
            for c, s in links
            if cust_deg[c] <= _CN_HUB_CAP
        ]
        by_cust = defaultdict(set)
        deg_s = Counter()
        for c, s in kept:
            by_cust[c].add(s)
            deg_s[s] += 1
        common = Counter()
        for ss in by_cust.values():
            ss = sorted(ss)
            for i, a in enumerate(ss):
                for b in ss[i + 1:]:
                    common[(a, b)] += 1
        scored = sorted(
            (
                (-n, s1, s2, n,
                 n * 1_000_000 // (deg_s[s1] + deg_s[s2] - n))
                for (s1, s2), n in common.items()
            )
        )[:20]
        expected = [(s1, s2, n, j) for _, s1, s2, n, j in scored]

        got = [
            (r["s1"], r["s2"], r["common"], r["jaccard_micro"])
            for r in graph_common_neighbors(spark, str(tmp_path)).collect()
        ]
        assert got == expected
        # the hub customer's exclusive suppliers (ids above 12) pair
        # ONLY through the hub — none of those pairs may appear
        hub_only_nodes = {
            s + _SUPPLIER_OFFSET for s in range(13, _CN_HUB_CAP + 4)
        }
        assert all(
            s1 not in hub_only_nodes and s2 not in hub_only_nodes
            for s1, s2, _, _ in got
        )


class TestPqAdc:
    def test_against_float64_reference(self, spark, tmp_path):
        from big_data_flight_spark.operators.similarity import (
            DIM,
            PQ_K,
            PQ_M,
            PQ_NQ,
            PQ_SUB,
            sim_pq_adc,
        )

        rng = np.random.default_rng(7)
        n = 50
        emb = rng.standard_normal((n, DIM)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, row)) for row in emb],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([i % 10 for i in range(n)], pa.int32()),
            }
        )
        pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")

        # independent reference: python-float left folds (the exact
        # IEEE order both engines use), argmin tie-break on code
        def sub(v, m):
            return [float(v[m * PQ_SUB + j]) for j in range(PQ_SUB)]

        def d2(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc += (x - y) * (x - y)
            return acc

        recon, codes = {}, {}
        for i in range(n):
            rc, cc = [], []
            for m in range(PQ_M):
                best = min(
                    (d2(sub(emb[i], m), sub(emb[k], m)), k)
                    for k in range(PQ_K)
                )
                rc.extend(sub(emb[best[1]], m))
                cc.append(best[1])
            recon[i] = rc
            codes[i] = "-".join(str(c) for c in cc)
        rows = []
        for qid in range(PQ_NQ):
            qv = [float(x) for x in emb[qid]]
            scored = sorted(
                (d2(qv, recon[k]), k) for k in range(n) if k != qid
            )[:5]
            for rn, (adc, k) in enumerate(scored, 1):
                rows.append(
                    (qid, k, codes[k],
                     math.floor(adc * 1e6 + 0.5) / 1e6, rn)
                )

        got = sorted(
            (r["query_id"], r["neighbor_id"], r["codes"], r["adc_d6"], r["rn"])
            for r in sim_pq_adc(spark, str(tmp_path)).collect()
        )
        assert got == sorted(rows)


class TestDynamicOverwrite:
    def test_conf_restored(self, spark):
        from big_data_flight_spark.sources.connectors import (
            sink_dynamic_partition_overwrite,
        )

        key = "spark.sql.sources.partitionOverwriteMode"
        before = spark.conf.get(key, None)
        sink_dynamic_partition_overwrite(spark, SF_SMOKE).collect()
        assert spark.conf.get(key, None) == before


class TestBpeEncode:
    def test_budgets_consistent_with_train(self, spark):
        """Encoding conservation laws on the real smoke fixture:
        n_chars == n_chars of the raw words (merges never change
        characters), n_tokens <= n_chars (a token is >= 1 char) and
        n_tokens >= n_words (a word is >= 1 token), and the corpus
        total token count equals the train gate's audited
        corpus_symbols_after at the final round."""
        from big_data_flight_spark.operators.text import (
            TEXT_BPE_ROUNDS,
            text_bpe_encode,
            text_bpe_merge_train,
        )

        enc = text_bpe_encode(spark, SF_SMOKE).collect()
        assert enc, "empty encode output"
        for r in enc:
            assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]
            assert r["n_unique_words"] <= r["n_words"]
        total_tokens = sum(r["n_tokens"] for r in enc)
        train = {r["round"]: r for r in
                 text_bpe_merge_train(spark, SF_SMOKE).collect()}
        assert total_tokens == train[TEXT_BPE_ROUNDS]["corpus_symbols_after"]


class TestCogroupKernel:
    def test_nat_and_empty_paths(self):
        """The kernel paths the sf fixture may never exercise: a
        purchase BEFORE any click (NaT inside merge_asof), an empty
        click side, and an empty purchase side."""
        from big_data_flight_spark.operators.udfs import _cogroup_asof

        left = pd.DataFrame(
            {"user_id": [1, 1],
             "ts": [T0, T0 + pd.Timedelta(hours=2)],
             "event_id": [10, 11]}
        )
        right = pd.DataFrame(
            {"user_id": [1],
             "c_ts": [T0 + pd.Timedelta(hours=1)],
             "c_eid": [5]}
        )
        m = _cogroup_asof(left, right).set_index("purchase_id")
        assert pd.isna(m.loc[10, "click_id"]) and pd.isna(m.loc[10, "delta_us"])
        assert m.loc[11, "click_id"] == 5
        assert m.loc[11, "delta_us"] == -3_600_000_000
        no_clicks = _cogroup_asof(left, right.iloc[0:0])
        assert list(no_clicks["purchase_id"]) == [10, 11]
        assert no_clicks["click_id"].isna().all()
        assert _cogroup_asof(left.iloc[0:0], right).empty


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
