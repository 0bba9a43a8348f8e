"""Driver-window rotation aliases (round 4 set).

The driver's correctness gate samples only the 50 alphabetically-first
gate names per round; rounds 1 and 2 both graded ``agg_*``…``fn_json``,
leaving every joins/windows/text/similarity/tpch/udf gate resting on
the local ``tools/compare.py`` oracle alone — exactly where round 2's
only regression (sim_rerank_pandas) hid. Each alias is a zero-code
delegation: same builder object, same oracle SQL, registered under an
``a0_``-prefixed name that sorts before ``agg_`` so it lands inside
the driver's alphabetical window.

Round-4 rotation (VERDICT r3 "Next round" #3 + ADVICE: rotate every
round so no family stays un-windowed for consecutive rounds):

* RETIRED: the 13 round-3 aliases whose targets went driver-green in
  CORRECTNESS_r03.json (join_asof, join_broadcast, win_topk_per_group,
  limit_topk, text_near_dedup_jaccard, text_minhash_lsh,
  sim_rerank_pandas, sim_topk_neighbors, tpch_q18, udf_scalar_arrow,
  tpch_q2, text_pii_scrub, text_weighted_mix).
* KEPT: ``a0_sim_quantize_int8`` — round 3's only red row (driver
  canonicalizer crash on its then-raw ``array<int>`` column); the
  output is now string-rendered and must be re-graded to green.
* NEW: 19 gates with strong oracles that have never had a driver row
  (tpch Q5/Q9/Q21-onescan, LSS dedup clustering, ANN LSH/IVF, csv
  round-trip, sink compaction, both streaming twins, range/equi joins,
  range-frame + running windows, mapInArrow, multimodal dedup, map
  functions, set-except, tfidf, deterministic sampling).
* NEW (session 2): the 8 gates born this session — chunking, epoch
  shuffle, matryoshka truncation, xml round-trip, chunk→pack
  pipeline, watermarked streaming window agg, mergeSchema drift
  ingest, range+sort time-series layout — so no brand-new gate ships
  without a driver row.

Displacement math (window = 28 ``a0_*`` + the 22 next names,
``agg_approx_distinct``…``etl_merge_upsert``): the names pushed
out of round 3's window — evt_rollup_cascade … evt_transition_matrix
by the session-1 set, evt_gap_fill / evt_late_data / evt_rate_alert /
evt_retention / evt_rfm / evt_dedup / evt_cooccurrence_pmi /
etl_scd2_intervals by the session-2 eight — are ALL green in
CORRECTNESS_r03.json (and in r1 and r2), and every displaced gate is
re-verified each round by the committed full-registry
COMPARE_LOCAL.json artifact, so net driver-verified surface strictly
grows (cumulative ≥ 91/176 distinct gates after r4).
"""

from __future__ import annotations

from big_data_flight_spark.registry import _REGISTRY, GateQuery

# alias -> existing gate name (family it finally gets driver-checked for)
_ALIASES = {
    # r3 carry-over: the one red row, now contract-fixed — must re-grade
    "a0_sim_quantize_int8": "sim_quantize_int8",
    # tpch pack (only Q2/Q18 ever driver-graded before)
    "a0_tpch_q5": "tpch_q5",
    "a0_tpch_q9": "tpch_q9",
    "a0_tpch_q21_onescan": "tpch_q21_onescan",  # measured single-scan strategy
    # dedup clustering / ANN (iterative + bucketed families)
    "a0_text_dedup_clusters_lss": "text_dedup_clusters_lss",
    "a0_sim_ann_lsh": "sim_ann_lsh",
    "a0_sim_ann_ivf": "sim_ann_ivf",
    # sources / sinks
    "a0_scan_csv": "scan_csv",
    "a0_sink_compaction": "sink_compaction",
    # streaming twins (micro-batch machinery under a bare session)
    "a0_stream_source_sink": "stream_source_sink",
    "a0_stream_stream_join": "stream_stream_join",
    # joins
    "a0_join_range_interval": "join_range_interval",
    "a0_join_inner_equi": "join_inner_equi",
    # windows
    "a0_win_range_frame": "win_range_frame",
    "a0_win_running": "win_running",
    # udf / multimodal / scalar-fn / set / text / sampling
    "a0_udf_map_in_arrow": "udf_map_in_arrow",
    "a0_mm_dedup_assets": "mm_dedup_assets",
    "a0_fn_map": "fn_map",
    "a0_set_except": "set_except",
    "a0_sample_rows": "sample_rows",
    # session-2 additions: every BRAND-NEW gate gets a driver row the
    # round it ships — the r2 (rerank) / r3 (quantize) lesson was that
    # the newest gate is exactly where driver-visible defects hide.
    # Displacing these 5 pushes evt_gap_fill / evt_late_data /
    # evt_rate_alert / evt_retention / evt_rfm out of the 50-name
    # window; all five are driver-green in r1 AND r2 AND r3
    # (verified against the committed CORRECTNESS artifacts) and stay
    # covered by COMPARE_LOCAL.json.
    "a0_text_chunk_documents": "text_chunk_documents",
    "a0_text_shuffle_shard": "text_shuffle_shard",
    "a0_sim_matryoshka_truncate": "sim_matryoshka_truncate",
    "a0_scan_xml": "scan_xml",
    "a0_text_chunk_pack_pipeline": "text_chunk_pack_pipeline",
    # displaces evt_dedup (green r1+r2+r3)
    "a0_stream_windowed_agg": "stream_windowed_agg",
    # displaces evt_cooccurrence_pmi (green r1+r2+r3)
    "a0_scan_schema_evolution": "scan_schema_evolution",
    # displaces etl_scd2_intervals (green r1+r2+r3)
    "a0_sink_sorted_layout": "sink_sorted_layout",
    # session-3 additions (same brand-new-gate rule); displacing these
    # 2 pushes etl_cdc_latest_snapshot / etl_merge_upsert out of the
    # window — both driver-green in r1+r2+r3 and covered by
    # COMPARE_LOCAL.json.
    "a0_sim_hamming_topk": "sim_hamming_topk",
    "a0_stream_dedup": "stream_dedup",
    # session-3 graph family (brand-new gates + the family's first-ever
    # driver rows); displacing these 2 pushes distinct_rows / dq_profile
    # out of the window — both r3-green and covered by COMPARE_LOCAL.
    "a0_graph_pagerank": "graph_pagerank",
    "a0_graph_degree_hist": "graph_degree_hist",
    # session-3: sixth dedup modality (displaces agg_stats — r3-green)
    "a0_text_near_dedup_editdist": "text_near_dedup_editdist",
    # session-3: real WAV codec round-trip (displaces agg_rollup —
    # r3-green)
    "a0_mm_audio_decode_wav": "mm_audio_decode_wav",
}


def _register_aliases() -> None:
    # Target modules are imported by _load_all_operator_modules before
    # this module (import order in registry.py), so lookups are safe.
    for alias, target in _ALIASES.items():
        if alias in _REGISTRY:  # idempotent across re-imports
            continue
        if target not in _REGISTRY:
            raise KeyError(f"alias target {target!r} not registered")
        t = _REGISTRY[target]
        _REGISTRY[alias] = GateQuery(
            name=alias,
            builder=t.builder,
            oracle=t.oracle,
            doc=f"Driver-window alias of {target} (see module docstring). " + t.doc,
            tags=tuple(t.tags) + ("alias",),
        )


_register_aliases()
