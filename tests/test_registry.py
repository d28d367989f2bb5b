"""Registry window discipline: every registered query must be PLACED in
``registry._PRIORITY`` deliberately — the driver grades only the first
``GRADED_WINDOW`` entries, so an unlisted query would silently escape the
external correctness gate (judge ADVICE r3/r4: warn-only is invisible in
a headless run)."""

from __future__ import annotations

import pytest

from opensnowcat_collector_spark.engine import registry, relational


def test_window_sentinel_pinned():
    assert registry._PRIORITY.index(registry._WINDOW_SENTINEL) == registry.GRADED_WINDOW


def test_priority_has_no_duplicates():
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))


def test_every_registered_query_is_listed():
    extras = [n for n in relational.QUERIES if n not in registry._PRIORITY]
    assert extras == []


def test_unlisted_extra_raises_then_allowed_with_flag():
    name = "zz_test_unlisted_query"
    assert name not in relational.QUERIES
    relational.QUERIES[name] = lambda spark, sf_dir: None
    try:
        with pytest.raises(RuntimeError, match="not listed in registry._PRIORITY"):
            registry.all_queries()
        registry.ALLOW_UNLISTED_EXTRAS = True
        try:
            with pytest.warns(UserWarning, match="not listed"):
                names = list(registry.all_queries())
            # escape hatch appends AFTER the graded window
            assert names[-1] == name
            assert names.index(name) >= registry.GRADED_WINDOW
        finally:
            registry.ALLOW_UNLISTED_EXTRAS = False
    finally:
        del relational.QUERIES[name]


_R10_R4_DISPLACED = [
    "q10_returned_items",
    "collector_enrich_events",
    "collector_bridge_roundtrip",
    "collector_bounce_events",
    "streaming_hourly_rollup",
    "agg_approx_distinct",
    "join_asof_last_click",
]

_R10_R5_TRANCHE = [
    "dedup_embedding_cosine",
    "dedup_embedding_kmeans",
    "dedup_cluster_components",
    "dedup_incremental",
    "sim_topk_bruteforce",
    "sim_ann_multiprobe",
    "sim_ann_ivf",
    "sim_ann_ivf_kmeans",
    "sim_ann_batch",
    "text_token_stats",
    "text_quality_score",
    "text_langid",
    "text_token_bpeish",
    "text_repetition_score",
    "curate_sample_stratified",
    "curate_pack_sequences",
    "curate_contamination",
    "curate_domain_mix",
    "curate_quality_quantile_filter",
    "curate_source_quota",
    "curate_token_budget_select",
    # mm_decode_metadata / mm_resize_plan / mm_frame_sample: displaced
    # from the window bottom by the graded-on-arrival
    # streaming_semdedup, curate_doremi_weights and
    # curate_rho_token_select (r5 evidence fresh through r11; they
    # head the r11 window)
]

_STANDING_KEEPS = [
    "streaming_leftouter_join",
    "streaming_session_timeout_flush",
    "dedup_paragraph_exact",
    "streaming_dedup_watermark",
    "streaming_session_window",
    "streaming_enrich_join",
    "streaming_stream_stream_join",
    "streaming_stateful_sessionize",
    "streaming_document_curation",
    "join_skew_salted",
    "join_bucketed_colocated",
    "dedup_minhash_lsh",
    "sim_ann_lsh",
    "corpus_curation_pipeline",
    "mm_feature_extract",
]


def _latest_green_by_round():
    """(latest_green, rounds) derived from the git-TRACKED CORRECTNESS
    artifacts — the same evidence the judge reads, minus any untracked
    in-flight artifact the driver drops after the builder's last commit
    (VERDICT r10 item 1: the round-composition pins below must not flip
    mid-round)."""
    import json
    import os
    import re
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from gen_gate_map import tracked_correctness_paths

    latest_green: dict[str, int] = {}
    rounds = []
    for path in tracked_correctness_paths():
        rnd = int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", path).group(1))
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") is True and row.get("schema_match") is True:
                if row.get("hash_match") in (True, None):
                    latest_green[name] = max(latest_green.get(name, 0), rnd)
    return latest_green, rounds


def test_r10_window_composition():
    """r10 rotation (VERDICT r9 item 1, executing the plan recorded in
    the r9 registry's "r10 PLAN" comment): the window holds (a) the
    seven r4-tranche entries displaced by r9-new queries (age 6 at r10
    — the last legal round under the freshness bar), (b) the complete
    r5-latest tranche (age 5 — clears the r5 backlog in one round),
    (c) the 15 standing keeps, and (d) four slots for r10-new queries
    (r6-head fillers until they land — every occupant must be either
    r6-or-fresher evidence or never graded, i.e. genuinely new).

    SELF-RETIRING: pins the round-10 composition only; skips once the
    r10 CORRECTNESS artifact lands.  The r11 rotation writes its own
    pin (the r8→r9 handoff showed a non-retiring pin fails the suite
    the moment the next round's artifacts land)."""
    latest_green, rounds = _latest_green_by_round()
    if max(rounds) + 1 != 10:
        pytest.skip("window-composition pin for round 10; rotate + re-pin")
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    for name in _R10_R4_DISPLACED + _R10_R5_TRANCHE + _STANDING_KEEPS:
        assert name in window, name
    mandatory = set(_R10_R4_DISPLACED + _R10_R5_TRANCHE + _STANDING_KEEPS)
    for name in window:
        if name not in mandatory:
            # free slot: r6-or-fresher filler, or an r10-new query
            assert latest_green.get(name, 99) >= 6, name


def test_next_round_rotation_horizon():
    """Round-generic horizon check (generalized from the r9-written r11
    pin, VERDICT r9 item 6): verify from the tracked artifacts that the
    CURRENT window composition leaves NO query aging past the 6-round
    freshness bar next round, given only that (a) the in-flight window
    gets this round's evidence and (b) the next window re-windows the
    staged head plus the standing keeps.  This is the executable form of
    the 'PLAN' comment registry.py carries for the following round."""
    latest_green, rounds = _latest_green_by_round()
    nxt = max(rounds) + 2  # artifacts exist through the completed round
    window = set(registry._PRIORITY[: registry.GRADED_WINDOW])
    simulated = dict(latest_green)
    for name in window:
        simulated[name] = nxt - 1
    staged = registry._PRIORITY[registry.GRADED_WINDOW :]
    must_window_next = [
        n for n in registry._PRIORITY if nxt - simulated.get(n, -100) > 6
    ]
    plan_next = set(staged[: 50 - len(_STANDING_KEEPS)]) | set(_STANDING_KEEPS)
    for name in must_window_next:
        assert name in plan_next, (
            f"{name} ages out at r{nxt} but is not in the staged window head"
        )
    # and the mandatory set is comfortably smaller than the window
    assert len(must_window_next) <= 50 - len(_STANDING_KEEPS)


_R11_MM_DISPLACED = [
    "mm_decode_metadata",
    "mm_resize_plan",
    "mm_frame_sample",
]

# head of the r6 block windowed at r11 (the bottom three —
# text_cooccurrence_ratio / curate_dataset_card / events_session_sequences
# — wait for r12 at age 6, still at the bar); r11-new queries displace
# further entries from this list's BOTTOM to the staged head, and each
# displacement removes the entry here (graded-on-arrival rule).
_R11_R6_HEAD = [
    "q2_minprice_supplier",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_balance",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity_revenue",
    "q20_excess_supply",
    "q21_waiting_supplier",
    "text_pii_scrub",
    "curate_blocklist_filter",
    "dedup_repeated_ngram_fraction",
    "text_tfidf_topterms",
    "agg_approx_percentile",
    "dedup_url_canonical",
    "events_transition_matrix",
    # curate_dedup_apply / curate_train_val_split /
    # agg_hll_partitioned_merge /
    # events_burst_detection / sim_ann_delete / dedup_incremental_minhash
    # / sim_ann_incremental / curate_tokenize_ids / events_funnel_steps /
    # events_retention_cohorts / sim_ann_recall / text_vocab_stats /
    # text_unigram_logprob: displaced from the window bottom by the
    # thirteen graded-on-arrival r11-new queries (r6 evidence fresh
    # through r12; they head the r12 window)
]


def test_r11_window_composition():
    """r11 rotation (VERDICT r10 item 1, executing the plan recorded in
    the r10 registry's "r11 PLAN" comment): the window holds (a) the
    mm_* trio displaced from the r10 window by the late r10-new queries
    (r5 evidence, age 6 at r11 — the last legal round), (b) the head of
    the r6 block (age 5), and (c) the 15 standing keeps.  Any free slot
    (opened by an r11-new query displacing an r6 entry from the window
    bottom) must hold either a genuinely new query (never graded) or
    r7-or-fresher evidence.

    SELF-RETIRING: pins the round-11 composition only; skips once the
    r11 CORRECTNESS artifact is tracked.  The r12 rotation writes its
    own pin."""
    latest_green, rounds = _latest_green_by_round()
    if max(rounds) + 1 != 11:
        pytest.skip("window-composition pin for round 11; rotate + re-pin")
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    for name in _R11_MM_DISPLACED + _R11_R6_HEAD + _STANDING_KEEPS:
        assert name in window, name
    mandatory = set(_R11_MM_DISPLACED + _R11_R6_HEAD + _STANDING_KEEPS)
    for name in window:
        if name not in mandatory:
            # free slot: an r11-new query (never graded) or an
            # r7-or-fresher filler
            assert name not in latest_green or latest_green[name] >= 7, name


def test_registered_query_outputs_are_scalar_only(spark, sf_dir):
    """The driver's correctness canonicalizer sorts result cells with
    pandas (``sort_values`` over all columns), which cannot hash array /
    map / struct cells — ``embed_quantize_int8`` escaped the local sweep
    in r7 and died in the driver with ``TypeError: unhashable type:
    'list'`` (CORRECTNESS_r07.json).  Every registered query therefore
    emits scalar columns only; vector-shaped results must be flattened
    (``array_join`` / explode) before registration.

    Batch queries are checked here lazily via ``.schema`` (analysis only,
    no job).  ``streaming_*`` gates drain a real stream inside their
    callable, so they are asserted instead at execution time by the full
    oracle sweep (tests/test_relational_oracle.py rejects non-scalar
    cells for every query, streaming included).
    """
    from pyspark.sql import types as T

    bad: dict[str, list[str]] = {}
    for name, fn in registry.all_queries().items():
        if name.startswith("streaming_"):
            continue
        schema = fn(spark, sf_dir).schema
        complex_fields = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_fields:
            bad[name] = complex_fields
    assert bad == {}, f"non-scalar output columns break the driver gate: {bad}"


def test_rotation_schedule_solvable_through_r16():
    """Forward-simulate the rotation for six future rounds and prove the
    freshness bar stays satisfiable: each simulated round windows the
    standing keeps plus the 35 stalest other entries (the greedy policy
    every actual rotation has followed), everything windowed gets that
    round's evidence, and NO query may exceed age 6 at any point.  This
    is the capacity check the per-round horizon test cannot see — e.g.
    r10's three graded-on-arrival displacements push r6 stragglers
    toward r12, which is only legal because the bar is >6, not >=6;
    if a future round over-displaces, this fails YEARS before the
    freshness test would."""
    latest_green, rounds = _latest_green_by_round()
    current = max(rounds) + 1  # the in-flight round
    sim = dict(latest_green)
    # the in-flight round grades the current window
    for name in registry._PRIORITY[: registry.GRADED_WINDOW]:
        sim[name] = current
    for rnd in range(current + 1, current + 7):
        # greedy: keeps always in; fill with the stalest evidence
        others = sorted(
            (n for n in registry._PRIORITY if n not in _STANDING_KEEPS),
            key=lambda n: (sim.get(n, -100), n),
        )
        window = set(_STANDING_KEEPS) | set(
            others[: registry.GRADED_WINDOW - len(_STANDING_KEEPS)]
        )
        for name in registry._PRIORITY:
            age = rnd - sim.get(name, -100)
            assert age <= 6 or name in window, (
                f"round {rnd}: {name} (age {age}) cannot fit the window — "
                f"the rotation schedule is over-committed"
            )
        for name in window:
            sim[name] = rnd


_R12_R6_BOTTOM = [
    "curate_dedup_apply",
    "curate_train_val_split",
    "agg_hll_partitioned_merge",
    "events_burst_detection",
    "sim_ann_delete",
    "dedup_incremental_minhash",
    "sim_ann_incremental",
    "curate_tokenize_ids",
    "events_funnel_steps",
    "events_retention_cohorts",
    "sim_ann_recall",
    "text_vocab_stats",
    "text_unigram_logprob",
    "text_cooccurrence_ratio",
    "curate_dataset_card",
    "events_session_sequences",
]

_R12_R7_HEAD = [
    "dedup_bloom_incremental",
    "dedup_prefix_contained",
    "curate_temperature_mix",
    "sim_ann_filtered",
    "streaming_latest_profile",
    "sim_ann_pq",
    "curate_chunk_overlap",
    "sim_ann_ivfpq",
    "curate_mix_apply",
    "streaming_foreachbatch_sink",
    "sim_ann_compacted",
    "sim_bitext_mine",
    "text_length_histogram",
    "events_scd2_intervals",
    # join_asof_forward_tolerance / dedup_lsh_quality /
    # events_zorder_pruned / curate_snapshot_diff: displaced from the
    # window bottom by the graded-on-arrival streaming_kn_scoring,
    # streaming_kn_refresh, streaming_fuzzy_contamination and
    # curate_kn_perplexity_buckets (r7 evidence fresh through r13;
    # they head the r13 window)
]


def test_r12_window_composition():
    """r12 rotation (VERDICT r11 item 6, executing the plan recorded in
    the r11 registry's "r12 PLAN" comment): the window holds (a) the
    sixteen r6-evidence entries deferred from r11 (age 6 at r12 — the
    last legal round), (b) the head of the r7 block (age 5), and (c)
    the 15 standing keeps.  Any free slot must hold either a genuinely
    new query (never graded) or r8-or-fresher evidence.

    SELF-RETIRING: pins the round-12 composition only; skips once the
    r12 CORRECTNESS artifact is tracked.  The r13 rotation writes its
    own pin."""
    latest_green, rounds = _latest_green_by_round()
    if max(rounds) + 1 != 12:
        pytest.skip("window-composition pin for round 12; rotate + re-pin")
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    for name in _R12_R6_BOTTOM + _R12_R7_HEAD + _STANDING_KEEPS:
        assert name in window, name
    mandatory = set(_R12_R6_BOTTOM + _R12_R7_HEAD + _STANDING_KEEPS)
    for name in window:
        if name not in mandatory:
            # free slot: an r12-new query (never graded) or an
            # r8-or-fresher filler
            assert name not in latest_green or latest_green[name] >= 8, name


_R13_R7_BOTTOM = [
    "join_asof_forward_tolerance",
    "dedup_lsh_quality",
    "events_zorder_pruned",
    "curate_snapshot_diff",
    "text_gopher_quality_gates",
    "curate_global_shuffle",
    "agg_countmin_heavy_hitters",
    "events_max_concurrency_sweep",
    "streaming_countmin_sketch",
    "events_sliding_window_stats",
    "join_asof_nearest",
    "curate_importance_resample",
    "text_langid_ngram_profiles",
    "streaming_sliding_window",
    "collector_split_accounting",
    "collector_thrift_roundtrip",
    "collector_redirect_origin_gates",
    "dedup_shingle_containment",
    "sim_radius_search",
    "text_entropy_metrics",
]

_R13_R8_HEAD = [
    "embed_quantize_int8",
    "dedup_suffix_repeats",
    "curate_suffix_dedup_apply",
    "q7_volume_shipping",
    "agg_stats_percentiles",
    "q12_linestatus_priority",
    "events_hourly_rollup",
    "agg_cube_status_priority",
    "agg_grouping_sets",
    # scalar_url_map_funcs / scalar_hash_encode_funcs / topk_orders /
    # json_props_extract / agg_distinct_counts / events_tumbling_15min:
    # displaced from the window bottom by the six graded-on-arrival
    # r13-new queries (streaming_fuzzy_refresh, curate_pack_bestfit,
    # curate_unimax_mix, dedup_cdc_chunks, streaming_cdc_dedup,
    # streaming_cdc_refresh — r8 evidence fresh through r14; they head
    # the r14 window)
]


def test_r13_window_composition():
    """r13 rotation (VERDICT r12 item 1, executing the plan recorded in
    the r12 registry's "r13 PLAN" comment): the window holds (a) the
    twenty r7-evidence entries deferred from r12 (age 6 at r13 — the
    last legal round), (b) the head of the r8 block (age 5), and (c)
    the 15 standing keeps.  Any free slot must hold either a genuinely
    new query (never graded) or r9-or-fresher evidence.

    SELF-RETIRING: pins the round-13 composition only; skips once the
    r13 CORRECTNESS artifact is tracked.  The r14 rotation writes its
    own pin."""
    latest_green, rounds = _latest_green_by_round()
    if max(rounds) + 1 != 13:
        pytest.skip("window-composition pin for round 13; rotate + re-pin")
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    for name in _R13_R7_BOTTOM + _R13_R8_HEAD + _STANDING_KEEPS:
        assert name in window, name
    mandatory = set(_R13_R7_BOTTOM + _R13_R8_HEAD + _STANDING_KEEPS)
    for name in window:
        if name not in mandatory:
            # free slot: an r13-new query (never graded) or an
            # r9-or-fresher filler
            assert name not in latest_green or latest_green[name] >= 9, name


_R14_R8_BOTTOM = [
    "events_tumbling_15min",
    "agg_distinct_counts",
    "scalar_url_map_funcs",
    "scalar_hash_encode_funcs",
    "topk_orders",
    "json_props_extract",
    "array_hof_embeddings",
    "join_left_order_counts",
    "join_semi_open_orders",
    "join_anti_customers_without_orders",
    "window_rank_acctbal",
    "window_running_spend",
    "setop_union_segments",
    "dedup_cascade_accounting",
    "text_bigram_logprob",
    "embed_dim_stats",
    "curate_dsir_weights",
    "text_zipf_fit",
    "curate_ccnet_buckets",
    "streaming_dsir_scoring",
    "text_bpe_merge_steps",
    "text_bpe_segment_counts",
    "text_dup_line_fractions",
    "curate_weighted_sample",
    "streaming_weighted_sample",
    "dedup_source_matrix",
]

# head of the r9 block windowed at r14 (the remaining twenty-six wait
# for r15 at age 6, still at the bar); r14-new queries displace entries
# from this list's BOTTOM to the staged head, and each displacement
# removes the entry here (graded-on-arrival rule).
_R14_R9_HEAD = [
    # events_dedup_latest / setop_except_inactive / scalar_string_funcs /
    # scalar_datetime_funcs / setop_intersect_active_auto /
    # window_range_frame_spend: displaced from the window bottom by the
    # graded-on-arrival curate_unimax_apply, dedup_cdc_apply,
    # streaming_fuzzy_serve_refreshed, curate_kcenter_coreset,
    # text_tokenizer_fertility and curate_length_curriculum (r9
    # evidence fresh through r15; they head the r15 window)
    "join_theta_quantity_over_size",
    "join_full_outer_nation_activity",
    "q14_promo_effect",
]


_R15_R9_BOTTOM = [
    "events_dedup_latest",
    "setop_except_inactive",
    "scalar_string_funcs",
    "scalar_datetime_funcs",
    "setop_intersect_active_auto",
    "window_range_frame_spend",
    "window_value_picking",
    "events_type_matrix",
    "window_analytics_distribution",
    "agg_pivot_status",
    "embed_norms",
    "sim_bucket_histogram",
    "text_fingerprint",
    "events_sessionize",
    "q22_global_sales_opportunity",
    "q19_disjunctive_revenue",
    "q18_large_orders",
    "join_range_price_bins",
    "agg_rollup_region_nation",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "curate_quality_classifier",
    "curate_quality_classifier_score",
    "curate_classifier_eval",
    "streaming_quality_scoring",
    "curate_fuzzy_contamination",
    "curate_line_dedup_apply",
    "dedup_source_order_plan",
]

# head of the r10 block windowed at r15 into the three free slots (r15
# is an optimization round with no new registrations, so the greedy
# staleness rule fills the free budget; the remaining thirty r10
# entries wait for r16 at age 6, still at the bar).
_R15_R10_HEAD = [
    "q10_returned_items",
    "collector_enrich_events",
    "collector_bridge_roundtrip",
]


def test_r15_window_composition():
    """r15 rotation (VERDICT r14 item 9, executing the plan recorded in
    the r14 registry's "r15 PLAN" comment): the window holds (a) the
    thirty-two r9-evidence entries deferred from r14 (age 6 at r15 —
    the last legal round), (b) the head of the r10 block (age 5) in
    the free slots, and (c) the 15 standing keeps.

    SELF-RETIRING: pins the round-15 composition only; skips once the
    r15 CORRECTNESS artifact is tracked.  The r16 rotation writes its
    own pin."""
    latest_green, rounds = _latest_green_by_round()
    if max(rounds) + 1 != 15:
        pytest.skip("window-composition pin for round 15; rotate + re-pin")
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    for name in _R15_R9_BOTTOM + _R15_R10_HEAD + _STANDING_KEEPS:
        assert name in window, name
    # no free slots beyond the r10 head: 32 + 3 + 15 fill the window
    assert len(window) == len(
        set(_R15_R9_BOTTOM + _R15_R10_HEAD + _STANDING_KEEPS)
    )


def test_r14_window_composition():
    """r14 rotation (VERDICT r13 item 1, executing the plan recorded in
    the r13 registry's "r14 PLAN" comment): the window holds (a) the
    twenty-six r8-evidence entries deferred from r13 (age 6 at r14 —
    the last legal round), (b) the head of the r9 block (age 5), and
    (c) the 15 standing keeps.  Any free slot must hold either a
    genuinely new query (never graded) or r10-or-fresher evidence.

    SELF-RETIRING: pins the round-14 composition only; skips once the
    r14 CORRECTNESS artifact is tracked.  The r15 rotation writes its
    own pin."""
    latest_green, rounds = _latest_green_by_round()
    if max(rounds) + 1 != 14:
        pytest.skip("window-composition pin for round 14; rotate + re-pin")
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    for name in _R14_R8_BOTTOM + _R14_R9_HEAD + _STANDING_KEEPS:
        assert name in window, name
    mandatory = set(_R14_R8_BOTTOM + _R14_R9_HEAD + _STANDING_KEEPS)
    for name in window:
        if name not in mandatory:
            # free slot: an r14-new query (never graded) or an
            # r10-or-fresher filler
            assert name not in latest_green or latest_green[name] >= 10, name
