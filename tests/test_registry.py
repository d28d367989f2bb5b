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


def test_r8_window_regrades_stalest_evidence():
    """r8 rotation (VERDICT r7 item 3): the window holds (a) the r7
    driver-red fix embed_quantize_int8, (b) the r8-new suffix-array
    substring dedup + its removal-accounting companion, (c) 19 of the
    32 entries with the OLDEST external evidence (the r1+r2-only
    basics; embed_norms, r3-only, is next-stalest and is the top r9
    candidate — asserted below), (d) the other thirteen r8-new queries
    graded on arrival (cascade accounting / bigram logprob / dim
    stats / DSIR weights + streaming serving twin / Zipf fit / CCNet
    buckets / BPE merge training + segmenter / duplicate-line
    fractions / weighted sample + its streaming reservoir twin /
    source provenance matrix), displacing thirteen r2-only
    entries into the r9 must-rotate set (each family keeps at least one
    member graded this round), and (e) the 15
    standing keeps — streaming gates NOT kept this round rotate out
    deliberately: all were driver-green r4-r7 and the flake-armor suite
    replays them 5x locally every round."""
    stalest = [
        "q7_volume_shipping",
        "agg_stats_percentiles",
        "q12_linestatus_priority",
        "events_hourly_rollup",
        "agg_cube_status_priority",
        "agg_grouping_sets",
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
    ]
    new_r8 = [
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
    keeps = [
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
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    assert window[0] == "embed_quantize_int8"  # the only never-green query
    assert window[1] == "dedup_suffix_repeats"  # r8-new, graded on arrival
    assert window[2] == "curate_suffix_dedup_apply"  # its removal twin
    for name in stalest + new_r8 + keeps:
        assert name in window, name
    assert len(window) == 3 + len(stalest) + len(new_r8) + len(keeps) == 50
    # embed_norms (r3-only) is the next-stalest entry and did NOT fit
    # this window; the registry comments name it the top r9 candidate
    # alongside the thirteen displaced r2-only entries.  Pin that claim
    # so the r9 rotation can't silently skip them.
    for name in (
        "embed_norms",
        "setop_except_inactive",
        "scalar_string_funcs",
        "scalar_datetime_funcs",
        "setop_intersect_active_auto",
        "window_range_frame_spend",
        "window_value_picking",
        "events_type_matrix",
        "window_analytics_distribution",
        "agg_pivot_status",
        "join_theta_quantity_over_size",
        "join_full_outer_nation_activity",
        "q14_promo_effect",
        "events_dedup_latest",
    ):
        assert name not in window, name
        assert name in registry._PRIORITY[registry.GRADED_WINDOW :], name


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
