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


def test_never_driver_confirmed_queries_now_in_window():
    """r7 rotation (VERDICT r6 top item): tranches 2+3 — every query whose
    only prior evidence was the local sweep — plus the r7-new split gate
    sit inside the graded window, and all streaming gates stay windowed."""
    rotated_in = [
        # tranche 2 (late-r5 additions)
        "dedup_bloom_incremental",
        "dedup_prefix_contained",
        "curate_temperature_mix",
        "embed_quantize_int8",
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
        "join_asof_forward_tolerance",
        "dedup_lsh_quality",
        "events_zorder_pruned",
        "curate_snapshot_diff",
        # tranche 3 (r6 additions)
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
        # r7-new
        "collector_split_accounting",
    ]
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    for name in rotated_in:
        assert name in window, name
    # flake armor: every streaming gate is driver-graded every round
    streaming = [n for n in registry._PRIORITY if n.startswith("streaming_")]
    for name in streaming:
        if name == "streaming_hourly_rollup":  # legacy r1-r4 gate, displaced
            continue
        assert name in window, name


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
