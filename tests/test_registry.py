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


_R9_R2_STALE = [
    "join_theta_quantity_over_size",
    "join_full_outer_nation_activity",
    "q14_promo_effect",
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
]

_R9_R3_TRANCHE = [
    "embed_norms",
    "sim_bucket_histogram",
    "text_fingerprint",
    "events_sessionize",
    "q22_global_sales_opportunity",
    "q19_disjunctive_revenue",
    "q18_large_orders",
    "join_range_price_bins",
    "agg_rollup_region_nation",
]

_R9_R4_TRANCHE = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "collector_enrich_events",
    "collector_bridge_roundtrip",
    "collector_bounce_events",
    "streaming_hourly_rollup",
    "agg_approx_distinct",
    "join_asof_last_click",
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


def test_r9_window_regrades_stalest_evidence():
    """r9 rotation (VERDICT r8 items 1/2): the window holds (a) the
    thirteen r2-only entries (age 7 this round — the freshness test
    forces them), (b) the complete r3-only tranche (age 6, would force
    the r10 window otherwise), (c) the r4 tranche — windowing it now
    clears the entire pre-r5 backlog, so no future tranche is windowed
    under freshness pressure — minus any members displaced from the
    BOTTOM of the block by r9-new queries (displaced members carry r4
    evidence, fresh through r10, and sit at the head of the staged
    block), and (d) the 15 standing keeps (streaming gates, skew/
    bucketed join pins, flagships).

    SELF-RETIRING: this pins the round-9 composition only.  Once the r9
    CORRECTNESS artifact lands (current round >= 10) the pin skips —
    its r8 predecessor instead failed the suite at the r9 handoff and
    had to be rewritten before anything else could be done; the r10
    rotation writes its own pin."""
    import glob
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    if max(rounds) + 1 != 9:
        pytest.skip("window-composition pin for round 9; rotate + re-pin")
    window = registry._PRIORITY[: registry.GRADED_WINDOW]
    for name in _R9_R2_STALE + _R9_R3_TRANCHE + _STANDING_KEEPS:
        assert name in window, name
    # r4-tranche members are either windowed or displaced to the head
    # of the staged block (still fresh through r10).
    staged = registry._PRIORITY[registry.GRADED_WINDOW :]
    for name in _R9_R4_TRANCHE:
        assert name in window or name in staged[: len(_R9_R4_TRANCHE)], name
    # every window slot belongs to one of the four groups or is r9-new
    # (no prior CORRECTNESS row) — nothing fresh sneaks in and burns a slot
    known = set(_R9_R2_STALE + _R9_R3_TRANCHE + _R9_R4_TRANCHE + _STANDING_KEEPS)
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graded_before = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        graded_before.update(json.load(open(path)).keys())
    for name in window:
        assert name in known or name not in graded_before, name
    assert len(window) == 50


def test_r10_rotation_horizon():
    """VERDICT r8 item 2, made executable: verify from the artifacts on
    disk that the r9 window composition leaves NO query that ages past
    the 6-round freshness bar at r10, given only that (a) the r9 window
    gets r9 evidence and (b) the r10 window re-windows the staged head
    (displaced r4 entries + the r5-latest tranche + standing keeps).
    This is the horizon math for the plan recorded in registry.py's
    'r10 PLAN' comment."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_green: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", path).group(1))
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") is True and row.get("schema_match") is True:
                if row.get("hash_match") in (True, None):
                    latest_green[name] = max(latest_green.get(name, 0), rnd)
    r10 = max(rounds) + 2  # artifacts exist through the completed round
    window = set(registry._PRIORITY[: registry.GRADED_WINDOW])
    # simulate: everything in the r9 window gets r9 evidence
    simulated = dict(latest_green)
    for name in window:
        simulated[name] = r10 - 1
    # the r10 window per the plan: staged head (displaced r4 + r5
    # tranche) + standing keeps fits in 50 slots with room for new work
    staged = registry._PRIORITY[registry.GRADED_WINDOW :]
    must_window_r10 = [
        n for n in registry._PRIORITY if r10 - simulated.get(n, -100) > 6
    ]
    plan_r10 = set(staged[: 50 - len(_STANDING_KEEPS)]) | set(_STANDING_KEEPS)
    for name in must_window_r10:
        assert name in plan_r10, (
            f"{name} ages out at r10 but is not in the staged r10 window head"
        )
    # and the mandatory set is comfortably smaller than the window
    assert len(must_window_r10) <= 50 - len(_STANDING_KEEPS)


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
