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
    """(latest_green, rounds) derived from the CORRECTNESS artifacts on
    disk — the same evidence the judge reads."""
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


def test_r11_rotation_horizon():
    """VERDICT r9 item 6, made executable: verify from the artifacts on
    disk that the r10 window composition leaves NO query that ages past
    the 6-round freshness bar at r11, given only that (a) the r10
    window gets r10 evidence and (b) the r11 window re-windows the
    staged head (the r6 block) plus the standing keeps.  This is the
    horizon math for the plan recorded in registry.py's 'r11 PLAN'
    comment."""
    latest_green, rounds = _latest_green_by_round()
    r11 = max(rounds) + 2  # artifacts exist through the completed round
    window = set(registry._PRIORITY[: registry.GRADED_WINDOW])
    simulated = dict(latest_green)
    for name in window:
        simulated[name] = r11 - 1
    staged = registry._PRIORITY[registry.GRADED_WINDOW :]
    must_window_r11 = [
        n for n in registry._PRIORITY if r11 - simulated.get(n, -100) > 6
    ]
    plan_r11 = set(staged[: 50 - len(_STANDING_KEEPS)]) | set(_STANDING_KEEPS)
    for name in must_window_r11:
        assert name in plan_r11, (
            f"{name} ages out at r11 but is not in the staged r11 window head"
        )
    # and the mandatory set is comfortably smaller than the window
    assert len(must_window_r11) <= 50 - len(_STANDING_KEEPS)


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
