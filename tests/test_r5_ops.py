"""Semantic invariants for the r5 operator additions: Bloom-prefiltered
incremental dedup, sorted-neighborhood prefix containment, temperature
mixing, int8 scalar quantization, filtered ANN, and the streaming
latest-profile gate.  Exact engine-vs-oracle equality is covered by
test_relational_oracle.py; these pin the operators' *meaning* and the
plan shapes their 100 TB story depends on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from opensnowcat_collector_spark.engine import registry
from opensnowcat_collector_spark.engine.llmdata import dedup, similarity
from opensnowcat_collector_spark.engine.tables import table


def _run(spark, sf_dir, name):
    return registry.all_queries()[name](spark, sf_dir).collect()


def _plan(spark, sf_dir, name: str) -> str:
    qs = registry.all_queries()
    return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# dedup_bloom_incremental
# ---------------------------------------------------------------------------


def test_bloom_result_equals_plain_membership(spark, sf_dir):
    """The operator's contract: the Bloom stage only prunes, so output is
    identical to dedup_incremental's plain hash-join membership."""
    qs = registry.all_queries()
    bloom = {r.doc_id: r for r in qs["dedup_bloom_incremental"](spark, sf_dir).collect()}
    plain = {r.doc_id: r for r in qs["dedup_incremental"](spark, sf_dir).collect()}
    assert bloom.keys() == plain.keys()
    for k in bloom:
        assert (bloom[k].is_dup, bloom[k].dup_of) == (plain[k].is_dup, plain[k].dup_of)


def test_bloom_has_no_false_negatives_and_bit_table_is_bounded(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % dedup.INCREMENTAL_NEW_MOD) == dedup.INCREMENTAL_NEW_REM
    corpus = d.filter(~is_new)
    bits = {
        r.pos
        for r in corpus.select(
            F.explode(dedup._bloom_positions(F.col("text"))).alias("pos")
        )
        .distinct()
        .collect()
    }
    assert len(bits) <= dedup.BLOOM_M  # bounded by geometry, not corpus
    # every true duplicate passes the prefilter (no false negatives);
    # sf0.001 may contain none — the bloom-equals-membership test above
    # covers the contract either way
    dups = [r for r in _run(spark, sf_dir, "dedup_bloom_incremental") if r.is_dup]
    batch_text = {
        r.doc_id: r.text
        for r in d.filter(is_new).select("doc_id", "text").collect()
    }
    for r in dups:
        pos = [
            hash_pos
            for hash_pos in _py_positions(spark, batch_text[r.doc_id])
        ]
        assert all(p in bits for p in pos), r.doc_id


def _py_positions(spark, text: str) -> list[int]:
    """Recompute xxhash64 bit positions via a one-row DataFrame (the JVM
    owns the xxhash64 implementation; correctness here only needs
    engine-self-consistency, not a Python reimplementation)."""
    row = (
        spark.range(1)
        .select(dedup._bloom_positions(F.lit(text)).alias("p"))
        .head()
    )
    return list(row.p)


def test_bloom_prefilter_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_bloom_incremental")
    assert "BroadcastHashJoin" in plan, plan


# ---------------------------------------------------------------------------
# dedup_prefix_contained
# ---------------------------------------------------------------------------


def test_prefix_contained_flags_are_real_proper_prefixes(spark, sf_dir):
    d = {
        r.doc_id: r.text.lower()
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    rows = _run(spark, sf_dir, "dedup_prefix_contained")
    for r in rows:
        a, b = d[r.doc_id], d[r.contained_in]
        assert a != b and b.startswith(a), (r.doc_id, r.contained_in)
        assert r.prefix_len == len(a)


def test_prefix_contained_is_exhaustive_within_contract(spark, sf_dir):
    """Brute-force check: every doc (>= PREFIX_BLOCK chars, representative
    of its text group) that is a proper prefix of ANY other doc is
    flagged — the lead-of-sorted-block argument is exact."""
    docs = [
        (r.doc_id, r.text.lower())
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    reps: dict[str, int] = {}
    for doc_id, t in docs:
        if t not in reps or doc_id < reps[t]:
            reps[t] = doc_id
    texts = sorted(reps)
    expected = set()
    for i, t in enumerate(texts):
        if len(t) < dedup.PREFIX_BLOCK:
            continue
        for u in texts[i + 1 :]:
            if not u.startswith(t):
                break  # sorted order: once the prefix run ends, no more extensions
            if u != t:
                expected.add(reps[t])
                break
    got = {r.doc_id for r in _run(spark, sf_dir, "dedup_prefix_contained")}
    assert got == expected


def test_prefix_contained_window_is_blocked_not_global(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_prefix_contained")
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(blk" in plan, plan


# ---------------------------------------------------------------------------
# curate_temperature_mix
# ---------------------------------------------------------------------------


def test_temperature_mix_probabilities_and_boost(spark, sf_dir):
    # outputs are rounded to 6 dp (cross-engine sum-order discipline),
    # so tolerances here are rounding-scale, not ulp-scale
    rows = _run(spark, sf_dir, "curate_temperature_mix")
    assert abs(sum(r.mix_prob for r in rows) - 1.0) < 1e-5 * len(rows)
    total_tokens = sum(r.n_tokens for r in rows)
    for r in rows:
        # boost = mix_prob / proportional share; sqrt rule compresses:
        # below-average sources get boost > 1, above-average get < 1
        prop = r.n_tokens / total_tokens
        assert abs(r.boost - r.mix_prob / prop) < 1e-4
        assert abs(r.mix_prob - math.sqrt(r.n_tokens) /
                   sum(math.sqrt(x.n_tokens) for x in rows)) < 1e-6
    small = min(rows, key=lambda r: r.n_tokens)
    big = max(rows, key=lambda r: r.n_tokens)
    if small.n_tokens < big.n_tokens:
        assert small.boost > big.boost


# ---------------------------------------------------------------------------
# embed_quantize_int8
# ---------------------------------------------------------------------------


def test_quantize_codes_geometry_and_reconstruction(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in e}
    dim = len(next(iter(vecs.values())))
    mn = [min(v[i] for v in vecs.values()) for i in range(dim)]
    mx = [max(v[i] for v in vecs.values()) for i in range(dim)]
    rows = _run(spark, sf_dir, "embed_quantize_int8")
    assert len(rows) == len(vecs)
    for r in rows:
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == dim
        assert 0 <= r.code_min and r.code_max <= 255
        v = vecs[r.vec_id]
        for i, c in enumerate(codes):
            # dequantized value within one bucket width of the original
            step = (mx[i] - mn[i]) / 255
            deq = mn[i] + c * step
            assert abs(deq - v[i]) <= step + 1e-9, (r.vec_id, i)


def test_quantize_stats_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "embed_quantize_int8")
    assert "BroadcastHashJoin" in plan, plan


# ---------------------------------------------------------------------------
# sim_ann_filtered
# ---------------------------------------------------------------------------


def test_filtered_ann_prefilters_not_postfilters(spark, sf_dir):
    """Every returned row satisfies the predicate AND the bucket probe;
    ranking happened within the filtered candidate set (pre-filtering),
    so the result equals brute-force top-k over (label & hamming<=1)."""
    rows = _run(spark, sf_dir, "sim_ann_filtered")
    assert all(r.label == similarity.FILTER_LABEL for r in rows)
    e = table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in e}
    labels = {r.vec_id: r.label for r in e}
    q = vecs[0]

    def sketch(v):
        return [
            1 if sum(p * x for p, x in zip(plane, v)) > 0 else 0
            for plane in similarity.PLANES
        ]

    qs = sketch(q)
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    cand = [
        vid
        for vid, v in vecs.items()
        if vid != 0
        and labels[vid] == similarity.FILTER_LABEL
        and sum(a != b for a, b in zip(sketch(v), qs)) <= 1
    ]
    expected = sorted(cand, key=lambda vid: (-cos(vecs[vid], q), vid))[:5]
    assert [r.vec_id for r in rows] == expected


def test_filtered_ann_plan_prunes_partitions_and_pushes_label(spark, sf_dir):
    qs = registry.all_queries()
    df = qs["sim_ann_filtered"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    assert "PushedFilters" in plan and "label" in plan, plan


# ---------------------------------------------------------------------------
# streaming_latest_profile
# ---------------------------------------------------------------------------


def test_streaming_latest_profile_matches_batch_argmax(spark, sf_dir):
    got = {r.user_id: r for r in _run(spark, sf_dir, "streaming_latest_profile")}
    ev = table(spark, sf_dir, "events").collect()
    best: dict[int, tuple] = {}
    for r in ev:
        key = (r.ts, r.event_id)
        if r.user_id not in best or key > best[r.user_id][0]:
            best[r.user_id] = (key, r.event_type, r.value)
    assert got.keys() == best.keys()
    for uid, (key, etype, value) in best.items():
        g = got[uid]
        assert (g.last_type, g.last_value) == (etype, value), uid
        assert g.last_ts == key[0].replace(tzinfo=None) or g.last_ts == key[0], uid


# ---------------------------------------------------------------------------
# sim_ann_pq
# ---------------------------------------------------------------------------


def test_pq_codes_and_adc_match_python_recompute(spark, sf_dir):
    import os

    import numpy as np

    idx = similarity.build_pq_index(spark, sf_dir)
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))
    book = {}
    for r in spark.read.parquet(os.path.join(idx, "codebook")).collect():
        book.setdefault((r.sub, r.cid), {})[r.i] = r.c
    e = table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in e}
    q = vecs[0]
    rows = _run(spark, sf_dir, "sim_ann_pq")
    assert len(rows) == 10
    sd = similarity.PQ_SUB_DIM
    prev = None
    for r in rows:
        codes = [getattr(r, f"code_{s}") for s in range(similarity.PQ_SUB)]
        assert all(0 <= c < similarity.PQ_K for c in codes)
        # ADC distance recomputed from the persisted codebook
        expected = 0.0
        for s, c in enumerate(codes):
            cent = np.array(
                [book[(s, c)][i] for i in sorted(book[(s, c)])], dtype=np.float64
            )
            qs = q[s * sd : (s + 1) * sd]
            expected += round(float(((qs - cent) ** 2).sum()), 6)
        assert abs(r.adc_d2 - round(expected, 6)) < 1e-6, r.vec_id
        if prev is not None:  # ascending distance order
            assert r.adc_d2 >= prev - 1e-9
        prev = r.adc_d2


def test_pq_probe_scan_has_no_joins(spark, sf_dir):
    """The ADC probe must be a single compressed scan: the lookup table
    is folded in as literal maps — no join, no shuffle except top-k."""
    plan = _plan(spark, sf_dir, "sim_ann_pq")
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin"):
        assert op not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


# ---------------------------------------------------------------------------
# curate_chunk_overlap
# ---------------------------------------------------------------------------


def test_chunk_overlap_geometry_and_coverage(spark, sf_dir):
    from opensnowcat_collector_spark.engine.llmdata import curation

    W, S = curation.CHUNK_TOKENS, curation.CHUNK_STRIDE
    docs = {
        r.doc_id: r.text.split(" ")
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    chunks: dict[int, list] = {}
    for r in _run(spark, sf_dir, "curate_chunk_overlap"):
        chunks.setdefault(r.doc_id, []).append(r)
    assert chunks.keys() == docs.keys()
    for doc_id, ws in docs.items():
        rows = sorted(chunks[doc_id], key=lambda r: r.chunk_idx)
        covered = set()
        for k, r in enumerate(rows):
            assert r.chunk_idx == k
            assert r.chunk_start == 1 + k * S
            toks = r.chunk_text.split(" ") if r.chunk_text else []
            assert len(toks) == r.chunk_len
            # window content matches the source tokens
            assert toks == ws[r.chunk_start - 1 : r.chunk_start - 1 + r.chunk_len]
            assert r.chunk_len <= W
            covered.update(range(r.chunk_start, r.chunk_start + r.chunk_len))
        # every token position is covered by at least one window
        assert covered == set(range(1, len(ws) + 1)), doc_id


def test_chunk_overlap_plan_is_shuffle_free(spark, sf_dir):
    plan = _plan(spark, sf_dir, "curate_chunk_overlap")
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# sim_ann_ivfpq
# ---------------------------------------------------------------------------


def test_ivfpq_probe_is_partition_pruned_compressed_scan(spark, sf_dir):
    """The composed probe must show BOTH wins: PartitionFilters on the
    cell column (IVF pruning) and a join-free ADC ranking (PQ literal
    maps)."""
    qs = registry.all_queries()
    df = qs["sim_ann_ivfpq"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin"):
        assert op not in plan, plan


def test_ivfpq_results_live_in_query_cell_and_match_pq_distances(spark, sf_dir):
    import os

    idx = similarity.build_ivfpq_index(spark, sf_dir)
    cell, _ = similarity.query_cell(spark, idx, sf_dir)
    rows = _run(spark, sf_dir, "sim_ann_ivfpq")
    assert rows and all(r.cell == cell for r in rows)
    # ADC distances agree with the standalone PQ ranking for shared vecs
    # (same codebooks: both artifacts train the identical deterministic SQL)
    pq = {r.vec_id: r.adc_d2 for r in _run(spark, sf_dir, "sim_ann_pq")}
    for r in rows:
        if r.vec_id in pq:
            assert abs(r.adc_d2 - pq[r.vec_id]) < 1e-9
    # ranking is ascending within the cell
    ds = [r.adc_d2 for r in rows]
    assert ds == sorted(ds)


# ---------------------------------------------------------------------------
# curate_mix_apply
# ---------------------------------------------------------------------------


def test_mix_apply_keeps_exactly_the_rate_scaled_prefix(spark, sf_dir):
    import hashlib
    import math as m

    mix = {r.source: r for r in _run(spark, sf_dir, "curate_temperature_mix")}
    docs = {}
    for r in table(spark, sf_dir, "documents").select("doc_id", "source").collect():
        docs.setdefault(r.source, []).append(r.doc_id)
    kept = {}
    for r in _run(spark, sf_dir, "curate_mix_apply"):
        kept.setdefault(r.source, set()).add(r.doc_id)
        assert r.rn <= r.n_keep
    for source, ids in docs.items():
        n_keep = m.ceil(min(1.0, mix[source].boost) * mix[source].n_docs)
        expected = set(
            sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[
                :n_keep
            ]
        )
        assert kept.get(source, set()) == expected, source


# ---------------------------------------------------------------------------
# streaming_foreachbatch_sink
# ---------------------------------------------------------------------------


def test_foreachbatch_sink_lands_the_projection(spark, sf_dir):
    got = {r.event_id: r for r in _run(spark, sf_dir, "streaming_foreachbatch_sink")}
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value").collect()
    assert len(got) == len(ev)
    for r in ev:
        g = got[r.event_id]
        assert g.event_type == r.event_type
        assert g.is_positive == (r.value > 0)


# ---------------------------------------------------------------------------
# sim_ann_compacted
# ---------------------------------------------------------------------------


def test_compacted_probe_equals_tombstoned_probe_without_antijoin(spark, sf_dir):
    """Compaction contract: identical rows to the tombstone-masked probe,
    and the compacted index carries no tombstone set or anti-join."""
    import os

    qs = registry.all_queries()
    masked = [tuple(r) for r in qs["sim_ann_delete"](spark, sf_dir).collect()]
    compacted_df = qs["sim_ann_compacted"](spark, sf_dir)
    compacted = [tuple(r) for r in compacted_df.collect()]
    assert compacted == masked
    plan = compacted_df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan, plan
    path = similarity.compact_ann_index(spark, sf_dir)
    assert not os.path.exists(os.path.join(path, "_tombstones"))
    # every tombstoned vec_id is physically gone from the compacted data
    dead = {
        r.vec_id
        for r in spark.read.parquet(
            os.path.join(similarity.delete_from_ann_index(spark, sf_dir), "_tombstones")
        ).collect()
    }
    live = {r.vec_id for r in spark.read.parquet(path).select("vec_id").collect()}
    assert not (dead & live)


# ---------------------------------------------------------------------------
# sim_bitext_mine / text_length_histogram
# ---------------------------------------------------------------------------


def test_bitext_pairs_are_cross_lingual_bucket_mates(spark, sf_dir):
    langs = {
        r.doc_id: r.lang
        for r in table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    rows = _run(spark, sf_dir, "sim_bitext_mine")
    assert rows
    seen_src = set()
    for r in rows:
        assert langs[r.src_id] == "en" and langs[r.tgt_id] != "en"
        assert r.tgt_lang == langs[r.tgt_id]
        assert r.src_id not in seen_src  # best-match: one row per source
        seen_src.add(r.src_id)
        assert r.is_confident == (r.cosine >= similarity.BITEXT_CONFIDENT)


def test_length_histogram_partitions_the_corpus(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("text").collect()
    n_docs = len(docs)
    total = sum(len(r.text.split(" ")) for r in docs)
    rows = _run(spark, sf_dir, "text_length_histogram")
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.total_tokens for r in rows) == total
    for r in rows:
        assert r.bucket_lo == 2 ** r.bucket
        assert r.bucket_hi == 2 ** (r.bucket + 1) - 1
        # bucket totals are consistent with their bounds
        assert r.bucket_lo * r.n_docs <= r.total_tokens <= r.bucket_hi * r.n_docs


# ---------------------------------------------------------------------------
# events_scd2_intervals
# ---------------------------------------------------------------------------


def test_scd2_intervals_tile_each_users_timeline(spark, sf_dir):
    rows = _run(spark, sf_dir, "events_scd2_intervals")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r.user_id, []).append(r)
    assert got.keys() == by_user.keys()
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        # python reference run-length encoding
        runs = []
        for r in evs:
            if not runs or runs[-1][0] != r.event_type:
                runs.append([r.event_type, r.ts, 0])
            runs[-1][2] += 1
        ivs = sorted(got[uid], key=lambda r: r.valid_from)
        assert len(ivs) == len(runs), uid
        for (state, start, n), iv in zip(runs, ivs):
            assert iv.state == state and iv.n_events == n
        # intervals tile: each valid_to equals the next valid_from;
        # exactly one open (current) interval per user, the last one
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from and not a.is_current
        assert ivs[-1].is_current and ivs[-1].valid_to is None


def test_scd2_plan_is_single_user_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_scd2_intervals")
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# join_asof_forward_tolerance / dedup_lsh_quality
# ---------------------------------------------------------------------------


def test_asof_forward_matches_python_reference(spark, sf_dir):
    ev = [
        r
        for r in table(spark, sf_dir, "events").collect()
        if r.event_type in ("click", "purchase")
    ]
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expected = {}
    from opensnowcat_collector_spark.engine import relational as R

    tol = R.ASOF_FORWARD_TOLERANCE_H * 3600
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        for i, r in enumerate(evs):
            if r.event_type != "click":
                continue
            nxt = min(
                ((p.ts, p.event_id) for p in evs[i + 1 :] if p.event_type == "purchase"),
                default=None,
            )
            if nxt and (nxt[0] - r.ts).total_seconds() <= tol:
                expected[r.event_id] = nxt[1]
    got = {r.click_id: r.purchase_id for r in _run(spark, sf_dir, "join_asof_forward_tolerance")}
    assert got == expected


def test_lsh_quality_counts_are_consistent(spark, sf_dir):
    rows = _run(spark, sf_dir, "dedup_lsh_quality")
    assert len(rows) == 1
    r = rows[0]
    # detected is the truth∩candidates intersection: bounded by both
    assert 0 <= r.n_detected <= min(r.n_true, r.n_candidates)
    # detected must equal what dedup_minhash_lsh actually emits
    lsh_pairs = _run(spark, sf_dir, "dedup_minhash_lsh")
    assert r.n_detected == len(lsh_pairs)
    if r.n_true:
        assert abs(r.recall - r.n_detected / r.n_true) < 1e-6
        # 4x3 banding at j>=0.8 should catch the large majority
        assert r.recall >= 0.9


# ---------------------------------------------------------------------------
# curate_snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_classes_partition_the_union(spark, sf_dir):
    rows = _run(spark, sf_dir, "curate_snapshot_diff")
    by_class: dict[str, set] = {}
    for r in rows:
        by_class.setdefault(r.change, set()).add(r.doc_id)
    docs = {r.doc_id for r in table(spark, sf_dir, "documents").select("doc_id").collect()}
    # every doc appears exactly once (old snapshot ⊆ new here, no removals)
    assert len(rows) == len(docs)
    assert by_class.get("removed", set()) == set()
    assert by_class.get("added") == {d for d in docs if d % 10 == 9}
    assert by_class.get("changed") == {d for d in docs if d % 10 != 9 and d % 3 == 0}
    assert by_class.get("unchanged") == {
        d for d in docs if d % 10 != 9 and d % 3 != 0
    }


def test_semdedup_keep_hard_policy(spark, sf_dir):
    """dedup_semdedup (r10) keep policy: the epsilon-ball winner is the
    member with the LOWEST similarity to the cluster centroid (ascending
    (centroid_cos, vec_id) order; a later member drops iff some earlier
    member is within tau).  Independent recomputation from the raw IVF
    layout: every cell's minimal-(centroid_cos, vec_id) member is first
    in the order, so it can NEVER be dropped — assert it survives in
    every cell; and the pass must actually drop something at this
    corpus/tau (otherwise the query degenerates to identity and grades
    nothing)."""
    import os

    import numpy as np

    from opensnowcat_collector_spark.engine import registry
    from opensnowcat_collector_spark.engine.llmdata.similarity import build_ivf_index

    survivors = registry.all_queries()["dedup_semdedup"](spark, sf_dir).collect()
    kept_ids = {r["vec_id"] for r in survivors}

    idx = build_ivf_index(spark, sf_dir)
    blocked = spark.read.parquet(os.path.join(idx, "vectors")).toPandas()
    cent = (
        spark.read.parquet(os.path.join(idx, "centroids"))
        .orderBy("cid", "i")
        .toPandas()
    )
    assert 0 < len(survivors) < len(blocked), (len(survivors), len(blocked))
    for cid, grp in blocked.groupby("cell"):
        c = cent[cent["cid"] == cid].sort_values("i")["c"].to_numpy(dtype=np.float64)
        v = np.stack(grp["embedding"].values).astype(np.float64)
        norms = np.sqrt((v * v).sum(axis=1))
        ccos = np.round((v @ c) / (norms * np.sqrt((c * c).sum())), 6)
        ids = grp["vec_id"].to_numpy()
        first = min(zip(ccos, ids))
        assert first[1] in kept_ids, (cid, first)


def test_unigram_lm_learns_multichar_pieces(spark, sf_dir):
    """The trained unigram-LM vocabulary must contain real multi-char
    pieces that the Viterbi segmentation actually USES — otherwise the
    trainer degenerated to a char model.  Consequences checkable from
    the two graded outputs: (1) pruned vocab has multi-char pieces;
    (2) per doc, n_pieces is strictly less than the char count (some
    multi-char piece won somewhere) and at least n_words (every word is
    >= 1 piece); (3) logprobs are a proper distribution (sum of
    exp(logprob over pruned vocab) ~ 1 up to 6dp rounding)."""
    import math

    from pyspark.sql import functions as F

    from opensnowcat_collector_spark.engine import registry
    from opensnowcat_collector_spark.engine.tables import table

    q = registry.all_queries()
    vocab = q["text_unigram_lm_train"](spark, sf_dir).collect()
    assert any(len(r["piece"]) > 1 for r in vocab), [r["piece"] for r in vocab]
    total_p = sum(math.exp(r["logprob"]) for r in vocab)
    assert abs(total_p - 1.0) < 1e-3, total_p

    seg = q["text_unigram_lm_segment"](spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(F.regexp_replace("text", " ", "")).alias("n_chars"),
    )
    joined = seg.join(docs, "doc_id").agg(
        F.sum(F.when(F.col("n_pieces") < F.col("n_chars"), 1).otherwise(0)).alias(
            "docs_compressed"
        ),
        F.sum(F.when(F.col("n_pieces") < F.col("n_words"), 1).otherwise(0)).alias(
            "impossible"
        ),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert joined.impossible == 0
    assert joined.docs_compressed == joined.n, joined


def test_segment_vocab_cap_fallback_char_level(spark, sf_dir, monkeypatch):
    """The SEGMENT_VOCAB_CAP fallback (VERDICT r10 item 2) must be exact
    char-level segmentation when it BINDS: with the cap forced to 0 the
    broadcast word->n_sub map is empty, so every token falls back
    in-plan — unigram n_pieces == total chars, BPE n_subwords == total
    chars + n_words (one </w> terminal per word).  Both expectations
    are independently computable from the raw corpus, so this pins the
    binding branch (the test vocabulary never reaches the default cap)
    without trusting either trained table."""
    from pyspark.sql import functions as F

    from opensnowcat_collector_spark.engine import registry
    from opensnowcat_collector_spark.engine.llmdata import text as text_mod
    from opensnowcat_collector_spark.engine.tables import table

    monkeypatch.setattr(text_mod, "SEGMENT_VOCAB_CAP", 0)
    q = registry.all_queries()
    expected = (
        table(spark, sf_dir, "documents")
        .select(
            F.length(F.regexp_replace("text", " ", "")).alias("chars"),
            F.size(F.split(F.lower("text"), " ")).alias("words"),
        )
        .agg(F.sum("chars").alias("c"), F.sum("words").alias("w"))
        .first()
    )
    uni = (
        q["text_unigram_lm_segment"](spark, sf_dir)
        .agg(F.sum("n_pieces"), F.sum("n_words"))
        .first()
    )
    assert (uni[0], uni[1]) == (expected.c, expected.w), (uni, expected)
    bpe = (
        q["text_bpe_segment_counts"](spark, sf_dir)
        .agg(F.sum("n_subwords"), F.sum("n_words"))
        .first()
    )
    assert (bpe[0], bpe[1]) == (expected.c + expected.w, expected.w), (bpe, expected)


def test_unigram_lm_grading_margin(spark, sf_dir):
    """The unigram-LM trainer is graded value-exact at 6 dp and its
    Viterbi argmax compares 6-dp-rounded LN sums across engines — the
    same risk class as the quality classifier (r9 ADVICE item 2), so
    pin the same measured-margin evidence: the UNROUNDED cross-engine
    logprob deltas on the graded corpus must sit orders of magnitude
    below the distance to the nearest 6dp rounding midpoint."""
    import re

    import duckdb

    from opensnowcat_collector_spark.engine import registry, relational

    sp = {
        r["piece"]: r["logprob"]
        for r in registry.all_queries()["text_unigram_lm_train"](
            spark, sf_dir
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    osql = relational.ORACLE["text_unigram_lm_train"]
    raw = re.sub(
        r"ROUND\(LN\(CAST\(cnt AS DOUBLE\)\)\n\s*- LN\(\(SELECT CAST\(SUM\(cnt\) AS DOUBLE\) FROM pruned\)\), 6\)",
        "LN(CAST(cnt AS DOUBLE)) - LN((SELECT CAST(SUM(cnt) AS DOUBLE) FROM pruned))",
        osql,
    )
    assert raw != osql, "raw-logprob rewrite did not match the oracle text"
    duck = {r[0]: r[2] for r in con.execute(raw).fetchall()}
    assert set(duck) == set(sp)
    # spark emits ROUND(lp, 6); compare duck raw to spark rounded: the
    # delta is (rounding + cross-engine noise) <= 5e-7 + eps, and the
    # raw value must not sit near a midpoint
    noise = 1e-12  # LN cross-engine bound, far above observed 1ulp
    worst_mid = min(
        abs(abs(v) * 1e6 % 1.0 - 0.5) / 1e6 for v in duck.values()
    )
    assert worst_mid > 100 * noise, worst_mid
    for p, v in duck.items():
        assert abs(sp[p] - round(v, 6)) < 1e-9, (p, sp[p], v)


def test_unigram_viterbi_matches_bruteforce_enumeration(spark):
    """Property pin for the unrolled Viterbi DP (r10): on a synthetic
    vocabulary with a hand-built piece table, the DP's per-word argmax
    path must equal exhaustive enumeration of EVERY segmentation under
    the identical scoring (sum of 6dp-rounded logprobs accumulated
    left-to-right) and tie-break (score DESC, path string ASC).  This
    is the semantics the oracle replays — proving it against an
    independent reference, not just against DuckDB running the same
    SQL shape."""
    import itertools
    import math

    from pyspark.sql import functions as F

    from opensnowcat_collector_spark.engine.llmdata.text import (
        UNI_MAX_PIECE_LEN,
        _uni_viterbi,
    )

    words = ["abba", "abab", "aaaa", "bcd", "a", "dcbaab"]
    pieces = {"a": 9, "b": 5, "ab": 7, "ba": 3, "bb": 2, "c": 1, "d": 1, "cd": 4, "abb": 2}
    total = sum(pieces.values())
    lp = {p: round(math.log(c) - math.log(total), 6) for p, c in pieces.items()}

    def segmentations(w):
        if not w:
            yield []
            return
        for ln in range(1, min(UNI_MAX_PIECE_LEN, len(w)) + 1):
            head = w[:ln]
            if head in lp:
                for rest in segmentations(w[ln:]):
                    yield [head] + rest

    expected = {}
    for w in words:
        best = None
        for seg in segmentations(w):
            score = 0.0
            for p in seg:
                score = score + lp[p]  # same left-to-right accumulation
            key = (-score, " ".join(seg))
            if best is None or key < best:
                best = key
        assert best is not None, f"{w} unsegmentable under the test pieces"
        expected[w] = best[1]

    wdf = spark.createDataFrame([(w, 1) for w in words], "w string, cnt long")
    lpdf = spark.createDataFrame(
        [(p, v) for p, v in lp.items()], "piece string, lp double"
    )
    got = {
        r["w"]: r["path"]
        for r in _uni_viterbi(wdf, lpdf, max(len(w) for w in words)).collect()
    }
    assert got == expected


def test_semdedup_drop_rule_matches_bruteforce(spark):
    """Property pin for the SemDeDup drop rule (r10): on random small
    vector sets, the chunked upper-triangular pass must agree with the
    O(n^2) definition — j drops iff SOME i earlier in ascending
    (centroid_cos, vec_id) order has round(cos(i,j),6) >= tau, whether
    or not i itself dropped.  Exercises chunk boundaries (n > chunk is
    impractical here, so the chunk size is monkeypatched via a local
    reimplementation with chunk=3 against the plain reference)."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, dim = 40, 8
    v = rng.randn(n, dim)
    # plant near-duplicates so the rule actually fires
    for k in range(0, 30, 3):
        v[k + 1] = v[k] + rng.randn(dim) * 0.01
    ids = np.arange(n)
    c = rng.randn(dim)
    norms = np.sqrt((v * v).sum(axis=1))
    ccos = np.round((v @ c) / (norms * np.sqrt((c * c).sum())), 6)
    order = np.lexsort((ids, ccos))
    vo, no = v[order], norms[order]
    tau = 0.35

    # reference: full O(n^2) double loop
    ref_dup = np.zeros(n, dtype=bool)
    for j in range(n):
        for i in range(j):
            g = round(float(vo[i] @ vo[j] / (no[i] * no[j])), 6)
            if g >= tau:
                ref_dup[j] = True
                break

    # chunked pass with a tiny chunk to cross many boundaries
    chunk = 3
    dup = np.zeros(n, dtype=bool)
    for s in range(1, n, chunk):
        e = min(s + chunk, n)
        g = np.round((vo[s:e] @ vo[:e].T) / np.outer(no[s:e], no[:e]), 6)
        ge = g >= tau
        for r in range(e - s):
            ge[r, s + r :] = False
        dup[s:e] = ge.any(axis=1)
    assert (dup == ref_dup).all()
    assert ref_dup.any() and not ref_dup.all()


def test_unigram_chain_compiles_within_codegen_limits(spark, sf_dir):
    """Regression guard for the r10 constraint-explosion finding: lazy
    localCheckpoint carries originConstraints forward, the Viterbi DP's
    4-way-union constraint sets compose near-exponentially, and
    InferFiltersFromConstraints then materializes a filter past
    janino's 64 KB method limit (observed: whole-stage codegen fallback
    with a ~350 KB inferred filter on the words scan).
    ``_constraint_free`` strips the constraints at each DP boundary via
    the JVM's internalCreateDataFrame — but it falls back SILENTLY to
    the checkpointed frame if that API ever moves, so this test runs
    the full training chain with ``spark.sql.codegen.fallback=false``:
    any recurrence of the blowup becomes a hard compile error HERE
    instead of a quiet interpreted-mode slowdown in production."""
    from opensnowcat_collector_spark.engine.llmdata.text import _uni_train_chain

    prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        pruned, _words, _ml = _uni_train_chain(spark, sf_dir)
        assert pruned.count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)


def test_lsh_tune_argmin_matches_independent_reference(spark, sf_dir):
    """dedup_lsh_tune (r11) against an INDEPENDENT numpy recomputation
    (the Viterbi/semdedup brute-force-pin discipline): rebuild the
    full (b, r) cost table with the same midpoint grid in numpy,
    assert every 6-dp-rounded fp/fn agrees, exactly one is_opt row,
    and the flagged scheme is numpy's argmin under the same
    (cost, b, r) tie-break.  Also pins the deployed miniature: the
    4x3 scheme must cost strictly more than the optimum (tuning buys
    something) and its collision probability at the threshold must be
    the ~0.97 recall quoted in dedup_lsh_quality's docstring."""
    import numpy as np

    from opensnowcat_collector_spark.engine import registry
    from opensnowcat_collector_spark.engine.llmdata.dedup import (
        JACCARD_THRESHOLD,
        LSH_TUNE_BUDGET,
        LSH_TUNE_STEPS,
    )

    rows = registry.all_queries()["dedup_lsh_tune"](spark, sf_dir).collect()
    s = (np.arange(1, LSH_TUNE_STEPS + 1) - 0.5) / LSH_TUNE_STEPS
    below = s < JACCARD_THRESHOLD
    ref = {}
    for b in range(1, LSH_TUNE_BUDGET + 1):
        for r in range(1, LSH_TUNE_BUDGET // b + 1):
            miss = (1.0 - s**r) ** b
            fp = float(((1.0 - miss) * below).sum() / LSH_TUNE_STEPS)
            fn = float((miss * ~below).sum() / LSH_TUNE_STEPS)
            ref[(b, r)] = (round(fp, 6), round(fn, 6), round(fp + fn, 6))
    assert len(rows) == len(ref)
    for row in rows:
        assert (row.fp, row.fn, row.cost) == ref[(row.b, row.r)], row
    opts = [r for r in rows if r.is_opt]
    assert len(opts) == 1
    best = min(ref, key=lambda k: (ref[k][2], k))
    assert (opts[0].b, opts[0].r) == best, (opts[0], best)
    deployed = ref[(4, 3)]
    assert ref[best][2] < deployed[2]
    p_at_t = 1 - (1 - JACCARD_THRESHOLD**3) ** 4
    assert abs(p_at_t - 0.9433) < 1e-3


# ---------------------------------------------------------------------------
# r11 additions: WordPiece trainer, Kneser-Ney bigram LM, JL random
# projection.  Exact engine-vs-oracle equality is covered by the full
# oracle sweep; these pin the operators' MEANING against independent
# references (the test_properties Viterbi/SemDeDup discipline).
# ---------------------------------------------------------------------------


def _py_wordpiece_reference(word_counts, steps):
    """Independent pure-Python WordPiece trainer: greedy left-to-right
    merge application, likelihood-score argmax (support / (c1 * c2)),
    ties broken on (w1, w2) text — written from the published algorithm,
    not from the Spark implementation."""
    vocab = {w: [*w, "</w>"] for w in word_counts}
    merges = []
    for step in range(1, steps + 1):
        pair_c: dict = {}
        sym_c: dict = {}
        for w, cnt in word_counts.items():
            syms = vocab[w]
            for s in syms:
                sym_c[s] = sym_c.get(s, 0) + cnt
            for a, b in zip(syms, syms[1:]):
                pair_c[(a, b)] = pair_c.get((a, b), 0) + cnt
        best = min(
            pair_c.items(),
            key=lambda kv: (-kv[1] / (sym_c[kv[0][0]] * sym_c[kv[0][1]]), kv[0]),
        )[0]
        merges.append(
            (
                step,
                best[0],
                best[1],
                best[0] + best[1],
                pair_c[best],
                sym_c[best[0]],
                sym_c[best[1]],
            )
        )
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_wordpiece_merges_match_python_reference(spark, sf_dir):
    """The distributed WordPiece chain reproduces, step by step, an
    independent pure-Python trainer run over the same word counts —
    argmax choice, support, and both denominator counts."""
    import collections

    docs = table(spark, sf_dir, "documents").select("text").collect()
    wc = collections.Counter(
        w for (t,) in docs for w in t.lower().split(" ")
    )
    from opensnowcat_collector_spark.engine.llmdata.text import (
        WORDPIECE_MERGE_STEPS,
    )

    expected = _py_wordpiece_reference(wc, WORDPIECE_MERGE_STEPS)
    got = sorted(
        tuple(r) for r in _run(spark, sf_dir, "text_wordpiece_train")
    )
    assert got == sorted(expected)


def test_wordpiece_objective_differs_from_bpe(spark, sf_dir):
    """The likelihood argmax must actually bite: on this corpus the
    first WordPiece merge differs from the first BPE merge (frequency
    would pick the most common pair; likelihood picks the most
    ASSOCIATED pair — 'qu' on the synthetic corpus).  Guards against a
    silent regression to frequency scoring, which the oracle could not
    catch (it would regress in both engines together only if the SQL
    changed too, but a Spark-side-only regression lands here first)."""
    wp = {r["step"]: (r["w1"], r["w2"]) for r in _run(spark, sf_dir, "text_wordpiece_train")}
    bpe = {r["step"]: (r["w1"], r["w2"]) for r in _run(spark, sf_dir, "text_bpe_merge_steps")}
    assert wp[1] != bpe[1], (wp, bpe)


def test_kn_bigram_is_proper_distribution_and_matches_recompute(spark, sf_dir):
    """Interpolated Kneser-Ney must (a) be a PROPER conditional
    distribution — for every context w1, sum over the full vocabulary of
    P(w2|w1) == 1 (the discount mass exactly funds the continuation
    backoff) — and (b) reproduce an independent per-doc Python recompute
    of the query's score."""
    import collections
    import math

    rows = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    bg_by_doc = {}
    cb: dict = collections.Counter()
    for doc_id, t in rows:
        ws = t.lower().split(" ")
        pairs = list(zip(ws, ws[1:]))
        if pairs:
            bg_by_doc[doc_id] = pairs
            cb.update(pairs)
    c1 = collections.Counter()
    n1l = collections.Counter()
    n1r = collections.Counter()
    for (w1, w2), c in cb.items():
        c1[w1] += c
        n1l[w1] += 1
        n1r[w2] += 1
    t_types = float(len(cb))
    d = 0.75

    def p(w1, w2):
        return (cb[(w1, w2)] - d) / c1[w1] + (d * n1l[w1] / c1[w1]) * (
            n1r[w2] / t_types
        )

    # (a) proper distribution over the continuation vocabulary: the
    # discounted observed mass + backoff mass telescopes to exactly 1
    vocab_r = list(n1r)
    successors: dict = collections.defaultdict(list)
    for a, b in cb:
        successors[a].append(b)
    for w1 in list(c1)[:25]:
        total = sum(
            (cb[(w1, w2)] - d) / c1[w1] for w2 in successors[w1]
        ) + (d * n1l[w1] / c1[w1]) * sum(n1r[w2] / t_types for w2 in vocab_r)
        assert abs(total - 1.0) < 1e-9, (w1, total)

    # (b) per-doc score recompute
    got = {r["doc_id"]: r for r in _run(spark, sf_dir, "text_kn_bigram_logprob")}
    assert set(got) == set(bg_by_doc)
    for doc_id in list(bg_by_doc)[:50]:
        pairs = bg_by_doc[doc_id]
        expect = round(sum(-math.log(p(a, b)) for a, b in pairs) / len(pairs), 6)
        assert abs(got[doc_id]["kn_neg_logprob"] - expect) < 2e-6, doc_id
        assert got[doc_id]["n_bigrams"] == len(pairs)


def test_random_projection_preserves_geometry(spark, sf_dir):
    """The JL sketch must actually be a distance sketch: per-vector
    norm ratios concentrate around 1 (mean within 5% — each ratio^2 is
    ~chi^2_16/16, so the mean over 200 vectors has std ~2.5%), and
    pairwise SQUARED DISTANCES are preserved in expectation (mean ratio
    within 15% over ~100 pairs) — the unbiasedness the JL lemma
    guarantees and the ANN prefilter use-case depends on.  (Per-PAIR
    cosine at k=16 carries ~0.25 std by design — the sketch trades
    per-pair precision for 4x width; only aggregates are pinned.)"""
    import collections
    import math

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in table(spark, sf_dir, "embeddings").limit(200).collect()
    }
    proj = collections.defaultdict(dict)
    for r in _run(spark, sf_dir, "embed_random_projection"):
        if r["vec_id"] in emb:
            proj[r["vec_id"]][r["j"]] = r["p"]

    def norm(v):
        return math.sqrt(sum(x * x for x in v))

    ratios = []
    for vid, v in emb.items():
        pv = [proj[vid][j] for j in sorted(proj[vid])]
        if norm(v) > 0:
            ratios.append(norm(pv) / norm(v))
    assert 0.95 < sum(ratios) / len(ratios) < 1.05, sum(ratios) / len(ratios)

    ids = sorted(emb)
    dratios = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d2 = sum((x - y) ** 2 for x, y in zip(emb[a], emb[b]))
        pa = [proj[a][j] for j in sorted(proj[a])]
        pb = [proj[b][j] for j in sorted(proj[b])]
        pd2 = sum((x - y) ** 2 for x, y in zip(pa, pb))
        if d2 > 0:
            dratios.append(pd2 / d2)
    assert len(dratios) >= 80
    mean_dr = sum(dratios) / len(dratios)
    assert 0.85 < mean_dr < 1.15, mean_dr


def test_rp_rerank_recall_and_exactness(spark, sf_dir):
    """sim_ann_rp_rerank must (a) return EXACT cosines for whatever it
    returns (the re-rank stage is exact — every returned (vec_id,
    cosine) appears in the brute-force ranking with the same value),
    and (b) recall >= 0.7 of the true top-10 at the test SF (measured
    0.9 here / 0.9 at sf0.01 / 0.8 at sf0.1 — the BASELINE.md sweep;
    threshold leaves margin for corpus regeneration)."""
    exact = {
        r["vec_id"]: r["cosine"]
        for r in _run(spark, sf_dir, "sim_topk_bruteforce")
    }
    got = _run(spark, sf_dir, "sim_ann_rp_rerank")
    assert len(got) == 10
    hits = [r for r in got if r["vec_id"] in exact]
    assert len(hits) >= 7, [r["vec_id"] for r in got]
    for r in hits:
        assert r["cosine"] == exact[r["vec_id"]], r


def test_semantic_contamination_matches_numpy_and_completes_triad(spark, sf_dir):
    """The semantic screen must reproduce an independent numpy
    max-benchmark-cosine recompute exactly (6-dp rounded, the
    pair_cos_udf bit-exactness contract), cover every train vector,
    and flag precisely the >= SEM_CONTAM_TAU set."""
    import numpy as np

    from opensnowcat_collector_spark.engine.llmdata.curation import (
        BENCH_MOD,
        SEM_CONTAM_TAU,
    )

    rows = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    v = np.array([[float(x) for x in r.embedding] for r in rows])
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    bench = vn[ids % BENCH_MOD == 0]
    got = {r.vec_id: r for r in _run(spark, sf_dir, "curate_semantic_contamination")}
    train_ids = ids[ids % BENCH_MOD != 0]
    assert set(got) == set(int(i) for i in train_ids)
    mx = {
        int(i): round(float((vn[ids == i] @ bench.T).max()), 6)
        for i in train_ids
    }
    flagged = 0
    for i, expect in mx.items():
        assert abs(got[i].bench_cos - expect) <= 1e-6, (i, got[i].bench_cos, expect)
        assert got[i].is_contaminated == (got[i].bench_cos >= SEM_CONTAM_TAU), i
        flagged += got[i].is_contaminated
    # the threshold must bite but not swallow the corpus
    assert 0 < flagged < len(mx), flagged


def test_negative_zero_round_divergence_and_normalization(spark):
    """The cross-engine -0.0 hazard is real and the normalization fixes
    it: DuckDB's ROUND keeps the sign of a tiny negative (-4e-7 ->
    -0.0) while Spark's BigDecimal round drops it (-> 0.0), and the
    driver's canonicalizer stringifies ("-0.0" != "0.0" though they
    compare equal as floats) — caught by the r11 replica-corpus sweep
    on curate_dsir_weights.  The repo's contract: every zero-crossing
    rounded output appends "+ 0" (oracle) / "+ F.lit(0.0)" (Spark) /
    "+ 0.0" (numpy), which maps -0.0 to +0.0 and is the identity
    everywhere else."""
    import math

    import duckdb

    raw = duckdb.sql("SELECT ROUND(-4e-7, 6) AS v").fetchall()[0][0]
    assert math.copysign(1, raw) == -1.0  # the hazard exists
    d = duckdb.sql("SELECT ROUND(-4e-7, 6) + 0 AS v").fetchall()[0][0]
    s = (
        spark.range(1)
        .select((F.round(F.lit(-4e-7), 6) + F.lit(0.0)).alias("v"))
        .head()
        .v
    )
    assert math.copysign(1, d) == 1.0 and math.copysign(1, s) == 1.0
    assert str(d) == str(s) == "0.0"


def test_kn_trigram_modified_discounts_proper_and_matches_recompute(spark, sf_dir):
    """Modified-interpolated KN (r12) must (a) fit the Chen-Goodman
    closed-form discounts from each order's count-of-counts, (b) be a
    PROPER distribution — for any context (w1,w2), the sum over the
    continuation vocabulary of P(w3|w1w2) telescopes to exactly 1
    (each level's discount mass exactly funds its backoff, down to the
    uniform 1/V base) — and (c) reproduce an independent per-doc
    Python recompute of the query's score."""
    import collections
    import math

    rows = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tg_by_doc = {}
    ct: dict = collections.Counter()
    for doc_id, t in rows:
        ws = t.lower().split(" ")
        tris = list(zip(ws, ws[1:], ws[2:]))
        if tris:
            tg_by_doc[doc_id] = tris
            ct.update(tris)
    ctx2 = collections.Counter()
    acat = collections.defaultdict(lambda: [0, 0, 0])
    mid = collections.Counter()
    for (a, b, c), n in ct.items():
        ctx2[(a, b)] += n
        acat[(a, b)][min(n, 3) - 1] += 1
        mid[(b, c)] += 1
    ctx1 = collections.Counter()
    kcat = collections.defaultdict(lambda: [0, 0, 0])
    low = collections.Counter()
    for (b, c), m in mid.items():
        ctx1[b] += m
        kcat[b][min(m, 3) - 1] += 1
        low[c] += 1
    tt = float(len(mid))
    vv = float(len(low))

    def discounts(counts):
        coc = collections.Counter(counts)
        n1, n2, n3, n4 = coc[1], coc[2], coc[3], coc[4]
        if not (n1 > 0 and n2 > 0):
            return [0.75, 0.75, 0.75]
        y = n1 / (n1 + 2.0 * n2)
        d1 = min(1.0, max(0.0, 1.0 - 2.0 * y * n2 / n1))
        d2 = min(2.0, max(0.0, 2.0 - 3.0 * y * n3 / n2))
        d3 = (
            min(3.0, max(0.0, 3.0 - 4.0 * y * n4 / n3)) if n3 > 0 else 0.75
        )
        return [d1, d2, d3]

    dt = discounts(ct.values())
    dm = discounts(mid.values())
    dl = discounts(low.values())
    lcat = [0, 0, 0]
    for u in low.values():
        lcat[min(u, 3) - 1] += 1
    g0 = (dl[0] * lcat[0] + dl[1] * lcat[1] + dl[2] * lcat[2]) / tt

    def p1(c):
        u = low[c]
        disc = (u - dl[min(u, 3) - 1]) / tt if u > 0 else 0.0
        return disc + g0 / vv

    def p2(b, c):
        m = mid[(b, c)]
        k = kcat[b]
        gam1 = (dm[0] * k[0] + dm[1] * k[1] + dm[2] * k[2]) / ctx1[b]
        # unseen (b, c): the discounted term is absent (max(m - D, 0)
        # with m == 0), probability mass comes entirely from backoff —
        # the graded query never evaluates this branch (it scores only
        # observed trigrams) but the properness sum below enumerates
        # the full vocabulary and must treat unseen events correctly
        disc = (m - dm[min(m, 3) - 1]) / ctx1[b] if m > 0 else 0.0
        return disc + gam1 * p1(c)

    def p3(a, b, c):
        n = ct[(a, b, c)]
        aa = acat[(a, b)]
        gam2 = (dt[0] * aa[0] + dt[1] * aa[1] + dt[2] * aa[2]) / ctx2[(a, b)]
        return (n - dt[min(n, 3) - 1]) / ctx2[(a, b)] + gam2 * p2(b, c)

    # (a) fitted discounts are in the KenLM-asserted range
    for i, d in enumerate([*dt, *dm, *dl]):
        assert 0.0 <= d <= (i % 3) + 1, (i, d)

    # (b) proper distribution: sum over the continuation vocab == 1
    vocab = list(low)
    succ3 = collections.defaultdict(set)
    for a, b, c in ct:
        succ3[(a, b)].add(c)
    for ab in list(ctx2)[:10]:
        gam2 = (
            dt[0] * acat[ab][0] + dt[1] * acat[ab][1] + dt[2] * acat[ab][2]
        ) / ctx2[ab]
        obs = sum(
            (ct[(*ab, c)] - dt[min(ct[(*ab, c)], 3) - 1]) / ctx2[ab]
            for c in succ3[ab]
        )
        total = obs + gam2 * sum(p2(ab[1], c) for c in vocab)
        assert abs(total - 1.0) < 1e-9, (ab, total)

    # (c) per-doc score recompute
    got = {r["doc_id"]: r for r in _run(spark, sf_dir, "text_kn_trigram_logprob")}
    assert set(got) == set(tg_by_doc)
    for doc_id in list(tg_by_doc)[:50]:
        tris = tg_by_doc[doc_id]
        expect = round(
            sum(-math.log(p3(a, b, c)) for a, b, c in tris) / len(tris), 6
        )
        assert abs(got[doc_id]["kn3_neg_logprob"] - expect) < 2e-6, doc_id
        assert got[doc_id]["n_trigrams"] == len(tris)


def test_streaming_kn_scoring_backoff_matches_recompute(spark, sf_dir):
    """The history-trained serving twin (r12) must reproduce an
    independent Python recompute of the FULL modified-KN backoff chain
    on the stream slice — and the recompute must observe every backoff
    branch actually firing (unseen trigram with seen context, unseen
    context, unseen continuation, OOV word), since those branches are
    the twin's whole point (the batch scorer structurally never takes
    them)."""
    import collections
    import math

    from opensnowcat_collector_spark.engine.llmdata.curation import (
        CURATION_CORPUS_SPLIT as SPLIT,
    )

    rows = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ct: dict = collections.Counter()
    stream_docs = {}
    for doc_id, t in rows:
        ws = t.lower().split(" ")
        tris = list(zip(ws, ws[1:], ws[2:]))
        if doc_id < SPLIT:
            ct.update(tris)
        elif tris:
            stream_docs[doc_id] = tris
    ctx2 = collections.Counter()
    acat = collections.defaultdict(lambda: [0, 0, 0])
    mid = collections.Counter()
    for (a, b, c), n in ct.items():
        ctx2[(a, b)] += n
        acat[(a, b)][min(n, 3) - 1] += 1
        mid[(b, c)] += 1
    ctx1 = collections.Counter()
    kcat = collections.defaultdict(lambda: [0, 0, 0])
    low = collections.Counter()
    for (b, c), m in mid.items():
        ctx1[b] += m
        kcat[b][min(m, 3) - 1] += 1
        low[c] += 1
    tt = float(len(mid))
    vv = float(len(low))

    def discounts(counts):
        coc = collections.Counter(counts)
        n1, n2, n3, n4 = coc[1], coc[2], coc[3], coc[4]
        if not (n1 > 0 and n2 > 0):
            return [0.75, 0.75, 0.75]
        y = n1 / (n1 + 2.0 * n2)
        d1 = min(1.0, max(0.0, 1.0 - 2.0 * y * n2 / n1))
        d2 = min(2.0, max(0.0, 2.0 - 3.0 * y * n3 / n2))
        d3 = min(3.0, max(0.0, 3.0 - 4.0 * y * n4 / n3)) if n3 > 0 else 0.75
        return [d1, d2, d3]

    dt = discounts(ct.values())
    dm = discounts(mid.values())
    dl = discounts(low.values())
    lcat = [0, 0, 0]
    for u in low.values():
        lcat[min(u, 3) - 1] += 1
    g0 = (dl[0] * lcat[0] + dl[1] * lcat[1] + dl[2] * lcat[2]) / tt

    branches = collections.Counter()

    def p3(a, b, c):
        # p1
        u = low[c]
        if u == 0:
            branches["oov_word"] += 1
            p1 = g0 / vv
        else:
            p1 = (u - dl[min(u, 3) - 1]) / tt + g0 / vv
        # p2
        if ctx1[b] == 0:
            branches["unseen_mid_context"] += 1
            p2 = p1
        else:
            k = kcat[b]
            gam1 = (dm[0] * k[0] + dm[1] * k[1] + dm[2] * k[2]) / ctx1[b]
            m = mid[(b, c)]
            if m == 0:
                branches["unseen_continuation"] += 1
                p2 = gam1 * p1
            else:
                p2 = (m - dm[min(m, 3) - 1]) / ctx1[b] + gam1 * p1
        # p3
        if ctx2[(a, b)] == 0:
            branches["unseen_top_context"] += 1
            return p2
        aa = acat[(a, b)]
        gam2 = (dt[0] * aa[0] + dt[1] * aa[1] + dt[2] * aa[2]) / ctx2[(a, b)]
        n = ct[(a, b, c)]
        if n == 0:
            branches["unseen_trigram_seen_context"] += 1
            return gam2 * p2
        branches["fully_seen"] += 1
        return (n - dt[min(n, 3) - 1]) / ctx2[(a, b)] + gam2 * p2

    got = {r["doc_id"]: r for r in _run(spark, sf_dir, "streaming_kn_scoring")}
    assert set(got) == set(stream_docs)
    for doc_id in list(stream_docs)[:50]:
        tris = stream_docs[doc_id]
        ps = [max(p3(a, b, c), 1e-9) for a, b, c in tris]
        expect = round(sum(-math.log(p) for p in ps) / len(ps), 6)
        assert abs(got[doc_id]["kn3_neg_logprob"] - expect) < 2e-6, doc_id
        assert got[doc_id]["n_trigrams"] == len(tris)
        assert got[doc_id]["n_unseen"] == sum(
            1 for t in tris if ct[t] == 0
        ), doc_id

    # the seen/unseen-event branches all fire on the graded corpus...
    for branch in (
        "fully_seen",
        "unseen_trigram_seen_context",
        "unseen_top_context",
        "unseen_continuation",
    ):
        assert branches[branch] > 0, (branch, dict(branches))
    # ...but the corpus vocabulary is small enough that every stream
    # WORD is history-seen, so the OOV and unseen-mid-context branches
    # need a purpose-built corpus: one OOV word mid-stream exercises
    # p1's g0/V uniform base and p2's direct-lower-order branch.
    assert branches["oov_word"] == 0 and branches["unseen_mid_context"] == 0


def test_streaming_kn_scoring_oov_branches_on_micro_corpus(spark, tmp_path):
    """Engine-vs-recompute equality on a hand-built corpus whose stream
    slice contains a word the history never saw — the OOV (g0/V) and
    unseen-mid-context (P2 -> P1 direct) branches the graded corpus's
    small vocabulary cannot reach."""
    import math

    from opensnowcat_collector_spark.engine import registry
    from opensnowcat_collector_spark.engine.llmdata.curation import (
        CURATION_CORPUS_SPLIT as SPLIT,
    )

    hist = [
        "a b c a b c a b d",
        "b c d b c e a b c",
        "c a b c d e a a b",
        "d e a b c a b e d",
    ]
    stream = [
        "a b zzz b c d",  # zzz OOV: w3-position (a,b,zzz), mid-context (zzz as w2)
        "a b c a b d e",  # fully in-vocab stream doc
    ]
    rows = [
        (i, t, "en", "src0", len(t))
        for i, t in enumerate(hist)
    ] + [
        (SPLIT + i, t, "en", "src0", len(t))
        for i, t in enumerate(stream)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "micro_sf")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = {
        r["doc_id"]: r
        for r in registry.all_queries()["streaming_kn_scoring"](
            spark, sf
        ).collect()
    }
    assert set(got) == {SPLIT, SPLIT + 1}

    # independent recompute (same construction as the main test)
    import collections

    ct: dict = collections.Counter()
    for t in hist:
        ws = t.split(" ")
        ct.update(zip(ws, ws[1:], ws[2:]))
    ctx2 = collections.Counter()
    acat = collections.defaultdict(lambda: [0, 0, 0])
    mid = collections.Counter()
    for (a, b, c), n in ct.items():
        ctx2[(a, b)] += n
        acat[(a, b)][min(n, 3) - 1] += 1
        mid[(b, c)] += 1
    ctx1 = collections.Counter()
    kcat = collections.defaultdict(lambda: [0, 0, 0])
    low = collections.Counter()
    for (b, c), m in mid.items():
        ctx1[b] += m
        kcat[b][min(m, 3) - 1] += 1
        low[c] += 1
    tt, vv = float(len(mid)), float(len(low))

    def discounts(counts):
        coc = collections.Counter(counts)
        n1, n2, n3, n4 = coc[1], coc[2], coc[3], coc[4]
        if not (n1 > 0 and n2 > 0):
            return [0.75, 0.75, 0.75]
        y = n1 / (n1 + 2.0 * n2)
        return [
            min(1.0, max(0.0, 1.0 - 2.0 * y * n2 / n1)),
            min(2.0, max(0.0, 2.0 - 3.0 * y * n3 / n2)),
            min(3.0, max(0.0, 3.0 - 4.0 * y * n4 / n3)) if n3 > 0 else 0.75,
        ]

    dt, dm, dl = discounts(ct.values()), discounts(mid.values()), discounts(low.values())
    lcat = [0, 0, 0]
    for u in low.values():
        lcat[min(u, 3) - 1] += 1
    g0 = (dl[0] * lcat[0] + dl[1] * lcat[1] + dl[2] * lcat[2]) / tt

    hit_oov = hit_mid_ctx = False

    def p3(a, b, c):
        nonlocal hit_oov, hit_mid_ctx
        u = low[c]
        if u == 0:
            hit_oov = True
            p1 = g0 / vv
        else:
            p1 = (u - dl[min(u, 3) - 1]) / tt + g0 / vv
        if ctx1[b] == 0:
            hit_mid_ctx = True
            p2 = p1
        else:
            k = kcat[b]
            gam1 = (dm[0] * k[0] + dm[1] * k[1] + dm[2] * k[2]) / ctx1[b]
            m = mid[(b, c)]
            p2 = (gam1 * p1) if m == 0 else (m - dm[min(m, 3) - 1]) / ctx1[b] + gam1 * p1
        if ctx2[(a, b)] == 0:
            return p2
        aa = acat[(a, b)]
        gam2 = (dt[0] * aa[0] + dt[1] * aa[1] + dt[2] * aa[2]) / ctx2[(a, b)]
        n = ct[(a, b, c)]
        return (gam2 * p2) if n == 0 else (n - dt[min(n, 3) - 1]) / ctx2[(a, b)] + gam2 * p2

    for i, t in enumerate(stream):
        ws = t.split(" ")
        tris = list(zip(ws, ws[1:], ws[2:]))
        ps = [max(p3(a, b, c), 1e-9) for a, b, c in tris]
        expect = round(sum(-math.log(p) for p in ps) / len(ps), 6)
        r = got[SPLIT + i]
        assert abs(r["kn3_neg_logprob"] - expect) < 2e-6, (i, r)
        assert r["n_trigrams"] == len(tris)
        assert r["n_unseen"] == sum(1 for x in tris if ct[x] == 0)
    assert hit_oov and hit_mid_ctx  # the corpus was built to reach both


def test_streaming_fuzzy_contamination_dominates_batch_screen(spark, sf_dir):
    """Structural containment between the twins: the serving twin's
    rarity table is trained on the STATIC slice only, and document
    frequency over a subset is <= document frequency over the full
    corpus — so every shingle that blocks a pair in the batch screen
    also blocks it in the twin.  For every stream doc the batch screen
    flags, the twin must therefore see AT LEAST its candidates
    (n_bench_candidates >=), reach a min_rel_edit that is <= the
    batch's, and inherit every contamination flag.  (Strict equality is
    NOT expected — extra static-rare shingles legitimately widen the
    twin's candidate pool; that drift is the documented refresh
    cadence.)"""
    from opensnowcat_collector_spark.engine.llmdata.curation import (
        BENCH_MOD,
        CURATION_CORPUS_SPLIT as SPLIT,
    )

    batch = {
        r["doc_id"]: r
        for r in _run(spark, sf_dir, "curate_fuzzy_contamination")
        if r["doc_id"] >= SPLIT and r["doc_id"] % BENCH_MOD != 0
    }
    twin = {
        r["doc_id"]: r for r in _run(spark, sf_dir, "streaming_fuzzy_contamination")
    }
    assert batch, "batch screen found no stream-slice candidates at this SF"
    assert set(batch) <= set(twin)
    for doc_id, b in batch.items():
        t = twin[doc_id]
        assert t["n_bench_candidates"] >= b["n_bench_candidates"], doc_id
        assert t["min_rel_edit"] <= b["min_rel_edit"] + 1e-9, doc_id
        if b["fuzzy_contaminated"]:
            assert t["fuzzy_contaminated"], doc_id


def test_rp_rerank_stage1_scale_recovers_exact_integers(spark, sf_dir):
    """The r12 integer-exact stage-1 rests on one premise: every 6-dp-
    rounded sketch component times 1e6 sits within float-error of an
    exact integer (so round().cast(long) loses nothing and the three
    dot-product sums are exact).  Guard the premise against anyone
    changing the sketch rounding without updating the scale."""
    proj = similarity._rp_project(spark, sf_dir)
    drift = proj.select(
        F.max(
            F.abs(F.col("p") * 1000000.0 - F.round(F.col("p") * 1000000.0, 0))
        ).alias("d")
    ).head()["d"]
    assert drift < 1e-4, drift


def test_kn_perplexity_buckets_are_exact_terciles_of_kn_scores(spark, sf_dir):
    """The CCNet gate (r12) must be exactly the integer-exact tercile
    of the KN-trigram scorer's own output: per language, bucket sizes
    in {floor(n/3)..ceil(n/3)+1} and every head score <= every middle
    score <= every tail score (ties broken by doc_id, so equal scores
    may straddle a boundary only in doc_id order)."""
    import collections

    kn = {r["doc_id"]: r["kn3_neg_logprob"]
          for r in _run(spark, sf_dir, "text_kn_trigram_logprob")}
    rows = _run(spark, sf_dir, "curate_kn_perplexity_buckets")
    assert {r["doc_id"] for r in rows} == set(kn)
    by_lang = collections.defaultdict(list)
    for r in rows:
        assert r["kn3_neg_logprob"] == kn[r["doc_id"]], r["doc_id"]
        by_lang[r["lang"]].append(r)
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        n = len(rs)
        sizes = collections.Counter(r["bucket"] for r in rs)
        for b in ("head", "middle", "tail"):
            assert n // 3 <= sizes[b] <= n // 3 + 1, (lang, dict(sizes))
        ranked = sorted(rs, key=lambda r: (r["kn3_neg_logprob"], r["doc_id"]))
        labels = [order[r["bucket"]] for r in ranked]
        assert labels == sorted(labels), lang  # monotone along the rank


def test_fertility_consistent_with_doc_level_segmentation(spark, sf_dir):
    """text_tokenizer_fertility (r14) must be EXACTLY the per-language
    rollup of text_bpe_segment_counts' per-document segmentation (the
    two share the subtree — this pins that they also cannot drift at
    the aggregation layer), with fertility >= 1 (every word is at
    least one subword) and the word totals partitioning the corpus."""
    import collections

    from opensnowcat_collector_spark.engine.tables import table

    seg = _run(spark, sf_dir, "text_bpe_segment_counts")
    lang_of = {
        r["doc_id"]: r["lang"]
        for r in table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    words = collections.Counter()
    subs = collections.Counter()
    docs = collections.Counter()
    for r in seg:
        lang = lang_of[r["doc_id"]]
        words[lang] += r["n_words"]
        subs[lang] += r["n_subwords"]
        docs[lang] += 1
    rows = {r["lang"]: r for r in _run(spark, sf_dir, "text_tokenizer_fertility")}
    assert set(rows) == set(words)
    for lang, r in rows.items():
        assert r["n_docs"] == docs[lang], lang
        assert r["n_words"] == words[lang], lang
        assert r["n_subwords"] == subs[lang], lang
        assert r["fertility"] >= 1.0, (lang, r["fertility"])


def test_length_curriculum_partitions_with_monotone_boundaries(spark, sf_dir):
    """curate_length_curriculum (r14): the four stages PARTITION the
    corpus (doc and token totals match the table; the running
    cum_tokens ends at the grand total) and stage length ranges are
    strictly ordered — a stage-m document is never longer than any
    stage-(m+1) document (quartile cuts are half-open by the CASE)."""
    import pyspark.sql.functions as F

    from opensnowcat_collector_spark.engine.tables import table

    rows = sorted(_run(spark, sf_dir, "curate_length_curriculum"),
                  key=lambda r: r["stage"])
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    d = table(spark, sf_dir, "documents")
    tot = d.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(F.split("text", " "))).alias("toks"),
    ).head()
    assert sum(r["n_docs"] for r in rows) == tot["docs"]
    assert sum(r["stage_tokens"] for r in rows) == tot["toks"]
    assert rows[-1]["cum_tokens"] == tot["toks"]
    running = 0
    for r in rows:
        running += r["stage_tokens"]
        assert r["cum_tokens"] == running, r
    for a, b in zip(rows, rows[1:]):
        assert a["max_len"] < b["min_len"], (a, b)
