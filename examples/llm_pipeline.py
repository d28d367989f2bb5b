"""End-to-end LLM-training-data pipeline demo over the synthetic corpus.

Chains the engine's curation surface the way a production run would:
admission (blocklist + PII scrub) -> dedup (exact, then near-dup
clusters applied) -> quality gating -> packing stats -> dataset card.
Each step is one of the oracle-gated registry operators — this script
just sequences them and prints the headline numbers.

Run:  python examples/llm_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from opensnowcat_collector_spark.engine import registry
    from opensnowcat_collector_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="llm-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    print(f"== corpus: {sf_dir}")

    block = qs["curate_blocklist_filter"](spark, sf_dir)
    kept = block.agg({"n_kept": "sum", "n_dropped": "sum"}).first()
    print(f"admission: {kept['sum(n_kept)']} kept / {kept['sum(n_dropped)']} blocklisted")

    pii = qs["text_pii_scrub"](spark, sf_dir)
    tot = pii.agg({"n_emails": "sum", "n_phones": "sum", "n_ips": "sum"}).first()
    print(
        f"pii scrub: {tot['sum(n_emails)']} emails, {tot['sum(n_phones)']} phones, "
        f"{tot['sum(n_ips)']} ips redacted"
    )

    exact = qs["dedup_exact"](spark, sf_dir)
    n_canon = exact.filter("is_canonical").count()
    print(f"exact dedup: {exact.count()} docs -> {n_canon} canonical")

    applied = qs["curate_dedup_apply"](spark, sf_dir)
    a = applied.agg({"n_kept": "sum", "n_dropped": "sum", "kept_chars": "sum"}).first()
    print(
        f"near-dup clusters applied: {a['sum(n_kept)']} kept / "
        f"{a['sum(n_dropped)']} dropped ({a['sum(kept_chars)']} chars kept)"
    )

    bloom = qs["dedup_bloom_incremental"](spark, sf_dir)
    nb = bloom.count()
    nd = bloom.filter("is_dup").count()
    print(f"incoming batch vs corpus (Bloom-prefiltered): {nd}/{nb} already present")

    prefix = qs["dedup_prefix_contained"](spark, sf_dir)
    print(f"prefix-contained (truncated re-crawls): {prefix.count()} flagged")

    cascade = qs["dedup_cascade_accounting"](spark, sf_dir)
    print("dedup cascade (exact -> normalized -> prefix16):")
    for row in cascade.orderBy("stage_order").collect():
        print(
            f"   {row.stage}: examined={row.examined} removed={row.removed} "
            f"surviving={row.surviving}"
        )

    matrix = qs["dedup_source_matrix"](spark, sf_dir)
    m = matrix.selectExpr(
        "sum(n_dup_pairs) AS pairs",
        "sum(CASE WHEN source_a <> source_b THEN 1 ELSE 0 END) AS cross_cells",
    ).first()
    print(
        f"duplicate provenance: {m.pairs or 0} fingerprint-dup pairs across "
        f"{m.cross_cells or 0} cross-source cells"
    )

    suffix = qs["curate_suffix_dedup_apply"](spark, sf_dir)
    s = suffix.agg({"removed_tokens": "sum"}).first()
    n_rm = s["sum(removed_tokens)"] or 0  # None when no doc has a repeat
    print(f"ExactSubstr removal: {n_rm} repeated tokens flagged")

    rep = qs["text_dup_line_fractions"](spark, sf_dir)
    r = rep.selectExpr(
        "sum(CASE WHEN n_dup_lines > 0 THEN 1 ELSE 0 END) AS n_any",
        "sum(CASE WHEN rep_lines_gate OR rep_chars_gate THEN 1 ELSE 0 END) AS n_rep",
    ).first()
    print(
        f"line repetition (MassiveText): {r.n_any} docs with repeated lines, "
        f"{r.n_rep} over the drop thresholds"
    )

    gate = qs["curate_quality_quantile_filter"](spark, sf_dir)
    print(f"quality gate survivors: {gate.count()}")

    ld = qs["curate_line_dedup_apply"](spark, sf_dir)
    lsum = ld.agg({"n_lines": "sum", "n_removed": "sum"}).first()
    print(
        f"C4 line dedup: removed {lsum['sum(n_removed)']}/{lsum['sum(n_lines)']} "
        f"corpus-duplicated lines (keep-earliest)"
    )

    fz = qs["curate_fuzzy_contamination"](spark, sf_dir)
    closest = fz.orderBy("min_rel_edit").first()
    if closest is None:
        print("fuzzy decontamination: no train doc shares a rare shingle with the benchmark")
    else:
        print(
            f"fuzzy decontamination: {fz.count()} candidate docs, "
            f"{fz.filter('fuzzy_contaminated').count()} flagged; closest is "
            f"doc {closest.doc_id} at rel edit {closest.min_rel_edit:.3f}"
        )

    plan = qs["dedup_source_order_plan"](spark, sf_dir)
    print("dedup order (greedy marginal duplicate mass):")
    for row in plan.orderBy("step").collect()[:5]:
        print(f"   {row.step}. {row.source} ({row.marginal} dup pairs attributed)")

    scored = qs["curate_quality_classifier_score"](spark, sf_dir)
    kept = scored.filter("keep").count()
    print(f"trained quality classifier: keeps {kept}/{scored.count()} docs at p>=0.5")

    ev = qs["curate_classifier_eval"](spark, sf_dir)
    half = ev.filter("threshold = 0.5").first()
    if half.precision_ is None:  # no predicted positives at this gate
        print("classifier eval @0.5: no docs above the gate")
    else:
        print(
            f"classifier eval @0.5: precision={half.precision_:.3f} "
            f"recall={half.recall_:.3f} f1={half.f1:.3f}"
        )

    ccnet = qs["curate_ccnet_buckets"](spark, sf_dir)
    heads = ccnet.filter("bucket = 'head'").count()
    print(f"CCNet buckets: {heads}/{ccnet.count()} docs in the head tercile")

    dsir = qs["curate_dsir_weights"](spark, sf_dir)
    top = dsir.orderBy(dsir.log_weight.desc()).first()
    if top is None:  # corpus with no >=2-token docs has no bigram features
        print("DSIR weights: no multi-token docs to score")
    else:
        print(f"DSIR weights: top doc {top.doc_id} log_weight={top.log_weight:.4f}")

    zipf = qs["text_zipf_fit"](spark, sf_dir).first()
    if zipf.zipf_slope is None:  # <2 head token types: regr_slope is NULL
        print("zipf fit: too few token types to fit")
    else:
        print(
            f"zipf fit over top-{zipf.head_size} types: slope={zipf.zipf_slope:.3f} "
            f"r2={zipf.zipf_r2:.3f}"
        )

    merges = qs["text_bpe_merge_steps"](spark, sf_dir)
    print("BPE merge training (first steps):")
    for row in merges.orderBy("step").collect():
        print(f"   step {row.step}: '{row.w1}' + '{row.w2}' -> '{row.merged}' (x{row.support})")

    seg = qs["text_bpe_segment_counts"](spark, sf_dir)
    st = seg.agg({"n_words": "sum", "n_subwords": "sum"}).first()
    print(
        f"BPE apply: {st['sum(n_words)']} words -> {st['sum(n_subwords)']} subword tokens"
    )

    sem = qs["dedup_semdedup"](spark, sf_dir)
    print(f"SemDeDup (eps-ball in trained IVF cells): {sem.count()} survivors")

    uni = qs["text_unigram_lm_train"](spark, sf_dir)
    top = uni.orderBy(uni.cnt.desc()).collect()[:5]
    print("unigram-LM pieces (top by count):", [r.piece for r in top])
    useg = qs["text_unigram_lm_segment"](spark, sf_dir)
    us = useg.agg({"n_words": "sum", "n_pieces": "sum"}).first()
    print(
        f"unigram-LM apply: {us['sum(n_words)']} words -> "
        f"{us['sum(n_pieces)']} pieces"
    )

    dor = qs["curate_doremi_weights"](spark, sf_dir)
    boosted = dor.orderBy(dor.mix_weight.desc()).collect()[:3]
    print(
        "DoReMi mixture (top boosted domains):",
        [(r.source, round(r.mix_weight, 4)) for r in boosted],
    )

    rho = qs["curate_rho_token_select"](spark, sf_dir)
    rs = rho.agg({"n_tokens": "sum", "n_selected": "sum"}).first()
    print(
        f"RHO-1 token selection: {rs['sum(n_selected)']}/{rs['sum(n_tokens)']} "
        f"tokens kept for selective-LM training"
    )
    srho = qs["streaming_rho_scoring"](spark, sf_dir)
    ss = srho.agg({"n_tokens": "sum", "n_selected": "sum"}).first()
    print(
        f"RHO-1 serving twin: {ss['sum(n_selected)']}/{ss['sum(n_tokens)']} "
        f"incoming tokens selected against the history-trained table"
    )

    tune = qs["dedup_lsh_tune"](spark, sf_dir)
    opt = tune.filter(tune.is_opt).first()
    print(
        f"LSH banding auto-tune (budget 128 @ t=0.8): optimal b={opt.b} r={opt.r} "
        f"(fp={opt.fp:.4f} fn={opt.fn:.4f})"
    )

    lref = qs["streaming_line_dedup_refresh"](spark, sf_dir)
    novel = lref.filter(lref.origin == "stream").count()
    print(f"line-table refresh: folded {novel} novel stream lines into history")

    sref = qs["streaming_semdedup_refresh"](spark, sf_dir)
    cells = sref.select("cell").distinct().count()
    print(
        f"semantic-index refresh: {cells} cells re-estimated from "
        f"running stats after folding the drained survivors"
    )

    wp = qs["text_wordpiece_train"](spark, sf_dir)
    print("WordPiece merge training (likelihood argmax):")
    for row in wp.orderBy("step").collect():
        print(
            f"   step {row.step}: '{row.w1}' + '{row.w2}' -> '{row.merged}' "
            f"(score {row.support}/({row.c1}*{row.c2}))"
        )
    wseg = qs["text_wordpiece_segment_counts"](spark, sf_dir)
    wst = wseg.agg({"n_words": "sum", "n_subwords": "sum"}).first()
    print(
        f"WordPiece apply: {wst['sum(n_words)']} words -> "
        f"{wst['sum(n_subwords)']} subword tokens"
    )

    kn = qs["text_kn_bigram_logprob"](spark, sf_dir)
    worst = kn.orderBy(kn.kn_neg_logprob.desc()).first()
    print(
        f"Kneser-Ney bigram LM: most disfluent doc {worst.doc_id} "
        f"(neg-logprob {worst.kn_neg_logprob:.3f})"
    )

    rp = qs["embed_random_projection"](spark, sf_dir)
    print(f"JL random projection: {rp.count()} sketch components (16 per vector)")

    rr = qs["sim_ann_rp_rerank"](spark, sf_dir).collect()
    exact = {r.vec_id for r in qs["sim_topk_bruteforce"](spark, sf_dir).collect()}
    hit = sum(1 for r in rr if r.vec_id in exact)
    print(
        f"two-stage ANN (sketch prefilter + exact re-rank): top-10 with "
        f"recall {hit}/10 vs brute force"
    )

    scon = qs["streaming_contamination"](spark, sf_dir)
    flagged = scon.filter(scon.is_contaminated).count()
    print(f"streaming decontamination: {flagged} incoming docs flagged vs benchmark")

    sem = qs["curate_semantic_contamination"](spark, sf_dir)
    sflag = sem.filter(sem.is_contaminated).count()
    print(
        f"semantic decontamination: {sflag}/{sem.count()} train vectors "
        f"within the benchmark epsilon-ball"
    )

    audit = qs["curate_contamination_audit"](spark, sf_dir)
    print("contamination-ladder audit (exact/fuzzy/semantic -> n_docs):")
    for row in audit.orderBy("exact_hit", "fuzzy_hit", "semantic_hit").collect():
        print(
            f"   {row.exact_hit!s:5} {row.fuzzy_hit!s:5} "
            f"{row.semantic_hit!s:5} -> {row.n_docs}"
        )

    mix = qs["curate_temperature_mix"](spark, sf_dir)
    print("temperature mix (T=2) boosts:")
    for row in mix.orderBy("source").collect()[:5]:
        print(f"   {row.source}: prob={row.mix_prob:.4f} boost={row.boost:.2f}")

    ws = qs["curate_weighted_sample"](spark, sf_dir)
    w = ws.agg({"weight": "sum", "rank": "count"}).first()
    print(
        f"weighted sample (Efraimidis-Spirakis): {w['count(rank)']} docs drawn, "
        f"{w['sum(weight)']} chars of sample mass"
    )

    packs = qs["curate_pack_sequences"](spark, sf_dir)
    print(f"packed sequences: {packs.count()}")

    chunks = qs["curate_chunk_overlap"](spark, sf_dir)
    print(f"retrieval chunks (64-token windows, 16 overlap): {chunks.count()}")

    cdc = qs["dedup_cdc_chunks"](spark, sf_dir)
    c = cdc.agg({"n_chunks": "sum", "dup_tokens": "sum"}).first()
    print(
        f"CDC chunk dedup: {c['sum(n_chunks)']} content-defined chunks, "
        f"{c['sum(dup_tokens)']} duplicated tokens"
    )
    cda = qs["dedup_cdc_apply"](spark, sf_dir)
    ca = cda.agg({"n_removed": "sum", "removed_tokens": "sum"}).first()
    print(
        f"CDC cleaner applied: removed {ca['sum(n_removed)']} chunks "
        f"({ca['sum(removed_tokens)']} tokens, keep-earliest)"
    )

    fert = qs["text_tokenizer_fertility"](spark, sf_dir)
    print("tokenizer fertility by language (subwords/word):")
    for row in fert.orderBy(fert.fertility.desc()).collect():
        print(f"   {row.lang}: {row.fertility:.3f} ({row.n_words} words)")

    uni_mix = qs["curate_unimax_mix"](spark, sf_dir)
    print("UniMax allocation (epoch-capped uniform budget):")
    for row in uni_mix.orderBy(uni_mix.alloc_tokens.desc()).collect():
        print(
            f"   {row.lang}: {row.alloc_tokens:.0f} tokens "
            f"({row.epochs_:.2f} epochs)"
        )
    uapp = qs["curate_unimax_apply"](spark, sf_dir)
    ua = uapp.agg({"sampled_tokens": "sum", "n_copies": "sum"}).first()
    print(
        f"UniMax applied: {ua['sum(sampled_tokens)']} tokens materialized "
        f"across {ua['sum(n_copies)']} document copies"
    )

    cur = qs["curate_length_curriculum"](spark, sf_dir)
    print("length curriculum (short -> long stages):")
    for row in cur.orderBy("stage").collect():
        print(
            f"   stage {row.stage}: {row.n_docs} docs, "
            f"lengths {row.min_len}-{row.max_len}, cum {row.cum_tokens} tokens"
        )

    kc = qs["curate_kcenter_coreset"](spark, sf_dir)
    print("k-center coreset (max-min diverse seeds):")
    for row in kc.orderBy("sel_round").collect():
        print(
            f"   round {row.sel_round}: vec {row.center_vec_id} covers "
            f"{row.n_assigned} (radius {row.radius:.3f})"
        )

    bf = qs["curate_pack_bestfit"](spark, sf_dir)
    b = bf.agg({"fill_rate": "avg", "pad_tokens": "sum"}).first()
    print(
        f"best-fit packing: mean fill {b['avg(fill_rate)']:.3f}, "
        f"{b['sum(pad_tokens)']} pad tokens"
    )

    card = qs["curate_dataset_card"](spark, sf_dir)
    print("dataset card:")
    for row in card.collect():
        print("  ", row.asDict())


if __name__ == "__main__":
    main()
