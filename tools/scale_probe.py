"""Empirical scale probe: run headline operators on N-times self-unioned
inputs and report the runtime ratio vs 1x.

A shuffle-linear operator should scale ~N on N-times data (same
partition counts, local[32]); super-linear growth flags a quadratic
term (join fan-out, candidate blowup) that would break at 100 TB.
Writes SCALING.md.

Usage: PYTHONPATH=/root/repo python tools/scale_probe.py [sf_dir] [N]
"""

from __future__ import annotations

import sys

import change_data_capture_poc_spark.queries  # noqa: F401 - registers all
from change_data_capture_poc_spark.registry import all_queries
from change_data_capture_poc_spark.session import get_spark
from change_data_capture_poc_spark.sources import tables as tables_mod
from tools.probe_common import (
    bytes_ratio,
    consumers,
    make_materialized_load,
    make_scaled_load,
    mb,
    run_query,
    set_loader,
    super_linear,
)

# Probe-name variant suffix: "<query>@repeat_text" runs the query
# with the REPEAT-TEXT fixture (documents copies reuse the same text;
# only ids shift) instead of the default alphabet rotation — the
# Heaps-law-shaped corpus where word TYPES stay constant while tokens
# grow n-times. Only meaningful for queries with no pair/self-join
# semantics (identical copies are all mutual near-dups there).
REPEAT_TEXT_SUFFIX = "@repeat_text"

# Explicit allowlist for the repeat-text fixture (round-12 ADVICE): a
# variant row for e.g. a minhash/containment query would merge a
# pathological all-mutual-near-dups measurement into SCALING.md under
# a legit-looking label. Extend this set ONLY for queries whose
# semantics never pair rows against each other (vocabulary-growth /
# per-doc map shapes).
REPEAT_TEXT_OK = frozenset({"text_tfidf_top_terms"})

# Queries whose SCALED input is localCheckpoint-materialized before
# the query runs: AQE re-plans the raw n-way self-UNION into
# per-branch joins for these (round 11 measured the containment
# query's exchanges going 3 -> 24, bytes 11.8x — a fixture artifact;
# real 8x data is one source, not eight plan branches).
MATERIALIZE_SCALED_INPUT = frozenset(
    {
        "dedup_containment_survivors",
        # round-13: 8.6x bytes watch item — same self-union fixture
        # class; materialized input is the honest 8x measurement.
        "dedup_bloom_paragraph",
    }
)

# Operators whose plans are MAP-ONLY by design (round-11 reworks or
# construction): zero shuffle bytes at BOTH scales is asserted, not
# just printed as '-'. A regression that introduces an exchange into
# one of these (a lost broadcast, an accidental distinct) is exactly
# the change the byte probe exists to catch — it must WARN, not
# silently switch the row to a finite ratio.
EXPECT_ZERO_SHUFFLE = frozenset(
    {
        "dedup_simhash_portable",
        "text_winnowing_fingerprint",
        "range_join_signup_windows",
        "embedding_random_projection",
        "split_train_val_test",
    }
)

PROBES = (
    "pricing_summary",
    "scd2_user_state",
    "local_supplier_volume",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_bruteforce",
    "asof_join_order_events",
    "window_running_sum",
    "dedup_simhash_portable",
    "dedup_cluster_label_propagation",
    "ann_cosine_lsh_hyperplane",
    "dedup_embedding_cosine",
    "dedup_semantic_semdedup",
    "corpus_temperature_resample",
    "eval_quality_score_calibration",
    "text_stupid_backoff_score",
    "text_winnowing_fingerprint",
    "corpus_unimax_allocation",
    "corpus_perplexity_prune",
    "ann_hard_negative_mining",
    "tokenizer_fertility_by_lang",
    "sql_small_qty_revenue",
    "range_join_signup_windows",
    "events_funnel",
    "text_tfidf_top_terms",
    # Round-12 (verdict item 3): the rotation fixture mints 8x word
    # types, which is what pushed tfidf's bytes to 10.8x; this twin
    # row measures the same plan on the repetition-shaped corpus
    # (constant vocabulary) where the Heaps claim predicts at-or-
    # under-linear bytes.
    "text_tfidf_top_terms@repeat_text",
    "decontaminate_ngram_overlap",
    "global_ordinal_ids",
    "events_transition_matrix",
    "corpus_build_e2e",
    "text_token_pmi",
    "cdc_net_effect_compaction",
    "snapshot_diff_changes",
    "events_ema",
    "text_unigram_logprob",
    "bpe_pair_merges",
    "kmeans_one_iter",
    "dedup_survivors",
    "text_bm25_retrieval",
    "events_debounce_dedup",
    "gdpr_erasure_audit",
    "fk_integrity_audit",
    "embedding_random_projection",
    "split_train_val_test",
    "corpus_mix_rebalance",
    "curriculum_quality_phases",
    "text_bigram_logprob",
    "tokenizer_oov_rate",
    "dedup_minhash_containment",
    "cdc_lsn_gap_transactions",
    "corpus_quality_token_budget",
    "text_span_dedup_c4",
    "scd2_rebuild_at_lsn",
    "embedding_pca_power_iteration",
    "dedup_cross_split_leakage",
    "events_pattern_signup_purchase_cep",
    "cdc_out_of_order_report",
    "text_js_divergence_sources",
    "ann_two_stage_rerank",
    "scd2_history_compaction",
    "dedup_containment_survivors",
    "corpus_cross_source_dup_report",
    "kmeans_multi_iter",
    "scd2_type3_current_previous",
    "text_boilerplate_top_spans",
    "events_ks_drift_halves",
    "events_autocorr_lag1",
    "text_zipf_fit",
    "text_vocab_coverage_curve",
    "embedding_centroid_drift",
    "orders_open_backlog_curve",
    "ann_mmr_diversified_rerank",
    "text_lang_confusion_matrix",
    "corpus_ngram_novelty_curve",
    "text_quality_classifier_score",
    "eval_holdout_stratified_exact",
    "dedup_incremental_delta_index",
    "corpus_importance_sampling",
    "scd2_bitemporal_grid_audit",
    "multimodal_feature_bucket_dedup",
    "eval_minhash_estimator_calibration",
    "corpus_chunk_sliding_window",
    "text_heavy_hitters_misra_gries",
    "ann_ivf_multiprobe_recall",
    "corpus_chunk_dedup_rate",
    "dedup_substring_suffix_runs",
    "text_kneser_ney_bigram_score",
    "text_pii_redact_classes",
    "agg_hll_portable",
    "corpus_bottomk_consistent_sample",
    "dedup_substring_removal",
    "corpus_filter_funnel_attribution",
    "text_knn_similarity_graph",
    "agg_cms_portable",
    "ann_pq_adc_recall",
    "decontaminate_semantic_embedding",
    "bitext_margin_mining",
    "corpus_doremi_domain_weights",
    "bpe_train_iterative_merges",
    "events_anomaly_mad_robust",
    "graph_triangle_count_dupgraph",
    "corpus_weighted_priority_sample",
    "dedup_bloom_portable",
    "ann_ivf_pq_recall",
    "corpus_weighted_build_e2e",
    "cdc_schema_evolution_union",
    "events_changepoint_cusum",
    "events_holt_linear_smoothing",
    "dedup_cluster_best_representative",
    "dedup_threshold_sensitivity",
    "agg_histogram_quantile_portable",
    "agg_selfjoin_size_f2_sketch",
    "agg_hll_set_ops",
    "eval_ann_recall_sampled_truth",
    "scd2_recompute_evolved_schema",
    "corpus_data_constrained_epochs",
    "events_welch_ttest",
    "asof_join_nearest_events",
    "privacy_dp_noisy_counts",
    "privacy_k_anonymity_audit",
    "multimodal_scene_segmentation",
    "range_join_interval_overlap",
    "eval_bbit_minhash_compression",
    "cdc_envelope_key_census",
    "agg_histogram_quantile_hourly",
    "events_psi_drift_halves",
    "eval_histogram_width_sensitivity",
    "bpe_encode_corpus",
    "ann_multiprobe_recall_sampled_truth",
    "pack_best_fit",
    "pack_fill_rate_report",
    "gdpr_erasure_purged_dim",
    "gdpr_erasure_ledger",
    "pack_emit_sequences",
    "wordpiece_maxmatch_encode",
    "wordpiece_threshold_sensitivity",
    "corpus_datacard_report",
    "dedup_url_canonical",
    "dedup_bloom_paragraph",
    # Round 11: unigram_train_em IS probed — the SPARK_GRAFT_TMP_NS
    # namespace confines its persisted vocab artifact to probe-local
    # dirs, and without it the unigram family had zero scale-probe
    # coverage (the viterbi-encode exclusion below leans on this row).
    "unigram_train_em",
    # NOT probed: BUILDER queries that force-persist shared artifacts
    # (tokenizer_vocab_build, ann_index_build,
    # chunk_index_build) — probing one under the patched loader trains
    # a model on the synthetic 8x corpus; the SPARK_GRAFT_TMP_NS
    # namespace (set below) confines any such write to probe-local
    # dirs, but the timing row would still describe the fixture, not
    # the operator. Also NOT probed: streaming_* drains (file-stream
    # sources watch a
    # symlink dir, not load_table — the self-union patch can't reach
    # them; their batch twins are probed). The artifact-SERVING family
    # (ann_serve_from_index / ann_index_delta_serve /
    # bpe_encode_from_vocab / unigram_viterbi_encode /
    # cdc_quarantine_report / cdc_quarantine_replay) is likewise
    # excluded HERE because the loader patch cannot scale a persisted
    # artifact — but since round 12 it is MEASURED by
    # tools/serve_probe.py, which builds honest 1x/8x artifacts under
    # per-phase namespaces and times the serve path against each (see
    # SCALING.md "Artifact-serving probe"). Still plan-audit-only:
    # ann_index_compact / bpe_detokenize_roundtrip /
    # pack_best_fit_bpe_tokens / tokenizer_family_fertility_compare
    # (read artifacts but add no distinct serve-path plan shape),
    # cdc_schema_evolution_widening (reads its own one-time
    # generation artifacts), cdc_incremental_agg_maintenance.
)


def main() -> None:
    # Confine every persisted /tmp artifact this process builds to a
    # probe-local namespace: the loader patch below self-unions fact
    # tables 8x with rotated text, and an artifact force-built from
    # that synthetic corpus under the REAL corpus's still-valid file
    # fingerprint poisons every later serve-path run
    # (functions/artifacts.py documents the incident).
    import os as _os

    _os.environ["SPARK_GRAFT_TMP_NS"] = "scaleprobe"

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # Optional query names after N: probe only those and APPEND a
    # section instead of rewriting the whole table.
    subset = sys.argv[3:]
    probes = tuple(subset) if subset else PROBES
    qs = all_queries()
    unknown = [
        p for p in probes if p.split("@")[0] not in qs
    ]
    # A typo'd variant suffix must not silently run the DEFAULT
    # fixture under the variant's label (round-12 review finding:
    # '@repeat_txt' would merge a rotation-fixture row that readers
    # interpret as the constant-vocabulary measurement).
    unknown += [
        p
        for p in probes
        if "@" in p and not p.endswith(REPEAT_TEXT_SUFFIX)
    ]
    # The repeat-text fixture is only valid for allowlisted queries
    # (no pair/self-join semantics) — reject the suffix elsewhere so a
    # pathological measurement can't land under a legit-looking label.
    unknown += [
        p
        for p in probes
        if p.endswith(REPEAT_TEXT_SUFFIX)
        and p.split("@")[0] not in REPEAT_TEXT_OK
    ]
    if unknown:
        sys.exit(
            f"unknown query name(s)/variant suffix(es) {unknown}; "
            "valid names come from registry.all_queries(), the only "
            f"variant suffix is {REPEAT_TEXT_SUFFIX!r} and it is "
            f"allowlisted to {sorted(REPEAT_TEXT_OK)}"
        )
    spark = get_spark(app_name="scale_probe")

    real_load = tables_mod.load_table
    scaled_rotate = make_scaled_load(real_load, n, rotate_text=True)
    scaled_repeat = make_scaled_load(real_load, n, rotate_text=False)
    mods = consumers()

    rows = []
    for probe in probes:
        name = probe.split("@")[0]
        scaled_loader = (
            scaled_repeat
            if probe.endswith(REPEAT_TEXT_SUFFIX)
            else scaled_rotate
        )
        base_loader = real_load
        free_base = free_scaled = None
        if name in MATERIALIZE_SCALED_INPUT:
            # Materialize BOTH phases, not just the 8x side: RAM-backed
            # 8x input vs disk-scanned 1x input would bias the ratio
            # low and could hide genuine super-linearity (round-12
            # review finding).
            base_loader, free_base = make_materialized_load(real_load)
            scaled_loader, free_scaled = make_materialized_load(
                scaled_loader
            )
        set_loader(mods, base_loader)
        reps = [run_query(spark, qs, name, sf_dir) for _ in range(3)]
        base = min(t for t, _ in reps)
        base_b = max(b for _, b in reps)  # peak across reps
        if free_base is not None:
            free_base()
        set_loader(mods, scaled_loader)
        reps = [run_query(spark, qs, name, sf_dir) for _ in range(3)]
        scaled = min(t for t, _ in reps)
        scaled_b = max(b for _, b in reps)
        if free_scaled is not None:
            free_scaled()
        set_loader(mods, real_load)
        ratio = scaled / base if base > 0 else float("nan")
        # bytes_ratio/super_linear semantics live in probe_common
        # (shared with serve_probe so the conventions cannot drift).
        bratio = bytes_ratio(base_b, scaled_b)
        rows.append(
            (probe, round(base, 2), round(scaled, 2), round(ratio, 1),
             mb(base_b), mb(scaled_b), bratio)
        )
        print(rows[-1])
        # The 1.1x allowance keeps linear-in-rows ratios (8.0-8.1 at
        # an 8x probe) from burying the real signal; ratios inside
        # the band still get a NOTE (round-11 advice: the threshold
        # must not silently absorb ~10% real growth).
        if super_linear(base_b, scaled_b, n):
            print(f"WARN super-linear shuffle bytes: {probe} "
                  f"{mb(base_b)} MB -> {mb(scaled_b)} MB at {n}x")
        elif base_b > 0 and n < scaled_b / base_b <= n * 1.1:
            print(f"NOTE near-linear shuffle bytes (within the 1.1x "
                  f"fixture allowance): {probe} "
                  f"{mb(base_b)} MB -> {mb(scaled_b)} MB at {n}x "
                  f"({scaled_b / base_b:.2f}x)")
        # Map-only contract: these plans must show ZERO shuffle bytes
        # at both scales; any bytes at all is a structural regression
        # (the 0->0 '-' row is the only acceptable state).
        if name in EXPECT_ZERO_SHUFFLE and (base_b > 0 or scaled_b > 0):
            print(f"WARN map-only operator gained shuffle bytes: {name} "
                  f"{mb(base_b)} MB (1x) / {mb(scaled_b)} MB ({n}x) — "
                  "expected 0 at both scales")

    if subset:
        # Merge into a SINGLE incremental section (new rows win over
        # prior subset runs; queries already in the main table keep the
        # incremental row only until the next full rewrite drops the
        # section).
        import re

        try:
            with open("SCALING.md") as f:
                doc = f.read()
        except OSError:
            # Missing artifact must not discard minutes of measurements
            # after the fact — start a fresh document instead.
            doc = ("# SCALING — empirical scale probe "
                   "(tools/scale_probe.py)\n")
        merged: dict[str, tuple] = {}
        # Match ONLY sections probed at THIS scale factor: merging a
        # prior 8x section's rows under a new 4x header would relabel
        # 8x timings as 4x data. Other-N sections are left in place.
        sec_re = re.compile(
            rf"\n## Incremental probe at {n}x \(same protocol\)\n\n"
            r"\| query \|[^\n]*\n\|[-| ]*\n((?:\|[^\n]*\n)*)"
        )
        for m in sec_re.finditer(doc):
            for line in m.group(1).strip().splitlines():
                parts = [p.strip() for p in line.strip("|").split("|")]
                if len(parts) == 4:
                    # pre-bytes-column row: pad the byte cells
                    merged[parts[0]] = tuple(parts) + ("-", "-", "-")
                elif len(parts) == 7:
                    merged[parts[0]] = tuple(parts)
                elif line.strip():
                    print(
                        "WARN scale_probe merge: dropping malformed "
                        f"incremental-section row: {line.strip()!r}",
                        file=sys.stderr,
                    )
        doc = sec_re.sub("", doc)
        for r in rows:
            merged[r[0]] = tuple(str(x) for x in r)
        with open("SCALING.md", "w") as f:
            f.write(doc.rstrip("\n") + "\n")
            f.write(
                f"\n## Incremental probe at {n}x (same protocol)\n\n"
                f"| query | 1x sec | {n}x sec | ratio "
                f"| 1x shuf MB | {n}x shuf MB | bytes ratio |\n"
                "|---|---|---|---|---|---|---|\n"
            )
            for name in sorted(merged):
                f.write("| " + " | ".join(merged[name]) + " |\n")
        print("merged subset into SCALING.md")
        return

    # Preserve appended sections (skew probe, broadcast audit, subset
    # probes) across a full-table rewrite.
    tail = ""
    try:
        with open("SCALING.md") as f:
            old = f.read()
        i = old.find("\n## ")
        if i != -1:
            tail = old[i:]
    except OSError:
        pass
    with open("SCALING.md", "w") as f:
        f.write(
            "# SCALING — empirical scale probe (tools/scale_probe.py)\n\n"
            f"Headline operators on {n}x self-unioned fact tables "
            f"(dims unchanged — they are broadcast sides), base `{sf_dir}`, "
            "best-of-3 (the box sees host-level CPU-steal bursts), local[32]. "
            "A shuffle-linear operator should show "
            f"ratio ≲ {n}; markedly super-linear growth would flag a "
            "quadratic term (join fan-out, candidate blowup) that breaks "
            "at 100 TB. The shuffle-byte columns (peak cumulative "
            "shuffle WRITE bytes across reps, from the driver "
            "AppStatusStore) are the memory dimension: a query can "
            "stay time-linear while its shuffle bytes blow up — bytes "
            f"ratio > {n} flags super-linear state growth even when "
            "wall time hides it behind fixed overheads. Byte deltas "
            "are deterministic (unlike wall time); '-' marks MAP-ONLY "
            "plans (zero shuffle bytes at both scales — the best "
            "scale shape, asserted for the EXPECT_ZERO_SHUFFLE set: "
            "the probe WARNs if one of those ever gains an "
            "exchange).\n\n"
            f"| query | 1x sec | {n}x sec | ratio "
            f"| 1x shuf MB | {n}x shuf MB | bytes ratio |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write("| " + " | ".join(str(x) for x in r) + " |\n")
        f.write(tail)
    print("wrote SCALING.md")

    # Serve probe is part of the committed gate (round-13, verdict
    # item 4): a full-table refresh regenerates the artifact-serving
    # section too, so index-serving regressions — the 100 TB read
    # path — cannot land silently between rounds. Subset runs above
    # return before reaching here; SKIP_SERVE_PROBE=1 opts out when
    # only the main table is wanted.
    if not _os.environ.get("SKIP_SERVE_PROBE"):
        from tools import serve_probe

        serve_probe.run(sf_dir, n)


if __name__ == "__main__":
    main()
