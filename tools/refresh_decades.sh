#!/bin/sh
# Full same-session refresh of ALL FIVE committed decade pairs
# (VERDICT r13 #1/#3): one vintage for every BENCH_sf1_*/BENCH_sf10_*
# file, so per-decade ratios never mix box/session conditions across
# rounds (r13's one red gate row was exactly such a mixed-vintage
# echo). Run after any fixture regeneration (tools/gen_scale.py
# changed in r14: events.value per-copy offset + the stripe-PNG block
# term both reshape the sf1/sf10 workloads).
#
# Produces the five pair files, then runs the machine gate. The sf10
# ORACLE subsets stay with their family scripts (check_sf10_dedup.sh,
# check_sf10_newops.sh, check_sf10_r10b.sh) and check_sf1.sh.
set -e
cd "$(dirname "$0")/.."

# Fixture staleness is EXPLICIT (ADVICE r14): each fixture dir carries
# a fingerprint (sha256 of gen_scale.py + its K) written at generation
# time; a gen_scale.py edit or K change regenerates automatically. A
# bare [ -d ] test silently benchmarked STALE fixtures whenever the
# generator changed under a pre-existing dir — the mixed-vintage
# hazard this script exists to prevent.
GENFP=$(sha256sum tools/gen_scale.py | cut -d' ' -f1)
ensure_fixture() { # K dir
  want="$GENFP K=$1"
  have=$(cat "$2/.gen_fingerprint" 2>/dev/null || true)
  if [ "$have" != "$want" ]; then
    echo "[refresh_decades] (re)generating $2 (fingerprint ${have:-absent} != $want)"
    rm -rf "$2"
    python3 tools/gen_scale.py "$1" /root/testdata/sf0.1 "$2"
    printf '%s' "$want" > "$2/.gen_fingerprint"
  fi
}
ensure_fixture 10 testdata/sf1
ensure_fixture 100 testdata/sf10

DEDUP=$(grep -v '^#' tools/sf10_dedup_subset.txt | paste -sd, -)
NEWOPS=q_text_span_corrupt,q_corpus_manifest,q_text_lm_backoff,q_text_index_search,q_text_inverted_index,q_ann_hard_negatives,q_text_lm_backoff3,q_text_wordlist_tags,q_text_unk_rare,q_sample_group_split,q_source_overlap,q_dedup_cdc_chunks,q_ann_random_project,q_text_bpe_fertility,q_text_langid_confusion,q_text_truncate,q_text_chat_template,q_sft_preference_pairs,q_k_orc_roundtrip,q_text_width_fold,q_sample_unimax
R13=q_agg_pivot,q_agg_rollup,q_event_funnel,q_event_retention,q_graph_pagerank,q_k_zstd_roundtrip,q_layout_incremental_rollup,q_layout_merge_upsert,q_mm_dhash_clusters,q_order_iclm,q_schema_evolution,q_text_html_extract,q_text_mad_gate,q_text_top_ngrams,q_window_range_frame
# r14: q_mm_dhash_neardup joins the e2e pair — gated for the first
# time now that the stripe fixture's print space grows with the corpus
E2E=q_audio_fingerprint_pairs,q_corpus_refresh_e2e,q_decontaminate_fuzzy,q_j8_skew_split_join,q_mm_dhash,q_mm_dhash_neardup,q_mm_resize,q_pipeline_e2e,q_sample_dsir_resample,q_text_bpe_encode,q_text_curation_e2e,q_text_lm_buckets,q_text_packing,q_text_tfidf,q_text_winnow_pairs,q_url_canonical_dedup
SIM=q_ann_topk_ivf,q_ann_topk_ivfpq,q_ann_topk_ivfpq_rerank,q_ann_topk_lsh,q_ann_topk_pq,q_ann_topk_pq_rerank,q_dedup_embedding_cosine,q_dedup_semantic,q_embed_seed_gate,q_sample_cluster_balanced

run() { # main args...
  tools/run_main.sh "$@"
}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
run graft.tools.ScaleBench testdata/sf1  BENCH_sf1_dedup.json   "$DEDUP"
run graft.tools.ScaleBench testdata/sf10 BENCH_sf10_dedup.json  "$DEDUP"
run graft.tools.ScaleBench testdata/sf1  BENCH_sf1_newops.json  "$NEWOPS"
run graft.tools.ScaleBench testdata/sf10 BENCH_sf10_newops.json "$NEWOPS"
run graft.tools.ScaleBench testdata/sf1  BENCH_sf1_r13.json     "$R13"
run graft.tools.ScaleBench testdata/sf10 BENCH_sf10_r13.json    "$R13"
run graft.tools.ScaleBench testdata/sf1  BENCH_sf1_e2e.json     "$E2E"
run graft.tools.ScaleBench testdata/sf10 BENCH_sf10_e2e.json    "$E2E"
run graft.tools.ScaleBench testdata/sf1  BENCH_sf1_sim.json     "$SIM"
run graft.tools.ScaleBench testdata/sf10 BENCH_sf10_sim.json    "$SIM"
python3 tools/check_decades.py
