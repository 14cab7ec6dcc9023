#!/bin/sh
# sf10 (100x) scale gate for the third-pass round-10 operators (span
# corruption, corpus manifest, Stupid Backoff LM, keyword retrieval,
# hard negatives): ScaleBench at sf1 AND sf10 for per-decade wall
# ratios, then Verify + driver-strict DuckDB compare at sf10.
# q_ann_hard_negatives stays in the TIMED subset but leaves the sf10
# ORACLE subset: its DuckDB replay materializes the probe x corpus
# position join (~10^8 rows at 200k vectors) - oracle cost, not engine
# cost; it is hash-checked at sf0.001/sf0.01/sf1.
set -e
cd "$(dirname "$0")/.."
[ -d testdata/sf1 ] || python3 tools/gen_scale.py 10 /root/testdata/sf0.1 testdata/sf1
[ -d testdata/sf10 ] || python3 tools/gen_scale.py 100 /root/testdata/sf0.1 testdata/sf10
# q_dedup_cdc_chunks also leaves the sf10 ORACLE subset: its DuckDB
# replay is ~23 s at sf1 (measured) and scales linearly with corpus
# chars (~4 min at sf10) - again oracle cost; it is hash-checked at
# sf0.001/sf0.01/sf1.
SUBSET=q_text_span_corrupt,q_corpus_manifest,q_text_lm_backoff,q_text_index_search,q_text_inverted_index,q_ann_hard_negatives,q_text_lm_backoff3,q_text_wordlist_tags,q_text_unk_rare,q_sample_group_split,q_source_overlap,q_dedup_cdc_chunks,q_ann_random_project,q_text_bpe_fertility,q_text_langid_confusion,q_text_truncate,q_text_chat_template,q_sft_preference_pairs,q_k_orc_roundtrip,q_text_width_fold,q_sample_unimax
ORACLE_SUBSET=q_text_span_corrupt,q_corpus_manifest,q_text_lm_backoff,q_text_index_search,q_text_inverted_index,q_text_lm_backoff3,q_text_wordlist_tags,q_text_unk_rare,q_sample_group_split,q_source_overlap,q_ann_random_project,q_text_bpe_fertility,q_text_langid_confusion,q_text_truncate,q_text_chat_template,q_sft_preference_pairs,q_k_orc_roundtrip,q_text_width_fold,q_sample_unimax
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} sbt -batch \
  "runMain graft.tools.ScaleBench testdata/sf1 BENCH_sf1_newops.json $SUBSET" \
  "runMain graft.tools.ScaleBench testdata/sf10 BENCH_sf10_newops.json $SUBSET" \
  "runMain graft.Verify testdata/sf10 /tmp/verify_sf10_newops $ORACLE_SUBSET"
python3 tools/check.py testdata/sf10 /tmp/verify_sf10_newops
