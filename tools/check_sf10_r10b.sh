#!/bin/sh
# sf1 (10x) + sf10 (100x) scale gate for the round-10 continuation
# operators (HTML extraction, PageRank, duplicated-n-gram audit, MAD
# gate, MERGE upsert, rollup/pivot, funnel/retention, schema evolution,
# incremental rollup, range-frame window, zstd, ICLM, image clusters):
# ScaleBench at both decades for wall ratios, then Verify + the
# driver-strict DuckDB compare at sf10 on the tractable-oracle subset.
#
# Excluded from the sf10 ORACLE subset (timed only), with reasons:
#  - q_order_iclm: the DuckDB greedy-chain replay is a recursive CTE of
#    ~12k hops per cluster at 200k vectors — oracle cost, not engine
#    cost; hash-checked at sf0.001/sf0.01 (500 vectors, full chains).
#  - q_mm_dhash_clusters: the pair-graph recursive-CTE components
#    replay explodes past DuckDB temp space at the sf10 graph size
#    (same adjudication as q_dedup_clusters_dist in
#    check_sf10_dedup.sh); hash-checked at sf0.001/sf0.01. Its TIMED
#    sf10 leg is the regression canary for the label-propagation
#    lineage fix.
#  - q_text_top_ngrams: ~200M gram rows in the DuckDB replay at sf10 —
#    measured oracle cost only; hash-checked through sf1.
#  - q_graph_pagerank: the 3-round CTE unroll materializes the 60M-row
#    orders⋈lineitem edge join per round — DuckDB needed >124 GB of
#    temp_directory and died ENOSPC twice (first run and a retry with
#    temp pointed at the 77 GB-free volume). Hash-checked through sf1
#    (tools/sf1_subset.txt); at sf10 the Spark output passes the
#    invariant check instead (100 rows, integer ranks, schema) —
#    engine wall 42.6 s for the 60M-edge 3-round iteration.
set -e
cd "$(dirname "$0")/.."
[ -d testdata/sf1 ] || python3 tools/gen_scale.py 10 /root/testdata/sf0.1 testdata/sf1
[ -d testdata/sf10 ] || python3 tools/gen_scale.py 100 /root/testdata/sf0.1 testdata/sf10
SUBSET=q_text_html_extract,q_graph_pagerank,q_text_top_ngrams,q_text_mad_gate,q_layout_merge_upsert,q_agg_rollup,q_agg_pivot,q_event_funnel,q_event_retention,q_schema_evolution,q_layout_incremental_rollup,q_window_range_frame,q_k_zstd_roundtrip,q_order_iclm,q_mm_dhash_clusters
ORACLE_SUBSET=q_text_html_extract,q_text_mad_gate,q_layout_merge_upsert,q_agg_rollup,q_agg_pivot,q_event_funnel,q_event_retention,q_schema_evolution,q_layout_incremental_rollup,q_window_range_frame,q_k_zstd_roundtrip
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} sbt -batch \
  "runMain graft.tools.ScaleBench testdata/sf1 BENCH_sf1_r10b.json $SUBSET" \
  "runMain graft.tools.ScaleBench testdata/sf10 BENCH_sf10_r10b.json $SUBSET" \
  "runMain graft.Verify testdata/sf10 /tmp/verify_sf10_r10b $ORACLE_SUBSET"
python3 tools/check.py testdata/sf10 /tmp/verify_sf10_r10b
