#!/bin/sh
# sf10 (100x) dedup-family scale gate — the second scale decade
# (VERDICT r9 Next #3). Three parts:
#   1. regenerate sf1/sf10 fixtures if absent (deterministic);
#   2. ScaleBench the dedup subset at BOTH decades ->
#      BENCH_sf1_dedup.json / BENCH_sf10_dedup.json (per-decade ratios
#      are the committed evidence; the NOTES table reads these);
#   3. Verify + DuckDB-compare at sf10 for the subset whose oracles
#      stay tractable at 500k docs (driver-strict check.py).
set -e
cd "$(dirname "$0")/.."
[ -d testdata/sf1 ] || python3 tools/gen_scale.py 10 /root/testdata/sf0.1 testdata/sf1
[ -d testdata/sf10 ] || python3 tools/gen_scale.py 100 /root/testdata/sf0.1 testdata/sf10
SUBSET=$(grep -v '^#' tools/sf10_dedup_subset.txt | paste -sd, -)
# q_dedup_clusters_dist stays in the TIMED subset (the distributed
# label-propagation tier is exactly what must be benched at 500k docs)
# but leaves the ORACLE subset at sf10: its DuckDB replay is a
# recursive CTE over the full pair set, which exceeds DuckDB's temp
# spill at this scale (measured: >78 GB of duckdb_temp before ENOSPC).
# It stays rows+schema-checked at sf1 and hash-checked at sf0.01.
# q_dedup_simhash REJOINED the oracle subset in r13: the engine's
# exact tier now extends to 1M docs (canonical-cover emission beat
# the old 200k auto-cap posture outright), so the sf10 output is the
# exact pair set again, and the replay's new two-chunk banding keeps
# DuckDB tractable at 500k docs (~36 s).
ORACLE_SUBSET=$(grep -v '^#' tools/sf10_dedup_subset.txt \
  | grep -v '^q_dedup_clusters_dist$' | paste -sd, -)
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} sbt -batch \
  "runMain graft.tools.ScaleBench testdata/sf1 BENCH_sf1_dedup.json $SUBSET" \
  "runMain graft.tools.ScaleBench testdata/sf10 BENCH_sf10_dedup.json $SUBSET" \
  "runMain graft.Verify testdata/sf10 /tmp/verify_sf10 $ORACLE_SUBSET"
python3 tools/check.py testdata/sf10 /tmp/verify_sf10
