#!/bin/sh
# sf1 (10x) oracle gate — the scale-up CI habit (VERDICT r8 Next #3):
# regenerate the fixture if absent, dump the tractable-oracle subset
# through Verify, DuckDB-compare with the driver-strict checker.
# The excluded queries are the documented SF-bounded metric/audit faces
# (quadratic exact-truth oracles: lsh_recall, clusters, cosine_exact)
# and the heavy ANN k-means oracle replays — their CORRECTNESS is
# certified at sf0.01 by the driver gate; sf1 covers them via Bench
# wall-time ratios instead.
set -e
cd "$(dirname "$0")/.."
[ -d testdata/sf1 ] || python3 tools/gen_scale.py 10 /root/testdata/sf0.1 testdata/sf1
SUBSET=$(grep -v '^#' tools/sf1_subset.txt | paste -sd, -)
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} sbt -batch \
  "runMain graft.Verify testdata/sf1 /tmp/verify_sf1 $SUBSET"
python3 tools/check.py testdata/sf1 /tmp/verify_sf1
