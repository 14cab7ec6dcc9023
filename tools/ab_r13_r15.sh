#!/bin/sh
# Interleaved cross-round A/B (VERDICT r14 #1): alternate QTime JVMs
# over the r13 worktree (expects a compiled checkout at $R13) and the
# current tree, 3 alternations, so box drift within the window applies
# to both codebases equally. Compare per-code MINS across alternations.
set -e
cd "$(dirname "$0")/.."
R13=${R13:-/tmp/r13ab}
QUERIES=${1:-q_text_curation_e2e,q_corpus_refresh_e2e,q_dedup_ngram_jaccard,q_graph_pagerank,q_curriculum_order}
for i in 1 2 3; do
  echo "=== alternation $i: r15 ==="
  tools/run_main.sh graft.tools.QTime "$QUERIES" 2>&1 | grep qtime | sed 's/^/r15 /'
  echo "=== alternation $i: r13 ==="
  (cd "$R13" && tools/run_main.sh graft.tools.QTime "$QUERIES" 2>&1 | grep qtime | sed 's/^/r13 /')
done
