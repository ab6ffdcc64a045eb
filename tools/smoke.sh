#!/usr/bin/env bash
# Pre-commit smoke gate (~100 s): one representative spec per planner
# dataflow class — flat agg, keyed min/max, value-equi join, ranked,
# ASOF, session, ROWS frames, session-DISTINCT, approx HLL, key-equi
# residual join — plus restart continuity, snapshot bootstrap, and the
# Debezium adapter. The full 300-test fleet (sbt test, ~11 min serial)
# remains the round gate; this is the fast inner loop.
set -euo pipefail
cd "$(dirname "$0")/.."
exec sbt \
  'testOnly graft.streaming.IncrementalPlannerSpec -- -z "171a " -z "171f " -z "171at " -z "171aq " -z "171bk " -z "171an " -z "171bq " -z "171bs " -z "171bt " -z "171bo "' \
  'testOnly graft.streaming.PlannerRestartSpec -- -z "220a " -z "220c "' \
  'testOnly graft.streaming.PlannerBootstrapSpec -- -z "221a "' \
  'testOnly graft.streaming.DebeziumSpec -- -z "222b "'
