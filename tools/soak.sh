#!/usr/bin/env bash
# Flake-soak harness — the analog of the reference's main/test-mr-many.sh
# (lines 15-22: re-run the suite N times to flush rare scheduling races,
# fail on first red). Targets the suites with genuine concurrency and
# process-level fault injection — streaming micro-batches, task-retry
# crash recovery, executor-JVM kill, straggler speculation, the mrout
# commit protocol, stage-parallelism observation — exactly the 1-in-20
# flake candidates a single green run cannot clear.
#
# Usage: tools/soak.sh [N]          (default 10)
#        SOAK_SUITES="..." tools/soak.sh 5
set -u
N="${1:-10}"
SUITES="${SOAK_SUITES:-graft.streaming.EventStreamsSpec graft.mr.FaultToleranceSpec graft.mr.ExecutorLossSpec graft.mr.SpeculationSpec graft.sources.MrOutSourceSpec graft.mr.ParallelismSpec}"
cd "$(dirname "$0")/.."
mkdir -p target
for i in $(seq 1 "$N"); do
  echo "[soak] iteration $i/$N: $(date -u +%H:%M:%SZ)"
  if ! sbt -batch "testOnly $SUITES" > "target/soak-$i.log" 2>&1; then
    echo "[soak] FAILED at iteration $i — see target/soak-$i.log"
    tail -40 "target/soak-$i.log"
    exit 1
  fi
done
echo "[soak] $N/$N iterations green"
