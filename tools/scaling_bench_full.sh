#!/bin/bash
# Final scaling evidence: build once, measure every level (pinned JVMs),
# then report the N->4N pairs. Levels chosen so that the headline 4->16
# pair sits where the host actually backs its vCPUs (see
# BENCH/spin_ceiling.json: pure-CPU spin efficiency is ~0.95 at 4->16
# but only ~0.68 at 8->32 — the machine, not the engine, caps the
# latter), with 8 and 32 measured anyway for transparency.
set -e
cd /root/repo
export SPARK_GRAFT_BENCH_DOCS=${SPARK_GRAFT_BENCH_DOCS:-24000000}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
python3 tools/spin_calibrate.py 4 8 16 32 | tail -1
sbt -batch "runMain graft.ScalingBench build" 2>/dev/null | grep '\[scaling\]'
for N in 4 8 16 32; do
  taskset -c 0-$((N - 1)) sbt -batch "runMain graft.ScalingBench measure $N" 2>/dev/null | grep '\[scaling\]'
done
sbt -batch "runMain graft.ScalingBench report 4 16" 2>/dev/null | grep -v '^\[info\] *$' | sed 's/^\[info\] //' | tail -40
