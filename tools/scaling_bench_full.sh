#!/bin/bash
# Final scaling evidence: build once, measure every level (pinned JVMs),
# then report the N->4N pairs. Levels chosen so that the headline 4->16
# pair sits where the host actually backs its vCPUs (see
# BENCH/spin_ceiling.json: pure-CPU spin efficiency is ~0.95 at 4->16
# but only ~0.68 at 8->32 — the machine, not the engine, caps the
# latter), with 8 and 32 measured anyway for transparency.
#
# Phases launch via tools/run_main.sh (plain java on a classpath
# snapshot) — a full sweep takes tens of minutes and must not hold the
# sbt build lock.
set -e
cd /root/repo
export SPARK_GRAFT_BENCH_DOCS=${SPARK_GRAFT_BENCH_DOCS:-96000000}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
# This VM's anonymous-page first-touch fault path runs at ~15 MB/s per
# thread (~73 MB/s with madvised THP) — measured via
# `java -Xms4g -Xmx4g -XX:+AlwaysPreTouch -version`: 4 GB = 4m22s wall
# without THP, 56 s with. A lazily-grown 48 GB heap therefore pays
# minutes of randomly-placed fault tax across the first runs, swamping
# the engine signal (observed: identical warm assessments at 155 s vs
# 378 s). Pre-touch the whole heap at JVM startup (outside every timed
# region) so runs at every level are fault-free and comparable.
export GRAFT_JAVA_OPTS="-Xms${SPARK_DRIVER_MEM} -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages"
export GRAFT_CLASSES=$(mktemp -d /tmp/graft_classes.XXXX)
cp -r target/scala-2.13/classes/* "$GRAFT_CLASSES/"
trap 'rm -rf "$GRAFT_CLASSES"' EXIT
# stderr goes to a log, not /dev/null: the round-5 sweep died twice and
# the suppressed stderr made the deaths undiagnosable (round-5 verdict)
SWEEP_LOG=${SWEEP_LOG:-BENCH/sweep_stderr.log}
: > "$SWEEP_LOG"
python3 tools/spin_calibrate.py 4 8 16 32 | tail -1
# versioned calibration snapshot (round-5 advice: overwriting the file
# in place desyncs committed data from previously published reports)
[ -n "$SPIN_SNAPSHOT" ] && cp BENCH/spin_ceiling.json "BENCH/$SPIN_SNAPSHOT"
bash tools/run_main.sh ScalingBench build 2>>"$SWEEP_LOG" | grep '\[scaling\]'
for N in 4 8 16 32; do
  taskset -c 0-$((N - 1)) bash tools/run_main.sh ScalingBench measure $N 2>>"$SWEEP_LOG" | grep '\[scaling\]'
done
bash tools/run_main.sh ScalingBench report 4 16 2>>"$SWEEP_LOG"
