#!/bin/bash
# North-rule scaling bench: each phase in its own JVM (run/fork := true,
# one sbt invocation per phase).
set -e
cd /root/repo
N=${SPARK_GRAFT_N:-8}
N4=$((N * 4))
export SPARK_GRAFT_BENCH_DOCS=${SPARK_GRAFT_BENCH_DOCS:-2000000}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
sbt -batch "runMain graft.ScalingBench build"        2>/dev/null | grep '\[scaling\]'
# taskset pins the WHOLE JVM (task slots + GC + shuffle + writer threads)
# to N cpus — local[N] alone caps only task slots, letting auxiliary
# threads borrow the other cores and inflating the small level.
taskset -c 0-$((N - 1))  sbt -batch "runMain graft.ScalingBench measure $N"  2>/dev/null | grep '\[scaling\]'
taskset -c 0-$((N4 - 1)) sbt -batch "runMain graft.ScalingBench measure $N4" 2>/dev/null | grep '\[scaling\]'
sbt -batch "runMain graft.ScalingBench report $N $N4" 2>/dev/null | grep -v '^\[info\] *$' | sed 's/^\[info\] //' | tail -30
