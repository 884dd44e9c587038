#!/usr/bin/env python3
"""Machine-ceiling calibration for the scaling evidence.

The sandbox advertises 32 vCPUs, but the host does not fully back them:
even a pure-CPU integer spin (zero shared state, zero memory traffic,
zero JVM) loses efficiency when scaling past ~16 workers. The constraint
suite cannot scale better than the machine it runs on, so BENCH/
BASELINE.md reports this ceiling next to the engine numbers.

Method: at each level n, pin n worker processes to cpus 0..n-1 (the same
taskset pinning the bench uses) and have each run an identical
fixed-size integer loop. throughput(n) = n*work/wall; the N->4N ceiling
is throughput(4N) / (4 * throughput(N)).
"""
import json, os, subprocess, sys, time

WORK = 40_000_000

def spin_child():
    t0 = time.time()
    x = 0
    for i in range(WORK):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return time.time() - t0

def run_level(n):
    procs = []
    t0 = time.time()
    for i in range(n):
        p = subprocess.Popen(
            ["taskset", "-c", f"0-{n-1}", sys.executable, __file__, "--child"])
        procs.append(p)
    for p in procs:
        assert p.wait() == 0
    wall = time.time() - t0
    return n * WORK / wall

if __name__ == "__main__":
    if "--child" in sys.argv:
        spin_child()
        sys.exit(0)
    levels = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    thr = {}
    for n in levels:
        thr[n] = run_level(n)
        print(f"level {n}: {thr[n]:.3e} ops/sec", flush=True)
    out = {"throughput": thr}
    for n in levels:
        if n * 4 in thr:
            out[f"ceiling_{n}_to_{n*4}"] = round(thr[n * 4] / (4 * thr[n]), 4)
    print(json.dumps(out))
    with open("BENCH/spin_ceiling.json", "w") as f:
        json.dump(out, f, indent=1)
