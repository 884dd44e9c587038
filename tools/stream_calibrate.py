#!/usr/bin/env python3
"""Memory-bandwidth ceiling calibration for the scaling evidence.

tools/spin_calibrate.py measures a pure-REGISTER ceiling (no memory
traffic) — the right bound for compute-only scaling. The constraint
suite is not compute-only: its physical work is dominated by memory
streams (tmpfs parquet reads, shuffle spills, string processing, GC
copying), and DRAM bandwidth is a SHARED resource — per-core bandwidth
falls as cores are added long before the core count stops scaling. This
script measures that second ceiling: per worker, repeatedly reduce a
buffer far larger than L3 (numpy sum — a ~1 byte/flop stream that runs
at memory speed), pinned exactly like the bench (taskset 0..n-1).

ceiling_N_to_4N = throughput(4N) / (4 * throughput(N)), like the spin
variant. BENCH/BASELINE.md publishes both ceilings next to the engine
numbers: an engine cannot scale better than min(compute, bandwidth)
allows for its instruction mix.
"""
import json, os, subprocess, sys, time

MB = 512          # per-worker buffer (way beyond L3)
ITERS = 12        # streams per worker → ~6 GB touched per worker

CHILD = r"""
import numpy as np, time, sys
mb = int(sys.argv[1]); iters = int(sys.argv[2])
a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
t0 = time.time(); s = 0.0
for _ in range(iters):
    s += float(a.sum())
dt = time.time() - t0
print(dt)
"""

def run_level(n):
    procs = []
    t0 = time.time()
    for i in range(n):
        p = subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", CHILD, str(MB), str(ITERS)],
            stdout=subprocess.PIPE)
        procs.append(p)
    for p in procs:
        p.wait()
    wall = time.time() - t0
    gb = n * MB * ITERS / 1024.0
    return gb / wall  # aggregate GB/s

def main(levels):
    tp = {}
    for n in levels:
        tp[n] = run_level(n)
        print(f"[stream] {n:2d} workers: {tp[n]:8.2f} GB/s aggregate "
              f"({tp[n]/n:6.2f} GB/s per worker)", file=sys.stderr)
    out = {"throughput_gbps": tp}
    for (a, b) in [(4, 16), (8, 32)]:
        if a in tp and b in tp:
            out[f"ceiling_{a}_to_{b}"] = round(tp[b] / (4 * tp[a]), 4)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/stream_ceiling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

if __name__ == "__main__":
    main([int(x) for x in (sys.argv[1:] or ["4", "8", "16", "32"])])
