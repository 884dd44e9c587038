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

Measurement discipline (learned the hard way in round 5): the child
times ONLY the reduction loop. First-touch page faulting of a fresh
anonymous buffer on this sandbox VM can run at single-digit MB/s of
pure sys time — ~50x slower than the stream it precedes — so a
wall-clock that includes allocation measures the host's page-fault
path, not its DRAM bandwidth (observed: 0.8 "GB/s" aggregate where the
stream region alone does ~2 GB/s per worker). Protocol: each child
allocates + warm-passes its buffer, prints "ready", and blocks on
stdin; the parent releases every child at once only after ALL are
ready, so the timed regions overlap no matter how long faulting took.
Aggregate = total bytes / max(child stream dt) — the conservative
choice: a straggling child only lowers the estimate.

ceiling_N_to_4N = throughput(4N) / (4 * throughput(N)), like the spin
variant. BENCH/BASELINE.md publishes both ceilings next to the engine
numbers: an engine cannot scale better than min(compute, bandwidth)
allows for its instruction mix.
"""
import json, os, subprocess, sys

MB = 256          # per-worker buffer (way beyond L3)
ITERS = 24        # streams per worker -> ~6 GB touched per worker

CHILD = r"""
import numpy as np, time, sys
mb = int(sys.argv[1]); iters = int(sys.argv[2])
a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
float(a.sum())                      # warm pass: TLB + any lazy COW
print("ready", flush=True)
sys.stdin.readline()                # barrier: parent releases all at once
t0 = time.time(); s = 0.0
for _ in range(iters):
    s += float(a.sum())
print(time.time() - t0, flush=True)
"""


def run_level(n):
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", CHILD,
             str(MB), str(ITERS)],
            stdout=subprocess.PIPE, stdin=subprocess.PIPE, text=True)
        for i in range(n)
    ]
    for p in procs:                 # wait for every buffer to exist
        assert p.stdout.readline().strip() == "ready"
    for p in procs:                 # release together
        p.stdin.write("go\n")
        p.stdin.flush()
    dts = [float(p.stdout.readline()) for p in procs]
    for p in procs:
        p.wait()
    gb = n * MB * ITERS / 1024.0
    return gb / max(dts)  # aggregate GB/s over the overlapped window


def main(levels):
    tp = {}
    for n in levels:
        tp[n] = run_level(n)
        print(f"[stream] {n:2d} workers: {tp[n]:8.2f} GB/s aggregate "
              f"({tp[n]/n:6.2f} GB/s per worker)", file=sys.stderr)
    out = {"throughput_gbps": tp,
           "note": ("child-timed stream region only (allocation/page-fault "
                    "excluded), ready/go barrier overlap, aggregate = "
                    "bytes / max(child dt)")}
    for (a, b) in [(4, 16), (8, 32)]:
        if a in tp and b in tp:
            out[f"ceiling_{a}_to_{b}"] = round(tp[b] / (4 * tp[a]), 4)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/stream_ceiling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main([int(x) for x in (sys.argv[1:] or ["4", "8", "16", "32"])])
