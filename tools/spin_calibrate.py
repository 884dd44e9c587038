#!/usr/bin/env python3
"""Machine-ceiling calibration for the scaling evidence.

The sandbox advertises 32 vCPUs, but the host does not fully back them:
even a pure-CPU integer spin (zero shared state, zero memory traffic,
zero JVM) loses efficiency when scaling past ~16 workers. The constraint
suite cannot scale better than the machine it runs on, so BENCH/
BASELINE.md reports this ceiling next to the engine numbers.

Method: at each level n, pin n worker processes to cpus 0..n-1 (the same
taskset pinning the bench uses) and have each run an identical
fixed-size integer loop. throughput(n) = n*work/wall.

The host's vCPU backing fluctuates ~3x between measurement windows, so
ceilings are published two ways:
 - per-level BEST across windows (the merged ceiling; can exceed 1.0
   because the levels may come from different windows — it is an upper
   envelope, not a real operating point);
 - the best SINGLE window (all levels measured in one pass, highest
   aggregate throughput) — a real operating point the host actually
   exhibited. Headline relative-efficiency figures in BENCH/BASELINE.md
   use the merged ceiling (conservative for the engine claim) and cite
   the single-window one next to it.
"""
import json, os, subprocess, sys, time

WORK = 40_000_000
WINDOWS = int(os.environ.get("SPIN_WINDOWS", "5"))

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

def ceilings(thr, levels):
    out = {}
    for n in levels:
        if n * 4 in thr and thr.get(n):
            out[f"ceiling_{n}_to_{n*4}"] = round(thr[n * 4] / (4 * thr[n]), 4)
    return out

if __name__ == "__main__":
    if "--child" in sys.argv:
        spin_child()
        sys.exit(0)
    levels = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    windows = []  # one {level: throughput} dict per window
    for w in range(WINDOWS):
        thr = {}
        for n in levels:
            thr[n] = run_level(n)
        windows.append(thr)
        print(f"window {w}: " +
              ", ".join(f"{n}:{thr[n]:.3e}" for n in levels), flush=True)
    best = {n: max(w[n] for w in windows) for n in levels}
    # best single window = highest aggregate throughput (a real operating
    # point: every level measured back-to-back in one host window)
    best_w = max(range(len(windows)), key=lambda i: sum(windows[i].values()))
    out = {
        "throughput_best_window": best,
        "windows": WINDOWS,
        "per_window_throughput": [{str(n): w[n] for n in levels} for w in windows],
        "note": ("merged ceilings use per-level BEST across windows (upper "
                 "envelope, may exceed 1.0); best_single_window_* is one real "
                 "host operating point (window with max aggregate throughput)"),
        "best_single_window_index": best_w,
    }
    out.update(ceilings(best, levels))
    out.update({f"best_single_window_{k}": v
                for k, v in ceilings(windows[best_w], levels).items()})
    print(json.dumps({k: v for k, v in out.items() if k != "per_window_throughput"}))
    with open("BENCH/spin_ceiling.json", "w") as f:
        json.dump(out, f, indent=1)
