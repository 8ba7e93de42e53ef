"""Direct aggregate-memory-bandwidth probe for the scaling analysis.

P taskset-pinned worker processes each stream a STREAM-triad-style
numpy kernel (a = b + s*c over arrays far larger than LLC); aggregate
GB/s moved vs P shows how far the host's shared memory subsystem
scales with core count.  This is the hardware ceiling any
shuffle-volume-bound BSP superstep inherits on a single-host local[N]
proxy — a real N->4N cluster adds one memory bus per executor instead.

Methodology: all P workers allocate first, then run R barrier-
synchronized timed reps; per level we report the MAX rep (machine
capability — hypervisor steal can only subtract) and the median
(typical).  Single-rep runs on this guest swing 2.5x with steal.

Usage: python scripts/membw_probe.py [levels...]   (default 1 2 4 8 16 32)
Writes BENCH_MEMBW.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

import numpy as np

N = 48_000_000  # 3 float64 arrays x 384 MB/array >> any LLC
WINDOW = 4.0  # seconds per rep
REPS = 5


def worker(cpu: int, q: mp.Queue, barrier):
    os.sched_setaffinity(0, {cpu})
    b = np.full(N, 1.5)
    c = np.full(N, 0.5)
    a = np.empty(N)
    np.add(b, c, out=a)  # warm / fault a
    for _ in range(REPS):
        # every rep window is aligned across workers: no worker's
        # window overlaps another's allocation or idle tail
        barrier.wait()
        t0 = time.monotonic()
        iters = 0
        while time.monotonic() - t0 < WINDOW:
            # triad: reads b,c writes a -> 4*N*8 bytes with RFO
            np.multiply(c, 3.0, out=a)
            np.add(a, b, out=a)
            iters += 1
        dt = time.monotonic() - t0
        q.put(iters * 4 * N * 8 / 1e9 / dt)


def run_level(p: int) -> dict:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(p)
    procs = [mp.Process(target=worker, args=(i, q, barrier)) for i in range(p)]
    for pr in procs:
        pr.start()
    reps = []
    for _ in range(REPS):
        reps.append(sum(q.get() for _ in procs))
    for pr in procs:
        pr.join()
    return {
        "max_gbps": round(max(reps), 1),
        "median_gbps": round(statistics.median(reps), 1),
        "reps_gbps": [round(r, 1) for r in reps],
    }


def main():
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    out = {
        "kernel": f"numpy triad a=b+3c, {N * 8 // 1_000_000}MB arrays, "
        f"{REPS} barrier-synced {WINDOW}s reps per level",
        "levels": {},
    }
    for p in levels:
        r = run_level(p)
        out["levels"][str(p)] = r
        print(
            f"{p:>3} procs: max {r['max_gbps']:7.1f} GB/s  "
            f"median {r['median_gbps']:7.1f}  reps {r['reps_gbps']}",
            flush=True,
        )
    for lo in levels:
        hi = lo * 4
        if str(lo) in out["levels"] and str(hi) in out["levels"]:
            out.setdefault("pair_scaling_4x_max", {})[f"{lo}->{hi}"] = round(
                out["levels"][str(hi)]["max_gbps"]
                / out["levels"][str(lo)]["max_gbps"]
                / 4.0,
                3,
            )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_MEMBW.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out.get("pair_scaling_4x_max", {}), indent=2))


if __name__ == "__main__":
    main()
