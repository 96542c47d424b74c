#!/usr/bin/env python
"""Memory-bandwidth envelope probe for the scaling-efficiency analysis.

The round-3 zero-steal run showed per-core CLOCK flat from 4 to 16 busy
cores (spin loop: register-bound) while per-CPU crawl throughput still
decayed ~24%. A spin loop exercises no memory; the crawl's Python
string/HTML work is memory-heavy. This probe measures the ACTUAL
per-process memory bandwidth at 1 / 4 / 16 / 32 concurrent processes:
each worker repeatedly copies a 64 MB numpy buffer (far beyond LLC) for
a fixed wall window and reports GB/s. If per-proc bandwidth decays with
process count on the same shape as the crawl's per-CPU throughput, the
scaling residual is the HOST's shared memory subsystem — a component a
real multi-node cluster multiplies per node — not engine overhead.

Usage: python tools/membw_probe.py  → one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def worker(seconds: float, out_q) -> None:
    import numpy as np

    src = np.ones(64 * 1024 * 1024 // 8, dtype=np.float64)  # 64 MB
    dst = np.empty_like(src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    elapsed = time.perf_counter() - t0
    # one copy touches 2 × 64 MB (read + write)
    out_q.put(n * 2 * src.nbytes / elapsed / 1e9)


def run_level(nproc: int, seconds: float = 4.0) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=worker, args=(seconds, q)) for _ in range(nproc)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    total = sum(rates)
    return {
        "nproc": nproc,
        "per_proc_gbps": round(total / nproc, 2),
        "total_gbps": round(total, 2),
    }


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    s0 = steal_jiffies()
    levels = [run_level(n) for n in (1, 4, 16, 32)]
    base = levels[0]["per_proc_gbps"]
    for lv in levels:
        lv["vs_1proc"] = round(lv["per_proc_gbps"] / base, 3)
    print(
        json.dumps(
            {
                "metric": "membw_envelope",
                "levels": levels,
                "steal_jiffies_during": steal_jiffies() - s0,
            }
        )
    )


if __name__ == "__main__":
    main()
