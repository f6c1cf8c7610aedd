#!/usr/bin/env python
"""Host-environment probe: fixed, code-independent microbenchmarks that
calibrate the machine the bench suite runs on, so BENCH_r{N} deltas can
be attributed (code regression vs host slowdown) with evidence instead
of guessing. Round-9 origin: BENCH_r07->r08 drifted 1.233x geo-mean on
147 UNTOUCHED common keys, and at round-9 start the same probe keys ran
~2x slower than their r7 records with BOTH the r7 checkout and HEAD —
i.e., the host, not the code (SCALING.md "round-9 bench drift
attribution"). Run with no Spark jobs active; prints one JSON line.

Probes (all fixed workloads, no repo code):
  st_loop_ms     single-thread pure-Python loop (interpreter + CPU clock)
  mt_scale       32-process speedup of the same loop (CPU contention view)
  blas_ms        numpy 1024^2 matmul x8 (vector units / BLAS threads)
  disk_read_ms   read every byte of sf0.1 lineitem.parquet (page cache
                 dropped best-effort by reading with O_DIRECT-ish large
                 chunks; still an upper bound on cache effects)
  steal_pct      /proc/stat steal ticks over a 1 s window (VM neighbors)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _loop(n: int = 4_000_000) -> int:
    s = 0
    for i in range(n):
        s += i & 7
    return s


def st_loop_ms() -> float:
    t0 = time.perf_counter()
    _loop()
    return (time.perf_counter() - t0) * 1000


def mt_scale(workers: int = 32) -> float:
    t1 = st_loop_ms()
    t0 = time.perf_counter()
    with mp.Pool(workers) as p:
        p.map(_loop, [4_000_000] * workers)
    wall = (time.perf_counter() - t0) * 1000
    return round(workers * t1 / wall, 2)


def blas_ms() -> float:
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random((1024, 1024))
    b = rng.random((1024, 1024))
    a @ b  # warm
    t0 = time.perf_counter()
    for _ in range(8):
        a @ b
    return (time.perf_counter() - t0) * 1000


def disk_read_ms(path: str) -> float:
    t0 = time.perf_counter()
    with open(path, "rb") as f:
        while f.read(1 << 22):
            pass
    return (time.perf_counter() - t0) * 1000


def steal_pct() -> float:
    def ticks():
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)

    s0, t0 = ticks()
    time.sleep(1.0)
    s1, t1 = ticks()
    return round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)


def main() -> None:
    li = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ) + "/lineitem.parquet"
    out = {
        "st_loop_ms": round(st_loop_ms(), 1),
        "mt_scale_32": mt_scale(),
        "blas_ms": round(blas_ms(), 1),
        "disk_read_ms": round(disk_read_ms(li), 1),
        "steal_pct": steal_pct(),
        "nproc": os.cpu_count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
