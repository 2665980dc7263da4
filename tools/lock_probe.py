"""Measure writer-lock acquisition cost under real multi-process
contention (VERDICT r6 stretch item 9): the flock single-writer
boundary's claim of "costs nothing measurable" should carry a number
under LOAD, not just on the quiet path.

N worker processes each run K acquire → hold(h) → release cycles on
the SAME database's lock; every acquisition's wait time is recorded.
The uncontended baseline is one process doing the same cycles alone.
Expected shape: uncontended acquisition is ~0.1 ms (open+flock+write);
contended waits cluster around (N-1)/2 × (hold + poll quantum) — the
0.05 s retry sleep in write_lock bounds the busy-wait overhead and is
the main latency quantum a waiter pays beyond the actual hold time.

Run: python tools/lock_probe.py  (prints one JSON line; numbers are
recorded in SCALE_NOTES.md)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROCS = 6
N_CYCLES = 20
HOLD_S = 0.01


def _worker(root: str, out_q, cycles: int, hold_s: float) -> None:
    from industrial_data_pipeline_spark.catalog.store import ParquetStore
    store = ParquetStore(None, root)  # lock path only — no Spark use
    waits = []
    for _ in range(cycles):
        t0 = time.perf_counter()
        with store.write_lock("probe", timeout_s=120.0):
            waits.append(time.perf_counter() - t0)
            time.sleep(hold_s)
    out_q.put(waits)


def _run(n_procs: int, cycles: int, hold_s: float, root: str) -> list:
    q = mp.get_context("spawn").Queue()
    procs = [mp.get_context("spawn").Process(
        target=_worker, args=(root, q, cycles, hold_s))
        for _ in range(n_procs)]
    for p in procs:
        p.start()
    waits = [w for _ in procs for w in q.get()]
    for p in procs:
        p.join()
    assert all(p.exitcode == 0 for p in procs), "a worker failed"
    return waits


def main() -> None:
    root = tempfile.mkdtemp(prefix="idp_lock_probe_")
    t0 = time.perf_counter()
    base = _run(1, N_CYCLES, HOLD_S, root)
    cont = _run(N_PROCS, N_CYCLES, HOLD_S, root)
    wall = time.perf_counter() - t0

    def stats(w):
        ws = sorted(w)
        return {"n": len(ws),
                "median_ms": round(statistics.median(ws) * 1e3, 2),
                "p95_ms": round(ws[int(0.95 * len(ws))] * 1e3, 2),
                "max_ms": round(ws[-1] * 1e3, 2)}

    print(json.dumps({
        "metric": "writer_lock_contention",
        "procs": N_PROCS, "cycles": N_CYCLES, "hold_ms": HOLD_S * 1e3,
        "uncontended": stats(base), "contended": stats(cont),
        "throughput_locks_per_s": round(
            (N_PROCS * N_CYCLES) / wall, 1)}))


if __name__ == "__main__":
    main()
