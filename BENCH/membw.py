"""Memory-bandwidth ceiling control for the scaling-efficiency evidence.

The flagship pipeline's N→4N efficiency on this single shared host is bounded
above by how the HOST's memory bandwidth scales from N to 4N concurrent
streams — a Spark-free, engine-free property. This control measures it with
a STREAM-triad-style kernel (a = b + k·c over ~256 MB float64 arrays) in P
independent processes (no shared state, no GIL interaction) and reports
aggregate GB/s at each P plus eff(P→4P) = (BW_4P / BW_P) / 4.

If the engine's measured eff at N→4N cores ≈ the triad eff at the same
process counts, the residual is the memory bus, not the engine.

Usage: python BENCH/membw.py [P ...]   (default: 1 2 4 8)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

N = 16_000_000  # floats per array → 3 arrays × 128 MB = 384 MB per process
REPS = 8


def _triad(_):
    import numpy as np

    a = np.zeros(N)
    b = np.random.default_rng(0).random(N)
    c = np.random.default_rng(1).random(N)
    # touch pages before timing
    a[:] = b
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.multiply(c, 3.0, out=a)  # c read, a written
        np.add(a, b, out=a)         # a, b read, a written — no temp array
        dt = time.perf_counter() - t0
        best = min(best, dt)
    bytes_moved = 5 * N * 8  # exactly 5 array passes (no numpy temp)
    return bytes_moved / best / 1e9


def measure(p: int) -> float:
    with mp.get_context("spawn").Pool(p) as pool:
        rates = pool.map(_triad, range(p))
    return sum(rates)


def main():
    ps = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    bw = {p: round(measure(p), 2) for p in ps}
    out = {"triad_gbps_by_procs": bw}
    for p in ps:
        if p * 4 in bw:
            out[f"bw_eff_{p}to{p * 4}"] = round(bw[p * 4] / bw[p] / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
