"""All-vs-all conjunction screening benchmark.

The reference screens with a CPU spatial hash (conjunction.zig); here
the two-stage MXU screen (astroz_tpu/screening.py) runs over a
synthetic LEO shell.

Usage: python benchmarks/bench_screening.py [n_sats] [n_times]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_sats = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_times = int(sys.argv[2]) if len(sys.argv) > 2 else 240

    import jax

    sys.path.insert(0, "tests")
    from astroz_tpu import build_catalog
    from astroz_tpu.screening import screen_all

    rng = np.random.default_rng(7)
    lines = []
    for k in range(n_sats):
        incl = 53.0 + rng.uniform(-2, 2)
        raan = rng.uniform(0, 360)
        mo = rng.uniform(0, 360)
        lines.append(f"1 {10000+k:05d}U 98067A   24001.50000000  "
                     f".00000000  00000-0  00000+0 0  9990")
        lines.append(f"2 {10000+k:05d} {incl:8.4f} {raan:8.4f} 0001000 "
                     f" 90.0000 {mo:8.4f} {14.0 + rng.uniform(0, 1.5):11.8f}10")
    cat = build_catalog("\n".join(lines))
    epoch = cat.epochs_jd[0]
    times = epoch + np.linspace(0.0, n_times / 1440.0, n_times)

    # warm the jitted propagate/coarse/refine programs at the real
    # shapes (compile ~10-30 s)
    screen_all(cat, times, threshold_km=10.0)
    t0 = time.perf_counter()
    si, sj, sd, st = screen_all(cat, times, threshold_km=10.0)
    dt = time.perf_counter() - t0
    pairs_checked = n_sats * (n_sats - 1) // 2 * n_times
    print(json.dumps({
        "metric": "allvsall_pairtimes_per_s",
        "value": round(pairs_checked / dt, 1),
        "unit": "pair-times/s",
        "n_sats": n_sats, "n_times": n_times,
        "hits": int(len(si)), "seconds": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
