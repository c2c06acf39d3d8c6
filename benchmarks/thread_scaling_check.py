#!/usr/bin/env python3
"""CI gate: the native host engine must scale across threads.

The reference's headline is a 16-thread batch-range loop
(Constellation.zig:337-385, README.md:35-45); our analogue is
native.sgp4_grid threading over satellite ranges with the GIL released.
This script times the same grid at 1 thread and at min(4, cpu_count)
threads and asserts speedup >= the floor (default 1.8 on >=4 cores) —
so a broken thread path (e.g. the GIL not released, or rows overlapping)
fails CI instead of silently serializing.

Usage: python benchmarks/thread_scaling_check.py [n_sats] [n_times]
Exits 0 with a SKIP note on hosts with < 4 cores.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_sats = int(args[0]) if args else 2000
    n_times = int(args[1]) if len(args) > 1 else 600

    cores = os.cpu_count() or 1
    if cores < 4:
        print(f"SKIP: host has {cores} cores (< 4); thread-scaling "
              "check needs a multi-core runner")
        return 0

    import jax

    jax.config.update("jax_platforms", "cpu")
    from astroz_tpu import native
    from astroz_tpu.constants import WGS72
    from astroz_tpu.ops.sgp4 import sgp4_init_np
    from astroz_tpu.propagation import catalog_from_elements

    if native.get_lib() is None:
        print("SKIP: native library unavailable (no compiler?)")
        return 0

    rng = np.random.default_rng(5)
    two_pi = 2 * np.pi
    fields = dict(
        no_kozai=rng.uniform(12.0, 16.0, n_sats) * two_pi / 1440.0,
        ecco=rng.uniform(1e-4, 0.02, n_sats),
        inclo=rng.uniform(0.3, 1.8, n_sats),
        nodeo=rng.uniform(0, two_pi, n_sats),
        argpo=rng.uniform(0, two_pi, n_sats),
        mo=rng.uniform(0, two_pi, n_sats),
        bstar=rng.uniform(-1e-4, 5e-4, n_sats),
        epoch_jd=np.full(n_sats, 2460310.5))
    cat = catalog_from_elements(sgp4_init_np(WGS72, **fields), WGS72)
    vecs = cat.scalar_vecs
    if vecs is None:
        print("SKIP: scalar vec packing unavailable")
        return 0
    tsince = np.broadcast_to(
        np.linspace(0.0, 1440.0, n_times), (n_sats, n_times)).copy()

    def timed(threads: int) -> float:
        os.environ["ASTROZ_NATIVE_THREADS"] = str(threads)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            err, r, v = native.sgp4_grid(vecs, tsince)
            best = min(best, time.perf_counter() - t0)
        assert (err == 0).all()
        return best

    timed(1)  # warm caches/pages
    t1 = timed(1)
    tn = timed(min(4, cores))
    rate1 = n_sats * n_times / t1
    raten = n_sats * n_times / tn
    speedup = t1 / tn
    floor = float(os.environ.get("ASTROZ_THREAD_SCALING_FLOOR", "1.8"))
    print(f"1 thread: {rate1/1e6:.1f}M props/s   "
          f"{min(4, cores)} threads: {raten/1e6:.1f}M props/s   "
          f"speedup {speedup:.2f}x (floor {floor})")
    if speedup < floor:
        print("FAIL: thread scaling below floor")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
