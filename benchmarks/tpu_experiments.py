#!/usr/bin/env python3
"""One-command TPU experiment battery (run when a real chip is attached).

Covers the open tuning/diagnosis items that need silicon:
  1. looped-vs-dispatch headline comparison (bench.py's two modes)
  2. fused-merge kernel (time_block, sat_block) retune — the merge
     epilogue adds per-block one-hot MXU work, so the plain shallow
     kernel's tuned (8, 1024) tile may not be optimal here
  3. the XLA-engine deep-subset anomaly (measured ~3 s/sweep on TPU in
     round 2 vs ~1 ms for the Pallas deep kernel; fine on CPU)

Usage: python benchmarks/tpu_experiments.py [--quick]
Each section prints its own timing lines; nothing is persisted.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _slope(fn, fetch, k1=1, k2=2, reps=1):
    """Min-wall slope timing (see bench.py): pipelined enqueue, fetch
    only the tail, difference of two run lengths."""
    fetch(fn())  # warm
    t_small = float("inf")
    t_big = float("inf")
    for _ in range(reps):
        for k, slot in ((k1, "s"), (k2, "b")):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                last = fn()
            fetch(last)
            w = time.perf_counter() - t0
            if slot == "s":
                t_small = min(t_small, w)
            else:
                t_big = min(t_big, w)
    e = (t_big - t_small) / (k2 - k1)
    return e if e > 0 else t_big / k2


def main():
    quick = "--quick" in sys.argv[1:]
    import jax
    import jax.numpy as jnp

    import astroz_tpu  # noqa: F401
    from bench import synthetic_catalog

    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform})")
    interp = dev.platform == "cpu"  # CPU smoke: Pallas interpret mode
    n_sats = 2048 if quick else 13478
    n_times = 288 if quick else 1440
    os.environ.setdefault("ASTROZ_BENCH_SATS", str(n_sats))
    os.environ.setdefault("ASTROZ_BENCH_TIMES", str(n_times))

    cat = synthetic_catalog(n_sats)
    props = n_sats * n_times

    # ---- 2. fused-merge tile retune --------------------------------
    from astroz_tpu.ops.pallas_sgp4 import (_unpack_outs,
                                            propagate_deep_pallas,
                                            propagate_fast_pallas_sep_merge)
    from astroz_tpu.propagation import _resonance_window

    import functools

    import jax as _jax
    from astroz_tpu.ops.pallas_sgp4 import build_merge_staging

    tsince = np.arange(n_times, dtype=np.float64)
    t_time = jnp.asarray(tsince)
    t_sat, t_sat_deep, _, _ = cat.fast_staging
    res_steps = 4
    res_window = _resonance_window(cat.deep_epochs_jd)

    print("\n# fused-merge tile sweep (ms/sweep, min-wall slope;"
          " in-program table build, uniform across tiles):")
    tiles = ((8, 1024), (16, 1024), (32, 1024), (8, 2048),
             (16, 2048), (8, 512), (16, 512), (32, 512))
    if interp:  # CPU smoke: interpret mode is ~1000x slower
        tiles = ((8, 1024), (8, 512))
    for tb, sb in tiles:
        try:
            # staging (perm/onehot/keep and the deep kernel outputs)
            # depends on sat_block — rebuild per tile
            perm, onehot, keep, k_width, g = build_merge_staging(
                cat.deep_idx, len(cat), sb)
            if k_width > 256:
                print(f"  ({tb:3d}, {sb:5d}): skipped (K={k_width})")
                continue
            perm = np.asarray(perm)

            def take(x):
                return x[perm] if getattr(x, "ndim", 0) else x

            els_p = jax.tree_util.tree_map(take, cat.els_deep)
            deep_p = jax.tree_util.tree_map(take, cat.deep_sub)
            tsd_p = t_time[:, None] - jnp.asarray(
                np.asarray(t_sat_deep)[perm])[None, :]
            width = els_p.no_kozai.shape[0]
            deep_sb = max(d for d in (256, 128, 64, 32, 16, 8)
                          if width % d == 0)
            oh = jnp.asarray(onehot)
            kp = jnp.asarray(keep)

            def sweep(tb=tb, sb=sb, els_p=els_p, deep_p=deep_p,
                      tsd_p=tsd_p, oh=oh, kp=kp, g=g,
                      deep_sb=deep_sb):
                d_outs = propagate_deep_pallas(
                    els_p, deep_p, tsd_p, cat.grav,
                    resonance_steps=res_steps, planes=True,
                    want_vel=True, resonance_window=res_window,
                    sat_block=deep_sb, interpret=interp)
                dr, dv, de = _unpack_outs(d_outs, True)
                return propagate_fast_pallas_sep_merge(
                    cat.els, t_time, t_sat, cat.grav, dr, dv, de,
                    oh, kp, kepler_iters=cat.kepler_iters, planes=True,
                    want_vel=True, group_blocks=g, interpret=interp,
                    time_block=tb, sat_block=sb)

            f = jax.jit(sweep)

            def fetch(outs):
                np.asarray(outs[0][:1, :1, :1])

            e = _slope(f, fetch, **({} if interp else dict(k1=2, k2=6, reps=3)))
            print(f"  ({tb:3d}, {sb:5d}): {e * 1e3:7.2f} ms  "
                  f"({props / e / 1e9:.2f}G props/s)  K={k_width} g={g}")
        except Exception as exc:  # noqa: BLE001 - tile may not lower
            print(f"  ({tb:3d}, {sb:5d}): failed ({exc})")

    # ---- 3. XLA deep-path diagnosis --------------------------------
    print("\n# deep-subset engines (ms/sweep):")
    from astroz_tpu.ops.fast import propagate_fast

    tsd = t_time[:, None] - jnp.asarray(
        (cat.els_deep.epoch_jd - cat.epoch_min_jd) * 1440.0)[None, :]

    def deep_xla():
        return propagate_fast(cat.els_deep, cat.deep_sub, tsd, cat.grav,
                              resonance_steps=res_steps,
                              resonance_window=res_window)

    def deep_pallas():
        return propagate_deep_pallas(
            cat.els_deep, cat.deep_sub, tsd, cat.grav,
            resonance_steps=res_steps, planes=True, want_vel=True,
            resonance_window=res_window, interpret=interp)

    for name, fn in (("pallas", deep_pallas), ("xla", deep_xla)):
        try:
            jf = jax.jit(fn)

            def fetch(outs):
                leaf = jax.tree_util.tree_leaves(outs)[0]
                np.asarray(leaf.ravel()[:1])

            e = _slope(jf, fetch, **({} if interp else dict(k1=2, k2=6, reps=3)))
            print(f"  {name:7s}: {e * 1e3:8.2f} ms")
        except Exception as exc:  # noqa: BLE001
            print(f"  {name:7s}: failed ({exc})")

    # ---- 1. headline modes ------------------------------------------
    print("\n# headline: run `python bench.py` (looped, default) and "
          "`ASTROZ_BENCH_MODE=dispatch python bench.py` to compare.")


if __name__ == "__main__":
    main()
