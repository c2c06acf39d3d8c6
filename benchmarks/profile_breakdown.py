"""Profile the end-to-end bench breakdown on the real TPU.

Slope-times each stage of the headline scenario separately so we can
see where the 501M -> 2.3G gap lives: dispatch floor, Pallas kernel,
deep subset, stack copies, scatter.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def slope(fn, fetch, k1=2, k2=6):
    """Per-call seconds via the slope method (cancels fixed overhead)."""
    def run(k):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = fn()
        fetch(last)
        return time.perf_counter() - t0
    run(1)  # warm
    t1 = run(k1)
    t2 = run(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    import jax
    import jax.numpy as jnp

    import astroz_tpu  # noqa: F401
    from astroz_tpu.propagation import (_propagate_fast_partitioned,
                                        _propagate_fast_shallow,
                                        default_engine)
    from astroz_tpu.ops.fast import propagate_fast
    from astroz_tpu.ops.pallas_sgp4 import propagate_fast_pallas_sep
    sys.path.insert(0, "/root/repo")
    from bench import synthetic_catalog, N_SATS, N_TIMES

    cat = synthetic_catalog(N_SATS)
    engine = default_engine()
    print(f"# engine={engine} n_deep={cat.n_deep}", flush=True)

    tsince_all = np.arange(N_TIMES, dtype=np.float64)
    jd_sum = 2460310.5 + tsince_all / 1440.0
    t_sat, t_sat_deep, _, _ = cat.fast_staging
    deep_idx = jnp.asarray(cat.deep_idx)
    ts = jax.device_put(jnp.asarray(tsince_all))
    js = jax.device_put(jnp.asarray(jd_sum)[:, None])

    def fetch3(outs):
        np.asarray(outs[0][:1, :1])

    # D: dispatch floor — trivial program
    x = jax.device_put(jnp.ones((8, 128), jnp.float32))
    tiny = jax.jit(lambda a: a + 1.0)
    t_d = slope(lambda: tiny(x), lambda r: np.asarray(r[:1, :1]))
    print(f"dispatch_floor_tiny: {t_d*1e3:.2f} ms", flush=True)

    # A: pallas separable shallow kernel alone (all sats)
    def run_a():
        return propagate_fast_pallas_sep(cat.els, ts, t_sat, cat.grav,
                                         kepler_iters=cat.kepler_iters)
    t_a = slope(run_a, fetch3)
    print(f"pallas_sep_shallow: {t_a*1e3:.2f} ms "
          f"({N_SATS*N_TIMES/t_a/1e9:.2f}G props/s)", flush=True)

    # C: deep subset XLA fast kernel alone
    tsince_deep = ts[:, None] - t_sat_deep[None, :]

    @jax.jit
    def run_c():
        return propagate_fast(cat.els_deep, cat.deep_sub, tsince_deep,
                              cat.grav, resonance_steps=4)
    t_c = slope(run_c, fetch3)
    print(f"deep_xla_subset: {t_c*1e3:.2f} ms", flush=True)

    # B: full partitioned current path
    def run_b():
        return _propagate_fast_partitioned(
            cat.els, cat.els_deep, cat.deep_sub, cat.deep_idx_dev,
            ts, t_sat,
            t_sat_deep, js, cat.grav, "teme", True, cat.kepler_iters,
            engine, 4)
    t_b = slope(run_b, fetch3)
    print(f"partitioned_full: {t_b*1e3:.2f} ms "
          f"({N_SATS*N_TIMES/t_b/1e9:.2f}G props/s)", flush=True)

    # B-planes: the headline bench path (grouped planes, no relayout)
    def run_bp():
        return _propagate_fast_partitioned(
            cat.els, cat.els_deep, cat.deep_sub, cat.deep_idx_dev,
            ts, t_sat, t_sat_deep, js, cat.grav, "teme", True,
            cat.kepler_iters, engine, 4, "planes")
    t_bp = slope(run_bp, lambda o: np.asarray(o[0][:1, :1, :1]))
    print(f"partitioned_planes: {t_bp*1e3:.2f} ms "
          f"({N_SATS*N_TIMES/t_bp/1e9:.2f}G props/s)", flush=True)

    # S-planes: shallow-only planes path (no deep kernel, no merge) on
    # the same full satellite axis — the merge+deep delta vs B-planes
    def run_sp():
        return _propagate_fast_shallow(cat.els, ts, t_sat, js, cat.grav,
                                       "teme", True, cat.kepler_iters,
                                       engine, "planes")
    t_sp = slope(run_sp, lambda o: np.asarray(o[0][:1, :1, :1]))
    print(f"shallow_planes: {t_sp*1e3:.2f} ms "
          f"({N_SATS*N_TIMES/t_sp/1e9:.2f}G props/s)  "
          f"[deep+merge delta {1e3*(t_bp-t_sp):.2f} ms]", flush=True)

    # G: scatter cost alone — scatter precomputed deep planes into r
    r0, v0, e0 = run_a()
    rd = jnp.zeros((N_TIMES, len(cat.deep_idx), 3), jnp.float32)

    @jax.jit
    def run_g(r, rdd):
        return r.at[:, deep_idx, :].set(rdd)
    t_g = slope(lambda: run_g(r0, rd), lambda r: np.asarray(r[:1, :1]))
    print(f"scatter_one_plane3: {t_g*1e3:.2f} ms", flush=True)

    # G2: same with constant (numpy) indices baked into the program
    idx_const = np.asarray(cat.deep_idx)

    @jax.jit
    def run_g2(r, rdd):
        return r.at[:, idx_const, :].set(rdd)
    t_g2 = slope(lambda: run_g2(r0, rd), lambda r: np.asarray(r[:1, :1]))
    print(f"scatter_const_idx: {t_g2*1e3:.2f} ms", flush=True)

    # H: plain full copy for reference (read+write 233MB)
    @jax.jit
    def run_h(r):
        return r * 1.000001
    t_h = slope(lambda: run_h(r0), lambda r: np.asarray(r[:1, :1]))
    print(f"copy_233MB: {t_h*1e3:.2f} ms", flush=True)

    # E: inner-rep scaling of the partitioned path: 2x and 4x time axis
    for k in (2, 4):
        tsk = jax.device_put(jnp.asarray(np.tile(tsince_all, k)))
        jsk = jax.device_put(jnp.asarray(np.tile(jd_sum, k))[:, None])

        def run_e():
            return _propagate_fast_partitioned(
                cat.els, cat.els_deep, cat.deep_sub, cat.deep_idx_dev,
                tsk, t_sat,
                t_sat_deep, jsk, cat.grav, "teme", True, cat.kepler_iters,
                engine, 4)
        t_e = slope(run_e, fetch3, k1=1, k2=3)
        print(f"partitioned_x{k}: {t_e*1e3:.2f} ms "
              f"({k*N_SATS*N_TIMES/t_e/1e9:.2f}G props/s)", flush=True)


if __name__ == "__main__":
    main()
