"""Profile the CURRENT headline inner program (fused-merge path).

Breaks the ~6.9 ms/sweep round-4 record into its real slices:

  shallow_sep      the plain separable shallow kernel (df32 spine in-kernel)
  merge_kernel     the same kernel with the deep-column merge epilogue,
                   fed PRECOMPUTED deep planes (isolates the merge cost)
  deep_spine       the XLA f64 deep spine alone (compacted subset)
  deep_side        deep spine + deep Pallas kernel (what the fused path
                   actually runs before the merge kernel)
  full_fused       _propagate_fast_fused end-to-end (the bench program)
  looped_carry     bench.py's looped mode as-is: fori_loop CARRYING the
                   full ~543 MB output planes (hypothesis: XLA inserts a
                   per-iteration carry copy ~1.3 ms at v5e HBM bw)
  looped_probe     same loop carrying ONLY a scalar probe (outputs die
                   inside the body; the Pallas kernel still materializes
                   them every iteration — pallas_call is opaque to DCE)

Every stage is slope-timed with pipelined dispatch (enqueue K programs,
fetch one element of the LAST output) and best-of-3 interleaved pairs,
per the tunnel rules in CLAUDE.md.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def slope(fn, fetch, k1=2, k2=6, pairs=3):
    def run(k):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = fn()
        fetch(last)
        return time.perf_counter() - t0
    run(1)  # warm
    t1 = float("inf")
    t2 = float("inf")
    for _ in range(pairs):
        t1 = min(t1, run(k1))
        t2 = min(t2, run(k2))
    e = (t2 - t1) / (k2 - k1)
    return e if e > 0 else t2 / k2


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    import astroz_tpu  # noqa: F401
    from astroz_tpu.propagation import (_propagate_fast_fused,
                                        _resonance_window, default_engine)
    from astroz_tpu.ops.fast import deep_spine_f64
    from astroz_tpu.ops.pallas_sgp4 import (_unpack_outs,
                                            propagate_deep_pallas,
                                            propagate_fast_pallas_sep,
                                            propagate_fast_pallas_sep_merge)
    from bench import N_SATS, N_TIMES, synthetic_catalog

    cat = synthetic_catalog(N_SATS)
    engine = default_engine()
    print(f"# engine={engine} n_deep={cat.n_deep}", flush=True)
    assert cat.merge_staging is not None

    tsince_all = np.arange(N_TIMES, dtype=np.float64)
    jd_sum = 2460310.5 + tsince_all / 1440.0
    t_sat, _, _, _ = cat.fast_staging
    ts = jax.device_put(jnp.asarray(tsince_all))
    js = jax.device_put(jnp.asarray(jd_sum)[:, None])
    res_steps = 4
    res_window = _resonance_window(cat.deep_epochs_jd)
    tables_p = cat.resonance_tables_packed(res_steps)
    onehot, keep, k_width, g, els_p, deep_p, t_sat_p = cat.merge_staging
    width = els_p.no_kozai.shape[0]
    deep_sb = 256 if width % 256 == 0 else 128
    print(f"# merge K={k_width} g={g} deep_width={width}", flush=True)
    nprops = N_SATS * N_TIMES

    def fetch_planes(outs):
        np.asarray(outs[0][:1, :1, :1])

    def report(name, t, note=""):
        print(f"{name}: {t*1e3:.2f} ms ({nprops/t/1e9:.2f}G) {note}",
              flush=True)

    # 1. plain shallow separable kernel (all sats), planes out
    def run_shallow():
        return propagate_fast_pallas_sep(cat.els, ts, t_sat, cat.grav,
                                         kepler_iters=cat.kepler_iters,
                                         planes=True)
    t_sh = slope(run_shallow, fetch_planes)
    report("shallow_sep", t_sh)

    # 2. deep spine alone (XLA f64, compacted subset)
    @jax.jit
    def run_spine():
        tsd = ts[:, None] - t_sat_p[None, :]
        return deep_spine_f64(els_p, deep_p, tsd, res_steps, res_window,
                              tables_p)
    t_spine = slope(run_spine, lambda o: np.asarray(o[0][:1, :1]))
    report("deep_spine", t_spine)

    # 3. deep side: spine + deep Pallas kernel (planes), as fused runs it
    @functools.partial(jax.jit, static_argnames=())
    def run_deep():
        tsd = ts[:, None] - t_sat_p[None, :]
        return propagate_deep_pallas(
            els_p, deep_p, tsd, cat.grav,
            kepler_iters=cat.deep_kepler_iters,
            resonance_steps=res_steps, planes=True, want_vel=True,
            resonance_window=res_window, tables=tables_p,
            sat_block=deep_sb)
    t_deep = slope(run_deep, fetch_planes)
    report("deep_side", t_deep)

    # 4. merge kernel with PRECOMPUTED deep planes (isolates merge cost)
    d_outs = jax.block_until_ready(run_deep())
    dr0, dv0, de0 = _unpack_outs(d_outs, True)
    dr0, dv0, de0 = map(jax.device_put, (dr0, dv0, de0))

    def run_merge():
        return propagate_fast_pallas_sep_merge(
            cat.els, ts, t_sat, cat.grav, dr0, dv0, de0, onehot, keep,
            kepler_iters=cat.kepler_iters, planes=True, group_blocks=g)
    t_mg = slope(run_merge, fetch_planes)
    report("merge_kernel", t_mg,
           f"[epilogue delta vs shallow {1e3*(t_mg-t_sh):+.2f} ms]")

    # 5. the full fused program (the bench's run_chunk)
    def run_full():
        return _propagate_fast_fused(
            cat.els, els_p, deep_p, onehot, keep, ts, t_sat, t_sat_p,
            js, cat.grav, "teme", True, cat.kepler_iters, res_steps,
            "planes", res_window, tables_p, g,
            deep_kepler_iters=cat.deep_kepler_iters)
    t_full = slope(run_full, fetch_planes)
    report("full_fused", t_full,
           f"[residual vs merge+deep {1e3*(t_full-t_mg-t_deep):+.2f} ms]")

    # 6/7. looped modes: full-output carry (bench as-is) vs probe-only
    def make_looped(carry_outs: bool):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run_looped(tsx, k):
            shapes = jax.eval_shape(lambda a: run_full_t(a), tsx)
            outs0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            probe0 = jnp.zeros((), outs0[0].dtype)
            if carry_outs:
                def body(_, carry):
                    probe, _outs = carry
                    ts_b, _pb = lax.optimization_barrier((tsx, probe))
                    outs = run_full_t(ts_b)
                    return outs[0][0, 0, 0], outs
                return lax.fori_loop(0, k, body, (probe0, outs0))

            def body(_, probe):
                ts_b, _pb = lax.optimization_barrier((tsx, probe))
                outs = run_full_t(ts_b)
                return outs[0][0, 0, 0]
            probe = lax.fori_loop(0, k, body, probe0)
            return probe, run_full_t(ts)
        return run_looped

    def run_full_t(tsx):
        return _propagate_fast_fused(
            cat.els, els_p, deep_p, onehot, keep, tsx, t_sat, t_sat_p,
            js, cat.grav, "teme", True, cat.kepler_iters, res_steps,
            "planes", res_window, tables_p, g,
            deep_kepler_iters=cat.deep_kepler_iters)

    for name, carry_outs in (("looped_carry", True),
                             ("looped_probe", False)):
        looped = make_looped(carry_outs)
        for k in (2, 6):
            np.asarray(looped(ts, k)[0])  # compile

        def run_k(k):
            t0 = time.perf_counter()
            probe, outs = looped(ts, k)
            np.asarray(probe)
            fetch_planes(outs)
            return time.perf_counter() - t0
        t1 = float("inf")
        t2 = float("inf")
        for _ in range(3):
            t1 = min(t1, run_k(2))
            t2 = min(t2, run_k(6))
        e = (t2 - t1) / 4
        if e <= 0:
            e = t2 / 6
        report(name, e)


if __name__ == "__main__":
    main()
