"""Single-satellite time-grid benchmark.

Scenario-for-scenario port of the reference's benchmark grid
(benchmarks/zig_sgp4_bench.zig:30-52, identical grids in its
python/rust/jax variants): one ISS TLE propagated over 1 day / 1 week /
2 weeks / 1 month at 1-minute steps and 2 weeks / 1 month / 3 months /
1 year at 1-second steps (up to 31.5M points).

Usage: python benchmarks/bench_single_sat.py [--f64] [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ISS_L1 = "1 25544U 98067A   24001.50000000  .00016717  00000-0  10270-3 0  9993"
ISS_L2 = "2 25544  51.6400 200.0000 0001234  90.0000 270.0000 15.50000000000017"

SCENARIOS = [
    ("1day_1min", 1440, 60.0),
    ("1week_1min", 10080, 60.0),
    ("2weeks_1min", 20160, 60.0),
    ("1month_1min", 43200, 60.0),
    ("2weeks_1s", 1209600, 1.0),
    ("1month_1s", 2592000, 1.0),
    ("3months_1s", 7776000, 1.0),
    ("1year_1s", 31536000, 1.0),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f64", action="store_true",
                    help="benchmark the full-f64 kernel instead of fast")
    ap.add_argument("--quick", action="store_true",
                    help="only the 1-minute-step scenarios")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from astroz_tpu import build_catalog
    from astroz_tpu.ops.fast import propagate_fast
    from astroz_tpu.ops.sgp4 import sgp4_propagate
    from astroz_tpu.propagation import default_engine

    cat = build_catalog("\n".join([ISS_L1, ISS_L2]))
    engine = default_engine()
    use_pallas = engine == "pallas" and not args.f64
    if use_pallas:
        from astroz_tpu.ops.pallas_sgp4 import propagate_fast_pallas_fused

    # time-as-lanes layout: a single satellite fills the whole VPU by
    # folding the time axis into both grid dimensions (the reference's
    # 1-sat x 8-times propagateN, Sgp4.zig:753, scaled to TPU width)
    LANES = 1024
    els1 = cat.els
    els_w = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (LANES,) + x.shape[1:])
        if getattr(x, "ndim", 0) else x, els1)

    @jax.jit
    def run_f64(t2d):
        return sgp4_propagate(els_w, t2d, cat.grav)

    @jax.jit
    def run_fast(t2d):
        return propagate_fast(els_w, None, t2d, cat.grav, kepler_iters=5)

    scenarios = SCENARIOS[:4] if args.quick else SCENARIOS
    results = {}
    for name, n_points, step_s in scenarios:
        n_pad = n_points + (-n_points) % LANES
        chunk = min(n_pad, 1 << 22)
        tmpl = (jnp.arange(chunk, dtype=jnp.float64)
                .reshape(-1, LANES) * (step_s / 60.0))

        def sweeps(k):
            """Enqueue k full sweeps and fetch ONLY the final chunk's
            output: per-program fetches serialize ~25-30 ms tunnel
            round trips each, so pipelining is the only way small
            grids ever amortize dispatch latency (see CLAUDE.md)."""
            out = None
            for _ in range(k):
                done = 0
                while done < n_pad:
                    n = min(chunk, n_pad - done)
                    t = tmpl[:n // LANES] + done * (step_s / 60.0)
                    if use_pallas:
                        out = propagate_fast_pallas_fused(
                            els_w, t, cat.grav, kepler_iters=5)
                    elif args.f64:
                        out = run_f64(t)
                    else:
                        out = run_fast(t)
                    done += n
            # fetch forces completion (block_until_ready can return
            # early on tunnel-attached chips)
            np.asarray(out[0][:1, :1])

        sweeps(1)  # compile + warm
        # slope over pipelined sweep batches cancels the fixed
        # dispatch/fetch overhead
        reps = max(1, min(64, (1 << 22) // n_pad))
        t0 = time.perf_counter()
        sweeps(1)
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        sweeps(1 + 2 * reps)
        t_three = time.perf_counter() - t0
        dt = (t_three - t_one) / (2 * reps)
        if dt <= 0:
            # tunnel jitter can make the longer batch measure faster;
            # fall back to the conservative total-time estimate
            # (includes the fixed dispatch overhead)
            dt = t_three / (1 + 2 * reps)
        results[name] = n_points / dt
        print(f"{name:12s} {n_points:>9d} pts  "
              f"{n_points/dt/1e6:8.1f} M props/s", flush=True)

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
