#!/usr/bin/env python3
"""On-hardware differential validation: the real-TPU engines vs the
independent scalar oracle.

CI validates every engine on the virtual CPU mesh
(tests/test_differential.py); this script runs the SAME
regime-covering randomized sweep against the engines as they actually
execute on the TPU — the fused Pallas shallow kernel, the deep-subset
Pallas kernel, and the end-to-end fast propagate — and prints worst-case
position/velocity deviations against tests' pure-Python oracle
(reference: the CI live cross-check vs python-sgp4,
.github/workflows/ci.yaml:101-153, moved onto the accelerator).

Usage: python benchmarks/validate_tpu.py [n_sats] [--fast-only]

``--fast-only`` skips the f64 engine (its unified while_loop kernel
takes several minutes to compile through the remote compile service).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 250
    fast_only = "--fast-only" in sys.argv

    import jax

    from astroz_tpu.constants import WGS72
    from astroz_tpu.ops.sgp4 import sgp4_init
    from astroz_tpu.propagation import (catalog_from_elements, propagate,
                                        default_engine)
    from test_differential import (SWEEP_TIMES, EPOCH_JD, oracle_sweep,
                                   random_elements)

    backend = jax.default_backend()
    engine = default_engine()
    print(f"backend: {backend}  engine: {engine}")
    if backend != "tpu":
        print("WARNING: not running on a TPU backend — this validates "
              "whatever the default device is")

    fields = random_elements(n)
    # the oracle propagates in minutes-since-own-epoch; pin every epoch
    # to the sweep reference so jd-based propagate() sees the same
    # tsince (the CPU tests use propagate_tsince instead and keep the
    # per-satellite epoch jitter)
    fields["epoch_jd"] = np.full(n, EPOCH_JD)
    print(f"oracle sweep: {n} sats x {len(SWEEP_TIMES)} epochs "
          f"(pure-Python, ~30 s) ...")
    o_err, o_r, o_v = oracle_sweep(fields, SWEEP_TIMES)

    cat = catalog_from_elements(sgp4_init(WGS72, **fields), WGS72)
    jd = EPOCH_JD + SWEEP_TIMES / 1440.0
    n_deep = cat.n_deep
    print(f"catalog: {len(cat)} sats, {n_deep} deep")

    worst_all = 0.0
    methods = [("fast", 100.0, 1e-3)]
    if not fast_only:
        methods.insert(0, ("f64", 100.0, 1e-3))
    for method, pos_tol_m, vel_tol in methods:
        r, v, err = propagate(cat, jd, method=method)
        err = np.asarray(err)
        ok = (err == 0) & (o_err == 0)
        agree = ((err == 0) == (o_err == 0)).mean()
        dr = np.linalg.norm(np.asarray(r, np.float64) - o_r, axis=-1)
        dv = np.linalg.norm(np.asarray(v, np.float64) - o_v, axis=-1)
        worst = float(dr[ok].max()) * 1e3
        worst_v = float(dv[ok].max()) * 1e3
        status = "OK" if worst < pos_tol_m and agree >= 0.99 else "FAIL"
        print(f"method={method:4s} [{status}] worst |dr| = {worst:8.2f} m"
              f"  worst |dv| = {worst_v * 1e3:7.2f} mm/s"
              f"  err-agreement = {agree:.4f}")
        worst_all = max(worst_all, worst)
        if status == "FAIL":
            sys.exit(1)
    print(f"all engines within the {100.0:.0f} m budget "
          f"(worst {worst_all:.2f} m) on {backend}")


if __name__ == "__main__":
    main()
