"""Write-time output layouts and the velocities=False fast path.

The reference lets callers pick time-/satellite-major at write time and
propagate into caller-provided buffers (Constellation.zig:46-51,
satrec.zig:896-988); here the same control is the ``layout=`` /
``velocities=`` arguments of :func:`astroz_tpu.propagate` — and the
``planes`` layout is literally the TPU kernels' own output buffers
(zero post-kernel copies).
"""

import numpy as np

from astroz_tpu import build_catalog, propagate

TLE = """1 25544U 98067A   24001.50000000  .00016717  00000-0  10270-3 0  9993
2 25544  51.6400 200.0000 0001234  90.0000 270.0000 15.50000000000017
1 28626U 05004A   24186.00000000 -.00000098  00000+0  00000+0 0  9998
2 28626   0.0163 279.8379 0003069  20.3251 343.1766  1.00270142 70992"""

cat = build_catalog(TLE)
jd = cat.epochs_jd[0] + np.linspace(0.0, 1.0, 25)

# classic time-major: (n_times, n_sats, 3)
r, v, err = propagate(cat, jd)
print("time_major:", r.shape)

# satellite-major: (n_sats, n_times, 3) — written directly by the fast
# program, not transposed after the fact
r_s, v_s, _ = propagate(cat, jd, layout="sat_major")
print("sat_major: ", r_s.shape)

# planes: (3, n_times, n_sats) component planes — the kernels' native
# buffers; fastest option for consumers that process per component
r_p, v_p, _ = propagate(cat, jd, layout="planes")
print("planes:    ", r_p.shape)
assert np.allclose(np.moveaxis(np.asarray(r_p), 0, -1), np.asarray(r))

# velocities=False runs 4-plane kernels that never compute the velocity
# terms (the reference's +30% fast path, astroz api.py:23)
r_n, v_n, _ = propagate(cat, jd, velocities=False)
assert v_n is None
assert np.array_equal(np.asarray(r_n), np.asarray(r))
print("velocities=False: v is", v_n, "- positions bit-identical")
