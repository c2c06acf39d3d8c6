"""TLE -> ECEF -> geodetic ground track (reference: examples/wcs.zig —
WorldCoordinateSystem.fromTle; here the whole track is one vectorized
propagate with the frame rotation fused in)."""

import numpy as np

from astroz_tpu import build_catalog, propagate

TLE = """1 55909U 23035B   24187.51050877  .00023579  00000+0  16099-2 0  9998
2 55909  43.9978 311.8012 0011446 278.6226  81.3336 15.05761711 71371"""

cat = build_catalog(TLE)
epoch = float(np.asarray(cat.els.epoch_jd)[0])

# one orbit sampled every 2 minutes, geodetic output in degrees
times = epoch + np.arange(0.0, 96.0, 2.0) / 1440.0
geo, vel, err = propagate(cat, times, output="geodetic_deg")
geo = np.asarray(geo)[:, 0]
assert not np.asarray(err).any()

print(f"ground track for NORAD {cat.satnum[0]} (one orbit):")
print(f"{'t+min':>6} {'lat deg':>9} {'lon deg':>10} {'alt km':>8}")
for k, (lat, lon, alt) in enumerate(geo):
    print(f"{2 * k:6d} {lat:9.3f} {lon:10.3f} {alt:8.1f}")

# same state in ECEF for comparison (reference logs the raw WCS struct)
ecef, _, _ = propagate(cat, times[:1], output="ecef")
x, y, z = np.asarray(ecef)[0, 0]
print(f"\nECEF at epoch: x={x:.3f} y={y:.3f} z={z:.3f} km")
