"""All-vs-all conjunction screening over a small shell."""

import numpy as np

from astroz_tpu import build_catalog, screen_all

rng = np.random.default_rng(1)
lines = []
for k in range(64):
    raan, mo = rng.uniform(0, 360), rng.uniform(0, 360)
    lines.append(f"1 {20000+k:05d}U 98067A   24001.50000000  .00000000"
                 f"  00000-0  00000+0 0  9990")
    lines.append(f"2 {20000+k:05d}  53.0000 {raan:8.4f} 0001000  90.0000"
                 f" {mo:8.4f} 15.20000000000010")
cat = build_catalog("\n".join(lines))
times = cat.epochs_jd[0] + np.linspace(0, 0.25, 120)
i, j, dmin, tmin = screen_all(cat, times, threshold_km=100.0, block=64)
print(f"{len(i)} pairs within 100 km:")
for a, b, d in list(zip(i, j, dmin))[:10]:
    print(f"  {cat.satnum[a]} - {cat.satnum[b]}: {d:.2f} km")
