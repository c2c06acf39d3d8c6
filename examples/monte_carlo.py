"""Monte-Carlo dispersion of a transfer (reference: MonteCarlo.zig demo)."""

from astroz_tpu.montecarlo import MonteCarloConfig, run_hohmann_monte_carlo

cfg = MonteCarloConfig(n_samples=5000, r1_sigma_km=10.0, r2_sigma_km=50.0)
res = run_hohmann_monte_carlo(cfg)
for name, s in res.items():
    print(f"{name:15s} mean={s.mean:10.4f}  std={s.std:8.5f}  "
          f"95% CI [{s.ci95_low:.4f}, {s.ci95_high:.4f}]")
