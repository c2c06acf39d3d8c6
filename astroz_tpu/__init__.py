"""astroz_tpu — a TPU-native constellation propagation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the astroz
astrodynamics toolkit (reference: /root/reference): SGP4/SDP4 analytic
propagation at constellation scale, numerical force-model propagation,
mission planning, conjunction screening, and telemetry parsing — designed
for TPU device meshes rather than CPU SIMD lanes.
"""

from . import config as _config  # noqa: F401  (enables x64 first)

__version__ = "0.1.0"

from . import constants  # noqa: E402
from . import time  # noqa: E402
from . import tle  # noqa: E402
from . import frames  # noqa: E402
from . import ops  # noqa: E402
from . import propagation  # noqa: E402
from . import propagators  # noqa: E402
from . import calculations  # noqa: E402
from . import orbital_mechanics  # noqa: E402
from . import spacecraft  # noqa: E402
from . import mission  # noqa: E402
from . import montecarlo  # noqa: E402
from . import api  # noqa: E402
from . import equatorial  # noqa: E402
from . import fits  # noqa: E402
from . import io  # noqa: E402
from . import spice  # noqa: E402
from . import constellation  # noqa: E402
from .constellation import Constellation  # noqa: E402
from . import screening  # noqa: E402
from .propagation import SatCatalog, build_catalog, propagate  # noqa: E402
from .screening import (screen_all, screen_all_ring,  # noqa: E402
                        screen_target)

__all__ = [
    "constants", "time", "tle", "frames", "ops", "propagation",
    "screening", "propagators", "calculations",
    "orbital_mechanics", "spacecraft", "mission", "montecarlo", "api",
    "equatorial", "fits", "io", "spice", "constellation", "Constellation",
    "SatCatalog", "build_catalog", "propagate",
    "screen_all", "screen_all_ring", "screen_target", "__version__",
]
