"""FITS image handling + star precession
(reference: Fits.zig / EquatorialCoordinateSystem.zig demos)."""

import numpy as np

from astroz_tpu.fits import Fits, image_to_pgm
from astroz_tpu.equatorial import Declination, RightAscension, precess

# build a small FITS image in-memory (see tests/test_fits.py helpers)
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_fits import make_image_fits

img = (np.add.outer(np.arange(32), np.arange(32)) % 17).astype(np.int16)
make_image_fits("/tmp/demo.fits", img)
f = Fits.open("/tmp/demo.fits")
hdu = f[0]
print(f"{len(f)} HDU(s); primary {hdu.shape}, OBJECT={hdu.header['OBJECT']}")
image_to_pgm(hdu.image(), "/tmp/demo.pgm", stretch="sqrt")
print("wrote /tmp/demo.pgm")

# precess Betelgeuse from J2000 to J2050
ra, dec = RightAscension(5, 55, 10.3), Declination(7, 24, 25.4)
ra2, dec2 = precess(ra, dec, 2451545.0 + 50 * 365.25)
print(f"Betelgeuse J2050: RA {ra2.hours}h{ra2.minutes}m{ra2.seconds:.1f}s "
      f"Dec {dec2.degrees}d{dec2.arcminutes}m{dec2.arcseconds:.0f}s")
