"""Native C++ bulk TLE parser vs the pure-Python parser.

The native path is the analogue of the reference's Zig ingest layer;
equivalence to the Python parser is the correctness gate.
"""

import numpy as np
import pytest

from astroz_tpu import native
from astroz_tpu.tle import TleArrays, iter_tles

from test_propagation import MIXED_TEXT
from test_screening import synthetic_leo_text

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

FIELDS = ("epoch_jd", "jdsatepoch", "jdsatepochF", "no_kozai", "ecco",
          "inclo", "nodeo", "argpo", "mo", "bstar", "ndot", "nddot")


def assert_equivalent(text):
    a = TleArrays.from_text(text, allow_native=True)
    b = TleArrays.from_tles(list(iter_tles(text)))
    assert len(a) == len(b) > 0
    np.testing.assert_array_equal(a.satnum, b.satnum)
    for f in FIELDS:
        np.testing.assert_allclose(getattr(a, f), getattr(b, f),
                                   rtol=0, atol=1e-15, err_msg=f)


def test_native_matches_python_mixed():
    assert_equivalent(MIXED_TEXT)


def test_native_matches_python_synthetic_catalog():
    assert_equivalent(synthetic_leo_text(200))


def test_native_skips_garbage():
    text = ("garbage line\n" + MIXED_TEXT + "\n1 truncated\n"
            "2 25544 orphan-without-line1\n")
    cols, satnums = native.parse_catalog(text)
    assert len(satnums) == 5


def test_native_crlf_and_blank_lines():
    text = MIXED_TEXT.replace("\n", "\r\n\r\n")
    cols, satnums = native.parse_catalog(text)
    assert len(satnums) == 5


def test_native_alpha5():
    l1 = ("1 E5544U 98067A   24001.50000000  .00016717  00000-0"
          "  10270-3 0  9993")
    l2 = ("2 E5544  51.6400 200.0000 0001234  90.0000 270.0000 "
          "15.50000000000017")
    cols, satnums = native.parse_catalog(l1 + "\n" + l2)
    assert satnums[0] == 145544  # E -> 14


def test_native_satnum_mismatch_skipped():
    l1 = ("1 25544U 98067A   24001.50000000  .00016717  00000-0"
          "  10270-3 0  9993")
    l2 = ("2 99999  51.6400 200.0000 0001234  90.0000 270.0000 "
          "15.50000000000017")
    cols, satnums = native.parse_catalog(l1 + "\n" + l2)
    assert len(satnums) == 0
