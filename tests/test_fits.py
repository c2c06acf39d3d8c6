"""FITS reader tests — synthesized standard-conformant files.

(The reference tests against test/small.fits + a downloaded Chandra
table, ci.yaml:25-28; here the fixtures are generated in-test so the
suite is hermetic.)
"""

import numpy as np
import pytest

from astroz_tpu.fits import Fits, FitsError, image_to_pgm, open_and_parse

BLOCK = 2880


def _card(key, value, comment=""):
    if isinstance(value, bool):
        v = "T" if value else "F"
        s = f"{key:<8}= {v:>20}"
    elif isinstance(value, int):
        s = f"{key:<8}= {value:>20}"
    elif isinstance(value, float):
        s = f"{key:<8}= {value:>20.10G}"
    elif value is None:
        s = f"{key:<8}"
    else:
        s = f"{key:<8}= '{value}'"
    if comment:
        s += f" / {comment}"
    return s.ljust(80)[:80].encode("ascii")


def _header(cards):
    raw = b"".join(cards) + b"END".ljust(80)
    pad = (-len(raw)) % BLOCK
    return raw + b" " * pad


def _pad_data(raw):
    return raw + b"\x00" * ((-len(raw)) % BLOCK)


def make_image_fits(path, arr):
    arr = np.asarray(arr, ">i2")
    cards = [_card("SIMPLE", True), _card("BITPIX", 16),
             _card("NAXIS", 2), _card("NAXIS1", arr.shape[1]),
             _card("NAXIS2", arr.shape[0]),
             _card("BSCALE", 2.0), _card("BZERO", 100.0),
             _card("OBJECT", "TESTOBJ", "synthetic")]
    with open(path, "wb") as f:
        f.write(_header(cards))
        f.write(_pad_data(arr.tobytes()))


def make_bintable_fits(path):
    n = 5
    ids = np.arange(n, dtype=">i4")
    flux = np.linspace(1.0, 2.0, n).astype(">f8")
    names = np.array([f"SRC{i}".ljust(6).encode() for i in range(n)])
    row_len = 4 + 8 + 6
    # note: scalar indexing would drop the big-endian byte order, so
    # slice 1-element views when serializing
    rows = b"".join(ids[i:i + 1].tobytes() + flux[i:i + 1].tobytes()
                    + names[i] for i in range(n))
    primary = _header([_card("SIMPLE", True), _card("BITPIX", 8),
                       _card("NAXIS", 0)])
    cards = [_card("XTENSION", "BINTABLE"), _card("BITPIX", 8),
             _card("NAXIS", 2), _card("NAXIS1", row_len),
             _card("NAXIS2", n), _card("PCOUNT", 0), _card("GCOUNT", 1),
             _card("TFIELDS", 3),
             _card("TTYPE1", "ID"), _card("TFORM1", "1J"),
             _card("TTYPE2", "FLUX"), _card("TFORM2", "1D"),
             _card("TTYPE3", "NAME"), _card("TFORM3", "6A")]
    with open(path, "wb") as f:
        f.write(primary)
        f.write(_header(cards))
        f.write(_pad_data(rows))


def test_image_hdu(tmp_path):
    img = np.arange(12, dtype=np.int16).reshape(3, 4)
    p = tmp_path / "img.fits"
    make_image_fits(str(p), img)
    fits = open_and_parse(str(p))
    assert len(fits) == 1
    hdu = fits[0]
    assert hdu.kind == "image"
    assert hdu.header["OBJECT"] == "TESTOBJ"
    assert hdu.comments.get("OBJECT") == "synthetic"
    data = hdu.image()
    assert data.shape == (3, 4)
    np.testing.assert_allclose(data, img * 2.0 + 100.0)


def test_binary_table(tmp_path):
    p = tmp_path / "tab.fits"
    make_bintable_fits(str(p))
    fits = Fits.open(str(p))
    assert len(fits) == 2
    assert fits[0].kind == "primary"
    assert fits[1].kind == "binary_table"
    cols = fits[1].table()
    np.testing.assert_array_equal(cols["ID"], np.arange(5))
    np.testing.assert_allclose(cols["FLUX"], np.linspace(1, 2, 5))
    assert list(cols["NAME"]) == [f"SRC{i}" for i in range(5)]


def test_not_fits_raises(tmp_path):
    p = tmp_path / "bad.fits"
    p.write_bytes(b"NOTAFITSFILE" + b" " * 3000)
    with pytest.raises(FitsError):
        Fits.open(str(p))


def test_pgm_export(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1000, (16, 16))
    for stretch in ("linear", "log", "sqrt"):
        out = tmp_path / f"{stretch}.pgm"
        image_to_pgm(img, str(out), stretch=stretch)
        raw = out.read_bytes()
        assert raw.startswith(b"P5\n16 16\n255\n")
        assert len(raw) == len(b"P5\n16 16\n255\n") + 256


def test_image_as_table(tmp_path):
    """Image HDU exposed as (x, y, value) columns — the reference's
    readImageAsTable CSV layout (Fits.zig:268-344)."""
    img = np.arange(12, dtype=np.int16).reshape(3, 4)
    p = tmp_path / "img.fits"
    make_image_fits(str(p), img)
    cols = open_and_parse(str(p))[0].image_as_table()
    assert set(cols) == {"x", "y", "value"}
    assert len(cols["x"]) == 12
    # row-major: pixel (x=2, y=1) is flat index 1*4+2
    k = 1 * 4 + 2
    assert cols["x"][k] == 2 and cols["y"][k] == 1
    assert cols["value"][k] == img[1, 2] * 2.0 + 100.0  # BSCALE/BZERO


def test_png_export(tmp_path):
    """PNG container is well-formed and the decoded scanlines match
    the asinh-stretched input (Fits.zig:219,346-394)."""
    import struct
    import zlib

    from astroz_tpu.fits import _asinh_stretch, image_to_png

    img = np.random.default_rng(1).uniform(0, 1000, (8, 5))
    out = tmp_path / "img.png"
    image_to_png(img, str(out))
    raw = out.read_bytes()
    assert raw.startswith(b"\x89PNG\r\n\x1a\n")
    # walk chunks
    pos, chunks = 8, {}
    while pos < len(raw):
        (length,), tag = struct.unpack(">I", raw[pos:pos + 4]), \
            raw[pos + 4:pos + 8]
        payload = raw[pos + 8:pos + 8 + length]
        assert struct.unpack(">I", raw[pos + 8 + length:pos + 12 + length]
                             )[0] == zlib.crc32(tag + payload)
        chunks[tag] = payload
        pos += 12 + length
    w, h, depth, color = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    assert (w, h, depth, color) == (5, 8, 8, 0)
    lines = zlib.decompress(chunks[b"IDAT"])
    decoded = np.frombuffer(lines, np.uint8).reshape(8, 6)
    assert (decoded[:, 0] == 0).all()  # filter byte None
    expect = (_asinh_stretch(img, 0.15, 0.5) * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(decoded[:, 1:], expect)


def test_endtime_keyword_not_mistaken_for_end(tmp_path):
    """Regression: header keywords starting with END (e.g. ENDTIME)
    truncated the header."""
    img = np.arange(4, dtype=np.int16).reshape(2, 2)
    arr = np.asarray(img, ">i2")
    cards = [_card("SIMPLE", True), _card("BITPIX", 16),
             _card("NAXIS", 2), _card("NAXIS1", 2), _card("NAXIS2", 2),
             _card("ENDTIME", "2024-01-01"), _card("OBJECT", "X")]
    p = tmp_path / "endtime.fits"
    with open(p, "wb") as f:
        f.write(_header(cards))
        f.write(_pad_data(arr.tobytes()))
    fits = Fits.open(str(p))
    hdu = fits[0]
    assert hdu.header["ENDTIME"] == "2024-01-01"
    assert hdu.header["OBJECT"] == "X"
    assert hdu.image().shape == (2, 2)
