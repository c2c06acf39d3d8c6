"""Telemetry parsing tests: CCSDS, VITA49, file/TCP Parser.

Mirrors the reference's parser robustness suite (Tle/Ccsds/Vita49
tests + the in-process dummy TCP server at parsers.zig:192-311).
"""

import socket
import threading
import time

import pytest

from astroz_tpu.io import Ccsds, CcsdsConfig, Parser, Vita49, parse_file
from astroz_tpu.io.ccsds import CcsdsError, build_packet as ccsds_build
from astroz_tpu.io.vita49 import (PacketType, Tsi, Vita49Error,
                                  build_packet as vita_build)
from astroz_tpu.equatorial import Declination, RightAscension, precess
from astroz_tpu.spice import et_to_jd, jd_to_et


def test_ccsds_roundtrip():
    raw = ccsds_build(apid=0x123, payload=b"hello", sequence_count=7,
                      packet_type=1)
    pkt = Ccsds.parse(raw)
    assert pkt.apid == 0x123
    assert pkt.packet_type == 1
    assert pkt.sequence_count == 7
    assert pkt.payload == b"hello"
    assert not pkt.secondary_header_flag
    assert pkt.total_length == len(raw)


def test_ccsds_secondary_header():
    raw = ccsds_build(apid=1, payload=b"data", secondary_header=b"\x01\x02")
    pkt = Ccsds.parse(raw, CcsdsConfig(secondary_header_length=2))
    assert pkt.secondary_header_flag
    assert pkt.secondary_header == b"\x01\x02"
    assert pkt.payload == b"data"


def test_ccsds_truncated_raises():
    raw = ccsds_build(apid=1, payload=b"abcdef")
    with pytest.raises(CcsdsError):
        Ccsds.parse(raw[:8])
    with pytest.raises(CcsdsError):
        Ccsds.parse(raw[:3])


def test_ccsds_config_json():
    cfg = CcsdsConfig.from_json('{"secondary_header_length": 10}')
    assert cfg.secondary_header_length == 10


def test_vita49_roundtrip():
    raw = vita_build(b"payload!", stream_id=42, tsi=Tsi.UTC,
                     integer_timestamp=1700000000, packet_count=3,
                     trailer=0xDEADBEEF)
    pkt = Vita49.parse(raw)
    assert pkt.packet_type == PacketType.SIGNAL_DATA_STREAM_ID
    assert pkt.stream_id == 42
    assert pkt.integer_timestamp == 1700000000
    assert pkt.packet_count == 3
    assert pkt.payload == b"payload!"
    assert pkt.trailer.raw == 0xDEADBEEF
    assert pkt.total_length == len(raw)


def test_vita49_malformed_raises():
    with pytest.raises(Vita49Error):
        Vita49.parse(b"\x00\x01")
    raw = vita_build(b"xx")
    with pytest.raises(Vita49Error):
        Vita49.parse(raw[:4])  # claims more words than present


def test_parser_file_back_to_back(tmp_path):
    """Back-to-back CCSDS frames parse in order (CCSDS has no sync
    marker, so garbage recovery needs an explicit sync pattern —
    same constraint as the reference's resync option)."""
    p1 = ccsds_build(apid=5, payload=b"one")
    p2 = ccsds_build(apid=6, payload=b"two")
    path = tmp_path / "stream.bin"
    path.write_bytes(p1 + p2)
    frames = parse_file(Ccsds, str(path))
    assert [f.apid for f in frames] == [5, 6]
    assert [f.payload for f in frames] == [b"one", b"two"]


def test_parser_sync_pattern(tmp_path):
    """Sync-pattern resync (parsers.zig:61-86): only frames following
    the pattern are parsed."""
    sync = b"\x1a\xcf\xfc\x1d"
    p1 = vita_build(b"frame one!!!")
    path = tmp_path / "sync.bin"
    path.write_bytes(b"junkjunk" + sync + p1 + b"trailing")
    parser = Parser(Vita49, sync_pattern=sync)
    # the pattern precedes each frame: parser skips the junk, then
    # parses the frame that starts right after the pattern
    frames = list(parser.iter_frames(path.read_bytes()))
    assert len(frames) == 1
    assert frames[0].payload.rstrip(b"\x00") == b"frame one!!!"


def test_parser_tcp_stream():
    """Live TCP ingestion with callback (parsers.zig:95-120, dummy
    server thread :192-311)."""
    pkts = [ccsds_build(apid=i, payload=bytes([i]) * 5,
                        sequence_count=i) for i in range(4)]

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        for p in pkts:
            conn.sendall(p)
            time.sleep(0.01)  # force fragmented delivery
        conn.close()

    th = threading.Thread(target=serve, daemon=True)
    th.start()

    seen = []
    frames = Parser(Ccsds).start("127.0.0.1", port,
                                 callback=seen.append, max_frames=4,
                                 timeout=5.0)
    th.join(timeout=5)
    server.close()
    assert len(frames) == 4
    assert [f.apid for f in frames] == [0, 1, 2, 3]
    assert len(seen) == 4


def test_equatorial_conversions():
    ra = RightAscension(hours=5, minutes=55, seconds=10.3)
    assert abs(ra.to_degrees() - 88.79291666) < 1e-6
    dec = Declination(degrees=7, arcminutes=24, arcseconds=25.4)
    assert abs(dec.to_degrees() - 7.40705555) < 1e-6
    dec_neg = Declination(degrees=-16, arcminutes=42, arcseconds=58.0)
    assert dec_neg.to_degrees() < -16.7
    back = RightAscension.from_degrees(ra.to_degrees())
    assert back.hours == 5 and back.minutes == 55
    assert abs(back.seconds - 10.3) < 1e-6


def test_precession_betelgeuse_50_years():
    """Betelgeuse J2000 -> J2050: RA grows ~2.6', Dec ~+1.5'
    (standard M/N method magnitudes)."""
    ra = RightAscension(5, 55, 10.3)
    dec = Declination(7, 24, 25.4)
    jd_2050 = 2451545.0 + 50 * 365.25
    ra2, dec2 = precess(ra, dec, jd_2050)
    dra_deg = ra2.to_degrees() - ra.to_degrees()
    ddec_deg = dec2.to_degrees() - dec.to_degrees()
    assert 0.5 < dra_deg < 1.2        # ~0.64 deg over 50 yr
    assert 0.0 < ddec_deg < 0.3       # northward drift


def test_spice_pure_time_math():
    assert jd_to_et(2451545.0) == 0.0
    assert et_to_jd(86400.0) == 2451546.0


def test_spice_gated():
    from astroz_tpu import spice
    if not spice.HAVE_SPICE:
        with pytest.raises(spice.SpiceNotEnabled):
            spice.get_sun_position(0.0)
        with pytest.raises(spice.SpiceNotEnabled):
            spice.load_kernel("/nonexistent.tls")


def test_vita49_fractional_timestamp_roundtrip():
    """Regression: build_packet advertised TSF but never appended the
    fractional timestamp word pair."""
    raw = vita_build(b"payload!", tsi=Tsi.UTC, integer_timestamp=7,
                     tsf=__import__("astroz_tpu.io.vita49",
                                    fromlist=["Tsf"]).Tsf.REAL_TIME_PS,
                     fractional_timestamp=123456789012345)
    pkt = Vita49.parse(raw)
    assert pkt.fractional_timestamp == 123456789012345
    assert pkt.payload == b"payload!"


def test_declination_subdegree_sign_roundtrip():
    """Regression: Declination.from_degrees(-0.5) lost the sign."""
    for deg in (-0.5, -0.004, -16.7, 0.5, 0.0):
        d = Declination.from_degrees(deg)
        assert abs(d.to_degrees() - deg) < 1e-9, deg


def test_parser_tcp_stream_resyncs_past_corrupt_frame():
    """Regression: a corrupt frame mid-stream (here a VITA49 header
    claiming 0 words, which no amount of extra data can complete) must
    not stall the stream parser — pre-fix, every later valid frame was
    lost because parse failures always 'waited for more data'."""
    from astroz_tpu.io import Vita49
    from astroz_tpu.io.vita49 import build_packet as v49_build

    good = [v49_build(payload=bytes([i]) * 8, stream_id=i)
            for i in range(3)]
    corrupt = b"\x10\x00\x00\x00" + b"\xab" * 12  # size_words == 0

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        conn.sendall(good[0])
        time.sleep(0.01)
        conn.sendall(corrupt)
        time.sleep(0.01)
        conn.sendall(good[1] + good[2])
        conn.close()

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    frames = Parser(Vita49).start("127.0.0.1", port, max_frames=3,
                                  timeout=5.0)
    th.join(timeout=5)
    server.close()
    assert [f.stream_id for f in frames] == [0, 1, 2]


def test_parse_stream_accepts_sync_pattern():
    """parse_stream must forward sync_pattern/config to the Parser
    (pre-fix it raised TypeError, breaking parity with parse_file)."""
    from astroz_tpu.io.parsers import parse_stream

    sync = b"\x1a\xcf\xfc\x1d"
    pkts = [ccsds_build(apid=i, payload=b"xyz", sequence_count=i)
            for i in range(2)]

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        for p in pkts:
            conn.sendall(b"\x00garbage" + sync + p)
        conn.close()

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    frames = parse_stream(Ccsds, "127.0.0.1", port, sync_pattern=sync,
                          max_frames=2, timeout=5.0)
    th.join(timeout=5)
    server.close()
    assert [f.apid for f in frames] == [0, 1]
