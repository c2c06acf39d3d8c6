"""Telemetry ingestion: build, stream, and parse CCSDS packets over TCP
(reference: parsers.zig TCP ingestion, examples ccsds/vita49 demos)."""

import socket
import threading

from astroz_tpu.io import Ccsds, Parser
from astroz_tpu.io.ccsds import build_packet

pkts = [build_packet(apid=100 + i, payload=f"frame-{i}".encode(),
                     sequence_count=i) for i in range(5)]

server = socket.socket()
server.bind(("127.0.0.1", 0))
server.listen(1)
port = server.getsockname()[1]

def serve():
    conn, _ = server.accept()
    for p in pkts:
        conn.sendall(p)
    conn.close()

threading.Thread(target=serve, daemon=True).start()
frames = Parser(Ccsds).start("127.0.0.1", port, max_frames=5,
                             callback=lambda f: print(
                                 f"APID {f.apid}: {f.payload.decode()}"))
print(f"parsed {len(frames)} frames")
