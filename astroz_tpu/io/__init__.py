"""Telemetry ingestion: CCSDS / VITA49 packet parsing + stream drivers.

Rebuild of the reference's telemetry layer (``src/Ccsds.zig``,
``src/Vita49.zig``, ``src/parsers.zig``) in pure Python — these paths
are host-side ingestion, not TPU compute (the reference likewise keeps
them off the SIMD hot path).
"""

from .ccsds import Ccsds, CcsdsConfig
from .vita49 import Vita49
from .parsers import Parser, parse_file, parse_stream

__all__ = ["Ccsds", "CcsdsConfig", "Vita49", "Parser", "parse_file",
           "parse_stream"]
