"""ISO/IEC 11172-3 constant-table loader (MP3).

Tables are extracted once from the MPEG standard data shipped in the Helix
source by tools/extract_mp3_tables.py into build/mp3_tables.npz.  Device code
reads signed views (the fixed-point math is int32 with wraparound).
"""

from __future__ import annotations

import functools
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
NPZ = REPO / "build" / "mp3_tables.npz"


@functools.lru_cache(None)
def mp3_tables() -> dict:
    if not NPZ.exists():
        subprocess.run([sys.executable, str(REPO / "tools" / "extract_mp3_tables.py")],
                       check=True, capture_output=True)
    raw = dict(np.load(NPZ))
    out = {}
    for k, v in raw.items():
        if v.dtype == np.uint32:
            v = v.view(np.int32)
        elif v.dtype == np.uint16:
            v = v.astype(np.int32)
        elif v.dtype == np.uint8:
            v = v.astype(np.int32)
        elif v.dtype == np.int8:
            v = v.astype(np.int32)
        elif v.dtype == np.int16:
            v = v.astype(np.int32)
        out[k] = v
    return out
