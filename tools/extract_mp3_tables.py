#!/usr/bin/env python3
"""Extract the ISO/IEC 11172-3 constant tables from the reference MP3 source.

MP3 decoding requires the standard's constant data: Huffman code tables,
scalefactor-band boundaries, synthesis-filter coefficients, dequantization
lookup tables, IMDCT windows, etc.  These are normative DATA from the MPEG-1
audio standard (as shipped in the public Helix decoder the reference embeds);
this tool parses the initializers out of the reference source text once and
re-emits them in canonical form:

  build/mp3_tables.npz   — named numpy arrays (device/python side)
  build/mp3_tables.h     — generated C header (host front-end build)

No reference CODE is extracted — only numeric table contents. Provenance
caveat (see NOTICE.md): a few tables are Helix-specific fixed-point
QUANTIZATIONS of the standard's mathematical constants (imdctWin, csa,
coef32, polyCoef, pow43/pow2 families) — bit-exact parity requires the same
quantized values — and huffTable/quadTable are extracted in Helix's packed
layout solely as INPUT to tools/gen_huffman_tables.py, which recovers the
normative (codeword, length, value) tuples of ISO/IEC 11172-3 Table B.7 and
re-emits this project's own LUT format for the runtime to use.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/decode/mp3_decoder.cpp")
OUT_DIR = Path(__file__).resolve().parent.parent / "build"

# name -> (dtype, shape or None for flat)
TABLES = {
    "samplerateTab": (np.int32, (3, 3)),
    "bitrateTab": (np.int16, (3, 3, 15)),
    "samplesPerFrameTab": (np.int16, (3, 3)),
    "bitsPerSlotTab": (np.int16, (3,)),
    "sideBytesTab": (np.int16, (3, 2)),
    "slotTab": (np.int16, (3, 3, 15)),
    "imdctWin": (np.uint32, (4, 36)),
    "ISFMpeg1": (np.int32, (2, 7)),
    "ISFMpeg2": (np.int32, (2, 2, 16)),
    "ISFIIP": (np.int32, (2, 2)),
    "csa": (np.uint32, (8, 2)),
    "coef32": (np.int32, (31,)),
    "polyCoef": (np.uint32, (264,)),
    "preTab": (np.int8, (22,)),
    "pow14": (np.int32, (4,)),
    "pow43_14": (np.int32, (4, 16)),
    "pow43": (np.int32, None),
    "poly43lo": (np.uint32, (5,)),
    "poly43hi": (np.uint32, (5,)),
    "pow2exp": (np.int32, (8,)),
    "pow2frac": (np.int32, (8,)),
    "SFLenTab": (np.int8, (16, 2)),
    "NRTab": (np.int8, (6, 3, 4)),
    "c18": (np.uint32, (9,)),
    "fastWin36": (np.uint32, (18,)),
    "huffTable": (np.uint16, None),
    "huffTabOffset": (np.int32, (32,)),
    "quadTable": (np.uint8, (80,)),
    "quadTabOffset": (np.int32, (2,)),
    "quadTabMaxBits": (np.int32, (2,)),
    "dcttab": (np.int32, (48,)),
}

SCALARS = ["c9_0", "c9_1", "c9_2", "c9_3", "c9_4"]


def _strip_comments(src: str) -> str:
    src = re.sub(r"/\*.*?\*/", " ", src, flags=re.S)
    src = re.sub(r"//[^\n]*", " ", src)
    return src


def _macro_map(src: str):
    """All object-like #define macros resolved to integer strings (handles
    nested arithmetic like `#define B (9 + A)`)."""
    raw = dict(re.findall(r"#define\s+(\w+)\s+(.+)", src))

    resolved = {}

    def resolve(name, depth=0):
        if name in resolved:
            return resolved[name]
        if depth > 20 or name not in raw:
            return None
        expr = _strip_comments(raw[name]).strip()
        def sub_name(m):
            v = resolve(m.group(1), depth + 1)
            return m.group(1) if v is None else str(v)

        expr = re.sub(r"\b([A-Za-z_]\w*)\b", sub_name, expr)
        if not re.fullmatch(r"[0-9a-fA-FxX+\-*()\s]+", expr):
            return None
        try:
            val = eval(expr, {"__builtins__": {}}, {})
        except Exception:
            return None
        resolved[name] = int(val)
        return resolved[name]

    out = {}
    for name in raw:
        v = resolve(name)
        if v is not None:
            out[name] = str(v)
    return out


def extract_array(src: str, name: str):
    m = re.search(rf"\b{name}\s*(\[[^=]*)?=\s*\{{", src)
    if not m:
        raise KeyError(name)
    start = src.index("{", m.start())
    depth = 0
    i = start
    while True:
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = _strip_comments(src[start + 1:i])
    macros = _macro_map(src)
    body = re.sub(r"\b([A-Za-z_]\w*)\b", lambda mm: macros.get(mm.group(1), mm.group(1)), body)
    body = body.replace("{", " ").replace("}", " ")
    nums = re.findall(r"(?<![\w.])-?\s*(?:0[xX][0-9a-fA-F]+|\d+)(?![\w.])", body)
    nums = [re.sub(r"\s+", "", n) for n in nums]

    def cint(n):
        neg = n.startswith("-")
        if neg:
            n = n[1:]
        if n.lower().startswith("0x"):
            v = int(n, 16)
        elif len(n) > 1 and n.startswith("0"):
            try:
                v = int(n, 8)  # C octal literal
            except ValueError:
                v = int(n, 10)  # e.g. table column formatting like "08"
        else:
            v = int(n, 10)
        return -v if neg else v

    return [cint(n) for n in nums]


def extract_sfband(src: str):
    """sfBandTable: 3x3 struct entries of {long[23], short[14]}."""
    vals = extract_array(src, "sfBandTable")
    assert len(vals) == 9 * (23 + 14), len(vals)
    arr = np.asarray(vals, np.int32).reshape(3, 3, 37)
    return arr[:, :, :23].copy(), arr[:, :, 23:].copy()


def extract_hufftab_lookup(src: str):
    """huffTabLookup: entries {linBits, tabType-enum}."""
    m = re.search(r"huffTabLookup\[HUFF_PAIRTABS\]\s*=\s*\{", src)
    body_start = src.index("{", m.start())
    depth, i = 0, body_start
    while True:
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = _strip_comments(src[body_start + 1:i])
    enum_map = {"noBits": 0, "oneShot": 1, "loopNoLinbits": 2, "loopLinbits": 3,
                "quadA": 4, "quadB": 5, "invalidTab": 6}
    entries = re.findall(r"\{\s*(\d+)\s*,\s*(\w+)\s*\}", body)
    lin = np.asarray([int(a) for a, b in entries], np.int32)
    typ = np.asarray([enum_map[b] for a, b in entries], np.int32)
    assert len(lin) == 32, len(lin)
    return lin, typ


def main():
    src = REF.read_text()
    out = {}
    for name, (dtype, shape) in TABLES.items():
        vals = extract_array(src, name)
        arr = np.asarray(vals, np.int64)
        if dtype in (np.uint32, np.uint16, np.uint8):
            arr = arr & ((1 << (8 * np.dtype(dtype).itemsize)) - 1)
        arr = arr.astype(dtype)
        if shape is not None:
            arr = arr.reshape(shape)
        out[name] = arr
    for s in SCALARS:
        m = re.search(rf"\b{s}\s*=\s*(-?0[xX][0-9a-fA-F]+|-?\d+)", src)
        out[s] = np.asarray(int(m.group(1), 0), np.int32)
    long_b, short_b = extract_sfband(src)
    out["sfBandLong"] = long_b
    out["sfBandShort"] = short_b
    lin, typ = extract_hufftab_lookup(src)
    out["huffLinBits"] = lin
    out["huffTabType"] = typ

    OUT_DIR.mkdir(exist_ok=True)
    np.savez(OUT_DIR / "mp3_tables.npz", **out)

    # generated C header for the native front-end
    with open(OUT_DIR / "mp3_tables.h", "w") as f:
        f.write("// GENERATED by tools/extract_mp3_tables.py — ISO 11172-3 constant data.\n")
        f.write("#pragma once\n#include <cstdint>\n")
        ctype = {np.dtype(np.int32): "int32_t", np.dtype(np.int16): "int16_t",
                 np.dtype(np.int8): "int8_t", np.dtype(np.uint32): "uint32_t",
                 np.dtype(np.uint16): "uint16_t", np.dtype(np.uint8): "uint8_t"}
        for name, arr in out.items():
            arr = np.asarray(arr)
            t = ctype[arr.dtype]
            if arr.ndim == 0:
                f.write(f"static const {t} eal_{name} = {int(arr)};\n")
                continue
            flat = arr.ravel()
            dims = "".join(f"[{d}]" for d in arr.shape)
            f.write(f"static const {t} eal_{name}{dims} = {{")
            f.write(",".join(str(int(v)) for v in flat))
            f.write("};\n")
    print(f"extracted {len(out)} tables -> {OUT_DIR}/mp3_tables.npz, .h")
    for k, v in sorted(out.items()):
        print(f"  {k}: {np.asarray(v).shape} {np.asarray(v).dtype}")


if __name__ == "__main__":
    sys.exit(main())
