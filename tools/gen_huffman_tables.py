#!/usr/bin/env python3
"""Generate this project's own MP3 Huffman lookup tables.

ISO/IEC 11172-3 Table B.7 defines 34 Huffman code tables for Layer III
spectral data (32 "big value" pair tables + 2 "count1" quad tables).  The
normative content is the set of (codeword, length, value) tuples per table.
This tool recovers those tuples by walking the packed lookup tables extracted
from the reference source (build/mp3_tables.npz — see NOTICE.md), verifies
each recovered table is a complete prefix code (Kraft sum == 1, prefix-free),
and emits THIS project's own runtime layout:

  Pair tables: a first-level LUT of 2^root_bits uint16 entries per table.
    - leaf entry:    (total_code_len << 8) | (x << 4) | y     (bit 15 clear)
    - escape entry:  0x8000 | sub_id                          (bit 15 set)
      sub_id indexes pair_sub_bits[] / pair_sub_off[]; the second-level LUT
      at pair_sub[sub_off : sub_off + 2^sub_bits] holds leaf entries whose
      len field is the TOTAL codeword length (root_bits + suffix length).
  Quad tables: single-level LUT, uint16 (len << 8) | (v<<3 | w<<2 | x<<1 | y).

The decode loops in native/src/mp3_frontend.cpp consume only this layout.

Outputs: build/mp3_huff.h (host) and build/mp3_huff.npz (inspection/tests).
"""

from __future__ import annotations

from fractions import Fraction
from pathlib import Path

import numpy as np

BUILD = Path(__file__).resolve().parent.parent / "build"

N_PAIR_TABLES = 32
ROOT_BITS_CAP = 9


def walk_pair_table(tab: np.ndarray, base: int, tab_type: int):
    """Recover (code, length, x, y) tuples from one packed pair table.

    The packed format (observed contract of the extracted data): a node is
    [maxbits, entries * 2^maxbits]; an entry with len==0 is a link whose
    value is the uint16 offset of the child node relative to the current
    node; otherwise bits 15..12 = len within this node, 11..8 = y, 7..4 = x.
    One-shot tables are a single node.
    """
    codes = {}

    def visit(node: int, prefix: int, plen: int):
        maxbits = int(tab[node]) & 0x0F
        for idx in range(1 << maxbits):
            cw = int(tab[node + 1 + idx])
            ln = (cw >> 12) & 0x0F
            if ln == 0:
                visit(node + cw, (prefix << maxbits) | idx, plen + maxbits)
            else:
                code = (prefix << maxbits) | idx
                code >>= maxbits - ln  # drop the padding bits
                key = (code, plen + ln)
                val = ((cw >> 4) & 0x0F, (cw >> 8) & 0x0F)
                if key in codes:
                    assert codes[key] == val, f"conflicting leaf at {key}"
                codes[key] = val

    if tab_type == 0:  # no codes (all-zero region)
        return []
    if tab_type == 1:  # one-shot: [maxbits, entries...]
        maxbits = int(tab[base]) & 0x0F
        for idx in range(1 << maxbits):
            cw = int(tab[base + 1 + idx])
            ln = (cw >> 12) & 0x0F
            assert ln > 0, "one-shot tables have no links"
            key = (idx >> (maxbits - ln), ln)
            val = ((cw >> 4) & 0x0F, (cw >> 8) & 0x0F)
            if key in codes:
                assert codes[key] == val
            codes[key] = val
    else:
        visit(base, 0, 0)
    return sorted((ln, code, x, y) for (code, ln), (x, y) in codes.items())


def walk_quad_table(tab: np.ndarray, base: int, maxbits: int):
    codes = {}
    for idx in range(1 << maxbits):
        cw = int(tab[base + idx])
        ln = (cw >> 4) & 0x0F
        assert ln > 0
        key = (idx >> (maxbits - ln), ln)
        val = cw & 0x0F  # v w x y in bits 3..0
        if key in codes:
            assert codes[key] == val
        codes[key] = val
    return sorted((ln, code, v) for (code, ln), v in codes.items())


def check_prefix_code(codes, name):
    """Complete prefix code: Kraft sum exactly 1 and no code prefixes another."""
    if not codes:
        return
    kraft = sum(Fraction(1, 1 << ln) for ln, *_ in codes)
    assert kraft == 1, f"{name}: Kraft sum {kraft} != 1 (incomplete/over-full)"
    seen = sorted((ln, code) for ln, code, *_ in codes)
    for i, (ln_a, c_a) in enumerate(seen):
        for ln_b, c_b in seen[i + 1 :]:
            assert not (c_b >> (ln_b - ln_a)) == c_a, f"{name}: prefix clash"


def build_pair_lut(codes):
    """First-level LUT + second-level subtables for one pair table."""
    if not codes:
        return 0, np.zeros(0, np.uint16), [], []
    max_len = max(ln for ln, *_ in codes)
    root_bits = min(max_len, ROOT_BITS_CAP)
    root = np.zeros(1 << root_bits, np.uint16)
    long_by_prefix = {}
    for ln, code, x, y in codes:
        if ln <= root_bits:
            entry = np.uint16((ln << 8) | (x << 4) | y)
            lo = code << (root_bits - ln)
            root[lo : lo + (1 << (root_bits - ln))] = entry
        else:
            long_by_prefix.setdefault(code >> (ln - root_bits), []).append((ln, code, x, y))

    sub_bits, subs = [], []
    for prefix, group in sorted(long_by_prefix.items()):
        sb = max(ln for ln, *_ in group) - root_bits
        sub = np.zeros(1 << sb, np.uint16)
        for ln, code, x, y in group:
            sl = ln - root_bits
            suffix = code & ((1 << sl) - 1)
            entry = np.uint16((ln << 8) | (x << 4) | y)
            lo = suffix << (sb - sl)
            sub[lo : lo + (1 << (sb - sl))] = entry
        root[prefix] = np.uint16(0x8000 | len(sub_bits))
        sub_bits.append(sb)
        subs.append(sub)
    return root_bits, root, sub_bits, subs


def build_quad_lut(codes):
    max_len = max(ln for ln, *_ in codes)
    lut = np.zeros(1 << max_len, np.uint16)
    for ln, code, v in codes:
        entry = np.uint16((ln << 8) | v)
        lo = code << (max_len - ln)
        lut[lo : lo + (1 << (max_len - ln))] = entry
    return max_len, lut


def emit_c_array(f, ctype, name, arr):
    flat = np.asarray(arr).ravel()
    f.write(f"static const {ctype} {name}[{max(len(flat), 1)}] = {{")
    for i, v in enumerate(flat):
        if i % 12 == 0:
            f.write("\n  ")
        f.write(f"{int(v)}, ")
    f.write("\n};\n\n")


def main():
    t = np.load(BUILD / "mp3_tables.npz")
    huff, offs = t["huffTable"], t["huffTabOffset"]
    tab_type = t["huffTabType"]

    pair_root_bits = np.zeros(N_PAIR_TABLES, np.int32)
    pair_root_off = np.zeros(N_PAIR_TABLES, np.int32)
    pair_roots = []
    all_sub_bits, all_sub_off, all_subs = [], [], []
    pair_sub_base = np.zeros(N_PAIR_TABLES, np.int32)  # first sub_id of table

    sub_words = 0
    root_words = 0
    for ti in range(N_PAIR_TABLES):
        codes = walk_pair_table(huff, int(offs[ti]), int(tab_type[ti]))
        check_prefix_code(codes, f"pair{ti}")
        rb, root, sbits, subs = build_pair_lut(codes)
        pair_root_bits[ti] = rb
        pair_root_off[ti] = root_words
        pair_sub_base[ti] = len(all_sub_bits)
        # rebase escape entries to global sub ids
        esc = (root & 0x8000) != 0
        root = root.copy()
        root[esc] = 0x8000 | ((root[esc] & 0x7FFF) + len(all_sub_bits))
        pair_roots.append(root)
        root_words += len(root)
        for sb, sub in zip(sbits, subs):
            all_sub_bits.append(sb)
            all_sub_off.append(sub_words)
            all_subs.append(sub)
            sub_words += len(sub)

    quad_tab, quad_off, quad_max = t["quadTable"], t["quadTabOffset"], t["quadTabMaxBits"]
    quad_bits = np.zeros(2, np.int32)
    quad_offs = np.zeros(2, np.int32)
    quad_luts = []
    qw = 0
    for qi in range(2):
        codes = walk_quad_table(quad_tab, int(quad_off[qi]), int(quad_max[qi]))
        check_prefix_code(codes, f"quad{qi}")
        mb, lut = build_quad_lut(codes)
        quad_bits[qi] = mb
        quad_offs[qi] = qw
        quad_luts.append(lut)
        qw += len(lut)

    pair_root = np.concatenate(pair_roots) if pair_roots else np.zeros(0, np.uint16)
    pair_sub = np.concatenate(all_subs) if all_subs else np.zeros(0, np.uint16)
    quad_lut = np.concatenate(quad_luts)

    np.savez(
        BUILD / "mp3_huff.npz",
        pair_root_bits=pair_root_bits, pair_root_off=pair_root_off, pair_root=pair_root,
        pair_sub_bits=np.asarray(all_sub_bits, np.int32),
        pair_sub_off=np.asarray(all_sub_off, np.int32), pair_sub=pair_sub,
        quad_bits=quad_bits, quad_offs=quad_offs, quad_lut=quad_lut,
    )

    with open(BUILD / "mp3_huff.h", "w") as f:
        f.write("// Generated by tools/gen_huffman_tables.py — this project's own\n"
                "// two-level Huffman LUT layout for ISO/IEC 11172-3 Table B.7.\n"
                "// See the tool's docstring for the entry encoding.\n"
                "#pragma once\n#include <cstdint>\n\n")
        emit_c_array(f, "int32_t", "eal_pair_root_bits", pair_root_bits)
        emit_c_array(f, "int32_t", "eal_pair_root_off", pair_root_off)
        emit_c_array(f, "uint16_t", "eal_pair_root", pair_root)
        emit_c_array(f, "int32_t", "eal_pair_sub_bits", np.asarray(all_sub_bits, np.int32))
        emit_c_array(f, "int32_t", "eal_pair_sub_off", np.asarray(all_sub_off, np.int32))
        emit_c_array(f, "uint16_t", "eal_pair_sub", pair_sub)
        emit_c_array(f, "int32_t", "eal_quad_bits", quad_bits)
        emit_c_array(f, "int32_t", "eal_quad_offs", quad_offs)
        emit_c_array(f, "uint16_t", "eal_quad_lut", quad_lut)

    max_pair_len = max(
        (int(e >> 8) & 0x3F)
        for arr in (pair_root, pair_sub) for e in arr if e and not (e & 0x8000)
    )
    print(f"pair roots: {root_words} words, subs: {sub_words} words "
          f"({len(all_sub_bits)} subtables), quads: {qw} words; "
          f"max pair code length {max_pair_len}")


if __name__ == "__main__":
    main()
