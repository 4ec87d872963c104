#!/usr/bin/env python3
"""Generate this project's MP3 Huffman tables (build/mp3_huff.{h,npz}).

ISO/IEC 11172-3 Table B.7 defines 34 Huffman code tables for Layer III
spectral data (32 "big value" pair-table ids + 2 "count1" quad tables).  This
tool recovers the normative (codeword, length, value) tuples by walking the
packed lookup tables extracted from the reference source (build/mp3_tables.npz
— see NOTICE.md), verifies each recovered table is a complete prefix code
(Kraft sum == 1), and emits the runtime tables consumed by
native/src/mp3_frontend.cpp.

Why the emitted pair tables are NODE trees rather than flat LUTs: the
reference decoder's behavior past the end of a granule's bit allotment is
observable (the fuzz-parity contract covers garbage streams), and that
behavior — 11-bit zero-pad grants issued per cache refill — is keyed to the
reference's *node-by-node* walk: a multi-level codeword can trigger a pad at
each level boundary.  Bit-exact parity therefore requires preserving the node
SEGMENTATION (which prefixes get their own sub-table).  Everything else is
this project's own: entry encoding, table-relative child offsets, breadth-
first node placement, and the decode loop/bit reader that consume them.

Pair node layout (uint16 words, one array per table concatenated into
eal_pair_nodes, table starts at eal_pair_node_off[id]):
  node      := [nbits, entry * 2^nbits]
  leaf      := 0x8000 | (len << 8) | (y << 4) | x    (len = bits consumed at
                                                      THIS node, 1..nbits)
  link      := child node offset relative to the table start (bit 15 clear)
Special eal_pair_node_off values: -2 = value-less table (region is zeros),
-1 = reserved table id (selecting it is a stream error).

Quad tables are single-level flat LUTs:
  entry     := (len << 8) | (v << 3 | w << 2 | x << 1 | y)
"""

from __future__ import annotations

from fractions import Fraction
from pathlib import Path

import numpy as np

BUILD = Path(__file__).resolve().parent.parent / "build"

N_PAIR_TABLES = 32


def walk_nodes(huff, base):
    """Discover the node set of one packed pair table (BFS order).

    Packed node shape: [maxbits, entries * 2^maxbits]; an entry with a zero
    length nibble is a link whose value is the child offset relative to the
    current node.
    """
    sizes = {}
    order = []
    queue = [int(base)]
    while queue:
        n = queue.pop(0)
        if n in sizes:
            continue
        nb = int(huff[n]) & 0x0F
        sizes[n] = nb
        order.append(n)
        for idx in range(1 << nb):
            cw = int(huff[n + 1 + idx])
            if (cw >> 12) & 0x0F == 0:
                queue.append(n + cw)
    return order, sizes


def convert_table(huff, base):
    """Re-emit one packed pair table in this project's node encoding."""
    order, sizes = walk_nodes(huff, base)
    my_off = {}
    pos = 0
    for n in order:
        my_off[n] = pos
        pos += 1 + (1 << sizes[n])
    out = np.zeros(pos, np.uint16)
    for n in order:
        nb = sizes[n]
        out[my_off[n]] = nb
        for idx in range(1 << nb):
            cw = int(huff[n + 1 + idx])
            ln = (cw >> 12) & 0x0F
            if ln == 0:
                child = my_off[n + cw]
                assert 0 < child < 0x8000
                out[my_off[n] + 1 + idx] = child
            else:
                x = (cw >> 4) & 0x0F
                y = (cw >> 8) & 0x0F
                out[my_off[n] + 1 + idx] = 0x8000 | (ln << 8) | (y << 4) | x
    return out


def enumerate_codes(nodes):
    """Canonical (length, code, x, y) tuples from a converted node table."""
    codes = {}

    def visit(node, prefix, plen):
        nb = int(nodes[node])
        for idx in range(1 << nb):
            e = int(nodes[node + 1 + idx])
            if e & 0x8000:
                ln = (e >> 8) & 0x0F
                code = ((prefix << nb) | idx) >> (nb - ln)
                key = (code, plen + ln)
                val = (e & 0x0F, (e >> 4) & 0x0F)
                if key in codes:
                    assert codes[key] == val, f"conflicting leaf at {key}"
                codes[key] = val
            else:
                visit(e, (prefix << nb) | idx, plen + nb)

    visit(0, 0, 0)
    return sorted((ln, code, x, y) for (code, ln), (x, y) in codes.items())


def check_prefix_code(codes, name):
    """Complete prefix code: Kraft sum exactly 1."""
    if not codes:
        return
    kraft = sum(Fraction(1, 1 << ln) for ln, *_ in codes)
    assert kraft == 1, f"{name}: Kraft sum {kraft} != 1 (incomplete/over-full)"


def walk_quad_table(tab, base, maxbits):
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
    tab_type = t["huffTabType"].astype(int)

    node_off = np.zeros(N_PAIR_TABLES, np.int32)
    node_tabs = []
    pos = 0
    max_len = 0
    for ti in range(N_PAIR_TABLES):
        if tab_type[ti] == 0:  # value-less table: region decodes to zeros
            node_off[ti] = -2
            continue
        if tab_type[ti] not in (1, 2, 3):  # reserved id: stream error
            node_off[ti] = -1
            continue
        tab = convert_table(huff, int(offs[ti]))
        codes = enumerate_codes(tab)
        check_prefix_code(codes, f"pair{ti}")
        max_len = max(max_len, max(ln for ln, *_ in codes))
        node_off[ti] = pos
        node_tabs.append(tab)
        pos += len(tab)
    pair_nodes = np.concatenate(node_tabs)

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
    quad_lut = np.concatenate(quad_luts)

    np.savez(
        BUILD / "mp3_huff.npz",
        pair_node_off=node_off, pair_nodes=pair_nodes,
        quad_bits=quad_bits, quad_offs=quad_offs, quad_lut=quad_lut,
    )

    with open(BUILD / "mp3_huff.h", "w") as f:
        f.write("// Generated by tools/gen_huffman_tables.py — node-tree Huffman tables\n"
                "// for ISO/IEC 11172-3 Table B.7 in this project's encoding.  See the\n"
                "// tool's docstring for the layout and why node segmentation is kept.\n"
                "#pragma once\n#include <cstdint>\n\n")
        emit_c_array(f, "int32_t", "eal_pair_node_off", node_off)
        emit_c_array(f, "uint16_t", "eal_pair_nodes", pair_nodes)
        emit_c_array(f, "int32_t", "eal_quad_bits", quad_bits)
        emit_c_array(f, "int32_t", "eal_quad_offs", quad_offs)
        emit_c_array(f, "uint16_t", "eal_quad_lut", quad_lut)

    print(f"pair nodes: {pos} words across {len(node_tabs)} tables "
          f"(max code length {max_len}); quads: {qw} words")


if __name__ == "__main__":
    main()
