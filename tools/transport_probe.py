#!/usr/bin/env python3
"""Host<->device transport probe: per-direction bandwidth, same-direction
concurrency scaling, and full-duplex overlap.

The serving layer's transport-slicing design (runtime/transport.py's
SLICE_OUT_BYTES / MP3_SLICE_PCM_BYTES / DRAIN_THREADS, PROFILES.md
"duplex transport slicing")
rests on three measured properties of the link; this tool re-measures them
so a new deployment can size its slices:

1. per-direction bandwidth (and its variance),
2. whether concurrent same-direction transfers scale aggregate bandwidth
   (on the measured tunnel they do NOT — one stream saturates a direction),
3. whether uploads and downloads overlap (full duplex — they DO, which is
   what the drain-thread slicing exploits).

Every rep uses FRESH random content: repeated buffers get deduplicated
somewhere in the tunneled transport and read out fictional bandwidths
(measured: 745 MB/s for a repeated 1 MB upload vs ~10-50 MB/s real).

Usage: python tools/transport_probe.py [total_MB]
"""

import concurrent.futures as cf
import sys
import time

import numpy as np


def main(total_mb: int = 32) -> None:
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev}")
    f = jax.jit(lambda x, s: x + s)
    w = jax.device_put(np.zeros(1024, np.int16), dev)
    f(w, np.int16(1)).block_until_ready()

    def fresh(mb):
        return np.random.randint(-30000, 30000, size=(mb * 512 * 1024,),
                                 dtype=np.int16)

    def up(parts, nt):
        t0 = time.perf_counter()
        if nt == 1:
            outs = [jax.device_put(a, dev) for a in parts]
        else:
            with cf.ThreadPoolExecutor(nt) as ex:
                outs = list(ex.map(lambda a: jax.device_put(a, dev), parts))
        for x in outs:
            x.block_until_ready()
        return time.perf_counter() - t0, outs

    def down(devs, nt):
        t0 = time.perf_counter()
        if nt == 1:
            _ = [np.asarray(y) for y in devs]
        else:
            with cf.ThreadPoolExecutor(nt) as ex:
                _ = list(ex.map(np.asarray, devs))
        return time.perf_counter() - t0

    if total_mb < 8:
        raise SystemExit("total_MB must be >= 8 (4-part legs need >= 2 MB parts)")

    for npart, nt in [(1, 1), (4, 1), (4, 4)]:
        moved = (total_mb // npart) * npart   # report what actually moved
        dt, _ = up([fresh(total_mb // npart) for _ in range(npart)], nt)
        print(f"H2D {moved} MB, {npart} parts, {nt} threads: "
              f"{moved / dt:6.1f} MB/s")

    for npart, nt in [(4, 1), (4, 4)]:
        moved = (total_mb // npart) * npart
        devs = []
        for i in range(npart):
            x = jax.device_put(fresh(total_mb // npart), dev)
            y = f(x, np.int16(i + 1))
            y.block_until_ready()
            devs.append(y)
        dt = down(devs, nt)
        print(f"D2H {moved} MB, {npart} parts, {nt} threads: "
              f"{moved / dt:6.1f} MB/s")

    # duplex: one upload and one download racing on two threads
    half = total_mb // 2
    a = fresh(half)
    y = f(jax.device_put(fresh(half), dev), np.int16(7))
    y.block_until_ready()
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(2) as ex:
        fu = ex.submit(lambda: up([a], 1)[0])
        fd = ex.submit(lambda: down([y], 1))
        u, d = fu.result(), fd.result()
    wall = time.perf_counter() - t0
    print(f"duplex {half} MB each way: up {u:.2f}s down {d:.2f}s "
          f"wall {wall:.2f}s (serial would be {u + d:.2f}s; "
          f"ratio {(u + d) / wall:.2f}x)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
