#!/usr/bin/env python
"""Roofline probe for the resampler's banded MXU contraction.

Times the production contraction shape (B=2048 stereo, 8192-frame chunks,
K=768 folded taps, 128-wide output tiles) at matmul precision DEFAULT (1
bf16 pass), HIGH (3 passes), and HIGHEST (6 passes), inside a scan with a
D2H completion barrier per rep (block_until_ready is not trustworthy on
this transport).  If time is ~flat across pass counts the contraction is
memory-bound (slab traffic), not FLOP-bound — the MFU number then measures
HBM efficiency, and more MXU passes are free.

Prints one JSON line per precision with achieved TFLOP/s and the implied
share of v5e bf16 peak (197 TFLOP/s) counting the real pass multiplier.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "build", "jax_cache"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, ch, K, tile = 2048, 2, 768, 128
    frames = 8192
    ratio = 16000.0 / 44100.0
    T_out = int(frames * ratio) + 8
    nt = (T_out + tile - 1) // tile
    L = frames + K + tile  # padded input line

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B * ch, L)).astype(np.float32))
    Wt = jnp.asarray(rng.standard_normal((nt, K, tile)).astype(np.float32) * 0.01)
    starts = jnp.asarray((np.arange(nt) * tile * (1 / ratio)).astype(np.int32))

    flops = 2.0 * nt * (B * ch) * K * tile
    passes = {"DEFAULT": 1, "HIGH": 3, "HIGHEST": 6}

    for name in ("DEFAULT", "HIGH", "HIGHEST"):
        prec = getattr(jax.lax.Precision, name)

        @jax.jit
        def chunked(x, Wt, starts, n=4):
            def step(carry, _):
                slabs = jax.vmap(
                    lambda s: jax.lax.dynamic_slice_in_dim(x, s, K, axis=-1))(starts)
                out = jnp.einsum("ibk,ikj->bij", slabs, Wt, precision=prec)
                return carry + out.sum(), None
            acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
            return acc

        n_inner = 4
        out = chunked(x, Wt, starts)
        _ = float(out)   # warm + D2H barrier
        reps = 6
        t0 = time.perf_counter()
        for _ in range(reps):
            _ = float(chunked(x, Wt, starts))
        dt = (time.perf_counter() - t0) / (reps * n_inner)
        tflops = flops / dt / 1e12
        mxu_tflops = tflops * passes[name]   # real bf16 MAC throughput
        print(json.dumps({
            "precision": name, "ms_per_chunk": round(dt * 1e3, 3),
            "achieved_tflops_f32_equivalent": round(tflops, 2),
            "mxu_bf16_tflops": round(mxu_tflops, 2),
            "pct_of_v5e_bf16_peak": round(100 * mxu_tflops / 197.0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
