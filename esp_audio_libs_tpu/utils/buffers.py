"""Buffer management: host staging pools and device-buffer donation.

TPU-native equivalent of the reference's memory utilities (reference:
src/memory_utils.cpp:11-32 — ``alloc_psram_fallback`` prefers large/slow
PSRAM and falls back to internal RAM).  The analogous tiering on a TPU host
is:

  * **host staging buffers** (the PSRAM analog): large reusable numpy
    arrays that parsed frames / PCM are packed into before a single
    ``device_put``.  Allocating these per call is the hot-loop malloc the
    reference avoids; ``BufferPool`` keeps them alive and recycles by
    (shape, dtype) so the feed path is allocation-free in steady state.
  * **device (HBM) buffers** (the internal-RAM analog): owned by XLA.  The
    lever we control is *donation* — ``donate`` marks carried-state
    arguments of a jitted step so XLA reuses their HBM pages for the
    outputs instead of double-buffering (the vbuf/overBuf/history analogs
    of SURVEY.md §2 #17 are all donation-eligible).

No ctypes arena is needed for the native front-ends: they allocate their
own fixed-size state structs once per decoder (see native/src/*_frontend.cpp)
exactly like the reference's AllocateBuffers (mp3_decoder.cpp:8047-8097).
"""

from __future__ import annotations

import functools
import threading

import jax
import numpy as np

__all__ = ["BufferPool", "default_pool", "donate", "device_put_pooled"]


class BufferPool:
    """Reusable host staging arrays, keyed by (shape, dtype).

    ``acquire`` returns a zeroed-or-dirty array (caller overwrites);
    ``release`` returns it for reuse.  Thread-safe; bounded per key so a
    burst can't pin unbounded host memory (the fallback behavior of the
    reference allocator: when the preferred tier is exhausted, allocate
    normally and let it be freed).
    """

    def __init__(self, max_per_key: int = 4):
        self._free: dict[tuple, list[np.ndarray]] = {}
        self._lock = threading.Lock()
        self._max = max_per_key
        self.hits = 0
        self.misses = 0

    def acquire(self, shape, dtype) -> np.ndarray:
        key = (tuple(shape), np.dtype(dtype).str)
        with self._lock:
            stack = self._free.get(key)
            if stack:
                self.hits += 1
                return stack.pop()
            self.misses += 1
        return np.empty(shape, dtype)

    def release(self, arr: np.ndarray) -> None:
        key = (arr.shape, arr.dtype.str)
        with self._lock:
            stack = self._free.setdefault(key, [])
            if len(stack) < self._max:
                stack.append(arr)

    def clear(self) -> None:
        with self._lock:
            self._free.clear()

    class _Lease:
        def __init__(self, pool, arr):
            self.pool, self.array = pool, arr

        def __enter__(self):
            return self.array

        def __exit__(self, *exc):
            self.pool.release(self.array)
            return False

    def lease(self, shape, dtype):
        """``with pool.lease((n,), np.int32) as buf: ...`` scoped acquire."""
        return self._Lease(self, self.acquire(shape, dtype))


@functools.lru_cache(None)
def default_pool() -> BufferPool:
    return BufferPool()


def donate(fn=None, *, argnums=None, argnames=None, **jit_kwargs):
    """``jax.jit`` with donated carried-state arguments.

    Use on step functions whose inputs include large carried state (decoder
    vbuf/overlap/history tensors): donation lets XLA write outputs into the
    inputs' HBM pages, halving peak memory for the state — the device-side
    counterpart of the reference keeping its big FIFOs in one long-lived
    allocation (mp3_decoder.cpp:8047-8097).

        @donate(argnums=(1,))
        def step(x, state): ...
    """

    def wrap(f):
        kw = dict(jit_kwargs)
        if argnums is not None:
            kw["donate_argnums"] = argnums
        if argnames is not None:
            kw["donate_argnames"] = argnames
        return jax.jit(f, **kw)

    return wrap if fn is None else wrap(fn)


def device_put_pooled(host_fill, shape, dtype, sharding=None,
                      pool: BufferPool | None = None):
    """Stage-through-pool transfer: lease a host buffer, let ``host_fill``
    write into it, ship it in ONE ``device_put`` (optionally sharded), and
    recycle the staging array.

    This is the framework's feed-path idiom: one transfer per batch instead
    of one per stream (the tunnel-latency lesson baked into
    models/resampler.py ``resample_stream``).
    """
    pool = pool or default_pool()
    with pool.lease(shape, dtype) as buf:
        host_fill(buf)
        if sharding is not None:
            return jax.device_put(buf, sharding)
        return jax.device_put(buf)
