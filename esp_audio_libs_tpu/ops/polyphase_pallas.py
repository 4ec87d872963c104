"""Pallas TPU kernel for the block-banded polyphase contraction.

The XLA fast path (ops/polyphase.polyphase_banded) materializes the per-tile
input slabs — an [M, nt, K] f32 intermediate (~300MB/chunk at production
shapes) written to and re-read from HBM purely to feed the matmul. This
kernel removes that round trip: each (tile, batch-block) program DMAs its
slab window HBM->VMEM directly (the window start is an arbitrary unaligned
offset, which BlockSpec index maps cannot express — hence the manual
``pltpu.make_async_copy`` with ``pl.ds``) and contracts it against the
tile's weight block on the MXU.

Numerics: same per-output dot products as the XLA path; the f32 matmul uses
HIGHEST precision like the einsum it replaces (fast-mode tolerance is
bounded by tests at <= 1 output LSB vs the exact path).

Grid: (nt, M/bm), m minor so a tile's weight block stays resident in VMEM
across the batch sweep. VMEM per program: slab bm*K + weights K*tile + out
bm*tile (~1.3MB at bm=256, K=768) — well under the ~16MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["polyphase_banded_pallas", "pallas_supported"]


def mark_unsupported() -> None:
    """Force the XLA fallback for the rest of the process: called when a
    REAL kernel instance fails to compile at some shape even though the
    probe passed (Mosaic lowering has shape-dependent failure modes on
    remote-compile transports)."""
    pallas_supported.cache_clear()
    global _FORCED_OFF
    _FORCED_OFF = True


_FORCED_OFF = False


@functools.lru_cache(None)
def pallas_supported() -> bool:
    """True when Mosaic kernels actually compile on this backend.

    Besides requiring a TPU backend, this probes a trivial kernel once:
    remote-compile transports (e.g. the axon tunnel's chipless AOT helper)
    can expose a TPU while being unable to initialize libtpu for Mosaic —
    there the XLA banded path is used instead. Tests exercise this kernel
    via interpret mode on any backend."""
    if _FORCED_OFF or jax.default_backend() != "tpu":
        return False
    try:
        # probe the REAL kernel at a minimal shape — a trivial kernel can
        # compile while the slab-DMA kernel's lowering still fails (observed:
        # a RecursionError inside Mosaic lowering on some tunnel versions)
        x = jnp.zeros((1, 1, 256), jnp.float32)
        wt = jnp.zeros((1, 128, 128), jnp.float32)
        starts = jnp.zeros((1,), jnp.int32)
        out = polyphase_banded_pallas(x, wt, starts, T=128)
        jax.block_until_ready(out)
        return True
    except Exception:
        return False


def _kernel(starts_ref, x_hbm, wt_ref, out_ref, slabs, sems):
    """Double-buffered across grid steps: while the MXU contracts slab g,
    the DMA engine fetches slab g+1 (scratch persists across the TPU's
    sequential grid). Tile starts are lane-aligned by construction
    (banded_weights_device rounds them down to 128); pl.multiple_of lets
    Mosaic prove the sliced DMA's lane-dim offset is tiling-divisible."""
    nm = pl.num_programs(1)
    g = pl.program_id(0) * nm + pl.program_id(1)
    total = pl.num_programs(0) * nm
    _, bm, K = slabs.shape

    def dma(step, slot):
        ii = step // nm
        mm = step - ii * nm
        st = pl.multiple_of(starts_ref[ii], 128)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(mm * bm, bm), pl.ds(st, K)],
            slabs.at[slot], sems.at[slot])

    slot = jax.lax.rem(g, jnp.int32(2))

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        dma(g + 1, jax.lax.rem(g + 1, jnp.int32(2))).start()

    dma(g, slot).wait()
    out_ref[...] = jnp.dot(slabs[slot], wt_ref[...],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def polyphase_banded_pallas(xext, Wt, starts, *, T: int, interpret: bool = False):
    """Drop-in for ops.polyphase.polyphase_banded on TPU.

    xext: f32 ``[..., L]``; Wt f32 ``[nt, K, tile]``; starts int32 ``[nt]``
    (clamped so start + K <= L). Returns f32 ``[..., T]``.
    """
    nt, K, tile = Wt.shape
    *lead, L = xext.shape
    M = 1
    for d in lead:
        M *= d

    # batch block: largest power-of-two divisor of M up to 512 (MXU-friendly);
    # batches too small to fill a sublane tile use the XLA path
    bm = 1
    while bm < 512 and M % (bm * 2) == 0:
        bm *= 2
    if bm < 8:
        from .polyphase import polyphase_banded

        return polyphase_banded(xext, Wt, starts, T=T)
    x2 = xext.reshape(M, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,              # starts
        grid=(nt, M // bm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),       # xext stays in HBM
            pl.BlockSpec((None, K, tile), lambda i, m, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, tile), lambda i, m, s: (m, i)),
        scratch_shapes=[
            pltpu.VMEM((2, bm, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((M, nt * tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), x2, Wt)
    return out.reshape(*lead, nt * tile)[..., :T]
