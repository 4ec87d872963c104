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
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["polyphase_banded_pallas", "polyphase_banded_pallas_sharded",
           "polyphase_fused16_pallas", "polyphase_fused16_pallas_sharded",
           "pallas_supported", "fused16_supported"]


def _ensure_recursion_headroom() -> None:
    """Lowering a pallas_call nested inside a large scanned jit recurses
    deeply in JAX's MLIR lowering; the default 1000-frame Python limit is
    not enough at production scan sizes (observed: RecursionError from
    _lower_jaxpr_to_fun_cached at B=2048, 8-chunk scans). 30k covers the
    observed depth with a wide margin while staying far from C-stack
    exhaustion (CPython >= 3.11 keeps pure-Python frames on the heap, and
    JAX's lowering recursion is pure Python); a genuinely runaway
    recursion still raises RecursionError, which _with_pallas_fallback
    treats as a lowering failure. Never lowers a higher user-set limit.
    On CPython < 3.11 pure-Python frames still consume C stack, so raising
    the limit there trades RecursionError for a possible hard segfault —
    keep the default and let the fallback machinery route deep lowerings
    to the XLA path instead."""
    if sys.version_info >= (3, 11) and sys.getrecursionlimit() < 100_000:
        sys.setrecursionlimit(100_000)


def raise_recursion_ceiling() -> bool:
    """Last-ditch headroom before abandoning Pallas for the process: the
    BENCH_ALL_r05 run hit a RecursionError during chunk-fn lowering even
    with the standard headroom in place (the lowering stack depth scales
    with the traced program, and the *absolute* depth also includes
    however deep the caller already was). Returns True when the limit was
    actually raised — i.e. a retry is worth attempting; False when there
    is no more Python-frame headroom to give (CPython < 3.11, or already
    at the ceiling — e.g. the failure is C-frame recursion, which
    ``sys.setrecursionlimit`` cannot extend on 3.12+)."""
    if sys.version_info < (3, 11):
        return False
    cur = sys.getrecursionlimit()
    ceiling = 1_000_000
    if cur >= ceiling:
        return False
    sys.setrecursionlimit(ceiling)
    return True


def mark_unsupported() -> None:
    """Force the XLA fallback for the rest of the process: called when a
    REAL kernel instance fails to compile at some shape even though the
    probe passed (Mosaic lowering has shape-dependent failure modes on
    remote-compile transports)."""
    pallas_supported.cache_clear()
    fused16_supported.cache_clear()
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


def _slab_pipeline(starts_ref, x_hbm, slabs, sems):
    """Shared double-buffered slab-DMA schedule: while the MXU contracts
    slab g, the DMA engine fetches slab g+1 (scratch persists across the
    TPU's sequential grid). Tile starts are lane-aligned by construction
    (banded_weights_device rounds them down to 128); pl.multiple_of lets
    Mosaic prove the sliced DMA's lane-dim offset is tiling-divisible.
    Returns the VMEM block for the current grid step, DMA-complete."""
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
    return slabs[slot]


def _kernel(starts_ref, x_hbm, wt_ref, out_ref, slabs, sems):
    slab = _slab_pipeline(starts_ref, x_hbm, slabs, sems)
    out_ref[...] = jnp.dot(slab, wt_ref[...],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def polyphase_banded_pallas(xext, Wt, starts, *, T: int, interpret: bool = False):
    """Drop-in for ops.polyphase.polyphase_banded on TPU.

    xext: f32 ``[..., L]``; Wt f32 ``[nt, K, tile]``; starts int32 ``[nt]``
    (clamped so start + K <= L). Returns f32 ``[..., T]``.
    """
    _ensure_recursion_headroom()
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


def polyphase_banded_pallas_sharded(xext, Wt, starts, *, T: int, mesh,
                                    interpret: bool = False):
    """SPMD form of :func:`polyphase_banded_pallas` for a stream mesh.

    ``pallas_call`` has no GSPMD partitioning rule, so under a multi-device
    mesh the plain kernel either fails to partition or gets its batch
    all-gathered onto every chip.  The math is embarrassingly parallel over
    the leading (stream) dim, so the correct SPMD form is a ``shard_map``:
    each device runs the Mosaic kernel on its LOCAL batch block with the
    weight tiles and tile starts replicated — zero collectives, exactly the
    per-chip program the single-device path compiles.

    ``xext`` ``[..., L]`` must have its leading dim divisible by the mesh
    size (the serving classes' bucketing guarantees this).  ``Wt``/``starts``
    are chunk schedule constants, identical on every shard.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import STREAM_AXIS

    B = xext.shape[0]
    if B % mesh.size:
        raise ValueError(
            f"leading dim {B} must divide over the {mesh.size}-device mesh")
    lead = P(STREAM_AXIS, *([None] * (xext.ndim - 1)))
    f = jax.shard_map(
        functools.partial(polyphase_banded_pallas, T=T, interpret=interpret),
        mesh=mesh,
        in_specs=(lead, P(None, None, None), P(None)),
        out_specs=lead,
        check_vma=False,  # pallas_call defeats shard_map's varying-axis check
    )
    return f(xext, Wt, starts)


# --------------------------------------------------------------- fused 16-bit


def _fused16_kernel(starts_ref, x_hbm, wt_ref, out_ref, clip_ref, slabs, sems):
    """Slab-DMA contraction with the 16-bit quantize epilogue fused in.

    Input slabs stay RAW int16 in HBM (half the DMA bytes of the f32 path;
    the caller folds the PCM gain factor into the weight tiles), convert to
    f32 on the VPU, contract on the MXU at HIGHEST precision (Mosaic's dot
    lowering rejects HIGH; HIGHEST matches the sibling slab kernel above and
    only tightens the fast-path tolerance), then quantize
    in-register: round-half-up ``floor(x*2^15 + 0.5)`` with the reference's
    x86 cast semantics (out-of-int32-range / NaN products collapse to
    INT_MIN and therefore clip to NEGATIVE full scale —
    src/quantization_utils.cpp:61) and symmetric clip to int16 with a
    clipped-lane mask (:54-56). The f32 `out` intermediate never touches
    HBM; outputs are int16 samples + an int8 clip mask (~5x less output
    traffic than f32 out + separate quantize pass)."""
    slab = _slab_pipeline(starts_ref, x_hbm, slabs, sems)
    outf = jnp.dot(slab.astype(jnp.float32), wt_ref[...],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.floor(outf * jnp.float32(32768.0) + jnp.float32(0.5))
    # x86 cvttss2si: NaN or |y| >= 2^31 converts to INT_MIN -> clips LOW
    bad = jnp.isnan(y) | (y >= jnp.float32(2147483648.0)) \
        | (y < jnp.float32(-2147483648.0))
    yc = jnp.where(bad, jnp.float32(-2147483648.0), y)
    clipped = (yc > jnp.float32(32767.0)) | (yc < jnp.float32(-32768.0))
    val = jnp.clip(yc, jnp.float32(-32768.0), jnp.float32(32767.0))
    out_ref[...] = val.astype(jnp.int32).astype(jnp.int16)
    clip_ref[...] = clipped.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def polyphase_fused16_pallas(x2, Wt, starts, *, interpret: bool = False):
    """Fused resample+quantize tile kernel for 16-bit output.

    Args:
      x2: RAW int16 samples ``[M, L]`` (history + chunk, factor NOT applied).
      Wt: f32 ``[nt, K, tile]`` weight tiles with the PCM gain factor folded
        in (``banded_weights_device(...) * factor``).
      starts: int32 ``[nt]`` lane-aligned tile starts (banded_K(aligned=True)).
    Returns: (samples int16 ``[M, nt*tile]``, clip mask int8 ``[M, nt*tile]``).
    The caller slices to the real output count and applies its own valid-lane
    masking for clip counting (lanes past `gen` carry garbage, as in the XLA
    fast path).
    """
    _ensure_recursion_headroom()
    nt, K, tile = Wt.shape
    M, L = x2.shape
    assert x2.dtype == jnp.int16, x2.dtype

    bm = 1
    while bm < 512 and M % (bm * 2) == 0:
        bm *= 2
    if bm < 16:   # int16 sublane tile is 16; tiny batches use the XLA path
        raise ValueError(f"M={M} too small for the fused kernel (bm={bm})")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, M // bm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((None, K, tile), lambda i, m, s: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, tile), lambda i, m, s: (m, i)),
            pl.BlockSpec((bm, tile), lambda i, m, s: (m, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bm, K), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _fused16_kernel,
        out_shape=[jax.ShapeDtypeStruct((M, nt * tile), jnp.int16),
                   jax.ShapeDtypeStruct((M, nt * tile), jnp.int8)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), x2, Wt)


def polyphase_fused16_pallas_sharded(x2, Wt, starts, *, mesh,
                                     interpret: bool = False):
    """SPMD form of :func:`polyphase_fused16_pallas` for a stream mesh.

    Same shape as :func:`polyphase_banded_pallas_sharded`: ``pallas_call``
    has no GSPMD partitioning rule, so the fused kernel runs under a
    ``shard_map`` — each device executes the Mosaic slab-DMA + contract +
    quantize program on its LOCAL ``[M/mesh, L]`` int16 block with the
    gain-folded weight tiles and tile starts replicated (zero collectives).
    Both outputs (int16 samples, int8 clip mask) come back stream-sharded,
    so the caller's pack / clip-count epilogue partitions without any
    resharding collective.

    ``x2``'s leading dim must divide by the mesh size AND leave a local
    block of >= 16 rows (the int16 sublane tile — the single-device kernel's
    own minimum); the resampler's fused-tier gate checks both before
    selecting this form.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import STREAM_AXIS

    M = x2.shape[0]
    if M % mesh.size:
        raise ValueError(
            f"leading dim {M} must divide over the {mesh.size}-device mesh")
    if (M // mesh.size) % 16:
        raise ValueError(
            f"local block {M // mesh.size} below the fused kernel's 16-row "
            f"int16 sublane minimum (M={M}, mesh={mesh.size})")
    lead = P(STREAM_AXIS, None)
    f = jax.shard_map(
        functools.partial(polyphase_fused16_pallas, interpret=interpret),
        mesh=mesh,
        in_specs=(lead, P(None, None, None), P(None)),
        out_specs=(lead, lead),
        check_vma=False,  # pallas_call defeats shard_map's varying-axis check
    )
    return f(x2, Wt, starts)


@functools.lru_cache(None)
def fused16_supported() -> bool:
    """Probe the fused kernel once at a minimal real shape (see
    pallas_supported for why a probe is needed on this transport)."""
    if _FORCED_OFF or jax.default_backend() != "tpu":
        return False
    try:
        x = jnp.zeros((16, 256), jnp.int16)
        wt = jnp.zeros((1, 128, 128), jnp.float32)
        starts = jnp.zeros((1,), jnp.int32)
        s, c = polyphase_fused16_pallas(x, wt, starts)
        jax.block_until_ready(s)
        return True
    except Exception:
        return False
