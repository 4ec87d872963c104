"""Sequence parallelism: time-sharded resample == single-device fast path.

Runs on the virtual 8-device CPU mesh (conftest). The folded fast path is a
pure FIR, so the halo-exchange decomposition computes the same per-output
dot products as the single-device banded kernel (up to f32 reduction-order
rounding from the different in-slab band alignment).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esp_audio_libs_tpu.ops import biquad as bq
from esp_audio_libs_tpu.ops import sinc
from esp_audio_libs_tpu.ops.polyphase import (
    banded_K, banded_weights_device, polyphase_banded)
from esp_audio_libs_tpu.parallel.sequence import (
    sequence_parallel_resample, time_mesh)
from esp_audio_libs_tpu.runtime.native import design_filterbank_native
from esp_audio_libs_tpu.runtime.phase_grid import PhaseState, phase_grid


@pytest.mark.parametrize("fold", [False, True])
def test_time_sharded_matches_single_device(fold):
    taps, nf = 64, 32
    ratio = 16000 / 44100
    flags = sinc.SUBSAMPLE_INTERPOLATE | sinc.INCLUDE_LOWPASS
    bank = np.asarray(design_filterbank_native(
        taps, nf, float(np.float32(ratio * 0.9)), flags), np.float32)
    if fold:
        coeffs = bq.biquad_init(bq.biquad_lowpass(float(np.float32(ratio * 0.45))), 1.0)
        filt, direct, off = bq.fold_biquad_into_filterbank(
            bank, coeffs, bq.fir_len_for(coeffs), half=taps // 2)
    else:
        filt, off = bank, 0
        direct = np.zeros(taps, np.float32)
        direct[taps // 2 - 1] = 1.0
    taps_p = filt.shape[1]
    halo = taps_p + 8
    K = banded_K(ratio, taps_p)

    D = len(jax.devices())
    assert D == 8
    T_in = D * 2048
    st = PhaseState.initial(taps)
    st.advance(taps / 2.0)
    out_free = int(T_in * ratio) + 8
    grid = phase_grid(st, nf, flags, np.float32(ratio), T_in, out_free)
    gen = grid.output_generated

    rng = np.random.default_rng(17)
    x = rng.standard_normal((2, 2, T_in)).astype(np.float32)

    # adjust win0 for the fold offset the way models/resampler does: the
    # folded window starts off samples earlier
    class G:                       # shallow copy with shifted win0
        win0 = grid.win0 - off
        idx1, idx2, weight, mode = grid.idx1, grid.idx2, grid.weight, grid.mode
        output_generated = gen

    mesh = time_mesh()
    y, counts = sequence_parallel_resample(
        jnp.asarray(x), filt, direct, G, mesh, taps_p=taps_p, K=K, halo=halo)
    y = np.asarray(y)
    To = y.shape[-1] // D
    got = np.concatenate(
        [y[..., d * To: d * To + counts[d]] for d in range(D)], axis=-1)
    assert got.shape[-1] == gen
    # padded per-device slots are zero, not garbage
    for d in range(D):
        np.testing.assert_array_equal(y[..., d * To + counts[d]:(d + 1) * To], 0.0)

    # single-device reference: same weights over the full (halo-padded) input
    L = -(-max(halo + T_in, K) // 128) * 128   # lane-aligned like production
    T_pad = -(-gen // 128) * 128
    win0x = np.zeros(T_pad, np.int32)
    win0x[:gen] = G.win0[:gen] + halo
    win0x[gen:] = win0x[gen - 1]
    pad = lambda a: np.pad(a[:gen], (0, T_pad - gen))
    xp = np.pad(x, [(0, 0), (0, 0), (halo, L - halo - T_in)])

    @jax.jit
    def single(xp, win0x, i1, i2, w, m):
        Wt, stt = banded_weights_device(
            jnp.asarray(filt), jnp.asarray(direct), win0x, i1, i2, w, m,
            jnp.int32(gen), K=K, taps_p=taps_p, L=xp.shape[-1])
        return polyphase_banded(xp, Wt, stt, T=T_pad)

    ref = np.asarray(single(
        jnp.asarray(xp), jnp.asarray(win0x), jnp.asarray(pad(G.idx1)),
        jnp.asarray(pad(G.idx2)), jnp.asarray(pad(G.weight)),
        jnp.asarray(pad(G.mode.astype(np.int32)))))

    # the band sits at different offsets inside the slab in the two
    # formulations, so the dot's f32 reduction tree groups addends
    # differently: equality holds to reduction-order tolerance, not bitwise
    np.testing.assert_allclose(got, ref[..., :gen], rtol=2e-6, atol=2e-6)


def test_exact_iir2_time_sharded_bit_exact():
    """Exact-mode SP composition: the order-2 IIR recurrence time-sharded
    over 8 devices with ppermute boundary-state passing is BIT-identical to
    the single-device sequential solve — including the carried final state
    across successive chunks."""
    from esp_audio_libs_tpu.ops.scan import iir2_sequential
    from esp_audio_libs_tpu.parallel.sequence import sequence_parallel_iir2

    mesh = time_mesh()
    D = mesh.devices.size
    rng = np.random.default_rng(7)
    B, T = 3, 64 * D
    p1, p2 = jnp.float32(-1.6), jnp.float32(0.81)   # stable resonator poles
    y1 = jnp.zeros(B, jnp.float32)
    y2 = jnp.zeros(B, jnp.float32)
    ys1, ys2 = y1, y2
    for chunk in range(3):   # carried state across chunks
        f = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
        ref, (r1, r2) = iir2_sequential(f, p1, p2, ys1, ys2)
        got, (g1, g2) = sequence_parallel_iir2(f, p1, p2, y1, y2, mesh)
        np.testing.assert_array_equal(
            np.asarray(got).view(np.uint32), np.asarray(ref).view(np.uint32),
            err_msg=f"chunk {chunk}")
        np.testing.assert_array_equal(np.asarray(g1).view(np.uint32),
                                      np.asarray(r1).view(np.uint32))
        np.testing.assert_array_equal(np.asarray(g2).view(np.uint32),
                                      np.asarray(r2).view(np.uint32))
        y1, y2, ys1, ys2 = g1, g2, r1, r2


def test_exact_iir2_cascade_composes():
    """Two SP IIR stages chained (the resampler's 2-biquad-cascade shape)
    stay bit-exact vs the sequential cascade."""
    from esp_audio_libs_tpu.ops.scan import iir2_sequential
    from esp_audio_libs_tpu.parallel.sequence import sequence_parallel_iir2

    mesh = time_mesh()
    D = mesh.devices.size
    rng = np.random.default_rng(11)
    B, T = 2, 32 * D
    p1, p2 = jnp.float32(-1.2), jnp.float32(0.5)
    f = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    z = jnp.zeros(B, jnp.float32)

    r1s, _ = iir2_sequential(f, p1, p2, z, z)
    r2s, _ = iir2_sequential(r1s, p1, p2, z, z)
    g1s, _ = sequence_parallel_iir2(f, p1, p2, z, z, mesh)
    g2s, _ = sequence_parallel_iir2(g1s, p1, p2, z, z, mesh)
    np.testing.assert_array_equal(np.asarray(g2s).view(np.uint32),
                                  np.asarray(r2s).view(np.uint32))


def test_lpc_companion_scan_bitexact_fixed_orders():
    """SURVEY §2/§5 SP row: the order-k companion-matrix associative scan
    restores shift-0 (fixed-predictor) subframes BIT-IDENTICALLY to the
    sequential scan — exact because the shift-0 recurrence is affine over
    Z/2^64 (the in-loop floor of shifted LPC is what makes the general
    case impossible; see the docstring)."""
    import jax.numpy as jnp
    from esp_audio_libs_tpu.ops.lpc import lpc_restore
    from esp_audio_libs_tpu.parallel.sequence import lpc_companion_scan

    kFixed = {0: [], 1: [1], 2: [-1, 2], 3: [1, -3, 3], 4: [-1, 4, -6, 4]}
    rng = np.random.default_rng(5)
    B, T = 6, 256
    data = rng.integers(-3000, 3000, (B, T)).astype(np.int32)
    orders = np.array([0, 1, 2, 3, 4, 2], np.int32)
    coeffs = np.zeros((B, 32), np.int32)
    for b, o in enumerate(orders):
        coeffs[b, :o] = kFixed[int(o)]

    want = lpc_restore(jnp.asarray(data), jnp.asarray(coeffs),
                       jnp.asarray(orders), jnp.zeros(B, jnp.int32),
                       use64=True)
    got = lpc_companion_scan(jnp.asarray(data), jnp.asarray(coeffs),
                             jnp.asarray(orders))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lpc_companion_scan_time_sharded():
    """The scan's time axis shards over the mesh: the same computation
    with the sample axis distributed across 8 virtual devices (GSPMD
    partitions associative_scan's log-depth combines with ICI boundary
    exchanges) stays bit-identical."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from esp_audio_libs_tpu.parallel.sequence import (lpc_companion_scan,
                                                      time_mesh)

    rng = np.random.default_rng(7)
    B, T = 2, 512
    data = rng.integers(-2000, 2000, (B, T)).astype(np.int32)
    coeffs = np.zeros((B, 32), np.int32)
    coeffs[:, :2] = [-1, 2]
    orders = np.full(B, 2, np.int32)

    ref = np.asarray(lpc_companion_scan(jnp.asarray(data),
                                        jnp.asarray(coeffs),
                                        jnp.asarray(orders)))
    mesh = time_mesh()
    sharded = jax.device_put(
        data, NamedSharding(mesh, P(None, "time")))
    fn = jax.jit(lambda d, c, o: lpc_companion_scan(d, c, o))
    got = np.asarray(fn(sharded, jnp.asarray(coeffs), jnp.asarray(orders)))
    np.testing.assert_array_equal(got, ref)
