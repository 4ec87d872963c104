"""Block-banded fast polyphase: equivalence with the dense fast path.

The banded path (ops/polyphase.py build_banded_weights + polyphase_banded)
is a schedule compression of the scatter+matmul fast path: same f32 lerp
folding, same HIGHEST-precision contraction per output column — outputs must
match the dense formulation to f32 association-order tolerance and the exact
path closely.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from esp_audio_libs_tpu.ops import biquad as bq
from esp_audio_libs_tpu.ops import sinc
from esp_audio_libs_tpu.ops.polyphase import (
    banded_K, banded_weights_device, build_banded_weights, polyphase_apply,
    polyphase_banded)
from esp_audio_libs_tpu.runtime.native import design_filterbank_native
from esp_audio_libs_tpu.runtime.phase_grid import PhaseState, phase_grid


def _grid(taps, nf, ratio, frames, out_free, flags):
    st = PhaseState.initial(taps)
    st.advance(taps / 2.0)
    return phase_grid(st, nf, flags, np.float32(ratio), frames, out_free)


@pytest.mark.parametrize("ratio,frames", [(16000 / 44100, 700), (48000 / 44100, 400)])
def test_banded_matches_dense_fast(ratio, frames):
    taps, nf = 64, 32
    flags = sinc.SUBSAMPLE_INTERPOLATE | sinc.INCLUDE_LOWPASS
    bank = design_filterbank_native(taps, nf, float(np.float32(min(ratio, 1.0) * 0.9)), flags)
    out_free = int(frames * ratio) + 8
    g = _grid(taps, nf, ratio, frames, out_free, flags)

    hist = taps + 8
    rng = np.random.default_rng(3)
    xext = rng.standard_normal((3, 2, hist + frames)).astype(np.float32)

    dense = np.asarray(polyphase_apply(
        jnp.asarray(xext), jnp.asarray(bank), jnp.asarray(g.win0 + hist),
        jnp.asarray(g.idx1), jnp.asarray(g.idx2), jnp.asarray(g.weight),
        jnp.asarray(g.mode.astype(np.int32)), half=taps // 2, exact=False))

    Wt, starts = build_banded_weights(
        np.asarray(bank, np.float32), g.win0.astype(np.int64) + hist,
        g.idx1, g.idx2, g.weight, g.mode, half=taps // 2,
        valid_len=g.output_generated, L=xext.shape[-1])
    banded = np.asarray(polyphase_banded(
        jnp.asarray(xext), jnp.asarray(Wt), jnp.asarray(starts), T=out_free))

    gen = g.output_generated
    np.testing.assert_allclose(banded[..., :gen], dense[..., :gen],
                               rtol=2e-6, atol=2e-6)
    assert not np.isnan(banded).any()
    # padded slots beyond the generated count are zero rows, not garbage
    np.testing.assert_array_equal(banded[..., gen:], 0.0)


@pytest.mark.parametrize("ratio,frames", [(16000 / 44100, 700), (48000 / 44100, 400)])
def test_device_builder_matches_host(ratio, frames):
    """banded_weights_device (barrel-shifter, in-jit) == the host builder,
    compared at the applied-output level (static K differs by padding)."""
    taps, nf = 64, 32
    flags = sinc.SUBSAMPLE_INTERPOLATE | sinc.INCLUDE_LOWPASS
    bank = np.asarray(design_filterbank_native(
        taps, nf, float(np.float32(min(ratio, 1.0) * 0.9)), flags), np.float32)
    out_free = int(frames * ratio) + 8
    g = _grid(taps, nf, ratio, frames, out_free, flags)
    hist = taps + 8
    L0 = hist + frames
    rng = np.random.default_rng(7)
    xext = rng.standard_normal((2, 2, L0)).astype(np.float32)

    Wt_h, st_h = build_banded_weights(
        bank, g.win0.astype(np.int64) + hist, g.idx1, g.idx2, g.weight, g.mode,
        half=taps // 2, valid_len=g.output_generated, L=L0)
    ref = np.asarray(polyphase_banded(
        jnp.asarray(xext), jnp.asarray(Wt_h), jnp.asarray(st_h), T=out_free))

    # device path: padded grid arrays, static K, xext padded to >= K
    tile = 128
    T = -(-out_free // tile) * tile
    win0x = np.zeros(T, np.int32)
    win0x[:out_free] = g.win0 + hist
    win0x[out_free:] = win0x[out_free - 1]
    pad = lambda a: np.pad(a[:out_free], (0, T - out_free))
    K = banded_K(ratio, taps)
    L = -(-max(L0, K) // 128) * 128
    xp = np.pad(xext, [(0, 0), (0, 0), (0, L - L0)])
    direct = np.zeros(taps, np.float32)
    direct[taps // 2 - 1] = 1.0

    @jax.jit
    def run(xp, win0x, idx1, idx2, weight, mode, gen):
        Wt, st = banded_weights_device(
            jnp.asarray(bank), jnp.asarray(direct), win0x, idx1, idx2,
            weight, mode, gen, K=K, taps_p=taps, L=L)
        return polyphase_banded(xp, Wt, st, T=out_free)

    got = np.asarray(run(jnp.asarray(xp), jnp.asarray(win0x),
                         jnp.asarray(pad(g.idx1)), jnp.asarray(pad(g.idx2)),
                         jnp.asarray(pad(g.weight)),
                         jnp.asarray(pad(g.mode.astype(np.int32))),
                         jnp.int32(g.output_generated)))
    gen = g.output_generated
    np.testing.assert_allclose(got[..., :gen], ref[..., :gen], rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(got[..., gen:], 0.0)


def test_pallas_kernel_matches_xla_interpret():
    """The Pallas slab-DMA kernel (interpret mode on CPU) must match the XLA
    banded path to f32 reduction-order tolerance."""
    from esp_audio_libs_tpu.ops.polyphase_pallas import polyphase_banded_pallas

    rng = np.random.default_rng(5)
    B, ch, L, nt, K, tile = 4, 2, 2100, 6, 512, 128
    xext = jnp.asarray(rng.standard_normal((B, ch, L)).astype(np.float32))
    Wt_np = np.zeros((nt, K, tile), np.float32)
    for i in range(nt):
        for j in range(tile):
            o = rng.integers(0, K - 300)
            Wt_np[i, o:o + 300, j] = rng.standard_normal(300).astype(np.float32)
    starts = jnp.asarray(np.minimum(np.arange(nt) * 310, L - K).astype(np.int32))
    T = nt * tile - 50
    ref = np.asarray(polyphase_banded(xext, jnp.asarray(Wt_np), starts, T=T))
    got = np.asarray(polyphase_banded_pallas(
        xext, jnp.asarray(Wt_np), starts, T=T, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=4e-5)


def test_pallas_sharded_matches_single_device_interpret():
    """The shard_map SPMD form of the slab kernel must be BIT-exact vs the
    single-device kernel: each shard runs the identical per-lane program on
    its local batch block (weights replicated, zero collectives), so not
    even the f32 reduction order changes."""
    from esp_audio_libs_tpu.ops.polyphase_pallas import (
        polyphase_banded_pallas, polyphase_banded_pallas_sharded)
    from esp_audio_libs_tpu.parallel.mesh import stream_mesh

    mesh = stream_mesh()
    assert mesh.size == 8  # conftest forces the 8-device CPU mesh

    rng = np.random.default_rng(17)
    B, ch, L, nt, K, tile = 16, 2, 2176, 4, 512, 128
    xext = jnp.asarray(rng.standard_normal((B, ch, L)).astype(np.float32))
    Wt_np = np.zeros((nt, K, tile), np.float32)
    for i in range(nt):
        for j in range(tile):
            o = rng.integers(0, K - 300)
            Wt_np[i, o:o + 300, j] = rng.standard_normal(300).astype(np.float32)
    # lane-aligned starts: the sharded form keeps the Mosaic DMA contract
    starts = jnp.asarray(
        np.minimum(np.arange(nt) * 256, L - K).astype(np.int32))
    T = nt * tile - 50

    ref = np.asarray(polyphase_banded_pallas(
        xext, jnp.asarray(Wt_np), starts, T=T, interpret=True))
    got = np.asarray(polyphase_banded_pallas_sharded(
        xext, jnp.asarray(Wt_np), starts, T=T, mesh=mesh, interpret=True))
    np.testing.assert_array_equal(got, ref)

    with pytest.raises(ValueError, match="divide"):
        polyphase_banded_pallas_sharded(
            xext[:6], jnp.asarray(Wt_np), starts, T=T, mesh=mesh,
            interpret=True)


def test_resampler_mesh_routes_to_sharded_pallas(monkeypatch):
    """Under a multi-device mesh with Pallas available, the fast path must
    dispatch the shard_map kernel (not silently fall back to XLA, and not
    all-gather): outputs bit-identical to the single-device Pallas path and
    the sharded wrapper observed exactly once per chunk fn."""
    import functools as ft

    import esp_audio_libs_tpu.models.resampler as rmod
    import esp_audio_libs_tpu.ops.polyphase_pallas as pp
    from esp_audio_libs_tpu.models.resampler import (Resampler,
                                                     ResamplerConfiguration)
    from esp_audio_libs_tpu.parallel.mesh import stream_mesh

    B, frames, ch, n_chunks = 16, 512, 2, 2
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, ch, True, True, 64, 32)
    rng = np.random.default_rng(29)
    pcm = rng.integers(-8192, 8192, (B, n_chunks * frames * ch)).astype(np.int16)
    data = jnp.asarray(pcm.view(np.uint8).reshape(B, -1))

    monkeypatch.setattr(rmod, "pallas_supported", lambda: True)
    # interpret-mode kernels on CPU: patch the single-device binding in the
    # resampler module AND the one the sharded wrapper calls internally
    # (the wrapper forwards its own interpret flag, so force it regardless)
    orig_kernel = pp.polyphase_banded_pallas

    def force_interp(x, w, s, *, T, interpret=False):
        return orig_kernel(x, w, s, T=T, interpret=True)

    monkeypatch.setattr(rmod, "polyphase_banded_pallas", force_interp)
    monkeypatch.setattr(pp, "polyphase_banded_pallas", force_interp)

    single = Resampler(batch=B, exact=False)
    single.initialize(cfg)
    p1, g1, c1 = single.resample_stream(data, frames, n_chunks)

    calls = []
    orig_sharded = pp.polyphase_banded_pallas_sharded

    def spy(*a, **k):
        calls.append(1)
        return orig_sharded(*a, **k)

    monkeypatch.setattr(rmod, "polyphase_banded_pallas_sharded", spy)
    sharded = Resampler(batch=B, exact=False, mesh=stream_mesh())
    sharded.initialize(cfg)
    p2, g2, c2 = sharded.resample_stream(data, frames, n_chunks)

    assert calls, "mesh path did not route through the sharded Pallas kernel"
    assert list(g1) == list(g2)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(single.history),
                                  np.asarray(sharded.history))


def test_pallas_supported_probe_is_safe():
    """pallas_supported() must return a bool without raising on any backend
    (it swallows Mosaic/transport compile failures and falls back)."""
    from esp_audio_libs_tpu.ops.polyphase_pallas import pallas_supported

    assert pallas_supported() in (True, False)


def test_folded_biquad_matches_cascade():
    """Biquad-folded filterbank == running the biquad cascade then resampling."""
    taps, nf = 64, 32
    ratio = 16000 / 44100
    flags = sinc.SUBSAMPLE_INTERPOLATE | sinc.INCLUDE_LOWPASS
    bank = design_filterbank_native(taps, nf, float(np.float32(ratio * 0.9)), flags)
    coeffs = bq.biquad_init(bq.biquad_lowpass(float(np.float32(ratio * 0.45))), 1.0)
    fir_len = bq.fir_len_for(coeffs)
    folded, direct_row, off = bq.fold_biquad_into_filterbank(
        bank, coeffs, fir_len, half=taps // 2)
    assert folded.shape == (nf + 1, taps + 2 * fir_len - 2)

    frames = 600
    out_free = int(frames * ratio) + 8
    g = _grid(taps, nf, ratio, frames, out_free, flags)
    hist = taps + 8 + off
    rng = np.random.default_rng(11)
    xext = rng.standard_normal((2, 2, hist + frames)).astype(np.float32)

    # reference: filter the whole padded signal with the biquad cascade
    # (f64, zero initial state far in the past == zero-padded history here),
    # then dense polyphase with the ORIGINAL bank
    xf = xext.astype(np.float64)
    a0, a1, a2, b1, b2 = (float(np.float32(c)) for c in coeffs)
    for _ in range(2):
        y = np.zeros_like(xf)
        x1 = x2 = y1 = y2 = 0.0
        for lane in range(xf.shape[0] * xf.shape[1]):
            i, j = divmod(lane, xf.shape[1])
            x1 = x2 = y1 = y2 = 0.0
            for t in range(xf.shape[2]):
                v = a0 * xf[i, j, t] + a1 * x1 + a2 * x2 - b1 * y1 - b2 * y2
                x2, x1 = x1, xf[i, j, t]
                y2, y1 = y1, v
                y[i, j, t] = v
        xf = y
    ref = np.zeros((2, 2, g.output_generated))
    for t in range(g.output_generated):
        s = g.win0[t] + hist
        f1 = np.asarray(bank)[g.idx1[t]].astype(np.float64)
        f2 = np.asarray(bank)[g.idx2[t]].astype(np.float64)
        w = float(g.weight[t])
        if g.mode[t] == 0:
            ref[..., t] = xf[..., s + taps // 2 - 1]
        else:
            row = f2 * w + f1 * (1 - w) if g.mode[t] == 2 else f1
            ref[..., t] = (xf[..., s:s + taps] * row).sum(-1)

    win0x = g.win0.astype(np.int64) + (hist - off)
    Wt, starts = build_banded_weights(
        folded, win0x, g.idx1, g.idx2, g.weight, g.mode, half=taps // 2,
        direct_row=direct_row, valid_len=g.output_generated, L=xext.shape[-1])
    got = np.asarray(polyphase_banded(
        jnp.asarray(xext), jnp.asarray(Wt), jnp.asarray(starts), T=out_free))

    np.testing.assert_allclose(got[..., :g.output_generated], ref,
                               rtol=5e-5, atol=5e-5)


# ------------------------------------------------------------- fused 16-bit


def test_fused16_kernel_matches_quantized_xla_interpret():
    """The fused int16 kernel (interpret mode) must reproduce the XLA
    composition (f32 banded contraction -> q.float_to_int) within 1 output
    LSB — the only rounding difference is folding the gain factor into the
    weights instead of the samples — with identical clip decisions away from
    exact clip boundaries, including the x86 huge-product -> NEGATIVE full
    scale semantics (src/quantization_utils.cpp:61)."""
    from esp_audio_libs_tpu.ops import quantization as q
    from esp_audio_libs_tpu.ops.polyphase_pallas import polyphase_fused16_pallas

    rng = np.random.default_rng(7)
    M, L, nt, K, tile = 32, 1024, 3, 512, 128
    x = rng.integers(-32768, 32768, (M, L), dtype=np.int16)
    Wt = (rng.standard_normal((nt, K, tile)) * 0.02).astype(np.float32)
    Wt[:, 300:, :] = 0.0
    # one column with huge weights: product overflows int32 -> INT_MIN ->
    # clips to NEGATIVE full scale on both paths
    Wt[0, :300, 5] = 1e6
    starts = jnp.asarray(np.array([0, 128, 256], np.int32))
    factor = np.float32(1.0 / 32768.0)

    s16, cmask = polyphase_fused16_pallas(
        jnp.asarray(x), jnp.asarray(Wt) * factor, starts, interpret=True)

    xf = jnp.asarray(x).astype(jnp.float32) * factor
    out = polyphase_banded(xf, jnp.asarray(Wt), starts, T=nt * tile)
    samples, clipped = q.float_to_int(out, 16)

    a = np.asarray(s16).astype(np.int32)
    b = np.asarray(samples)
    assert np.abs(a - b).max() <= 1
    cm = np.asarray(cmask) > 0
    cb = np.asarray(clipped)
    # clip decisions may differ only where the quantized value sits at the
    # boundary (a <=1-LSB rounding difference straddling the clip edge)
    disagree = cm != cb
    assert not (disagree & (np.abs(b) < 32766)).any()
    # the huge-weight column clipped NEGATIVE despite positive overflow
    hot = a[:, 5]
    assert (np.abs(hot) == 32768 - 1) .any() or (hot == -32768).any()
    assert cm[:, 5].all() and cb[:, 5].all()


def test_fused16_supported_probe_is_safe():
    from esp_audio_libs_tpu.ops.polyphase_pallas import fused16_supported

    assert fused16_supported() in (True, False)


@pytest.mark.parametrize("ch", [1, 2])
def test_fused_stream_fn_matches_xla_fast_stream(monkeypatch, ch):
    """The fused-tier stream fn (models/resampler._build_fused_stream_fn,
    interpret-mode kernel) must match the XLA fast stream path: same packed
    bytes within 1 LSB, same generated counts, identical carried f32 history
    (history round-trips exactly through the raw-int16 representation)."""
    import functools as ft

    import esp_audio_libs_tpu.models.resampler as rmod
    from esp_audio_libs_tpu.models.resampler import (Resampler,
                                                     ResamplerConfiguration)

    B, frames, n_chunks = 16, 512, 3  # B*ch >= 16: the fused tier's minimum
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, ch, True, True, 64, 32)
    rng = np.random.default_rng(11)
    # quarter-scale input: no clipping on either path, so clip counts must
    # be exactly zero on both
    pcm = (rng.integers(-8192, 8192, (B, n_chunks * frames * ch))
           .astype(np.int16))
    data = jnp.asarray(pcm.view(np.uint8).reshape(B, -1))

    ref = Resampler(batch=B, exact=False)
    ref.initialize(cfg)
    p_ref, g_ref, c_ref = ref.resample_stream(data, frames, n_chunks)

    monkeypatch.setenv("EAL_RESAMPLE_FUSED16", "1")
    monkeypatch.setattr(rmod, "pallas_supported", lambda: True)
    monkeypatch.setattr(rmod, "fused16_supported", lambda: True)
    monkeypatch.setattr(rmod, "polyphase_fused16_pallas",
                        ft.partial(rmod.polyphase_fused16_pallas,
                                   interpret=True))
    fus = Resampler(batch=B, exact=False)
    fus.initialize(cfg)
    p_fus, g_fus, c_fus = fus.resample_stream(data, frames, n_chunks)

    assert list(g_ref) == list(g_fus)
    a = np.asarray(p_ref).view(np.int16).astype(np.int32)
    b = np.asarray(p_fus).view(np.int16).astype(np.int32)
    assert np.abs(a - b).max() <= 1
    assert np.asarray(c_ref).sum() == 0 and np.asarray(c_fus).sum() == 0
    # carried state stays on the shared f32 contract
    np.testing.assert_array_equal(np.asarray(ref.history),
                                  np.asarray(fus.history))


def test_fused_tier_gain_change_routes_to_xla(monkeypatch):
    """A gain change between resample_stream calls must not corrupt the
    carried history through the fused tier's raw-int16 round-trip:
    ``history / factor`` is only exact when the history was produced under
    the same gain factor, so any call with gain != 0 — and the first
    gain-0 call after one — must route through the XLA body.  Those calls
    must match the plain resampler EXACTLY; the fused builder must be
    invoked only once (for the clean gain-0 calls)."""
    import functools as ft

    import esp_audio_libs_tpu.models.resampler as rmod
    from esp_audio_libs_tpu.models.resampler import (Resampler,
                                                     ResamplerConfiguration)

    B, frames, ch = 16, 512, 2
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, ch, True, True, 64, 32)
    rng = np.random.default_rng(23)
    pcm = rng.integers(-8192, 8192, (B, frames * ch)).astype(np.int16)
    data = jnp.asarray(pcm.view(np.uint8).reshape(B, -1))

    gains = [0.0, 12.0, 0.0, 0.0]

    # reference sequence on the plain XLA path, before any patching
    ref = Resampler(batch=B, exact=False)
    ref.initialize(cfg)
    ref_out = []
    for g in gains:
        p, gen, c = ref.resample_stream(data, frames, 1, gain_db=g)
        ref_out.append((np.asarray(p), list(gen), np.asarray(c),
                        np.asarray(ref.history)))

    monkeypatch.setenv("EAL_RESAMPLE_FUSED16", "1")
    monkeypatch.setattr(rmod, "pallas_supported", lambda: True)
    monkeypatch.setattr(rmod, "fused16_supported", lambda: True)
    monkeypatch.setattr(rmod, "polyphase_fused16_pallas",
                        ft.partial(rmod.polyphase_fused16_pallas,
                                   interpret=True))
    # the gain-routed calls take the plain (non-fused) stream fn, which
    # with pallas_supported()=True would lower a real Mosaic kernel — on
    # CPU alias it to the XLA banded impl (identical values: the aligned-K
    # slack contributes exact f32 zeros)
    monkeypatch.setattr(rmod, "polyphase_banded_pallas", rmod.polyphase_banded)
    builds = []
    orig_build = Resampler._build_fused_stream_fn

    def spy(self, *a, **k):
        builds.append(1)
        return orig_build(self, *a, **k)

    monkeypatch.setattr(Resampler, "_build_fused_stream_fn", spy)
    fus = Resampler(batch=B, exact=False)
    fus.initialize(cfg)

    for i, g in enumerate(gains):
        p_f, g_f, c_f = fus.resample_stream(data, frames, 1, gain_db=g)
        p_r, g_r, c_r, h_r = ref_out[i]
        assert list(g_r) == list(g_f)
        a = p_r.view(np.int16).astype(np.int32)
        b = np.asarray(p_f).view(np.int16).astype(np.int32)
        # without the fused_ok gate, call 1 corrupts the gain-12 history
        # (up to 4x rescale + clipping) and calls 1-2 would be off by
        # thousands of LSBs; the 1-LSB bound is the fast-path contract
        # (exact equality across the two bodies isn't defined on CPU: the
        # aligned-K padding changes the backend's f32 reduction order)
        assert np.abs(a - b).max() <= 1, f"call {i}"
        # carried history must stay on the shared f32 contract throughout
        # (it is sliced input samples, not contraction output: exact)
        np.testing.assert_array_equal(h_r, np.asarray(fus.history),
                                      err_msg=f"history after call {i}")
    # routing: the fused fn was built exactly once (the clean gain-0 calls);
    # the gain-affected calls compiled the separate non-fused variant
    assert sum(builds) == 1
    fused_keys = [k for k in fus._chunk_fns if k[0] == "faststream" and k[4]]
    plain_keys = [k for k in fus._chunk_fns if k[0] == "faststream" and not k[4]]
    assert len(fused_keys) == 1 and len(plain_keys) == 1


def test_fused16_sharded_matches_per_shard_single_device_interpret():
    """The shard_map SPMD form of the fused int16 kernel must be BIT-exact —
    samples AND clip mask — vs running the single-device kernel on each
    shard's LOCAL block: that per-chip program is exactly what shard_map
    stamps out (weights replicated, zero collectives).  The whole-batch
    single-device call is only 1-LSB-equivalent, not bitwise: its larger
    batch block (bm) changes the backend's f32 contraction blocking."""
    from esp_audio_libs_tpu.ops.polyphase_pallas import (
        polyphase_fused16_pallas, polyphase_fused16_pallas_sharded)
    from esp_audio_libs_tpu.parallel.mesh import stream_mesh

    mesh = stream_mesh()
    assert mesh.size == 8  # conftest forces the 8-device CPU mesh

    rng = np.random.default_rng(31)
    M, L, nt, K, tile = 128, 1024, 3, 512, 128  # local block: 16 rows
    x = rng.integers(-32768, 32768, (M, L), dtype=np.int16)
    Wt = (rng.standard_normal((nt, K, tile)) * 0.02).astype(np.float32)
    Wt[:, 300:, :] = 0.0
    Wt[0, :300, 5] = 1e6  # int32-overflow column: x86 INT_MIN clip semantics
    starts = jnp.asarray(np.array([0, 128, 256], np.int32))
    factor = np.float32(1.0 / 32768.0)
    wt_dev = jnp.asarray(Wt) * factor

    loc = M // mesh.size
    per_shard = [polyphase_fused16_pallas(
        jnp.asarray(x[i * loc:(i + 1) * loc]), wt_dev, starts, interpret=True)
        for i in range(mesh.size)]
    s_ref = np.concatenate([np.asarray(s) for s, _ in per_shard])
    c_ref = np.concatenate([np.asarray(c) for _, c in per_shard])
    s_got, c_got = polyphase_fused16_pallas_sharded(
        jnp.asarray(x), wt_dev, starts, mesh=mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_got), s_ref)
    np.testing.assert_array_equal(np.asarray(c_got), c_ref)

    # whole-batch single-device form: same program at a different bm —
    # 1-LSB-equivalent with identical clip decisions on overflow columns
    s_one, c_one = polyphase_fused16_pallas(
        jnp.asarray(x), wt_dev, starts, interpret=True)
    d = np.abs(np.asarray(s_one).astype(np.int32) - s_got.astype(np.int32))
    assert d.max() <= 1
    assert (np.asarray(c_one)[:, 5] > 0).all() and (c_got[:, 5] > 0).all()

    with pytest.raises(ValueError, match="divide"):
        polyphase_fused16_pallas_sharded(
            jnp.asarray(x[:116]), jnp.asarray(Wt) * factor, starts, mesh=mesh,
            interpret=True)
    with pytest.raises(ValueError, match="sublane minimum"):
        polyphase_fused16_pallas_sharded(
            jnp.asarray(np.tile(x, (2, 1))[:64]), jnp.asarray(Wt) * factor,
            starts, mesh=mesh, interpret=True)


def test_resampler_mesh_fused16_routes_sharded(monkeypatch):
    """Under a multi-device mesh with the fused tier enabled, the fast
    stream path must dispatch the shard_map fused kernel — packed samples
    within the 1-LSB fast-path contract of the single-device fused tier
    (the per-shard bm changes the f32 contraction blocking), identical
    generated counts and zero clip counts, carried history bit-exact (it
    is sliced raw input, not contraction output), and the sharded wrapper
    actually observed."""
    import functools as ft

    import esp_audio_libs_tpu.models.resampler as rmod
    import esp_audio_libs_tpu.ops.polyphase_pallas as pp
    from esp_audio_libs_tpu.models.resampler import (Resampler,
                                                     ResamplerConfiguration)
    from esp_audio_libs_tpu.parallel.mesh import stream_mesh

    B, frames, ch, n_chunks = 64, 512, 2, 2  # B*ch/8 = 16: local minimum
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, ch, True, True, 64, 32)
    rng = np.random.default_rng(37)
    pcm = rng.integers(-8192, 8192, (B, n_chunks * frames * ch)).astype(np.int16)
    data = jnp.asarray(pcm.view(np.uint8).reshape(B, -1))

    monkeypatch.setenv("EAL_RESAMPLE_FUSED16", "1")
    monkeypatch.setattr(rmod, "pallas_supported", lambda: True)
    monkeypatch.setattr(rmod, "fused16_supported", lambda: True)
    orig_fused = pp.polyphase_fused16_pallas

    def force_interp(x2, Wt, starts, *, interpret=False):
        return orig_fused(x2, Wt, starts, interpret=True)

    monkeypatch.setattr(rmod, "polyphase_fused16_pallas", force_interp)
    monkeypatch.setattr(pp, "polyphase_fused16_pallas", force_interp)

    single = Resampler(batch=B, exact=False)
    single.initialize(cfg)
    p1, g1, c1 = single.resample_stream(data, frames, n_chunks)

    calls = []
    orig_sharded = pp.polyphase_fused16_pallas_sharded

    def spy(*a, **k):
        calls.append(1)
        return orig_sharded(*a, **k)

    monkeypatch.setattr(rmod, "polyphase_fused16_pallas_sharded", spy)
    sharded = Resampler(batch=B, exact=False, mesh=stream_mesh())
    sharded.initialize(cfg)
    p2, g2, c2 = sharded.resample_stream(data, frames, n_chunks)

    assert calls, "mesh path did not route through the sharded fused kernel"
    assert list(g1) == list(g2)
    a = np.asarray(p1).view(np.int16).astype(np.int32)
    b = np.asarray(p2).view(np.int16).astype(np.int32)
    assert np.abs(a - b).max() <= 1
    assert np.asarray(c1).sum() == 0 and np.asarray(c2).sum() == 0
    np.testing.assert_array_equal(np.asarray(single.history),
                                  np.asarray(sharded.history))


def test_resampler_mesh_fused16_indivisible_local_block_falls_back(monkeypatch):
    """A fleet whose per-shard block would violate the fused kernel's 16-row
    minimum must route to the plain (non-fused) mesh path, not crash."""
    import esp_audio_libs_tpu.models.resampler as rmod
    from esp_audio_libs_tpu.models.resampler import (Resampler,
                                                     ResamplerConfiguration)
    from esp_audio_libs_tpu.parallel.mesh import stream_mesh

    B, frames, ch = 16, 512, 2  # B*ch/8 = 4 < 16 -> fused gate must reject
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, ch, True, True, 64, 32)
    rng = np.random.default_rng(41)
    pcm = rng.integers(-8192, 8192, (B, frames * ch)).astype(np.int16)
    data = jnp.asarray(pcm.view(np.uint8).reshape(B, -1))

    monkeypatch.setenv("EAL_RESAMPLE_FUSED16", "1")
    monkeypatch.setattr(rmod, "fused16_supported", lambda: True)
    # pallas_supported stays False on CPU -> plain XLA mesh body
    builds = []
    orig_build = Resampler._build_fused_stream_fn

    def spy(self, *a, **k):
        builds.append(1)
        return orig_build(self, *a, **k)

    monkeypatch.setattr(Resampler, "_build_fused_stream_fn", spy)
    r = Resampler(batch=B, exact=False, mesh=stream_mesh())
    r.initialize(cfg)
    p, g, c = r.resample_stream(data, frames, 1)
    assert not builds, "fused tier must not build below the local-block minimum"
    assert np.asarray(p).shape[0] == 1
