"""Stage-level differential tests: MP3 device kernels vs reference internals.

The reference header exposes its pipeline stages (Dequantize/IMDCT/Subband)
and struct layouts, so each batched device kernel is validated in isolation
against the exact C stage on randomized granule states — no encoder needed.
"""

import ctypes as C

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from esp_audio_libs_tpu.models.mp3 import granule_params  # noqa: E402
from esp_audio_libs_tpu.ops import mp3dsp  # noqa: E402

_i32p = C.POINTER(C.c_int32)


def _p(a):
    return a.ctypes.data_as(_i32p)


def random_granule(rng, ver=0, sr_idx=0, nch=2, mode_ext=0, block_type=0, mixed=0,
                   density=0.3, nzb_max=576):
    """Build a random (huff, params, sf, frame, sfjs, nzb) granule state."""
    huff = np.zeros((nch, 576), np.int32)
    nzb = np.zeros(nch, np.int32)
    for ch in range(nch):
        n = int(rng.integers(0, nzb_max))
        vals = rng.integers(0, 40, n).astype(np.int32)
        big = rng.random(n) < 0.05
        vals = np.where(big, rng.integers(64, 3000, n), vals).astype(np.int32)
        vals[rng.random(n) > density] = 0
        sign = rng.random(n) < 0.5
        huff[ch, :n] = np.where(sign, vals | np.int32(-0x80000000), vals)
        huff[ch, :n][vals == 0] = 0
        nz = np.nonzero(huff[ch])[0]
        nzb[ch] = (nz[-1] + 1) if len(nz) else 0
        # reference nzb is an even pair/quad boundary >= last nonzero; keep simple
        nzb[ch] = min(576, int(nzb[ch] + (nzb[ch] & 1)))

    params = np.zeros((nch, 24), np.int32)
    sf = np.zeros((nch, 62), np.int32)
    for ch in range(nch):
        params[ch, 2] = rng.integers(80, 220)     # globalGain
        params[ch, 4] = 1 if block_type else 0    # winSwitchFlag
        params[ch, 5] = block_type
        params[ch, 6] = mixed
        params[ch, 10:13] = rng.integers(0, 8, 3)  # subBlockGain
        params[ch, 15] = rng.integers(0, 2)        # preFlag (MPEG1)
        params[ch, 16] = rng.integers(0, 2)        # sfactScale
        sf[ch, :23] = rng.integers(0, 8, 23)
        sf[ch, 23:] = rng.integers(0, 8, 39)
    frame = np.zeros(16, np.int32)
    frame[0] = ver
    frame[4] = sr_idx
    frame[2] = 3 if nch == 1 else (1 if mode_ext else 0)  # sMode
    frame[3] = mode_ext
    frame[5] = nch
    frame[6] = 2 if ver == 0 else 1
    frame[7] = 576
    sfjs = np.zeros(8, np.int32)
    sfjs[:4] = rng.integers(0, 4, 4)
    sfjs[4:] = [6, 5, 5, 5]
    return huff, params, sf, frame, sfjs, nzb


CASES = [
    dict(ver=0, nch=1, block_type=0),
    dict(ver=0, nch=2, block_type=0),
    dict(ver=0, nch=2, block_type=2, mixed=0),
    dict(ver=0, nch=2, block_type=2, mixed=1),
    dict(ver=0, nch=2, block_type=0, mode_ext=2),            # mid-side
    dict(ver=0, nch=2, block_type=0, mode_ext=3),            # ms + intensity
    dict(ver=0, nch=2, block_type=0, mode_ext=1),            # intensity only
    dict(ver=0, nch=2, block_type=2, mixed=0, mode_ext=3),   # short + js
    dict(ver=1, nch=2, block_type=0, sr_idx=1),              # MPEG2
    dict(ver=1, nch=2, block_type=0, mode_ext=3, sr_idx=1),  # MPEG2 js
    dict(ver=1, nch=2, block_type=2, mixed=0, mode_ext=1, sr_idx=2),
    dict(ver=2, nch=2, block_type=0, sr_idx=0),              # MPEG2.5
    dict(ver=0, nch=2, block_type=1),                        # start block
    dict(ver=0, nch=2, block_type=3),                        # stop block
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("seed", [0, 1])
def test_dequant_stage(oracle, case, seed):
    rng = np.random.default_rng(seed * 100 + hash(str(sorted(case.items()))) % 97)
    kwargs = dict(case)
    huff, params, sf, frame, sfjs, nzb = random_granule(rng, **kwargs)
    nch = kwargs["nch"]

    # --- reference ---
    h = oracle.lib.ref_mp3_init()
    huff2 = np.zeros((2, 576), np.int32)
    huff2[:nch] = huff
    params2 = np.zeros((2, 24), np.int32)
    params2[:nch] = params
    sf2 = np.zeros((2, 62), np.int32)
    sf2[:nch] = sf
    nzb2 = np.zeros(2, np.int32)
    nzb2[:nch] = nzb
    out_ref = np.zeros((2, 576), np.int32)
    out_nzb = np.zeros(2, np.int32)
    out_gb = np.zeros(2, np.int32)
    cbi = np.zeros((2, 6), np.int32)
    frame_ref = frame[[0, 4, 2, 3]].copy()  # ver, srIdx, sMode, modeExt
    sfjs_ref = np.concatenate([[frame[12]], sfjs]).astype(np.int32)
    rc = oracle.lib.ref_mp3_stage_dequant(
        h, _p(huff2), _p(nzb2), _p(params2), _p(sf2), _p(frame_ref), _p(sfjs_ref),
        _p(out_ref), _p(out_nzb), _p(out_gb), _p(cbi))
    oracle.lib.ref_mp3_free(h)
    assert rc == 0

    # --- ours ---
    hp_np = granule_params(params, sf, frame, sfjs, nzb)
    hp = {k: (v if k.startswith("_")   # "_"-keys are static trace constants
              else jnp.asarray(np.asarray(v)[None, ...]))
          for k, v in hp_np.items()}
    res = mp3dsp.dequantize_granule(
        jnp.asarray(huff[None]), jnp.asarray(nzb[None]), hp, nch=nch,
        sfb_s=tuple(int(v) for v in np.asarray(hp_np["sfb_s"])))

    got_x = np.asarray(res["x"])[0]
    got_nzb = np.asarray(res["nzb"])[0].reshape(-1)
    got_gb = np.asarray(res["gb"])[0].reshape(-1)

    np.testing.assert_array_equal(got_x, out_ref[:nch], err_msg="dequantized samples")
    np.testing.assert_array_equal(got_nzb[:nch], out_nzb[:nch])
    # gb comes from CLZ(mask); for mask == 0 the reference hits UB
    # (__builtin_clz(0)) and returns garbage — our 31 (lzcnt semantics) is the
    # defined substitute, so only compare when the mask was nonzero.
    defined = got_gb[:nch] != 31
    np.testing.assert_array_equal(got_gb[:nch][defined], out_gb[:nch][defined])
    # cbi
    np.testing.assert_array_equal(np.asarray(res["cb_type"])[0][:nch], cbi[:nch, 0])
    np.testing.assert_array_equal(np.asarray(res["cb_end_l"])[0][:nch], cbi[:nch, 1])
    np.testing.assert_array_equal(np.asarray(res["cb_end_s"])[0][:nch], cbi[:nch, 2:5])
    np.testing.assert_array_equal(np.asarray(res["cb_end_smax"])[0][:nch], cbi[:nch, 5])


from esp_audio_libs_tpu.ops import mp3imdct  # noqa: E402
from esp_audio_libs_tpu.runtime.tables import mp3_tables  # noqa: E402


IMDCT_CASES = [
    dict(block_type=0, mixed=0, prev_type=0, gb_lo=8, gb_hi=12),   # long fast path
    dict(block_type=0, mixed=0, prev_type=1, gb_lo=8, gb_hi=12),   # long slow path
    dict(block_type=1, mixed=0, prev_type=0, gb_lo=8, gb_hi=12),   # start
    dict(block_type=3, mixed=0, prev_type=2, gb_lo=8, gb_hi=12),   # stop after short
    dict(block_type=2, mixed=0, prev_type=0, gb_lo=8, gb_hi=12),   # short
    dict(block_type=2, mixed=1, prev_type=2, gb_lo=8, gb_hi=12),   # mixed
    dict(block_type=0, mixed=0, prev_type=0, gb_lo=2, gb_hi=5),    # rescale path
    dict(block_type=2, mixed=0, prev_type=3, gb_lo=2, gb_hi=5),    # short rescale
]


@pytest.mark.parametrize("case", IMDCT_CASES)
@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("ver,sr_idx", [(0, 0), (1, 1)])
def test_imdct_stage(oracle, case, seed, ver, sr_idx):
    rng = np.random.default_rng(seed * 1000 + hash(str(sorted(case.items()))) % 997 + ver)
    T = mp3_tables()
    gb = int(rng.integers(case["gb_lo"], case["gb_hi"]))
    scale = 1 << (30 - gb)
    nzb = int(rng.integers(1, 577))
    x = np.zeros(576, np.int32)
    x[:nzb] = rng.integers(-scale, scale, nzb)
    over = rng.integers(-(1 << 24), 1 << 24, 288).astype(np.int32)
    num_prev = int(rng.integers(0, 33))
    over[9 * num_prev:] = 0  # reference invariant: xPrev beyond numPrevIMDCT is 0
    prev_win_switch = int(rng.integers(0, 9)) if case["prev_type"] else 0

    params = np.zeros(24, np.int32)
    params[4] = 1 if case["block_type"] else 0
    params[5] = case["block_type"]
    params[6] = case["mixed"]
    frame = np.array([ver, sr_idx, 0, 0], np.int32)

    # --- reference ---
    h = oracle.lib.ref_mp3_init()
    over_ref = over.copy()
    pt = np.array([case["prev_type"]], np.int32)
    pws = np.array([prev_win_switch], np.int32)
    npv = np.array([num_prev], np.int32)
    out_ref = np.zeros(18 * 32, np.int32)
    out_nzb = np.zeros(1, np.int32)
    out_gb = np.zeros(1, np.int32)
    rc = oracle.lib.ref_mp3_stage_imdct(
        h, 0, _p(x), nzb, gb, _p(params), _p(frame), _p(over_ref),
        _p(pt), _p(pws), _p(npv), _p(out_ref), _p(out_nzb), _p(out_gb))
    oracle.lib.ref_mp3_free(h)
    assert rc == 0

    # --- ours ---
    cutoff = int(T["sfBandLong"][ver][sr_idx][8 if ver == 0 else 6] // 18)
    res = mp3imdct.imdct_granule(
        jnp.asarray(x[None]), jnp.asarray(over.reshape(1, 32, 9)),
        jnp.asarray([nzb]), jnp.asarray([gb]),
        jnp.asarray([case["block_type"]]), jnp.asarray([case["mixed"]]),
        jnp.asarray([case["prev_type"]]), jnp.asarray([prev_win_switch]),
        jnp.asarray([cutoff]), jnp.asarray([num_prev]))
    out, new_prev, new_nzb, gb_out, n_out, cws = [np.asarray(r) for r in res]

    np.testing.assert_array_equal(out[0].reshape(-1), out_ref, err_msg="outBuf")
    np.testing.assert_array_equal(new_prev[0].reshape(-1), over_ref, err_msg="overBuf")
    assert int(new_nzb[0]) == int(out_nzb[0])
    assert int(n_out[0]) == int(npv[0])
    if int(gb_out[0]) != 31:  # CLZ(0) is UB in the reference
        assert int(gb_out[0]) == int(out_gb[0])


from esp_audio_libs_tpu.ops import mp3subband  # noqa: E402

_i16p = C.POINTER(C.c_int16)


@pytest.mark.parametrize("nch", [1, 2])
@pytest.mark.parametrize("vindex0", [0, 3, 7])
@pytest.mark.parametrize("seed", [0, 1])
def test_subband_stage(oracle, nch, vindex0, seed):
    rng = np.random.default_rng(seed * 31 + vindex0 * 7 + nch)
    gb = rng.integers(2, 10, 2).astype(np.int32)  # exercises the es path too
    outbuf = np.zeros((2, 18, 32), np.int32)
    for ch in range(nch):
        outbuf[ch] = rng.integers(-(1 << (30 - gb[ch])), 1 << (30 - gb[ch]), (18, 32))
    vbuf = rng.integers(-(1 << 20), 1 << 20, 2 * 1088).astype(np.int32)

    # --- reference ---
    h = oracle.lib.ref_mp3_init()
    vbuf_ref = vbuf.copy()
    vi = np.array([vindex0], np.int32)
    pcm_ref = np.zeros(18 * 32 * nch, np.int16)
    rc = oracle.lib.ref_mp3_stage_subband(
        h, nch, _p(outbuf), _p(gb), _p(vbuf_ref), _p(vi),
        pcm_ref.ctypes.data_as(_i16p))
    oracle.lib.ref_mp3_free(h)
    assert rc == 0

    # --- ours ---
    pcm, new_vbuf = mp3subband.subband_granule(
        jnp.asarray(outbuf[None, :nch]), jnp.asarray(gb[None, :nch]),
        jnp.asarray(vbuf[None]), jnp.int32(vindex0), nch=nch)
    np.testing.assert_array_equal(np.asarray(pcm)[0], pcm_ref, err_msg="pcm")
    np.testing.assert_array_equal(np.asarray(new_vbuf)[0], vbuf_ref, err_msg="vbuf")
    assert ((vindex0 - 9) & 7) == int(vi[0])
