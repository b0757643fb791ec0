"""LPC subframes (BASELINE config 3): quantization properties, round-trip
losslessness, device==golden byte identity, and compression benefit on
tonal signals."""

import io

import numpy as np
import pytest

from zigflac_tpu.decoder import decode_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import write_wav

from conftest import make_signal
from test_device_vs_golden import run_both, assert_identical


def lpc_cfg(**kw):
    kw.setdefault("prediction", "lpc")
    kw.setdefault("lpc_order", 8)
    return EncoderConfig(**kw)


def test_lpc_roundtrip(rng):
    samples = make_signal(rng, 3 * 4096 + 100, channels=2, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    flac = encode_wav_bytes(buf.getvalue(), config=lpc_cfg(), backend="golden")
    dec = decode_flac(flac)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok


def test_lpc_beats_fixed_on_tonal(rng):
    samples = make_signal(rng, 8 * 4096, channels=2, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    wav_bytes = buf.getvalue()
    fixed = encode_wav_bytes(wav_bytes, backend="golden")
    lpc = encode_wav_bytes(wav_bytes, config=lpc_cfg(), backend="golden")
    assert len(lpc) < len(fixed), (len(lpc), len(fixed))


@pytest.mark.parametrize("kind", ["sine", "mixed", "quiet_noise"])
def test_lpc_device_vs_golden(rng, kind):
    samples = make_signal(rng, 2 * 1024, channels=2, depth=16, kind=kind)
    cfg = lpc_cfg(block_size=1024)
    g, d = run_both(samples, 16, config=cfg, block=1024)
    assert_identical(g, d)


def test_lpc_24bit_device_vs_golden(rng):
    samples = make_signal(rng, 2 * 1024, channels=2, depth=24, kind="sine")
    cfg = lpc_cfg(block_size=1024)
    g, d = run_both(samples, 24, rate=96000, config=cfg, block=1024)
    assert_identical(g, d)


def test_lpc_high_order_roundtrip(rng):
    samples = make_signal(rng, 2 * 4096, channels=2, depth=16, kind="sine")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    flac = encode_wav_bytes(
        buf.getvalue(), config=lpc_cfg(lpc_order=12), backend="golden"
    )
    dec = decode_flac(flac)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))


def test_lpc_noise_falls_back(rng):
    """On white noise LPC shouldn't blow up the stream vs fixed."""
    samples = make_signal(rng, 2 * 4096, channels=2, depth=16, kind="noise")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    wav_bytes = buf.getvalue()
    fixed = encode_wav_bytes(wav_bytes, backend="golden")
    lpc = encode_wav_bytes(wav_bytes, config=lpc_cfg(), backend="golden")
    assert len(lpc) <= len(fixed) * 1.02


def test_lag_sums_jnp_equals_numpy(rng):
    """The integer lag sums are the cross-platform determinism anchor:
    device (jnp) and golden (numpy) must produce identical int64 limbs."""
    import jax.numpy as jnp

    from conftest import make_signal
    from zigflac_tpu.ops.lpc import lag_sums, lag_sums_np

    for depth, kind in [(16, "mixed"), (24, "sine"), (32, "noise")]:
        planes = make_signal(rng, 512, channels=2, depth=depth, kind=kind)
        for ss in (None, depth):  # general tier AND the depth-gated tier
            a = np.asarray(lag_sums(jnp.asarray(planes), 8, ss))
            b = lag_sums_np(planes, 8, ss)
            np.testing.assert_array_equal(a, b)


def test_lag_sums_tiers_identical_at_extremes(rng):
    """Every product tier computes the SAME exact value (unique normalized
    limb decomposition), including at full-scale boundary magnitudes where
    the tier bounds are tightest — side planes carry sample_size+1 bits."""
    import jax.numpy as jnp

    from zigflac_tpu.ops.lpc import _lag_tier, lag_sums, lag_sums_np

    # Q8 window tiers: 8/16/17 -> tier 0; 20 -> tier 1 narrow (i16/u16
    # halves); 24 -> tier 1 NON-narrow (x stays i64, y halves i32);
    # 32 -> tier 2 (limb path vs itself, plus the jnp mirror)
    for ss, B in [(8, 4096), (12, 4096), (16, 4096), (16, 8192), (17, 4096),
                  (20, 4096), (24, 4096), (32, 1024)]:
        lim = 1 << ss  # side-plane magnitude: sample_size+1 signed bits
        planes = rng.integers(-lim, lim, size=(3, B), dtype=np.int64)
        planes[0, :] = -lim  # constant full-scale: maximal correlation
        planes[1, ::2], planes[1, 1::2] = -lim, lim - 1
        ref = lag_sums_np(planes, 8, None)  # general limb path
        got = lag_sums_np(planes, 8, ss)  # gated tier
        np.testing.assert_array_equal(got, ref), (ss, B)
        dev = np.asarray(lag_sums(jnp.asarray(planes), 8, ss))
        np.testing.assert_array_equal(dev, ref)
    # gate sanity: common depths take the cheap tiers (Q8 window bounds)
    assert _lag_tier(8, 4096) == 0
    assert _lag_tier(16, 4096) == 0
    assert _lag_tier(20, 4096) == 1
    assert _lag_tier(24, 4096) == 1
    assert _lag_tier(32, 4096) == 2
    assert _lag_tier(None, 4096) == 2


def test_fixed_levinson_shapes_and_silence(rng):
    from zigflac_tpu.ops.lpc import (
        fixed_point_levinson,
        lag_sums_np,
        lpc_candidate_orders,
    )

    from zigflac_tpu.ops.lpc import select_lpc_candidate

    orders = lpc_candidate_orders(8)
    planes = np.zeros((3, 256), np.int32)  # silence: must not crash
    out = fixed_point_levinson(lag_sums_np(planes, 8), orders, 15, np)
    assert [o for o, *_ in out] == list(orders)
    for o, C, cmax, ok, err in out:
        assert C.shape == (3, 8)
        assert (C[:, o:] == 0).all()
        assert not ok.any()  # silence disqualifies the LPC candidate
    order, qc, shift, ok = select_lpc_candidate(out, 256, 15, np)
    assert qc.shape == (3, 32)
    assert (qc == 0).all() and not ok.any()


def test_fixed_levinson_device_equals_numpy(rng):
    """The Q28 integer Levinson must be BIT-IDENTICAL between its numpy
    run (golden) and its jitted XLA run (device program) — the whole
    determinism argument for in-program LPC."""
    import jax
    import jax.numpy as jnp

    from zigflac_tpu.ops.lpc import (
        fixed_point_levinson,
        lag_sums_np,
        lpc_candidate_orders,
    )

    orders = lpc_candidate_orders(12)
    t = np.arange(4096)
    sig = np.stack([
        np.clip(9000 * np.sin(2 * np.pi * 441.3 * t / 44100)
                + rng.normal(0, 37, t.size), -32768, 32767),
        np.clip(rng.normal(0, 12000, t.size), -32768, 32767),
        np.clip(1e6 * np.sin(2 * np.pi * 97 * t / 44100), -(2 ** 31), 2 ** 31 - 1),
        np.zeros(t.size),
    ]).astype(np.int64)
    from zigflac_tpu.ops.lpc import select_lpc_candidate

    lags = lag_sums_np(sig, 12)
    ref = fixed_point_levinson(lags, orders, 14, np)
    ref_sel = select_lpc_candidate(ref, 4096, 14, np)

    @jax.jit
    def dev(lg):
        outs = fixed_point_levinson(lg, orders, 14, jnp)
        sel = select_lpc_candidate(outs, 4096, 14, jnp)
        return [(c, m, k, e) for _o, c, m, k, e in outs], sel

    got, got_sel = dev(jnp.asarray(lags))
    for (o, cr, mr, kr, er), (cd, md, kd, ed) in zip(ref, got):
        np.testing.assert_array_equal(cr, np.asarray(cd)), o
        np.testing.assert_array_equal(mr, np.asarray(md))
        np.testing.assert_array_equal(kr, np.asarray(kd))
        np.testing.assert_array_equal(er, np.asarray(ed))
    for r, d in zip(ref_sel, got_sel):
        np.testing.assert_array_equal(r, np.asarray(d))
