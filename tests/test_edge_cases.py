"""Edge-case parity tests: wide-mode overflow fallback, escape partitions
with the >=32-bit bits-per-sample fallback, synthetic packer inputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from zigflac_tpu import golden
from zigflac_tpu.golden import RiceConfig
from zigflac_tpu.metadata import StreamInfo
from zigflac_tpu.ops.bitpack import channel_symbols
from zigflac_tpu.utils.bits import BitWriter
from zigflac_tpu.utils.config import EncoderConfig

from test_device_vs_golden import run_both, assert_identical


def test_wide_overflow_falls_back_to_verbatim(rng):
    """32-bit depth with alternating extremes: 4th-order residuals overflow
    i32, bestOrder must disqualify and the subframe become verbatim
    (libFLAC/Encoder.zig:344-350) — identical on both backends."""
    B = 1024
    n = 2 * B
    lo, hi = -(2**31), 2**31 - 1
    x = np.empty(n, np.int64)
    x[0::2] = lo
    x[1::2] = hi
    samples = np.stack([x, -x // 2]).astype(np.int32)
    cfg = EncoderConfig(block_size=B)
    g, d = run_both(samples, 32, config=cfg, block=B)
    assert_identical(g, d)
    # Structurally confirm a verbatim subframe exists: with block 1024
    # (common code), rate 44100 (common code) and frame number < 128 the
    # frame header is exactly 6 bytes (sync 2 + bs|sr 1 + ch|depth 1 +
    # frame number 1 + CRC-8 1), so byte 6 is the first subframe header;
    # verbatim is type 1 -> header byte 0b0000_0010 = 0x02.
    assert any(fr[6] == 0x02 for fr in g)


def _golden_channel_bytes(kind, order, method, part_order, ss, params,
                          plane, residuals, B):
    """Serialize one subframe with the golden writer."""
    w = BitWriter()
    if kind == 0:
        golden.write_constant_subframe(w, ss, int(plane[0]))
    elif kind == 1:
        golden.write_verbatim_subframe(w, ss, plane)
    else:
        cfg = RiceConfig(method=method, part_order=part_order,
                         params=list(params))
        golden.write_fixed_subframe(w, ss, plane, residuals, order, cfg)
    return w.bytes_so_far(), w.bit_length


def _device_channel_bytes(kind, order, method, part_order, ss, params,
                          plane, residuals, B):
    nb_full, dep_val, dep_nbv = channel_symbols(
        jnp.asarray([kind], jnp.int32),
        jnp.asarray([order], jnp.int32),
        jnp.asarray([method], jnp.int32),
        jnp.asarray([part_order], jnp.int32),
        jnp.asarray([ss], jnp.int32),
        jnp.asarray(np.asarray(params, np.uint8)[None]),
        jnp.asarray(np.asarray(plane, np.int64)[None]),
        jnp.asarray(np.asarray(residuals, np.int32)[None]),
        jnp.zeros((1, 32), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        B,
        8,
    )
    nb = np.asarray(nb_full)[0]
    cum = np.cumsum(nb)
    total_bits = int(cum[-1])
    buf = bytearray((total_bits + 7) // 8)

    def deposit(end_bit, v, vb):
        if vb == 0:
            return
        d_start = int(end_bit) - int(vb)
        end = d_start + int(vb)
        byte0, byte1 = d_start // 8, (end + 7) // 8
        span = (byte1 - byte0) * 8
        chunk = int.from_bytes(buf[byte0:byte1], "big")
        chunk |= (int(v) & ((1 << int(vb)) - 1)) << (span - (end - byte0 * 8))
        buf[byte0:byte1] = chunk.to_bytes(byte1 - byte0, "big")

    # the unified stream: every column deposits at its prefix-sum offset
    # (partition params live on their grid columns inside the stream)
    for e, v, vb in zip(
        cum.tolist(),
        np.asarray(dep_val)[0].tolist(),
        np.asarray(dep_nbv)[0].tolist(),
    ):
        deposit(e, v, vb)
    return bytes(buf), total_bits


def synth_case(kind, order, method, part_order, ss, params, plane, residuals, B):
    g = _golden_channel_bytes(kind, order, method, part_order, ss,
                              params, plane, residuals, B)
    d = _device_channel_bytes(kind, order, method, part_order, ss,
                              params, plane, residuals, B)
    assert g == d, f"golden bits {g[1]} vs device bits {d[1]}"


def test_packer_escape_partition_zero_residuals(rng):
    """Escape code on an all-zero partition writes bps=0 and no samples."""
    B = 256
    residuals = np.zeros(B, np.int32)
    residuals[:64] = rng.integers(-100, 100, 64)
    residuals[0] = 0  # order 0: everything coded
    params = np.zeros(256, np.uint8)
    params[0] = 7
    params[1] = 31  # escape on zero partition
    params[2] = 31
    params[3] = 5
    plane = residuals.copy()
    synth_case(2, 0, 1, 2, 16, params, plane, residuals, B)


def test_packer_escape_with_nonzero_bps(rng):
    B = 256
    residuals = rng.integers(-3, 4, B).astype(np.int32)
    params = np.zeros(256, np.uint8)
    params[0] = 31  # escape with small nonzero residuals -> small bps
    params[1] = 2
    synth_case(2, 0, 1, 1, 16, params, plane=residuals, residuals=residuals, B=B)


def test_packer_escape_bps32_fallback(rng):
    """|r| >= 2^30 in an escape partition: bps >= 32 forces the param-30
    Rice fallback (FrameWriter.zig:325-327)."""
    B = 256
    residuals = rng.integers(-100, 100, B).astype(np.int32)
    residuals[10] = -(2**31)  # forces bps = 33
    params = np.zeros(256, np.uint8)
    params[0] = 31
    params[1] = 4
    synth_case(2, 0, 1, 1, 32, params, plane=residuals, residuals=residuals, B=B)


def test_packer_negative_one_partition(rng):
    """all r in {0,-1}: res_max == 0 but or_all != 0 -> bps = 1."""
    B = 256
    residuals = np.zeros(B, np.int32)
    residuals[128:] = -1
    params = np.zeros(256, np.uint8)
    params[0] = 3
    params[1] = 31  # escape over the {0,-1} half
    synth_case(2, 0, 1, 1, 16, params, plane=residuals, residuals=residuals, B=B)


def test_packer_constant_and_verbatim_33bit():
    B = 64
    plane = np.full(B, -(2**32), np.int64)  # needs 33 bits
    synth_case(0, 0, 0, 0, 33, np.zeros(256, np.uint8), plane,
               np.zeros(B, np.int32), B)
    plane2 = (np.arange(B, dtype=np.int64) - 32) * (2**27)
    synth_case(1, 0, 0, 0, 33, np.zeros(256, np.uint8), plane2,
               np.zeros(B, np.int32), B)


def test_wasted_bits_roundtrip(rng):
    """Wasted-bits extension: samples with common trailing zeros encode
    smaller and round-trip exactly (decoder restores the shift)."""
    import io

    from zigflac_tpu.decoder import decode_flac
    from zigflac_tpu.models.encoder import encode_wav_bytes
    from zigflac_tpu.wav import write_wav
    from conftest import make_signal

    base = make_signal(rng, 2 * 4096 + 33, channels=2, depth=16, kind="mixed")
    samples = np.clip(base // 16, -(1 << 11), (1 << 11) - 1) * 16  # 4 wasted bits
    buf = io.BytesIO()
    write_wav(buf, samples.astype(np.int32), 44100, 16)
    wav_bytes = buf.getvalue()
    plain = encode_wav_bytes(wav_bytes, backend="golden")
    cfg = EncoderConfig(wasted_bits=True)
    shaved = encode_wav_bytes(wav_bytes, config=cfg, backend="golden")
    assert len(shaved) < len(plain) * 0.95, (len(shaved), len(plain))
    dec = decode_flac(shaved)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok


def test_wasted_bits_device_vs_golden(rng):
    from conftest import make_signal

    samples = (make_signal(rng, 2 * 1024, channels=2, depth=16, kind="mixed") // 8) * 8
    cfg = EncoderConfig(block_size=1024, wasted_bits=True)
    g, d = run_both(samples.astype(np.int32), 16, config=cfg, block=1024)
    assert_identical(g, d)


def test_wasted_bits_off_by_default(rng):
    """Default config output is untouched by the feature's existence: decode
    the frames and assert no subframe carries the wasted flag."""
    from conftest import make_signal
    from zigflac_tpu.utils.bits import BitReader

    samples = (make_signal(rng, 1024, channels=2, depth=16, kind="mixed") // 4) * 4
    g_off, d_off = run_both(
        samples.astype(np.int32), 16,
        config=EncoderConfig(block_size=1024), block=1024,
    )
    assert_identical(g_off, d_off)
    for fr in g_off:
        # walk to the first subframe header: frame header is 2 sync +
        # 1 codes + 1 codes + 1 frame-number (frame 0) + 1 crc8 = 6 bytes
        r = BitReader(fr, 6 * 8)
        assert r.read(1) == 0
        r.read(6)  # type
        assert r.read(1) == 0, "wasted flag set under default config"


def test_wasted_bits_32bit_stereo(rng):
    """Wasted bits through the int64 side-channel path (depth 32)."""
    from conftest import make_signal

    samples = (
        make_signal(rng, 2 * 1024, channels=2, depth=32, kind="mixed") >> 8
    ) << 8  # 8 trailing zero bits
    cfg = EncoderConfig(block_size=1024, wasted_bits=True)
    g, d = run_both(samples.astype(np.int32), 32, config=cfg, block=1024)
    assert_identical(g, d)


def test_wasted_bits_indep_channels(rng):
    """Wasted bits on the independent-channels (non-stereo) plan path."""
    import io

    from conftest import make_signal
    from zigflac_tpu.decoder import decode_flac
    from zigflac_tpu.models.encoder import encode_wav_bytes
    from zigflac_tpu.wav import write_wav

    samples = (make_signal(rng, 1024, channels=3, depth=16, kind="mixed") // 32) * 32
    cfg = EncoderConfig(block_size=1024, channels=3, wasted_bits=True)
    g, d = run_both(samples.astype(np.int32), 16, config=cfg, block=1024)
    assert_identical(g, d)
    buf = io.BytesIO()
    write_wav(buf, samples.astype(np.int32), 48000, 16)
    flac = encode_wav_bytes(buf.getvalue(), config=cfg, backend="golden")
    dec = decode_flac(flac)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok
