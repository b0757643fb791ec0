"""Hand-derived golden byte vectors (ORACLE_AUDIT.md companion).

Every expected byte below was assembled BY HAND from the reference's
serialization rules (libFLAC/FrameWriter.zig, libFLAC/rice.zig,
libFLAC/fixed.zig) — the expectations never call golden.py's writer, and
the CRCs come from standalone bit-by-bit implementations in this file.
They pin the riskiest decision rules end-to-end: first-min order argmin,
the flake estimate's wrapping cost + smallest-param / largest-partition-
order ties, the all-zero-partition escape, the escape bps field, and the
uncommon-rate-tail bug (the header writes block_size instead of the rate,
FrameWriter.zig:240-244).
"""

import numpy as np
import pytest

from zigflac_tpu import golden
from zigflac_tpu.metadata import StreamInfo
from zigflac_tpu.models.pipeline import DevicePipeline
from zigflac_tpu.utils.config import EncoderConfig


def crc8(data: bytes) -> int:
    """CRC-8 poly 0x07, init 0, MSB-first (independent of zigflac_tpu.crc)."""
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    """CRC-16/UMTS poly 0x8005, init 0, MSB-first, unreflected."""
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class HandBits:
    """Minimal MSB-first assembler for the hand-written field list."""

    def __init__(self) -> None:
        self.bits = ""

    def w(self, n: int, v: int) -> "HandBits":
        if n:
            self.bits += format(v, f"0{n}b")
        return self

    def to_bytes(self) -> bytes:
        s = self.bits + "0" * (-len(self.bits) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def finish_frame(header_wo_crc: bytes, body: bytes) -> bytes:
    """header + CRC-8 + body + big-endian CRC-16 (FrameWriter.zig:117-133)."""
    hdr = header_wo_crc + bytes([crc8(header_wo_crc)])
    frame = hdr + body
    return frame + crc16(frame).to_bytes(2, "big")


def encode_both(samples: np.ndarray, block: int, depth: int, rate: int,
                frame_number: int) -> tuple:
    c = samples.shape[0]
    cfg = EncoderConfig(block_size=block, channels=c)
    info = StreamInfo(rate, c, depth, samples.shape[1], block, block)
    g = golden.encode_frame([samples[i] for i in range(c)], frame_number,
                            info, cfg)
    frames = samples.reshape(c, 1, block).transpose(1, 0, 2)
    d = DevicePipeline(cfg, depth, batch_size=1).encode_frames(
        frames, frame_number, info
    )[0]
    return g, d


def test_hand_constant_frame():
    """Mono, depth 8, block 16, rate 44100, frame 0, all samples = 5.

    Header: sync FF F8; block 16 -> uncommon-8-bit code 6, tail 0x0F;
    rate 44100 -> code 9; mono ch code 0, depth-8 code 2; fn byte 00.
    Subframe: constant header 0x00 + the sample in 8 bits.
    """
    expected = finish_frame(
        bytes([0xFF, 0xF8, 0x69, 0x02, 0x00, 0x0F]),
        bytes([0x00, 0x05]),
    )
    samples = np.full((1, 16), 5, np.int32)
    g, d = encode_both(samples, 16, 8, 44100, 0)
    assert g == expected
    assert d == expected


def test_hand_uncommon_rate_tail_bug():
    """Rate 12345 needs a 16-bit uncommon tail (code 13) — and the reference
    writes BLOCK_SIZE there instead of the rate (FrameWriter.zig:240-244).
    Block 16 -> tail bytes 00 10 after the block-size tail 0F."""
    expected = finish_frame(
        bytes([0xFF, 0xF8, 0x6D, 0x02, 0x00, 0x0F, 0x00, 0x10]),
        bytes([0x00, 0x05]),
    )
    samples = np.full((1, 16), 5, np.int32)
    g, d = encode_both(samples, 16, 8, 12345, 0)
    assert g == expected
    assert d == expected


def test_hand_escape_all_zero_partition():
    """Mono ramp 0..7, depth 8, block 8, frame 0: second difference is zero,
    so first-min picks fixed order 2; all partition sums are 0 -> the
    all-zero escape (param 15, bit count 5, rice.zig:347-350); partition
    orders are clamped to <= 2 (ctz and order limits) and po=0 wins with
    cost 5+4=9. Escape partition writes param 1111 + bps 00000 and nothing
    else (FrameWriter.zig:313-339 with or_all == 0)."""
    body = (
        HandBits()
        .w(8, (8 | 2) << 1)  # fixed subframe header, order 2
        .w(8, 0).w(8, 1)     # warmup samples 0, 1
        .w(2, 0).w(4, 0)     # method FOUR, partition order 0
        .w(4, 0b1111)        # escape param
        .w(5, 0)             # bits-per-sample 0 -> no residual bits
        .to_bytes()
    )
    assert body == bytes([0x14, 0x00, 0x01, 0x03, 0xC0])
    expected = finish_frame(
        bytes([0xFF, 0xF8, 0x69, 0x02, 0x00, 0x07]), body
    )
    samples = np.arange(8, dtype=np.int32).reshape(1, 8)
    g, d = encode_both(samples, 8, 8, 44100, 0)
    assert g == expected
    assert d == expected


def test_hand_rice_coded_order0_frame():
    """Mono [5,3,6,2,7,1,8,0], depth 8, block 8, frame 1: order sums are
    [32,35,60,...] -> order 0; zigzags [10,6,12,4,14,2,16,0] sum 64;
    po=0 cost = min_k 8(k+1) + (60 >> k) = 39 at k=2 (ties 39@k3 -> smaller
    param wins); po totals {0:43, 1:46, 2:52, 3:69} -> po 0. Each code is
    quo zeros + 1 + 2 remainder bits (writeRicePart)."""
    hb = (
        HandBits()
        .w(8, (8 | 0) << 1)  # fixed subframe header, order 0
        .w(2, 0).w(4, 0)     # method FOUR, partition order 0
        .w(4, 2)             # rice param k=2
    )
    for zz in (10, 6, 12, 4, 14, 2, 16, 0):
        hb.w(zz >> 2, 0).w(1, 1).w(2, zz & 3)  # quo zeros, stop bit, rem
    body = hb.to_bytes()
    assert len(body) == 7  # 56 bits exactly
    expected = finish_frame(
        bytes([0xFF, 0xF8, 0x69, 0x02, 0x01, 0x07]), body
    )
    samples = np.array([[5, 3, 6, 2, 7, 1, 8, 0]], np.int32)
    g, d = encode_both(samples, 8, 8, 44100, 1)
    assert g == expected
    assert d == expected


def test_hand_crc_check_values():
    """The standalone CRCs in this file agree with the published check
    values ("123456789"): CRC-8/SMBUS 0xF4, CRC-16/UMTS 0xFEE8."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def encode_both_cfg(samples, block, depth, rate, frame_number, **cfg_kwargs):
    c = samples.shape[0]
    cfg = EncoderConfig(block_size=block, channels=c, **cfg_kwargs)
    info = StreamInfo(rate, c, depth, samples.shape[1], block, block)
    g = golden.encode_frame([samples[i] for i in range(c)], frame_number,
                            info, cfg)
    frames = samples.reshape(c, 1, block).transpose(1, 0, 2)
    d = DevicePipeline(cfg, depth, batch_size=1).encode_frames(
        frames, frame_number, info
    )[0]
    return g, d


def test_hand_wasted_bits_frame():
    """Wasted-bits subframe layout, hand-assembled from the FLAC spec
    (extension — the reference has no wasted-bits support, so the spec is
    the only authority): samples are 4x the order-0 vector above, so the OR
    of the block has k=2 trailing zero bits. Spec layout: subframe header
    pad/type/flag with flag=1, then k-1 unary coded ((k-1) zeros then a 1 —
    k=2 -> bits 01), then the subframe encodes plane>>k. The shifted plane
    is exactly test_hand_rice_coded_order0_frame's, so the fixed-order-0 /
    k=2 / po=0 derivation carries over unchanged."""
    hb = (
        HandBits()
        .w(8, ((8 | 0) << 1) | 1)  # fixed order 0, wasted flag set
        .w(2, 0b01)                # wasted k=2: one zero, stop bit
        .w(2, 0).w(4, 0)           # method FOUR, partition order 0
        .w(4, 2)                   # rice param k=2
    )
    for zz in (10, 6, 12, 4, 14, 2, 16, 0):
        hb.w(zz >> 2, 0).w(1, 1).w(2, zz & 3)
    body = hb.to_bytes()
    expected = finish_frame(
        bytes([0xFF, 0xF8, 0x69, 0x02, 0x02, 0x07]), body
    )
    samples = 4 * np.array([[5, 3, 6, 2, 7, 1, 8, 0]], np.int32)
    g, d = encode_both_cfg(samples, 8, 8, 44100, 2, wasted_bits=True)
    assert g == expected
    assert d == expected


def test_hand_lpc_subframe_decode():
    """LPC subframe layout, hand-assembled from the FLAC spec and verified
    against the DECODER (extension — the reference stubs LPC). This breaks
    the encoder<->decoder shared-misreading loop: the decoder must read
    spec-exact bytes (order = (type & 31) + 1, precision field = precision-1,
    5-bit shift, order coefficients MSB-first, floor-shift prediction), and
    the existing encode->decode round-trip tests then pin the encoder to the
    same layout.

    Frame: mono, depth 8, block 8, LPC order 2, precision 4 (field 3),
    shift 2, coeffs [3, -1], warmup [10, 12], residuals [1,-2,0,3,-1,2].
    Synthesis by hand (pred = (3*x[i-1] - x[i-2]) >> 2, arithmetic floor
    shift): x = [10, 12, 7, 0, -2, 1, 0, 1]."""
    hb = (
        HandBits()
        .w(8, (0x20 | (2 - 1)) << 1)  # LPC subframe, order 2, no wasted
        .w(8, 10).w(8, 12)            # warmup at sample_size 8
        .w(4, 3)                      # precision - 1
        .w(5, 2)                      # shift
        .w(4, 3).w(4, 0b1111)         # coeffs 3, -1 (4-bit two's complement)
        .w(2, 0).w(4, 0)              # method FOUR, partition order 0
        .w(4, 1)                      # rice param k=1
    )
    for zz in (2, 3, 0, 6, 1, 4):     # zigzag(1,-2,0,3,-1,2)
        hb.w(zz >> 1, 0).w(1, 1).w(1, zz & 1)
    frame = finish_frame(
        bytes([0xFF, 0xF8, 0x69, 0x02, 0x03, 0x07]), hb.to_bytes()
    )
    expected_samples = np.array([10, 12, 7, 0, -2, 1, 0, 1], np.int64)

    from zigflac_tpu.decoder import decode_frame

    info = StreamInfo(44100, 1, 8, 8, 8, 8)
    samples, fn, end = decode_frame(frame, 0, info, check_crc=True)
    assert fn == 3
    assert end == len(frame)
    np.testing.assert_array_equal(samples[0], expected_samples)

    # the native batch parser must agree byte-for-byte with the scalar path
    try:
        import _zf_native  # noqa: F401
    except ImportError:
        return
    from zigflac_tpu.decoder import _decode_batch

    for synth in ("native", "device"):
        got, nfr, endn = _decode_batch(frame, 0, info, True, synth=synth)
        assert nfr == 1 and endn == len(frame)
        np.testing.assert_array_equal(got[0], expected_samples)


def test_hand_wasted_bits_decode():
    """Wasted-bits decode layout from the spec: the hand frame from
    test_hand_wasted_bits_frame must decode to the ORIGINAL (unshifted)
    samples on every decoder backend."""
    hb = (
        HandBits()
        .w(8, ((8 | 0) << 1) | 1)
        .w(2, 0b01)
        .w(2, 0).w(4, 0)
        .w(4, 2)
    )
    for zz in (10, 6, 12, 4, 14, 2, 16, 0):
        hb.w(zz >> 2, 0).w(1, 1).w(2, zz & 3)
    frame = finish_frame(
        bytes([0xFF, 0xF8, 0x69, 0x02, 0x02, 0x07]), hb.to_bytes()
    )
    expected = 4 * np.array([5, 3, 6, 2, 7, 1, 8, 0], np.int64)

    from zigflac_tpu.decoder import decode_frame

    info = StreamInfo(44100, 1, 8, 8, 8, 8)
    samples, fn, end = decode_frame(frame, 0, info, check_crc=True)
    assert fn == 2 and end == len(frame)
    np.testing.assert_array_equal(samples[0], expected)
    try:
        import _zf_native  # noqa: F401
    except ImportError:
        return
    from zigflac_tpu.decoder import _decode_batch

    for synth in ("native", "device"):
        got, nfr, endn = _decode_batch(frame, 0, info, True, synth=synth)
        assert nfr == 1 and endn == len(frame)
        np.testing.assert_array_equal(got[0], expected)
