"""Property fuzz (ORACLE_AUDIT.md companion): randomized signals across
depths, block sizes, channel counts, and signal classes must satisfy

  (1) golden-encoded streams decode back to the exact input PCM,
      pass CRC-8/CRC-16 verification, and the STREAMINFO MD5 matches
      (the round-trip property from SURVEY §4 oracle (b)), and
  (2) the device pipeline is byte-identical to golden over many random
      contents at a fixed compiled shape (content fuzz, one compile).

Seeded rng: failures reproduce deterministically.
"""

import io

import numpy as np
import pytest

from zigflac_tpu.decoder import decode_flac, verify_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import write_wav


def _random_signal(rng, n, channels, depth):
    """Random content drawn from a mix of encoder-decision-space classes."""
    lo, hi = -(1 << (depth - 1)), (1 << (depth - 1)) - 1
    kind = rng.integers(0, 7)
    t = np.arange(n)
    if kind == 0:  # silence / constant
        x = np.full((channels, n), int(rng.integers(lo, hi + 1)), np.float64)
    elif kind == 1:  # pure tone
        f = rng.uniform(20, 8000)
        x = 0.5 * hi * np.sin(2 * np.pi * f * t / 44100)[None, :].repeat(
            channels, 0
        )
    elif kind == 2:  # white noise, full scale (verbatim-ish)
        x = rng.uniform(lo, hi, (channels, n))
    elif kind == 3:  # quiet noise (deep rice params)
        x = rng.normal(0, max(2.0, hi * 1e-4), (channels, n))
    elif kind == 4:  # tonal + noise (typical music-like)
        f = rng.uniform(50, 2000)
        x = 0.3 * hi * np.sin(2 * np.pi * f * t / 44100) + rng.normal(
            0, hi * 0.01, (channels, n)
        )
    elif kind == 5:  # impulses in silence (escape partitions)
        x = np.zeros((channels, n))
        for _ in range(max(1, n // 64)):
            x[rng.integers(0, channels), rng.integers(0, n)] = rng.integers(
                lo, hi + 1
            )
    else:  # ramps (low fixed orders)
        x = (t * rng.uniform(0.1, 50))[None, :].repeat(channels, 0) % (
            hi - max(lo, -hi)
        ) + lo / 2
    return np.clip(np.round(x), lo, hi).astype(np.int32)


@pytest.mark.parametrize("case", range(60))
def test_fuzz_golden_roundtrip(case):
    """Golden encode -> decode == input PCM, CRCs + MD5 verify, across
    random (depth, block, channels, length incl. ragged tails)."""
    rng = np.random.default_rng(0xF1AC_0000 + case)
    depth = int(rng.choice([8, 12, 16, 20, 24, 32]))
    channels = int(rng.integers(1, 4))
    block = int(rng.choice([32, 64, 192, 256, 576, 1024]))
    n = int(rng.integers(block // 2, 3 * block))
    rate = int(rng.choice([8000, 44100, 48000, 12345, 96000]))
    samples = _random_signal(rng, n, channels, depth)

    buf = io.BytesIO()
    write_wav(buf, samples, rate, depth)
    wav_bytes = buf.getvalue()
    cfg = EncoderConfig(
        block_size=block,
        channels="stereo_auto" if channels == 2 else channels,
    )
    flac = encode_wav_bytes(wav_bytes, config=cfg, backend="golden")

    dec = decode_flac(flac)
    assert dec.info.sample_rate == rate
    assert dec.info.bit_depth == depth
    # WAV depths < 32 sign-extend through the container quirks; compare
    # against what the reader itself produced to include them
    from zigflac_tpu.wav import WavReader

    ref = WavReader.from_bytes(wav_bytes).planar_samples()
    np.testing.assert_array_equal(dec.samples, ref.astype(np.int64))
    assert dec.md5_ok, f"MD5 mismatch (case {case})"
    assert verify_flac(flac)


@pytest.mark.parametrize("chunk", range(4))
def test_fuzz_device_matches_golden(chunk, rng):
    """Content fuzz at one compiled shape: 40 random stereo 16-bit signals
    per chunk of frames, device bytes == golden bytes."""
    from zigflac_tpu import golden
    from zigflac_tpu.metadata import StreamInfo
    from zigflac_tpu.models.pipeline import DevicePipeline

    B = 256
    nf = 10
    cfg = EncoderConfig(block_size=B)
    r = np.random.default_rng(0xDE1CE + chunk)
    planes = np.stack(
        [
            _random_signal(r, B, 2, 16)
            for _ in range(nf)
        ]
    )  # [nf, 2, B]
    info = StreamInfo(44100, 2, 16, nf * B, B, B)
    g = [
        golden.encode_frame([planes[i, 0], planes[i, 1]], i, info, cfg)
        for i in range(nf)
    ]
    d = DevicePipeline(cfg, 16, batch_size=nf).encode_frames(planes, 0, info)
    for i, (a, b) in enumerate(zip(g, d)):
        assert a == b, f"frame {i} differs (chunk {chunk})"


@pytest.mark.parametrize("case", range(10))
def test_fuzz_config_space(case):
    """Config fuzz: random (prediction, lpc_order, wasted_bits, rice limits)
    x random content — golden == device bytes AND decode round-trip."""
    rng = np.random.default_rng(0xCF60 + case)
    depth = int(rng.choice([16, 24]))
    block = int(rng.choice([192, 256, 512]))
    # ragged coverage with DETERMINISTIC tail length (block // 2): one
    # compiled device-tail shape per block bucket instead of one per case
    # (a random tail in [0, block) compiled ~10 one-off shapes)
    n = int(rng.integers(2, 4)) * block + (
        block // 2 if rng.integers(0, 2) else 0
    )
    samples = _random_signal(rng, n, 2, depth)
    if rng.integers(0, 2):
        samples &= ~((1 << int(rng.integers(1, 4))) - 1)  # force wasted bits
    cfg = EncoderConfig(
        block_size=block,
        channels="stereo_auto",
        prediction=str(rng.choice(["fixed", "lpc"])),
        lpc_order=int(rng.choice([4, 8])),
        wasted_bits=bool(rng.integers(0, 2)),
        max_rice_order=int(rng.choice([4, 8])),
    )
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, depth)
    wav_bytes = buf.getvalue()
    g = encode_wav_bytes(wav_bytes, config=cfg, backend="golden")
    d = encode_wav_bytes(wav_bytes, config=cfg, backend="device")
    assert g == d, f"golden != device (case {case}, {cfg})"
    dec = decode_flac(g)
    from zigflac_tpu.wav import WavReader

    ref = WavReader.from_bytes(wav_bytes).planar_samples()
    np.testing.assert_array_equal(dec.samples, ref.astype(np.int64))
    assert dec.md5_ok and verify_flac(g)


@pytest.mark.parametrize("mode", ["flip", "burst", "truncate"])
def test_fuzz_corrupt_decode_fails_cleanly(mode):
    """Decode-side adversarial property (tools/fuzz_decode.py is the long
    form): corrupted / truncated streams through BOTH decode surfaces (host
    scalar + native fused file path) either fail with a clean typed error
    or decode with the corruption caught by CRC/MD5 — never crash."""
    import os
    import tempfile

    from zigflac_tpu.decoder import FlacDecodeError, decode_file

    rng = np.random.default_rng(0xC0 + len(mode))
    base_pcm = _random_signal(np.random.default_rng(3), 4096 + 515, 2, 16)
    buf = io.BytesIO()
    write_wav(buf, base_pcm, 44100, 16)
    seed = encode_wav_bytes(buf.getvalue(), backend="golden")
    ok_errors = (FlacDecodeError, ValueError, EOFError, IndexError)
    for _ in range(12):
        b = bytearray(seed)
        if mode == "flip":
            b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
        elif mode == "burst":
            at = int(rng.integers(0, len(b)))
            ln = int(rng.integers(1, 64))
            b[at : at + ln] = bytes(
                rng.integers(0, 256, min(ln, len(b) - at), dtype=np.uint8)
            )
        else:
            b = b[: rng.integers(0, len(b))]
        blob = bytes(b)
        try:
            dec = decode_flac(blob, check_crc=True)
            assert isinstance(dec.md5_ok, (bool, np.bool_))
        except ok_errors:
            pass
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "x.flac")
            with open(p, "wb") as f:
                f.write(blob)
            try:
                decode_file(p, os.path.join(td, "x.wav"), check_crc=True,
                            verify=True, backend="native")
            except ok_errors:
                pass


def test_corrupt_vorbis_tag_count_fails_fast():
    """A VorbisComment whose claimed tag count is huge but whose body is
    exhausted must raise promptly, not spin ~2^32 zero-length reads
    (regression: hang found by tools/fuzz_decode.py)."""
    import time

    from zigflac_tpu.decoder import FlacDecodeError

    base_pcm = _random_signal(np.random.default_rng(9), 4096, 2, 16)
    buf = io.BytesIO()
    write_wav(buf, base_pcm, 44100, 16)
    flac = bytearray(encode_wav_bytes(buf.getvalue(), backend="golden"))
    # the metadata chain is STREAMINFO (4+4+34) then VorbisComment; its
    # body starts after the 4-byte block header
    vc_body = 4 + 4 + 34 + 4
    vlen = int.from_bytes(flac[vc_body : vc_body + 4], "little")
    ntags_at = vc_body + 4 + vlen
    flac[ntags_at : ntags_at + 4] = (0xFFFFFFF0).to_bytes(4, "little")
    t0 = time.perf_counter()
    with pytest.raises((FlacDecodeError, ValueError, EOFError, IndexError)):
        decode_flac(bytes(flac))
    assert time.perf_counter() - t0 < 5.0
