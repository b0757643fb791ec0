"""Robustness: malformed inputs fail with typed errors, never crashes;
container parsing handles real-world WAV layouts."""

import io

import numpy as np
import pytest

from zigflac_tpu.decoder import FlacDecodeError, decode_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.wav import WavFormatError, WavReader, write_wav

from conftest import make_signal


def make_flac(rng, n=4096 + 100):
    samples = make_signal(rng, n, channels=2, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    return encode_wav_bytes(buf.getvalue(), backend="golden")


def test_decoder_bitflip_fuzz(rng):
    """Corrupting any byte must produce a typed decode error or a CRC/MD5
    failure — never an unhandled exception."""
    flac = make_flac(rng)
    data = bytearray(flac)
    for _ in range(60):
        pos = int(rng.integers(4, len(data)))
        old = data[pos]
        data[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            dec = decode_flac(bytes(data), check_crc=True)
            # a lucky flip in ignored padding may still verify; that's fine
        except (FlacDecodeError, EOFError):
            pass
        data[pos] = old


def test_decoder_truncation(rng):
    flac = make_flac(rng)
    for cut in [10, 50, len(flac) // 2, len(flac) - 3]:
        with pytest.raises((FlacDecodeError, EOFError, IndexError)):
            decode_flac(flac[:cut])


def test_wav_chunk_skipping(rng):
    """LIST/fact chunks before fmt and between fmt and data are skipped
    (reference behavior, src/WavReader.zig:126-129,158-164)."""
    samples = make_signal(rng, 1000, channels=2, depth=16, kind="sine")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    raw = bytearray(buf.getvalue())
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + (6).to_bytes(4, "little") + b"INFOxy"
    raw2 = bytes(raw[:fmt_end]) + junk + bytes(raw[fmt_end:])
    # fix RIFF size
    riff_len = len(raw2) - 8
    raw3 = raw2[:4] + riff_len.to_bytes(4, "little") + raw2[8:]
    wav = WavReader.from_bytes(raw3)
    np.testing.assert_array_equal(wav.planar_samples(), samples)


def test_wav_errors(rng):
    with pytest.raises(WavFormatError):
        WavReader.from_bytes(b"RIFX" + b"\x00" * 100)
    with pytest.raises(WavFormatError):
        WavReader.from_bytes(b"RIFF\x00\x00\x00\x00WAVX" + b"\x00" * 100)
    # truncated mid-header
    with pytest.raises((WavFormatError, EOFError)):
        WavReader.from_bytes(b"RIFF\x04\x00\x00\x00WAVE")


def test_wav_bad_block_align(rng):
    """block_align inconsistent with channels/bit_depth must raise a typed
    error, never reach the native de-interleave (which would SIGFPE on
    stride 0 or hit negative-shift UB on stride > 4)."""
    samples = make_signal(rng, 256, channels=2, depth=16, kind="sine")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    good = bytearray(buf.getvalue())
    # fmt fields start at offset 20: codec(2) ch(2) rate(4) brate(4) align(2) depth(2)
    for bad_align in (0, 1, 3, 10, 255):
        raw = bytearray(good)
        raw[32:34] = bad_align.to_bytes(2, "little")
        # keep byte_rate consistent so the align check is what fires
        rate = int.from_bytes(raw[24:28], "little")
        raw[28:32] = (rate * (bad_align // 2) * 2).to_bytes(4, "little")
        with pytest.raises(WavFormatError):
            WavReader.from_bytes(bytes(raw))


def test_verify_flac_truncation_returns_false(rng):
    """verify_flac reports False on truncated streams instead of leaking
    EOFError/IndexError (the CLI maps False to exit 3)."""
    from zigflac_tpu.decoder import verify_flac

    flac = make_flac(rng)
    assert verify_flac(flac)
    for cut in [4, 10, 50, len(flac) // 2, len(flac) - 3]:
        assert verify_flac(flac[:cut]) is False


def test_pcm_extend_format(rng):
    """PCM_EXTEND (0xFFFE) with valid-bits override parses like the
    reference (src/WavReader.zig:147-155)."""
    samples = make_signal(rng, 500, channels=2, depth=24, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 48000, 24)
    raw = bytearray(buf.getvalue())
    # rewrite the fmt chunk as extensible: codec 0xFFFE, size 40
    # original fmt: offset 12: "fmt " + size(16) + fields(16)
    fields = bytes(raw[20:36])
    ext = (
        b"fmt " + (40).to_bytes(4, "little")
        + b"\xfe\xff" + fields[2:]
        + (22).to_bytes(2, "little")
        + (24).to_bytes(2, "little")  # valid bits
        + (0).to_bytes(4, "little")   # channel mask
        + b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    )
    rest = bytes(raw[36:])
    out = bytes(raw[:12]) + ext + rest
    out = out[:4] + (len(out) - 8).to_bytes(4, "little") + out[8:]
    wav = WavReader.from_bytes(out)
    assert wav.bit_depth == 24
    np.testing.assert_array_equal(wav.planar_samples(), samples)
