"""Public-API round-trip on the device backend: WAV bytes -> FLAC (device
pipeline) -> decode -> exact PCM + MD5."""

import io

import numpy as np
import pytest

from zigflac_tpu.decoder import decode_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import write_wav

from conftest import make_signal


def test_device_roundtrip_16bit(rng):
    samples = make_signal(rng, 3 * 4096 + 500, channels=2, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    flac = encode_wav_bytes(buf.getvalue(), backend="device")
    dec = decode_flac(flac)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok


def test_device_equals_golden_stream(rng):
    """Whole-stream equality: device and golden backends must produce the
    byte-identical FLAC file, including STREAMINFO min/max frame sizes."""
    samples = make_signal(rng, 5 * 4096 + 123, channels=2, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    wav_bytes = buf.getvalue()
    a = encode_wav_bytes(wav_bytes, backend="golden")
    b = encode_wav_bytes(wav_bytes, backend="device")
    assert a == b


def test_device_roundtrip_24bit(rng):
    samples = make_signal(rng, 2 * 4096, channels=2, depth=24, kind="sine")
    buf = io.BytesIO()
    write_wav(buf, samples, 96000, 24)
    flac = encode_wav_bytes(buf.getvalue(), backend="device")
    dec = decode_flac(flac)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok
