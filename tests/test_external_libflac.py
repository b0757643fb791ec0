"""Validation against the CANONICAL Xiph libFLAC (vendored by pygame,
bound via zigflac_tpu.utils.sndfile).

This closes the oracle-trust chain: golden.py mirrors the Zig reference's
decision rules by reading its source, and every device path is
byte-checked against golden — but until now nothing INDEPENDENT ever
parsed our streams. Here the reference Xiph decoder does:

* every subframe type / depth / channel mode we emit must decode to the
  exact input PCM through libFLAC, and
* FLAC files produced by the canonical libFLAC ENCODER (its own LPC and
  partition choices, which our encoder never makes) must decode exactly
  through OUR decoder.
"""

import io

import numpy as np
import pytest

from zigflac_tpu.decoder import decode_flac as our_decode, verify_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.utils import sndfile
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import WavReader, write_wav

from conftest import make_signal

pytestmark = pytest.mark.skipif(
    not sndfile.available(), reason="no libsndfile/libFLAC on this system"
)


def _wav_bytes(samples, rate, depth):
    buf = io.BytesIO()
    write_wav(buf, samples, rate, depth)
    return buf.getvalue()


def _encode(samples, rate, depth, config=None, backend="golden", **kw):
    wav_bytes = _wav_bytes(samples, rate, depth)
    flac = encode_wav_bytes(wav_bytes, config=config, backend=backend, **kw)
    # what the FLAC payload must decode to: the reference WavReader mapping
    # (identity for 16/24-bit; the 8-bit subtract-before-shift quirk of
    # src/WavReader.zig:74-81 makes low depths differ from the input)
    expect = WavReader.from_bytes(wav_bytes).planar_samples()
    return flac, expect


CASES = [
    # (kind, n, channels, depth, config overrides)
    ("mixed", 4096 * 3 + 777, 2, 16, {}),
    ("sine", 4096 * 2, 2, 16, {}),
    ("silence", 4096, 2, 16, {}),
    ("constant", 4096, 2, 16, {}),
    ("noise", 4096 * 2 + 123, 2, 16, {}),          # escapes / verbatim
    ("alternating", 4096, 2, 16, {}),
    ("mixed", 4096 + 500, 1, 16, {}),               # mono
    ("mixed", 4096 * 2 + 99, 2, 24, {}),            # 24-bit
    ("quiet_noise", 4096, 2, 8, {}),                # 8-bit
    ("mixed", 4096, 2, 16, {"block_size": 1024}),
]


@pytest.mark.parametrize("kind,n,channels,depth,cfg", CASES)
def test_libflac_decodes_our_streams(rng, kind, n, channels, depth, cfg):
    """Canonical libFLAC must accept our streams and return the input PCM
    bit-exactly (fixed prediction, reference parity)."""
    x = make_signal(rng, n, channels=channels, depth=depth, kind=kind)
    config = (
        EncoderConfig(channels="stereo_auto", **cfg)
        if channels == 2 else (EncoderConfig(**cfg) if cfg else None)
    )
    flac, expect = _encode(x, 44100, depth, config=config)
    got, rate = sndfile.decode_flac(flac, depth)
    assert rate == 44100
    np.testing.assert_array_equal(got, expect)


def test_libflac_decodes_lpc_mode(rng):
    """Our LPC extension subframes (spec layout the Zig reference stubs)
    through the canonical decoder."""
    x = make_signal(rng, 4096 * 2 + 333, channels=2, depth=16, kind="mixed")
    config = EncoderConfig(channels="stereo_auto", prediction="lpc")
    flac, expect = _encode(x, 44100, 16, config=config)
    got, _ = sndfile.decode_flac(flac, 16)
    np.testing.assert_array_equal(got, expect)


def test_libflac_decodes_wasted_bits(rng):
    """Shaved samples (wasted-bits subframe header extension) through the
    canonical decoder."""
    x = make_signal(rng, 4096 + 77, channels=2, depth=16, kind="mixed")
    x = (x >> 3) << 3  # 3 wasted bits everywhere
    flac, expect = _encode(x, 44100, 16)
    got, _ = sndfile.decode_flac(flac, 16)
    np.testing.assert_array_equal(got, expect)


def test_libflac_decodes_device_backend_stream(rng):
    """The full device pipeline's bytes (not just golden's) through the
    canonical decoder."""
    x = make_signal(rng, 4096 * 2 + 1000, channels=2, depth=16, kind="mixed")
    flac, expect = _encode(x, 44100, 16, backend="device")
    got, _ = sndfile.decode_flac(flac, 16)
    np.testing.assert_array_equal(got, expect)


def test_libflac_decodes_metadata_extras(rng):
    """Streams carrying our SEEKTABLE / VorbisComment tags / PADDING still
    parse as valid FLAC for the canonical implementation."""
    x = make_signal(rng, 4096 * 3, channels=2, depth=16, kind="sine")
    flac, expect = _encode(
        x, 44100, 16,
        tags=[("TITLE", "validation"), ("ARTIST", "suite")],
        seek_interval=4096, padding=256,
    )
    got, _ = sndfile.decode_flac(flac, 16)
    np.testing.assert_array_equal(got, expect)


def test_libflac_rejects_corrupted_stream(rng):
    """Flipping frame bits must make the canonical decoder fail or return
    different PCM — confirms the external check has teeth."""
    x = make_signal(rng, 4096, channels=2, depth=16, kind="sine")
    flac, expect = _encode(x, 44100, 16)
    flac = bytearray(flac)
    flac[len(flac) // 2] ^= 0xFF  # inside frame data
    try:
        got, _ = sndfile.decode_flac(bytes(flac), 16)
    except RuntimeError:
        return  # rejected outright — good
    assert not np.array_equal(got, expect)


@pytest.mark.parametrize("depth", [16, 24])
@pytest.mark.parametrize("kind", ["mixed", "sine", "noise"])
def test_our_decoder_reads_canonical_streams(rng, kind, depth):
    """FLAC produced by the canonical libFLAC ENCODER — its own LPC orders,
    rice partitions, and stereo decisions — must decode bit-exactly through
    every backend of our decoder."""
    x = make_signal(rng, 4096 * 2 + 600, channels=2, depth=depth, kind=kind)
    flac = sndfile.encode_flac(x, 44100, depth)
    for backend in ("host", "native"):
        dec = our_decode(flac, backend=backend)
        assert dec.info.sample_rate == 44100
        assert dec.info.bit_depth == depth
        np.testing.assert_array_equal(dec.samples, x, err_msg=backend)
    assert verify_flac(flac)


def test_our_decoder_reads_canonical_mono_8bit(rng):
    x = make_signal(rng, 4096 + 123, channels=1, depth=8, kind="quiet_noise")
    flac = sndfile.encode_flac(x, 22050, 8)
    dec = our_decode(flac, backend="host")
    np.testing.assert_array_equal(dec.samples, x)
