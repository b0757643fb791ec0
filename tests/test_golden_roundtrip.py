"""Golden encoder -> decoder round-trip: the core correctness property.
Our own decoder must reproduce the input PCM exactly and the STREAMINFO MD5
must match the raw-WAV-byte MD5 (SURVEY.md §4)."""

import io

import numpy as np
import pytest

from zigflac_tpu.decoder import decode_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import WavReader, write_wav

from conftest import make_signal

KINDS = [
    "silence", "constant", "sine", "noise", "ramp",
    "quiet_noise", "mixed", "alternating", "extreme",
]


def roundtrip(samples, rate, depth, config=None, backend="golden"):
    buf = io.BytesIO()
    write_wav(buf, samples, rate, depth)
    wav_bytes = buf.getvalue()
    flac = encode_wav_bytes(wav_bytes, config=config, backend=backend)
    dec = decode_flac(flac)
    return flac, dec


@pytest.mark.parametrize("kind", KINDS)
def test_roundtrip_16bit_stereo(rng, kind):
    samples = make_signal(rng, 3 * 4096 + 777, channels=2, depth=16, kind=kind)
    flac, dec = roundtrip(samples, 44100, 16)
    assert dec.info.bit_depth == 16
    assert dec.info.channels == 2
    assert dec.frame_count == 4
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok, "STREAMINFO MD5 must match decoded PCM"


@pytest.mark.parametrize("kind", ["sine", "noise", "mixed"])
def test_roundtrip_24bit(rng, kind):
    samples = make_signal(rng, 2 * 4096 + 100, channels=2, depth=24, kind=kind)
    flac, dec = roundtrip(samples, 96000, 24)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok


@pytest.mark.parametrize("kind", ["sine", "mixed", "extreme"])
def test_roundtrip_32bit(rng, kind):
    samples = make_signal(rng, 4096 + 17, channels=2, depth=32, kind=kind)
    flac, dec = roundtrip(samples, 44100, 32)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok


@pytest.mark.parametrize("channels", [1, 3, 5, 8])
def test_roundtrip_multichannel(rng, channels):
    samples = make_signal(rng, 4096 + 321, channels=channels, depth=16, kind="mixed")
    flac, dec = roundtrip(samples, 48000, 16)
    assert dec.info.channels == channels
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    assert dec.md5_ok


def test_roundtrip_8bit(rng):
    # The reference's 8-bit read path maps container byte b -> sample b-1
    # (src/WavReader.zig:74-90 quirk); round-trip is exact w.r.t. that
    # mapping and the MD5 covers the original raw bytes.
    samples = make_signal(rng, 2 * 4096, channels=2, depth=8, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 8000, 8)
    wav_bytes = buf.getvalue()
    wav = WavReader.from_bytes(wav_bytes)
    planar = wav.planar_samples()
    flac = encode_wav_bytes(wav_bytes, backend="golden")
    dec = decode_flac(flac)
    np.testing.assert_array_equal(dec.samples, planar.astype(np.int64))
    assert dec.md5_ok


def test_short_stream_tail_frames(rng):
    # final frames of every length class: 1..5 samples hit the constant /
    # verbatim-only paths and partition-order clamps
    for tail in [1, 2, 3, 4, 5, 63, 100]:
        samples = make_signal(rng, 4096 + tail, channels=2, depth=16, kind="mixed")
        flac, dec = roundtrip(samples, 44100, 16)
        np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
        assert dec.md5_ok, f"tail={tail}"


def test_tiny_stream(rng):
    for n in [1, 2, 4, 5, 16, 192]:
        samples = make_signal(rng, n, channels=2, depth=16, kind="noise")
        flac, dec = roundtrip(samples, 44100, 16)
        np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))


def test_uncommon_sample_rate(rng):
    samples = make_signal(rng, 4096, channels=2, depth=16, kind="sine")
    flac, dec = roundtrip(samples, 44056, 16)  # not in the common-rate table
    assert dec.info.sample_rate == 44056
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))


def test_odd_block_size(rng):
    cfg = EncoderConfig(block_size=1000, channels="stereo_auto")
    samples = make_signal(rng, 3000, channels=2, depth=16, kind="mixed")
    flac, dec = roundtrip(samples, 44100, 16, config=cfg)
    assert dec.frame_count == 3
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))


def test_vendor_string(rng):
    samples = make_signal(rng, 100, channels=2, depth=16, kind="sine")
    flac, dec = roundtrip(samples, 44100, 16)
    assert dec.vendor == b"toastori FLAC 0.0.0"


def test_min_max_frame_sizes_recorded(rng):
    samples = make_signal(rng, 4 * 4096, channels=2, depth=16, kind="mixed")
    flac, dec = roundtrip(samples, 44100, 16)
    assert 0 < dec.info.max_frame_size
    assert dec.info.min_frame_size <= dec.info.max_frame_size


def test_prediction_none(rng):
    cfg = EncoderConfig(prediction="none")
    samples = make_signal(rng, 4096 * 2, channels=2, depth=16, kind="mixed")
    flac, dec = roundtrip(samples, 44100, 16, config=cfg)
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))


def test_compression_happens(rng):
    samples = make_signal(rng, 8 * 4096, channels=2, depth=16, kind="sine")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    flac, _ = roundtrip(samples, 44100, 16)
    assert len(flac) < 0.7 * len(buf.getvalue()), "sine should compress well"


def test_encode_to_file_matches_in_memory(rng):
    """The streaming two-pass seek-back protocol (reference
    src/wav2flac.zig:30-47) produces the identical byte stream."""
    import io as _io

    from zigflac_tpu.models.encoder import Encoder, encode_to_file
    from zigflac_tpu.metadata import StreamInfo
    from zigflac_tpu.utils.config import EncoderConfig

    s = make_signal(rng, 2 * 4096 + 55, channels=2, depth=16, kind="mixed")
    cfg = EncoderConfig.default(2)
    i1 = StreamInfo(44100, 2, 16, s.shape[1], 4096, 4096)
    i2 = StreamInfo(44100, 2, 16, s.shape[1], 4096, 4096)
    buf = _io.BytesIO()
    encode_to_file(buf, s, i1, cfg, backend="golden")
    assert buf.getvalue() == Encoder(cfg, 16, backend="golden").encode_stream(s, i2)


def test_vorbis_tags_roundtrip(rng):
    """Vorbis comment tags (reference queued feature, readme.md:31)."""
    samples = make_signal(rng, 3000, channels=2, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    flac = encode_wav_bytes(
        buf.getvalue(), backend="golden",
        tags=[("TITLE", "test song"), ("ARTIST", "ziggy=stardust")],
    )
    dec = decode_flac(flac)
    assert dec.tags == [("TITLE", "test song"), ("ARTIST", "ziggy=stardust")]
    assert dec.vendor == b"toastori FLAC 0.0.0"
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))


def test_seektable_and_padding(rng):
    """SEEKTABLE + PADDING blocks (reference queued features): every
    seekpoint's byte offset must land on a frame whose number matches its
    sample position."""
    import zigflac_tpu.decoder as dec
    from zigflac_tpu.decoder import decode_frame

    samples = make_signal(rng, 5 * 4096 + 100, channels=2, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples, 44100, 16)
    flac = encode_wav_bytes(
        buf.getvalue(), backend="golden", seek_interval=8192, padding=64
    )
    d = decode_flac(flac)
    assert d.md5_ok
    assert d.seektable is not None and len(d.seektable) == 3
    info, _v, _t, st, pos = dec._parse_metadata(flac)
    for sample, offset, nsamples in st:
        _s, fnum, _end = decode_frame(flac, pos + offset, info)
        assert fnum == sample // 4096
        assert nsamples == 4096
    np.testing.assert_array_equal(d.samples, samples.astype(np.int64))


@pytest.mark.parametrize("depth", [12, 20])
def test_roundtrip_12_20_bit(rng, depth):
    """12/20-bit depths are extensions: the reference crashes on them
    (FrameWriter.zig:207-209); we encode them with the spec's depth codes."""
    samples = make_signal(rng, 4096 + 50, channels=2, depth=depth, kind="mixed")
    flac, dec = roundtrip(samples, 44100, depth)
    assert dec.info.bit_depth == depth
    np.testing.assert_array_equal(dec.samples, samples.astype(np.int64))
    # 12/20-bit MD5 IS verified (left-justified container-stride bytes)
    assert dec.md5_ok, "non-byte-aligned depths must verify MD5, not skip it"
