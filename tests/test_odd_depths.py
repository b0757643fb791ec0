"""Arbitrary 4-32-bit depth encoding via frame depth code 0b000
(depth-from-STREAMINFO, FLAC spec §9.1.3).

The reference ACCEPTS 4-32-bit WAV (src/WavReader.zig:140-143) but
crashes frame-encoding anything outside {8,12,16,20,24,32}
(libFLAC/FrameWriter.zig:202-214 `unreachable`); this framework encodes
every depth in the accepted envelope — the uncoded ones through the
spec's depth-from-STREAMINFO escape — so a reference user never hits the
crash surface. Canonical libFLAC cross-validation is structurally
unavailable here: the libsndfile binding rejects non-{8,16,24}-bit FLAC
at sf_open (its own subformat table, not a stream-validity signal), so
these depths are pinned by our decoder + MD5 + device==golden instead;
test_external_libflac covers the depths libsndfile can read.
"""

import io

import numpy as np
import pytest

from zigflac_tpu.decoder import decode_flac, metadata_blocks, verify_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.wav import WavReader, reconstruct_raw_bytes, write_wav

from conftest import make_signal

ODD_DEPTHS = [4, 5, 7, 17, 23, 31]


def _wav(x, depth, rate=44100):
    buf = io.BytesIO()
    write_wav(buf, x, rate, depth)
    return buf.getvalue()


def _first_frame_depth_code(flac: bytes) -> int:
    pos = 4
    for _t, body in metadata_blocks(flac):
        pos += 4 + len(body)
    return flac[pos + 3] & 0xF


@pytest.mark.parametrize("depth", ODD_DEPTHS)
def test_golden_roundtrip_uncoded_depth(rng, depth):
    x = make_signal(rng, 4096 + 500, channels=2, depth=depth, kind="mixed")
    wav_bytes = _wav(x, depth)
    flac = encode_wav_bytes(wav_bytes, backend="golden")
    assert _first_frame_depth_code(flac) == 0  # depth-from-STREAMINFO
    dec = decode_flac(flac)
    assert dec.info.bit_depth == depth
    assert dec.md5_ok
    np.testing.assert_array_equal(
        dec.samples, WavReader.from_bytes(wav_bytes).planar_samples()
    )
    assert verify_flac(flac)


@pytest.mark.parametrize("depth", [5, 17])
def test_device_matches_golden_uncoded_depth(rng, depth):
    from zigflac_tpu.utils.config import EncoderConfig

    x = make_signal(rng, 256 * 4 + 100, channels=2, depth=depth,
                    kind="mixed")
    wav_bytes = _wav(x, depth)
    cfg = EncoderConfig(block_size=256, channels="stereo_auto")
    g = encode_wav_bytes(wav_bytes, config=cfg, backend="golden")
    d = encode_wav_bytes(wav_bytes, config=cfg, backend="device")
    assert g == d


@pytest.mark.parametrize("backend", ["native", "host"])
def test_decode_file_verifies_subbyte_md5(rng, tmp_path, backend):
    """STREAMINFO MD5 now verifies for sub-byte depths on every decode
    backend (the 1-byte container rebias generalizes to the left-justified
    quirk inverse)."""
    from zigflac_tpu.decoder import decode_file

    x = make_signal(rng, 256 * 3 + 50, channels=2, depth=5,
                    kind="quiet_noise")
    from zigflac_tpu.utils.config import EncoderConfig

    flac = encode_wav_bytes(
        _wav(x, 5), config=EncoderConfig(block_size=256,
                                         channels="stereo_auto"),
        backend="golden",
    )
    fp = tmp_path / "a.flac"
    fp.write_bytes(flac)
    info = decode_file(str(fp), str(tmp_path / "a.wav"), verify=True,
                       backend=backend)
    assert info.bit_depth == 5


@pytest.mark.parametrize("depth", [4, 6, 8, 12, 17])
def test_reconstruct_inverts_planar(rng, depth):
    """reconstruct_raw_bytes must exactly invert WavReader.planar_samples
    for canonical containers at every depth — including the 1-byte
    read-quirk rotation (sample = signed(value-1), src/WavReader.zig:74-81)
    whose inverse must apply BEFORE left-justification for sub-byte."""
    x = make_signal(rng, 777, channels=2, depth=depth, kind="extreme")
    wav_bytes = _wav(x, depth)
    r = WavReader.from_bytes(wav_bytes)
    raw = bytes(r.raw_pcm_bytes())
    assert reconstruct_raw_bytes(r.planar_samples(), depth) == raw


def test_wav_roundtrip_uncoded_multibyte(rng, tmp_path):
    """flac2wav reproduces the original WAV byte-for-byte at uncoded
    multi-byte depths (1-byte containers keep the standard unsigned
    container on output, off by the reference's read rotation — interop
    beats self-roundtrip there, as at depth 8)."""
    from zigflac_tpu.decoder import decode_file

    x = make_signal(rng, 4096 + 70, channels=2, depth=17, kind="mixed")
    wav_bytes = _wav(x, 17)
    flac = encode_wav_bytes(wav_bytes, backend="golden")
    fp = tmp_path / "b.flac"
    fp.write_bytes(flac)
    out = tmp_path / "b.wav"
    decode_file(str(fp), str(out), verify=True, backend="native")
    assert out.read_bytes() == wav_bytes


def test_depth_bounds_still_rejected():
    from zigflac_tpu.ops.header import header_static

    for bad in (0, 1, 3, 33):
        with pytest.raises(ValueError):
            header_static(4096, 44100, bad)
