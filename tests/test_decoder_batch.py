"""Batch decoder (native C++ parse + device synthesis scan) must agree
exactly with the scalar host decoder on every stream shape the encoder can
emit. BASELINE config 5: decoder round-trip, bit-exact PCM."""

import io

import numpy as np
import pytest

from conftest import make_signal
from zigflac_tpu.decoder import decode_flac, verify_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.native import HAVE_NATIVE
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import write_wav

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="native extension not built"
)


def _flac(rng, n, depth=16, channels=2, kind="mixed", **cfg_kw):
    sig = make_signal(rng, n, channels=channels, depth=depth, kind=kind)
    buf = io.BytesIO()
    write_wav(buf, sig, 44100, depth)
    cfg = EncoderConfig(
        channels="stereo_auto" if channels == 2 else channels,
        **{"block_size": 256, **cfg_kw},
    )
    return encode_wav_bytes(buf.getvalue(), config=cfg, backend="golden")


def _assert_same(flac):
    dh = decode_flac(flac, backend="host")
    dd = decode_flac(flac, backend="device")
    dn = decode_flac(flac, backend="native")
    np.testing.assert_array_equal(dh.samples, dd.samples)
    np.testing.assert_array_equal(dh.samples, dn.samples)
    assert dh.frame_count == dd.frame_count == dn.frame_count
    assert dh.md5_ok and dd.md5_ok and dn.md5_ok


@pytest.mark.parametrize("kind", ["silence", "constant", "sine", "mixed",
                                  "noise", "alternating"])
def test_batch_decode_kinds(rng, kind):
    _assert_same(_flac(rng, 256 * 5 + 100, kind=kind))


@pytest.mark.parametrize("depth,channels", [(8, 1), (12, 2), (16, 2),
                                            (20, 2), (24, 2), (32, 2)])
def test_batch_decode_depths(rng, depth, channels):
    _assert_same(_flac(rng, 256 * 4 + 33, depth=depth, channels=channels))


def test_batch_decode_lpc(rng):
    _assert_same(
        _flac(rng, 256 * 6 + 17, kind="sine", prediction="lpc", lpc_order=8)
    )


def test_batch_decode_wasted_bits(rng):
    sig = make_signal(rng, 256 * 4, depth=16, kind="mixed") & ~0x7
    buf = io.BytesIO()
    write_wav(buf, sig, 44100, 16)
    cfg = EncoderConfig(block_size=256, channels="stereo_auto",
                        wasted_bits=True)
    _assert_same(encode_wav_bytes(buf.getvalue(), config=cfg, backend="golden"))


def test_batch_decode_verbatim_escape(rng):
    # incompressible noise at full scale forces verbatim subframes and
    # escape partitions
    _assert_same(_flac(rng, 256 * 3 + 55, kind="noise"))


def test_batch_decode_large_multibatch(rng):
    # more frames than one parse batch (512): exercises the re-invoke loop
    flac = _flac(rng, 256 * 530, kind="sine")
    _assert_same(flac)


def test_batch_verify_corrupt_stream(rng):
    flac = bytearray(_flac(rng, 256 * 3))
    assert verify_flac(bytes(flac))
    flac[len(flac) // 2] ^= 0xFF  # flip bits mid-frame
    assert not verify_flac(bytes(flac))


def test_batch_verify_truncated(rng):
    flac = _flac(rng, 256 * 3)
    assert not verify_flac(flac[: len(flac) - 40])


def test_decode_range_with_seektable(rng):
    from zigflac_tpu.decoder import decode_range

    block = 256
    sig = make_signal(rng, block * 9 + 77, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, sig, 44100, 16)
    cfg = EncoderConfig(block_size=block, channels="stereo_auto")
    flac = encode_wav_bytes(
        buf.getvalue(), config=cfg, backend="golden",
        seek_interval=block * 2,
    )
    full = decode_flac(flac).samples
    for start, n in [(0, 100), (block * 3 + 5, 300), (block * 8, block + 77),
                     (block * 9, 77)]:
        got = decode_range(flac, start, n)
        np.testing.assert_array_equal(got, full[:, start : start + n])
    # no seektable: still exact, just slower
    flac2 = encode_wav_bytes(buf.getvalue(), config=cfg, backend="golden")
    got = decode_range(flac2, block * 4 + 1, 99)
    np.testing.assert_array_equal(
        got, full[:, block * 4 + 1 : block * 4 + 100]
    )
    import pytest as _pytest

    from zigflac_tpu.decoder import FlacDecodeError

    with _pytest.raises(FlacDecodeError):
        decode_range(flac, block * 9, 100)  # past the end


def test_decode_file_streaming(tmp_path, rng):
    """decode_file: streaming flac2wav, byte-identical WAV to the one-shot
    path, MD5 verified incrementally; exercises multi-batch + ragged tail."""
    from zigflac_tpu.decoder import FlacDecodeError, decode_file
    from zigflac_tpu.utils.config import EncoderConfig
    from zigflac_tpu.wav import write_wav

    block = 256
    sig = make_signal(rng, block * 9 + 130, depth=16, kind="mixed")
    wav_path = tmp_path / "in.wav"
    write_wav(str(wav_path), sig, 44100, 16)
    cfg = EncoderConfig(block_size=block, channels="stereo_auto")
    flac = encode_wav_bytes(wav_path.read_bytes(), config=cfg,
                            backend="golden")
    fp = tmp_path / "a.flac"
    fp.write_bytes(flac)

    for backend in ("device", "native", "host"):
        out = tmp_path / f"out_{backend}.wav"
        info = decode_file(str(fp), str(out), backend=backend, verify=True)
        assert info.interchannel_samples == sig.shape[1]
        assert out.read_bytes() == wav_path.read_bytes(), backend

    # corrupted MD5 in STREAMINFO -> FlacDecodeError only when verifying
    bad = bytearray(flac)
    bad[26] ^= 0xFF  # a byte inside the STREAMINFO MD5 field
    bp = tmp_path / "bad.flac"
    bp.write_bytes(bytes(bad))
    decode_file(str(bp), str(tmp_path / "x.wav"))  # no verify: ok
    import pytest as _pytest

    with _pytest.raises(FlacDecodeError):
        decode_file(str(bp), str(tmp_path / "y.wav"), verify=True)


def test_decode_range_backend_parity(rng):
    """decode_range rides the native batch parser by default; every backend
    must return identical samples (and the batch cap must not truncate)."""
    from zigflac_tpu.decoder import decode_range

    block = 256
    sig = make_signal(rng, block * 7 + 10, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, sig, 44100, 16)
    cfg = EncoderConfig(block_size=block, channels="stereo_auto")
    flac = encode_wav_bytes(buf.getvalue(), config=cfg, backend="golden")
    full = decode_flac(flac).samples
    for start, n in [(0, 64), (block * 2 + 3, block * 3), (block * 6, block + 10)]:
        ref = full[:, start : start + n]
        for backend in ("native", "device", "host"):
            got = decode_range(flac, start, n, backend=backend)
            np.testing.assert_array_equal(got, ref, err_msg=backend)


def test_fused_decode_crc_detection(rng, tmp_path):
    """The fused native decode path (decode_frames_pcm) reports frame CRC
    corruption through decode_file just like the scalar path."""
    from zigflac_tpu.decoder import FlacDecodeError, decode_file

    flac = bytearray(_flac(rng, 256 * 3))
    fp = tmp_path / "ok.flac"
    fp.write_bytes(bytes(flac))
    decode_file(str(fp), str(tmp_path / "ok.wav"), backend="native")
    flac[len(flac) - 30] ^= 0x10  # corrupt inside the last frame body
    bp = tmp_path / "bad.flac"
    bp.write_bytes(bytes(flac))
    with pytest.raises(FlacDecodeError):
        decode_file(str(bp), str(tmp_path / "bad.wav"), backend="native")


def test_unary_window_edge_vector():
    """Regression: a >=63-zero unary run ending exactly at the last bit of
    the native bit reader's full 64-bit window used to hit a shift-by-64
    (UB; x86 masks the count to 0), leaving the consumed stop bit as a
    stale 1 that surfaced inside a later Rice remainder — one residual
    read +1 with the CRC still passing. tests/vectors/unary_window_edge
    .flac is the fuzz-found stream (tools/fuzz_long.py seed 51966); its
    embedded MD5 is the ground truth all backends must reproduce."""
    import os

    from zigflac_tpu.decoder import decode_flac

    path = os.path.join(os.path.dirname(__file__), "vectors",
                        "unary_window_edge.flac")
    with open(path, "rb") as f:
        data = f.read()
    ref = None
    for backend in ("host", "native", "device"):
        dec = decode_flac(data, check_crc=True, backend=backend)
        assert dec.md5_ok, f"{backend} backend MD5 mismatch"
        if ref is None:
            ref = dec.samples
        else:
            assert (dec.samples == ref).all(), backend
