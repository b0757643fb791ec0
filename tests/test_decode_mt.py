"""Frame-parallel native decode (decode_frames_pcm_mt) must be
byte-identical to the serial path for every content shape, thread count,
frame budget, and failure mode — the stitcher verifies spans chain exactly
and falls back to serial decode from the last verified byte, so identity is
by construction; these tests enforce it empirically, including on
adversarial content where false sync candidates appear inside Rice data.

(The speedup target is multi-core hosts; the CI host has one core, so these
tests exercise correctness of real threading, not throughput —
ROADMAP item 4.)
"""

import io

import pytest

import zigflac_tpu.native as native
from conftest import make_signal
from zigflac_tpu.decoder import _parse_metadata, decode_file
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import write_wav

pytestmark = pytest.mark.skipif(
    native._n is None or not hasattr(native._n, "decode_frames_pcm_mt"),
    reason="native extension not built",
)


def _flac(rng, n, depth=16, kind="mixed", bs=1024, pred="fixed"):
    sig = make_signal(rng, n, channels=2, depth=depth, kind=kind)
    buf = io.BytesIO()
    write_wav(buf, sig, 44100, depth)
    cfg = EncoderConfig(block_size=bs, prediction=pred)
    data = encode_wav_bytes(buf.getvalue(), config=cfg, backend="golden")
    _info, _v, _t, _s, pos = _parse_metadata(data)
    return data, pos, depth


def _walk(fn, data, pos, depth, maxf, *extra):
    """Batch-by-batch decode over the whole stream, incl. tail re-entry."""
    out, p = [], pos
    while True:
        nfr, p2, _bs, pcm, bad, mx = fn(data, p, maxf, depth, 2, *extra)
        out.append((nfr, p2, _bs, pcm, bad, mx))
        if nfr == 0:
            break
        p = p2
    return out


CASES = [
    ("mixed", 16, "fixed"),
    ("noise", 16, "fixed"),      # verbatim-heavy: false syncs in the data
    ("mixed", 24, "lpc"),
    ("extreme", 32, "fixed"),
    ("silence", 16, "fixed"),    # constant subframes: tiny frames
]


@pytest.mark.parametrize("kind,depth,pred", CASES)
def test_mt_identity(rng, kind, depth, pred):
    n = native._n
    data, pos, depth = _flac(rng, 1024 * 9 + 300, depth=depth, kind=kind,
                             pred=pred)
    for maxf in (1 << 50, 7, 1):
        ser = n.decode_frames_pcm(data, pos, maxf, depth, 2)
        for threads in (2, 3, 8):
            mt = n.decode_frames_pcm_mt(data, pos, maxf, depth, 2, threads)
            assert mt == ser, (kind, depth, maxf, threads)


def test_mt_batch_walk_with_tail(rng):
    """Small batches force many calls, a mid-stream re-entry at every batch
    boundary, and a final tail frame at a different block size."""
    n = native._n
    data, pos, depth = _flac(rng, 1024 * 11 + 777)
    ser = _walk(n.decode_frames_pcm, data, pos, depth, 3)
    for threads in (2, 5):
        mt = _walk(n.decode_frames_pcm_mt, data, pos, depth, 3, threads)
        assert mt == ser, threads


def test_mt_corrupt_and_truncated(rng):
    """A flipped byte (CRC mismatch downstream of a span boundary) and a
    truncated stream must produce the exact serial result — same frame
    count, end position, crc_bad index, and PCM bytes."""
    n = native._n
    data, pos, depth = _flac(rng, 1024 * 8 + 100)
    corrupt = bytearray(data)
    corrupt[len(data) // 2] ^= 0x41
    for blob in (bytes(corrupt), data[: len(data) * 2 // 3]):
        ser = n.decode_frames_pcm(blob, pos, 1 << 50, depth, 2)
        for threads in (2, 4):
            mt = n.decode_frames_pcm_mt(blob, pos, 1 << 50, depth, 2,
                                        threads)
            assert mt == ser


def test_mt_error_contract(rng):
    """Garbage at the start raises the same ValueError both ways."""
    n = native._n
    data, pos, depth = _flac(rng, 1024 * 2)
    blob = b"\x00\x01" + data[pos:]
    with pytest.raises(ValueError):
        n.decode_frames_pcm(blob, 0, 1 << 50, depth, 2)
    with pytest.raises(ValueError):
        n.decode_frames_pcm_mt(blob, 0, 1 << 50, depth, 2, 3)


def test_decode_file_threads(rng, tmp_path):
    """decode_file(threads=3) writes a byte-identical WAV and passes the
    MD5 verify; threads=1 pins the serial path."""
    sig = make_signal(rng, 1024 * 6 + 123, channels=2, depth=16, kind="mixed")
    wav_path = tmp_path / "in.wav"
    write_wav(str(wav_path), sig, 44100, 16)
    flac_path = tmp_path / "in.flac"
    cfg = EncoderConfig(block_size=1024)
    flac_path.write_bytes(
        encode_wav_bytes(wav_path.read_bytes(), config=cfg, backend="golden")
    )
    out1 = tmp_path / "s.wav"
    out3 = tmp_path / "m.wav"
    decode_file(str(flac_path), str(out1), backend="native", verify=True,
                threads=1)
    decode_file(str(flac_path), str(out3), backend="native", verify=True,
                threads=3)
    assert out1.read_bytes() == out3.read_bytes() == wav_path.read_bytes()
