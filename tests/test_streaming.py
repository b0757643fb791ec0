"""Streaming feeder: O(chunk) host memory encode_file must be byte-identical
to the in-memory path (reference analog: src/wav2flac.zig:64-75 encodes
2^36-sample streams in O(frame) memory via chunked reads + incremental MD5).
"""

import io
import os

import numpy as np
import pytest

from conftest import make_signal
from zigflac_tpu.models.encoder import (
    _count_seekpoints,
    encode_file,
    encode_file_streaming,
    encode_wav_bytes,
)
from zigflac_tpu.native import Md5Stream, md5
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import WavReader, WavStreamReader, write_wav


def _wav_file(tmp_path, rng, n, depth=16, channels=2, rate=44100, name="in.wav"):
    sig = make_signal(rng, n, channels=channels, depth=depth)
    path = tmp_path / name
    write_wav(str(path), sig, rate, depth)
    return path


def test_stream_reader_header_parity(tmp_path, rng):
    path = _wav_file(tmp_path, rng, 5000, depth=24)
    mem = WavReader.from_file(str(path))
    with WavStreamReader.open(str(path)) as st:
        for attr in (
            "sample_rate", "bit_depth", "channels", "bytes_per_sample",
            "samples_count",
        ):
            assert getattr(st, attr) == getattr(mem, attr), attr
        # chunked reads reproduce the exact raw bytes + planar samples
        raws, planars = [], []
        while True:
            raw, planar = st.read_samples(777)
            if planar.shape[1] == 0:
                break
            assert planar.shape[1] <= 777
            raws.append(raw)
            planars.append(planar)
    assert b"".join(raws) == bytes(mem.raw_pcm_bytes())
    np.testing.assert_array_equal(
        np.concatenate(planars, axis=1), mem.planar_samples()
    )


def test_md5_stream_matches_oneshot(rng):
    data = rng.integers(0, 256, 100003, dtype=np.uint8).tobytes()
    h = Md5Stream()
    for i in range(0, len(data), 6151):
        h.update(data[i : i + 6151])
    assert h.digest() == md5(data)


def test_count_seekpoints_matches_builder():
    from zigflac_tpu.metadata import build_seekpoints

    for total, block, interval in [
        (0, 256, 1000), (100, 256, 1000), (10000, 256, 1000),
        (10000, 256, 100), (4096 * 7 + 3, 4096, 44100), (256, 256, 1),
    ]:
        n_frames = -(-total // block)
        sizes = np.full(n_frames, 100, np.int64)
        expect = len(build_seekpoints(sizes, block, interval, total))
        assert _count_seekpoints(total, block, interval) == expect, (
            total, block, interval,
        )


@pytest.mark.parametrize("backend", ["device", "golden"])
def test_streaming_equals_inmemory(tmp_path, rng, backend):
    # multiple chunks (frames_per_chunk=3) + a ragged tail
    block = 256
    n = block * 11 + 97
    path = _wav_file(tmp_path, rng, n)
    cfg = EncoderConfig(block_size=block, channels="stereo_auto")
    out_s = tmp_path / "s.flac"
    encode_file_streaming(
        str(path), str(out_s), config=cfg, backend=backend, frames_per_chunk=3
    )
    with open(path, "rb") as f:
        expect = encode_wav_bytes(f.read(), config=cfg, backend=backend)
    assert out_s.read_bytes() == expect


def test_streaming_with_metadata_chain(tmp_path, rng):
    # SEEKTABLE (reserved + patched), tags, padding — full metadata parity
    block = 256
    n = block * 9 + 130
    path = _wav_file(tmp_path, rng, n)
    cfg = EncoderConfig(block_size=block, channels="stereo_auto")
    kw = dict(
        config=cfg, backend="device",
        tags=[("TITLE", "stream"), ("ARTIST", "zf")],
        seek_interval=block * 2, padding=64,
    )
    out_s = tmp_path / "s.flac"
    encode_file_streaming(str(path), str(out_s), frames_per_chunk=2, **kw)
    with open(path, "rb") as f:
        expect = encode_wav_bytes(f.read(), **kw)
    got = out_s.read_bytes()
    assert got == expect
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(got)


@pytest.mark.parametrize("depth,channels", [(8, 1), (24, 2)])
def test_streaming_depths(tmp_path, rng, depth, channels):
    block = 256
    path = _wav_file(tmp_path, rng, block * 5 + 77, depth=depth,
                     channels=channels)
    cfg = EncoderConfig(
        block_size=block,
        channels="stereo_auto" if channels == 2 else channels,
    )
    out_s = tmp_path / "s.flac"
    encode_file_streaming(
        str(path), str(out_s), config=cfg, backend="device",
        frames_per_chunk=2,
    )
    with open(path, "rb") as f:
        expect = encode_wav_bytes(f.read(), config=cfg, backend="device")
    assert out_s.read_bytes() == expect


def test_encode_file_is_streaming_and_bounded(tmp_path, rng, monkeypatch):
    """encode_file must route through the chunked reader and never request
    more than one chunk of samples at a time."""
    block = 256
    path = _wav_file(tmp_path, rng, block * 40)
    cfg = EncoderConfig(block_size=block, channels="stereo_auto")

    max_req = []
    orig = WavStreamReader.read_samples

    def spy(self, m):
        max_req.append(m)
        return orig(self, m)

    monkeypatch.setattr(WavStreamReader, "read_samples", spy)
    out = tmp_path / "o.flac"
    encode_file(str(path), str(out), config=cfg, backend="device")
    assert max_req, "encode_file did not use the streaming reader"
    # default device chunk = pipeline batch (1024 frames)
    assert max(max_req) <= 1024 * block
    with open(path, "rb") as f:
        assert out.read_bytes() == encode_wav_bytes(
            f.read(), config=cfg, backend="device"
        )


def test_cli_decode_roundtrip(tmp_path, rng):
    """flac2wav CLI: encode, decode back, byte-identical WAV."""
    from zigflac_tpu.cli import main

    block = 256
    path = _wav_file(tmp_path, rng, block * 4 + 50)
    flac = tmp_path / "a.flac"
    wav2 = tmp_path / "back.wav"
    assert main([str(path), str(flac), "--block-size", str(block)]) == 0
    assert main(["--decode", str(flac), str(wav2), "--verify"]) == 0
    assert wav2.read_bytes() == path.read_bytes()
    # invalid stream -> exit 2
    bad = tmp_path / "bad.flac"
    bad.write_bytes(b"fLaC garbage")
    assert main(["--decode", str(bad), str(wav2)]) == 2
