"""Batched multi-file encode (BASELINE config 4): N WAVs fused into one
device frame batch must produce exactly the same per-file FLAC streams as
encoding each file alone."""

import io

import numpy as np

from zigflac_tpu.models.encoder import encode_wav_bytes, encode_wav_bytes_many
from zigflac_tpu.decoder import decode_flac
from zigflac_tpu.wav import write_wav

from conftest import make_signal


def wav_of(samples, rate, depth):
    buf = io.BytesIO()
    write_wav(buf, samples, rate, depth)
    return buf.getvalue()


def test_multifile_matches_single(rng):
    wavs = [
        wav_of(make_signal(rng, 2 * 4096 + 77, 2, 16, "mixed"), 44100, 16),
        wav_of(make_signal(rng, 4096, 2, 16, "sine"), 44100, 16),
        wav_of(make_signal(rng, 3 * 4096, 2, 16, "quiet_noise"), 44100, 16),
    ]
    batched = encode_wav_bytes_many(wavs, backend="device")
    singles = [encode_wav_bytes(w, backend="device") for w in wavs]
    for i, (a, b) in enumerate(zip(batched, singles)):
        assert a == b, f"file {i} differs"


def test_multifile_mixed_formats(rng):
    wavs = [
        wav_of(make_signal(rng, 4096 + 10, 2, 16, "mixed"), 44100, 16),
        wav_of(make_signal(rng, 4096, 2, 24, "sine"), 96000, 24),
        wav_of(make_signal(rng, 2 * 4096, 1, 16, "ramp"), 48000, 16),
    ]
    batched = encode_wav_bytes_many(wavs, backend="device")
    for w, f in zip(wavs, batched):
        dec = decode_flac(f)
        assert dec.md5_ok


def test_multifile_golden_backend(rng):
    wavs = [
        wav_of(make_signal(rng, 4096 + 5, 2, 16, "mixed"), 44100, 16),
        wav_of(make_signal(rng, 2 * 4096, 2, 16, "sine"), 44100, 16),
    ]
    batched = encode_wav_bytes_many(wavs, backend="golden")
    singles = [encode_wav_bytes(w, backend="golden") for w in wavs]
    assert batched == singles


def test_multifile_shared_config_mixed_channels(rng):
    """A shared config adapts its channel mode per format group."""
    from zigflac_tpu.utils.config import EncoderConfig

    wavs = [
        wav_of(make_signal(rng, 4096, 2, 16, "mixed"), 44100, 16),
        wav_of(make_signal(rng, 4096, 1, 16, "sine"), 44100, 16),
    ]
    cfg = EncoderConfig(block_size=1024, prediction="fixed")
    outs = encode_wav_bytes_many(wavs, config=cfg, backend="golden")
    for w, f in zip(wavs, outs):
        assert decode_flac(f).md5_ok


def test_cli_batch_mode(tmp_path, rng):
    """--batch: directory of WAVs -> directory of FLACs, each byte-identical
    to its single-file encode."""
    import io

    from conftest import make_signal
    from zigflac_tpu.cli import main
    from zigflac_tpu.models.encoder import encode_wav_bytes
    from zigflac_tpu.utils.config import EncoderConfig
    from zigflac_tpu.wav import write_wav

    indir = tmp_path / "wavs"
    outdir = tmp_path / "flacs"
    indir.mkdir()
    for i, (n, kind) in enumerate([(700, "sine"), (1030, "mixed"),
                                   (512, "noise")]):
        sig = make_signal(rng, n, channels=2, depth=16, kind=kind)
        write_wav(str(indir / f"f{i}.wav"), sig, 44100, 16)
    rc = main(["--batch", str(indir), str(outdir), "--block-size", "256",
               "--verify", "--backend", "golden"])
    assert rc == 0
    cfg = EncoderConfig(block_size=256, channels="stereo_auto")
    for i in range(3):
        got = (outdir / f"f{i}.flac").read_bytes()
        expect = encode_wav_bytes(
            (indir / f"f{i}.wav").read_bytes(), config=cfg, backend="golden"
        )
        assert got == expect, f"f{i}"
    # non-directory input -> exit 1
    assert main(["--batch", str(indir / "f0.wav"), str(outdir)]) == 1


def test_encode_files_streaming_paths(tmp_path, rng):
    """encode_files (the file-to-file streaming form) is byte-identical to
    per-file encode_file for every file, including device tails."""
    from zigflac_tpu.models.encoder import encode_file, encode_files
    from zigflac_tpu.utils.config import EncoderConfig

    cfg = EncoderConfig(block_size=256, channels="stereo_auto")
    sigs = [
        make_signal(rng, 256 * 3 + 100, 2, 16, "mixed"),   # device tail
        make_signal(rng, 256 * 2, 2, 16, "sine"),           # no tail
        make_signal(rng, 256 + 30, 2, 16, "ramp"),          # host tail (<64)
        make_signal(rng, 100, 2, 16, "quiet_noise"),        # tail only
    ]
    ins, outs, refs = [], [], []
    for i, s in enumerate(sigs):
        ip = tmp_path / f"in{i}.wav"
        write_wav(str(ip), s, 44100, 16)
        ins.append(str(ip))
        outs.append(str(tmp_path / f"out{i}.flac"))
        rp = tmp_path / f"ref{i}.flac"
        encode_file(str(ip), str(rp), config=cfg, backend="device")
        refs.append(rp.read_bytes())
    infos = encode_files(ins, outs, config=cfg, backend="device")
    for i, (op, ref) in enumerate(zip(outs, refs)):
        got = open(op, "rb").read()
        assert got == ref, f"file {i} differs from encode_file"
        assert infos[i].md5 == decode_flac(got).info.md5


def test_encode_files_tiny_batches_cross_files(tmp_path, rng):
    """frames_per_chunk smaller than any file forces fused batches that
    cross file boundaries AND files that span several batches; tails must
    still land after their file's full frames."""
    from zigflac_tpu.models.encoder import encode_files
    from zigflac_tpu.utils.config import EncoderConfig

    cfg = EncoderConfig(block_size=256, channels="stereo_auto")
    sigs = [
        make_signal(rng, 256 * 7 + 90, 2, 16, "mixed"),
        make_signal(rng, 256 * 3, 2, 16, "sine"),
        make_signal(rng, 256 * 9 + 70, 2, 16, "quiet_noise"),
        make_signal(rng, 256 * 1 + 65, 2, 16, "ramp"),
    ]
    ins, outs = [], []
    for i, s in enumerate(sigs):
        ip = tmp_path / f"t{i}.wav"
        write_wav(str(ip), s, 44100, 16)
        ins.append(str(ip))
        outs.append(str(tmp_path / f"t{i}.flac"))
    encode_files(ins, outs, config=cfg, backend="device", frames_per_chunk=4)
    singles = [
        encode_wav_bytes(open(p, "rb").read(), config=cfg, backend="device")
        for p in ins
    ]
    for i, (op, ref) in enumerate(zip(outs, singles)):
        assert open(op, "rb").read() == ref, f"file {i}"
