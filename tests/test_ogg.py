"""Ogg-FLAC container: page-level round trips, lacing edges, CRC
tamper detection, and full encode->transmux->decode byte identity.
(Framework extension — the reference has no container work at all.)"""

import io

import numpy as np
import pytest

from zigflac_tpu import ogg
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.wav import write_wav


def _wav_bytes(seconds=0.5, rate=44100, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate))
    x = 8000 * np.sin(2 * np.pi * 440 * t / rate) + rng.normal(0, 90, (2, t.size))
    buf = io.BytesIO()
    write_wav(buf, np.clip(np.round(x), -32768, 32767).astype(np.int32), rate, 16)
    return buf.getvalue()


def _page_roundtrip(packets, granules):
    out = io.BytesIO()
    w = ogg.OggPageWriter(out)
    for i, (p, g) in enumerate(zip(packets, granules)):
        w.add_packet(p, g)
    w.close(granules[-1] if granules else 0)
    got = [p for p, _g in ogg.OggPageReader(out.getvalue()).packets()]
    assert got == packets


def test_page_writer_reader_roundtrip_sizes():
    """Lacing edge cases: empty, <255, exactly 255, multiple-of-255 (the
    0-lacing terminator), and page-spanning (>64 KB) packets."""
    rng = np.random.default_rng(0)
    sizes = [0, 1, 254, 255, 256, 510, 1020, 65025, 70000, 255 * 255 + 3]
    packets = [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes]
    _page_roundtrip(packets, list(range(1, len(packets) + 1)))


def test_page_crc_detects_corruption():
    out = io.BytesIO()
    w = ogg.OggPageWriter(out)
    w.add_packet(b"hello ogg", 1, flush=True)
    w.close(1)
    data = bytearray(out.getvalue())
    data[30] ^= 0x41  # flip a payload byte (header 27 + lacing 1 + body)
    with pytest.raises(ValueError, match="CRC"):
        list(ogg.OggPageReader(bytes(data)).packets())


def test_ogg_crc_known_vector():
    # poly 0x04C11DB7, init 0, refin/refout false, xorout 0
    assert ogg.ogg_crc(b"123456789") == 0x89A1897F


def test_transmux_roundtrip_byte_identical():
    flac = encode_wav_bytes(_wav_bytes(), backend="golden")
    out = io.BytesIO()
    ogg.flac_to_ogg(flac, out)
    oga = out.getvalue()
    assert ogg.is_ogg(oga)
    assert ogg.ogg_to_flac(oga) == flac
    # first page carries the BOS flag and only the first packet
    assert oga[5] & 0x02
    # mapping header
    pkts = ogg.OggPageReader(oga).packets()
    first, g0 = next(pkts)
    assert first[:5] == b"\x7fFLAC" and first[9:13] == b"fLaC"
    assert g0 == 0


def test_transmux_preserves_metadata_blocks():
    from zigflac_tpu.decoder import decode_flac
    from zigflac_tpu.metadata import vorbis_comment_block

    flac = encode_wav_bytes(
        _wav_bytes(seconds=0.3),
        backend="golden",
        tags=[("TITLE", "ogg test"), ("ARTIST", "zigflac")],
    )
    out = io.BytesIO()
    ogg.flac_to_ogg(flac, out)
    back = ogg.ogg_to_flac(out.getvalue())
    assert back == flac
    dec = decode_flac(back, backend="host")
    assert ("TITLE", "ogg test") in dec.tags


def test_granule_positions_accumulate():
    flac = encode_wav_bytes(_wav_bytes(seconds=0.6), backend="golden")
    out = io.BytesIO()
    ogg.flac_to_ogg(flac, out)
    grans = [g for _p, g in ogg.OggPageReader(out.getvalue()).packets()]
    audio = [g for g in grans if g > 0]
    assert audio == sorted(audio)
    assert audio[-1] == int(0.6 * 44100)


def test_decode_file_autodetects_ogg(tmp_path):
    from zigflac_tpu.decoder import decode_file

    wav = _wav_bytes(seconds=0.4)
    flac = encode_wav_bytes(wav, backend="golden")
    oga_path = tmp_path / "x.oga"
    out = io.BytesIO()
    ogg.flac_to_ogg(flac, out)
    oga_path.write_bytes(out.getvalue())
    wav_out = tmp_path / "x.wav"
    decode_file(str(oga_path), str(wav_out), verify=True)
    assert wav_out.read_bytes() == wav


def test_ogg_rejects_non_flac_stream():
    out = io.BytesIO()
    w = ogg.OggPageWriter(out)
    w.add_packet(b"\x01vorbis-not-flac", 0, flush=True)
    w.close(0)
    with pytest.raises(ValueError, match="Ogg-FLAC"):
        ogg.ogg_to_flac(out.getvalue())


def test_cli_ogg_encode_and_batch(tmp_path):
    """CLI --ogg single-file and --batch --ogg both produce verifiable
    Ogg-FLAC whose embedded native stream matches a direct encode."""
    from zigflac_tpu.cli import main

    wav = _wav_bytes(seconds=0.3)
    wdir = tmp_path / "wavs"
    odir = tmp_path / "out"
    wdir.mkdir()
    (wdir / "x.wav").write_bytes(wav)
    single = tmp_path / "single.oga"
    rc = main([str(wdir / "x.wav"), str(single), "--backend", "golden"])
    assert rc == 0
    assert ogg.is_ogg(single.read_bytes())
    rc = main([
        "--batch", str(wdir), str(odir), "--ogg", "--backend", "golden",
        "--verify",
    ])
    assert rc == 0
    batch_oga = (odir / "x.oga").read_bytes()
    assert ogg.ogg_to_flac(batch_oga) == ogg.ogg_to_flac(single.read_bytes())


def test_streaming_single_pass_ogg_matches_transmux(tmp_path):
    """encode_file(ogg=True) writes Ogg-FLAC in ONE streaming pass
    (OggStreamSink: placeholder header pages + seek-back rewrite); the
    result must be byte-identical to transmuxing the native encode —
    including SEEKTABLE reservation and tag blocks — and decode back to
    the original PCM."""
    from zigflac_tpu.decoder import decode_file
    from zigflac_tpu.models.encoder import encode_file
    from zigflac_tpu.wav import write_wav

    rng = np.random.default_rng(77)
    t = np.arange(44100)
    x = 7000 * np.sin(2 * np.pi * 440 * t / 44100) + rng.normal(0, 80, (2, t.size))
    pcm = np.clip(np.round(x), -32768, 32767).astype(np.int32)
    wav_path = tmp_path / "in.wav"
    write_wav(str(wav_path), pcm, 44100, 16)

    flac_path = tmp_path / "out.flac"
    oga_path = tmp_path / "out.oga"
    encode_file(str(wav_path), str(flac_path), backend="golden",
                seek_interval=22050, tags=[("TITLE", "sp")])
    encode_file(str(wav_path), str(oga_path), backend="golden", ogg=True,
                seek_interval=22050, tags=[("TITLE", "sp")])
    native = flac_path.read_bytes()
    out = io.BytesIO()
    ogg.flac_to_ogg(native, out)
    single_pass = oga_path.read_bytes()
    assert ogg.ogg_to_flac(single_pass) == native
    assert single_pass == out.getvalue()
    # and the container decodes back to the exact PCM
    rt = tmp_path / "rt.wav"
    decode_file(str(oga_path), str(rt), verify=True)
    assert rt.read_bytes() == wav_path.read_bytes()


def test_chained_ogg_streams(tmp_path):
    """Chained container (EOS then a fresh BOS, RFC 3533): ogg_to_flac
    returns the first link, ogg_to_flac_all every link, and decode_file
    decodes the first link transparently."""
    from zigflac_tpu.decoder import decode_file

    wav_a = _wav_bytes(seconds=0.3, seed=11)
    wav_b = _wav_bytes(seconds=0.2, seed=12)
    flac_a = encode_wav_bytes(wav_a, backend="golden")
    flac_b = encode_wav_bytes(wav_b, backend="golden")
    out = io.BytesIO()
    ogg.flac_to_ogg(flac_a, out, serial=0x11111111)
    ogg.flac_to_ogg(flac_b, out, serial=0x22222222)
    chained = out.getvalue()
    assert ogg.flac_serials(chained) == [0x11111111, 0x22222222]
    assert ogg.ogg_to_flac(chained) == flac_a
    assert ogg.ogg_to_flac(chained, serial=0x22222222) == flac_b
    assert ogg.ogg_to_flac_all(chained) == [flac_a, flac_b]

    # chained links REUSING one serial (the default writer serial — plain
    # concatenation of two .oga files): (serial, link) addressing
    same = io.BytesIO()
    ogg.flac_to_ogg(flac_a, same)
    ogg.flac_to_ogg(flac_b, same)
    blob = same.getvalue()
    streams = ogg.flac_streams(blob)
    assert [k for _s, k in streams] == [0, 1]
    assert ogg.ogg_to_flac_all(blob) == [flac_a, flac_b]
    assert ogg.ogg_to_flac(blob, serial=streams[1][0], link=1) == flac_b
    oga_path = tmp_path / "chain.oga"
    oga_path.write_bytes(chained)
    wav_out = tmp_path / "chain.wav"
    decode_file(str(oga_path), str(wav_out), verify=True)
    assert wav_out.read_bytes() == wav_a


def _interleave_pages(a: bytes, b: bytes) -> bytes:
    """Multiplex two single-stream Ogg byte streams page by page."""
    def pages(data):
        out, pos = [], 0
        while pos < len(data):
            nsegs = data[pos + 26]
            body = int(np.frombuffer(
                data[pos + 27 : pos + 27 + nsegs], np.uint8).sum())
            end = pos + 27 + nsegs + body
            out.append(data[pos:end])
            pos = end
        return out
    pa, pb = pages(a), pages(b)
    out = []
    for i in range(max(len(pa), len(pb))):
        if i < len(pb):
            out.append(pb[i])
        if i < len(pa):
            out.append(pa[i])
    return b"".join(out)


def test_multiplexed_ogg_picks_flac_stream():
    """A FLAC stream multiplexed with a foreign (non-FLAC) logical stream:
    the reader skips the foreign serial's pages — including its BOS that
    appears FIRST in the file — and still recovers the FLAC stream."""
    flac = encode_wav_bytes(_wav_bytes(seconds=0.25, seed=13), backend="golden")
    fout = io.BytesIO()
    ogg.flac_to_ogg(flac, fout, serial=0x0F1AC001)
    other = io.BytesIO()
    w = ogg.OggPageWriter(other, serial=0x07DE4D01)
    w.add_packet(b"\x01vorbis-ish header", 0, flush=True)
    for i in range(3):
        w.add_packet(b"opaque payload %d" % i, i + 1, flush=True)
    w.close(3)
    mux = _interleave_pages(fout.getvalue(), other.getvalue())
    assert ogg.flac_serials(mux) == [0x0F1AC001]
    assert ogg.ogg_to_flac(mux) == flac
    assert ogg.ogg_to_flac(mux, serial=0x0F1AC001) == flac


def test_batch_ogg_single_pass_matches_transmux(tmp_path):
    """encode_files(ogg=True) writes each Ogg-FLAC output in the SAME
    single streaming pass as the native encode (per-file OggStreamSink in
    the fused device pipeline) — byte-identical to transmuxing the native
    output, across full-frame files, ragged tails, and both backends."""
    from zigflac_tpu.models.encoder import encode_files
    from zigflac_tpu.utils.config import EncoderConfig
    from zigflac_tpu.wav import write_wav

    rng = np.random.default_rng(21)
    cfg = EncoderConfig(block_size=512, channels="stereo_auto")
    lengths = [512 * 3, 512 * 2 + 177, 512 + 64]  # incl. ragged tails
    ins = []
    for i, n in enumerate(lengths):
        t = np.arange(n)
        x = 6000 * np.sin(2 * np.pi * (300 + 50 * i) * t / 44100)
        pcm = np.clip(
            np.round(x + rng.normal(0, 70, (2, n))), -32768, 32767
        ).astype(np.int32)
        p = tmp_path / f"in{i}.wav"
        write_wav(str(p), pcm, 44100, 16)
        ins.append(str(p))

    for backend in ("device", "golden"):
        native = [str(tmp_path / f"{backend}{i}.flac") for i in range(3)]
        ogas = [str(tmp_path / f"{backend}{i}.oga") for i in range(3)]
        encode_files(ins, native, config=cfg, backend=backend)
        encode_files(ins, ogas, config=cfg, backend=backend, ogg=True)
        for npath, opath in zip(native, ogas):
            ref = io.BytesIO()
            with open(npath, "rb") as f:
                ogg.flac_to_ogg(f.read(), ref)
            with open(opath, "rb") as f:
                assert f.read() == ref.getvalue(), (backend, npath)
