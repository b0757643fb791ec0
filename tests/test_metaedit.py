"""In-place metadata editing (metaflac parity; framework extension —
the reference only writes metadata at encode time, libFLAC/metadata.zig).

Every edit is validated three ways: the decoder re-parses the chain, the
frames region is proven byte-untouched, and verify_flac (frame CRCs +
STREAMINFO MD5) still passes — an edit can only ever touch the head."""

import io

import numpy as np
import pytest

from zigflac_tpu.decoder import metadata_blocks, parse_vorbis_body
from zigflac_tpu.metadata import BlockType
from zigflac_tpu.metaedit import (
    MetaEditError,
    edit_metadata_bytes,
    edit_metadata_file,
    export_pictures,
)
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.wav import write_wav

PNG_SIG = b"\x89PNG\r\n\x1a\n" + b"fakepng-payload" * 20


def _wav_bytes(seconds=0.3, rate=44100, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate))
    x = 6000 * np.sin(2 * np.pi * 330 * t / rate) + rng.normal(0, 70, (2, t.size))
    buf = io.BytesIO()
    write_wav(buf, np.clip(np.round(x), -32768, 32767).astype(np.int32), rate, 16)
    return buf.getvalue()


def _frames(data: bytes) -> bytes:
    pos = 4
    for _btype, body in metadata_blocks(data):
        pos += 4 + len(body)
    return data[pos:]


def _tags(data: bytes):
    for btype, body in metadata_blocks(data):
        if btype == BlockType.VorbisComment:
            return parse_vorbis_body(body)[1]
    return []


def _chain_types(data: bytes):
    return [btype for btype, _ in metadata_blocks(data)]


@pytest.fixture(scope="module")
def flac():
    return encode_wav_bytes(
        _wav_bytes(), backend="golden",
        tags=[("TITLE", "orig"), ("ARTIST", "someone")], padding=256,
    )


def test_add_and_remove_tags_bytes(flac):
    out, plan = edit_metadata_bytes(
        flac, add_tags=[("ALBUM", "new"), ("TITLE", "second")],
        remove_tags=["artist"],
    )
    assert plan.tags_added == 2 and plan.tags_removed == 1
    assert _tags(out) == ["TITLE=orig", "ALBUM=new", "TITLE=second"]
    assert _frames(out) == _frames(flac)
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(out)


def test_edit_preserves_vendor_and_order(flac):
    out, _ = edit_metadata_bytes(flac, add_tags=[("X", "1")])
    for btype, body in metadata_blocks(out):
        if btype == BlockType.VorbisComment:
            vendor, _ = parse_vorbis_body(body)
            break
    orig_vendor = None
    for btype, body in metadata_blocks(flac):
        if btype == BlockType.VorbisComment:
            orig_vendor = parse_vorbis_body(body)[0]
    assert vendor == orig_vendor
    # VC keeps its slot (right after STREAMINFO), padding stays last
    types = _chain_types(out)
    assert types[0] == BlockType.StreamInfo
    assert types[1] == BlockType.VorbisComment
    assert types[-1] == BlockType.Padding


def test_in_place_uses_padding_slack(tmp_path, flac):
    p = tmp_path / "a.flac"
    p.write_bytes(flac)
    plan = edit_metadata_file(str(p), add_tags=[("COMMENT", "hi" * 20)])
    assert plan.in_place  # grew into the 256-byte padding
    data = p.read_bytes()
    # total head span unchanged: frames start where they used to
    assert _frames(data) == _frames(flac)
    assert "COMMENT=" + "hi" * 20 in _tags(data)
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(data)


def test_rewrite_when_chain_outgrows_padding(tmp_path, flac):
    p = tmp_path / "b.flac"
    p.write_bytes(flac)
    big = "x" * 2048  # larger than the 256-byte padding slack
    plan = edit_metadata_file(str(p), add_tags=[("LYRICS", big)])
    assert not plan.in_place
    data = p.read_bytes()
    assert f"LYRICS={big}" in _tags(data)
    assert _frames(data) == _frames(flac)
    # the old padding allotment is preserved across the rewrite
    assert plan.padding == 256


def test_picture_roundtrip(tmp_path, flac):
    p = tmp_path / "c.flac"
    p.write_bytes(flac)
    edit_metadata_file(str(p), picture=(PNG_SIG, "image/png"))
    data = p.read_bytes()
    pics = export_pictures(data)
    assert pics == [("image/png", PNG_SIG)]
    plan = edit_metadata_file(str(p), remove_pictures=True)
    assert plan.pictures_removed == 1
    assert export_pictures(p.read_bytes()) == []
    assert _frames(p.read_bytes()) == _frames(flac)


def test_explicit_padding_resize(tmp_path, flac):
    p = tmp_path / "d.flac"
    p.write_bytes(flac)
    plan = edit_metadata_file(str(p), padding=4096)
    assert plan.padding == 4096 and not plan.in_place
    pad = [len(b) for t, b in metadata_blocks(p.read_bytes())
           if t == BlockType.Padding]
    assert pad == [4096]
    # shrinking back to the same chain size edits in place
    plan2 = edit_metadata_file(str(p), add_tags=[("A", "b")])
    assert plan2.in_place
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(p.read_bytes())


def test_no_vc_block_created_on_demand():
    bare = encode_wav_bytes(_wav_bytes(seed=7), backend="golden")
    # encoder always writes a VC block; strip it to simulate foreign files
    blocks = list(metadata_blocks(bare))
    from zigflac_tpu.metaedit import _serialize_chain

    stripped = b"fLaC" + _serialize_chain(
        [(t, b) for t, b in blocks if t != BlockType.VorbisComment]
    ) + _frames(bare)
    out, plan = edit_metadata_bytes(stripped, add_tags=[("TITLE", "t")])
    assert plan.tags_added == 1
    assert _tags(out) == ["TITLE=t"]
    types = _chain_types(out)
    assert types[0] == BlockType.StreamInfo
    assert types[1] == BlockType.VorbisComment
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(out)


def test_ogg_rejected(tmp_path):
    from zigflac_tpu.ogg import flac_to_ogg

    flac = encode_wav_bytes(_wav_bytes(seed=3), backend="golden")
    buf = io.BytesIO()
    flac_to_ogg(flac, buf)
    with pytest.raises(MetaEditError):
        edit_metadata_bytes(buf.getvalue(), add_tags=[("A", "b")])


def test_cli_edit_flow(tmp_path):
    from zigflac_tpu.cli import main

    wav = tmp_path / "in.wav"
    wav.write_bytes(_wav_bytes(seed=9))
    out = tmp_path / "out.flac"
    img = tmp_path / "cover.png"
    img.write_bytes(PNG_SIG)
    assert main([str(wav), str(out), "--backend", "golden",
                 "--tag", "TITLE=first", "--padding", "512"]) == 0
    assert main([str(out), "--edit", "--tag", "ALBUM=a",
                 "--remove-tag", "TITLE", "--picture", str(img)]) == 0
    data = out.read_bytes()
    assert _tags(data) == ["ALBUM=a"]
    assert export_pictures(data) == [("image/png", PNG_SIG)]
    exported = tmp_path / "cover_out.png"
    assert main([str(out), "--edit", "--export-picture", str(exported)]) == 0
    assert exported.read_bytes() == PNG_SIG
    # --edit with an output path is an error
    assert main([str(out), str(tmp_path / "x.flac"), "--edit"]) == 1
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(data)


def test_truncated_chain_typed_error():
    """A chain whose last block lacks the last-flag runs off the end of
    the data; the walker must raise the typed FlacDecodeError (and the
    editor MetaEditError), never a raw IndexError (advisor r3)."""
    flac = encode_wav_bytes(_wav_bytes(seed=21), backend="golden")
    blocks = list(metadata_blocks(flac))
    # rebuild with no last-flag anywhere
    chain = bytearray()
    for btype, body in blocks:
        chain.append(int(btype))  # last-flag bit clear
        chain += len(body).to_bytes(3, "big")
        chain += body
    bad = b"fLaC" + bytes(chain)  # no frames: walker runs off the end
    from zigflac_tpu.decoder import FlacDecodeError

    with pytest.raises(FlacDecodeError):
        list(metadata_blocks(bad))
    with pytest.raises(MetaEditError):
        edit_metadata_bytes(bad, add_tags=[("A", "b")])


def test_oversized_block_bodies_typed_errors():
    """24-bit block-length overflow raises typed errors, not
    OverflowError (advisor r3): picture_block on encode, the chain
    serializer on edit."""
    from zigflac_tpu.metadata import picture_block
    from zigflac_tpu.metaedit import _serialize_chain

    big = bytes(1 << 24)  # body will exceed 2^24-1 with headers
    with pytest.raises(ValueError, match="too large"):
        picture_block(big, "image/png", False)
    with pytest.raises(MetaEditError, match="too large"):
        _serialize_chain([(int(BlockType.Picture), big)])


def test_cue_sheet_strict_increase():
    """Non-increasing INDEX offsets (within or across tracks) and
    non-increasing index numbers are spec-invalid (advisor r3)."""
    from zigflac_tpu.metadata import parse_cue_sheet

    # valid: two tracks, increasing everywhere
    parse_cue_sheet(
        "TRACK 01 AUDIO\nINDEX 01 00:00:00\nINDEX 02 00:30:00\n"
        "TRACK 02 AUDIO\nINDEX 01 01:00:00\n", 44100, 44100 * 120)
    # regressing offset within a track
    with pytest.raises(ValueError, match="strictly increase"):
        parse_cue_sheet(
            "TRACK 01 AUDIO\nINDEX 01 00:30:00\nINDEX 02 01:00:00\n"
            "INDEX 03 00:45:00\n", 44100, 44100 * 120)
    # duplicate index number within a track
    with pytest.raises(ValueError, match="INDEX numbers"):
        parse_cue_sheet(
            "TRACK 01 AUDIO\nINDEX 01 00:00:00\nINDEX 01 00:30:00\n",
            44100, 44100 * 120)
    # track offsets must increase across tracks too
    with pytest.raises(ValueError, match="strictly increase"):
        parse_cue_sheet(
            "TRACK 01 AUDIO\nINDEX 01 01:00:00\n"
            "TRACK 02 AUDIO\nINDEX 01 00:30:00\n", 44100, 44100 * 120)
    # index numbers reset per track (01 after track change is fine)
    parse_cue_sheet(
        "TRACK 01 AUDIO\nINDEX 01 00:00:00\nINDEX 02 00:10:00\n"
        "TRACK 02 AUDIO\nINDEX 01 00:20:00\n", 44100, 44100 * 60)


def _app_ids(data: bytes):
    return [bytes(b[:4]) for t, b in metadata_blocks(data)
            if t == BlockType.Application]


def test_application_set_replace_remove():
    """metaflac --set-application/--remove-application semantics: set
    appends, set with an existing id replaces IN ITS SLOT, remove drops
    by id; other blocks and the frames are untouched."""
    flac = encode_wav_bytes(_wav_bytes(seed=31), backend="golden")
    out, plan = edit_metadata_bytes(
        flac, set_applications=[(b"aTst", b"payload-1"),
                                (b"bTst", b"other")])
    assert plan.applications_set == 2
    assert _app_ids(out) == [b"aTst", b"bTst"]
    assert _frames(out) == _frames(flac)
    # replace keeps slot order
    out2, plan2 = edit_metadata_bytes(
        out, set_applications=[(b"aTst", b"payload-2-longer")])
    assert plan2.applications_set == 1
    assert _app_ids(out2) == [b"aTst", b"bTst"]
    bodies = {bytes(b[:4]): bytes(b[4:]) for t, b in metadata_blocks(out2)
              if t == BlockType.Application}
    assert bodies[b"aTst"] == b"payload-2-longer"
    assert bodies[b"bTst"] == b"other"
    # remove by id
    out3, plan3 = edit_metadata_bytes(
        out2, remove_applications=[b"aTst"])
    assert plan3.applications_removed == 1
    assert _app_ids(out3) == [b"bTst"]
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(out3)
    # malformed ids are typed errors
    with pytest.raises(MetaEditError):
        edit_metadata_bytes(flac, set_applications=[(b"toolong", b"")])
    with pytest.raises(MetaEditError):
        edit_metadata_bytes(flac, remove_applications=[b"x"])


def test_cuesheet_import_and_remove():
    """--edit --cuesheet imports a .cue against the file's own STREAMINFO;
    a second import REPLACES the block in its slot; --remove-cuesheet
    drops it."""
    flac = encode_wav_bytes(_wav_bytes(seconds=1.2, seed=33),
                            backend="golden")
    cue = ("CATALOG 1234567890123\n"
           "TRACK 01 AUDIO\nINDEX 01 00:00:00\n"
           "TRACK 02 AUDIO\nINDEX 01 00:00:50\n")
    out, plan = edit_metadata_bytes(flac, cuesheet=cue)
    assert plan.cuesheet_set and not plan.cuesheet_removed
    cues = [b for t, b in metadata_blocks(out) if t == BlockType.CueSheet]
    assert len(cues) == 1 and cues[0][395] == 3  # 2 tracks + lead-out
    # replace: one block, new content
    cue2 = "TRACK 01 AUDIO\nINDEX 01 00:00:00\n"
    out2, plan2 = edit_metadata_bytes(out, cuesheet=cue2)
    cues2 = [b for t, b in metadata_blocks(out2)
             if t == BlockType.CueSheet]
    assert plan2.cuesheet_set and len(cues2) == 1 and cues2[0][395] == 2
    # matches the encode-time builder byte-for-byte (derive rate/total
    # from STREAMINFO like the editor does)
    from zigflac_tpu.metadata import parse_cue_sheet
    from zigflac_tpu.metaedit import _streaminfo_fields

    rate, total = _streaminfo_fields(list(metadata_blocks(flac)))
    assert cues2[0] == parse_cue_sheet(cue2, rate, total)[4:]
    out3, plan3 = edit_metadata_bytes(out2, remove_cuesheet=True)
    assert plan3.cuesheet_removed
    assert not [1 for t, _ in metadata_blocks(out3)
                if t == BlockType.CueSheet]
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(out3)
    # malformed sheets are typed errors
    with pytest.raises(MetaEditError):
        edit_metadata_bytes(flac, cuesheet="TRACK xx AUDIO\n")


def test_import_tags_file_parse():
    from zigflac_tpu.metaedit import parse_tags_file

    assert parse_tags_file("A=1\n\nB=two words\n") == [
        ("A", "1"), ("B", "two words")]
    with pytest.raises(MetaEditError):
        parse_tags_file("A=1\nnot-a-tag\n")
    with pytest.raises(MetaEditError):
        parse_tags_file("=value\n")


def test_cli_edit_metaflac_long_tail(tmp_path, capsys):
    """CLI surface: --import-tags-from, --set-application,
    --remove-application, --cuesheet/--remove-cuesheet with --edit."""
    from zigflac_tpu.cli import main

    wav = tmp_path / "in.wav"
    wav.write_bytes(_wav_bytes(seconds=1.2, seed=35))
    out = tmp_path / "out.flac"
    assert main([str(wav), str(out), "--backend", "golden",
                 "--padding", "1024"]) == 0
    tagf = tmp_path / "tags.txt"
    tagf.write_text("ALBUM=someday\nTITLE=track one\n")
    appf = tmp_path / "app.bin"
    appf.write_bytes(b"\x01\x02\x03opaque")
    cuef = tmp_path / "x.cue"
    cuef.write_text("TRACK 01 AUDIO\nINDEX 01 00:00:00\n")
    assert main([str(out), "--edit",
                 "--import-tags-from", str(tagf),
                 "--set-application", f"Ztst={appf}",
                 "--cuesheet", str(cuef)]) == 0
    data = out.read_bytes()
    assert _tags(data) == ["ALBUM=someday", "TITLE=track one"]
    assert _app_ids(data) == [b"Ztst"]
    assert [1 for t, _ in metadata_blocks(data) if t == BlockType.CueSheet]
    # --list shows the application id
    assert main([str(out), "--list"]) == 0
    assert "id 'Ztst'" in capsys.readouterr().out
    assert main([str(out), "--edit", "--remove-application", "Ztst",
                 "--remove-cuesheet"]) == 0
    data = out.read_bytes()
    assert _app_ids(data) == []
    assert not [1 for t, _ in metadata_blocks(data)
                if t == BlockType.CueSheet]
    # malformed inputs exit 1/2 without traceback
    assert main([str(out), "--edit", "--set-application", "nofile"]) == 1
    badtags = tmp_path / "bad.txt"
    badtags.write_text("oops\n")
    assert main([str(out), "--edit",
                 "--import-tags-from", str(badtags)]) == 2
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(out.read_bytes())


def test_application_block_builder_encode_time():
    """metadata.application_block feeds extra_metadata at encode time."""
    from zigflac_tpu.metadata import application_block

    blk = application_block(b"riff", b"\x00\x01", False)
    assert blk[0] == int(BlockType.Application)
    assert blk[4:8] == b"riff" and blk[8:] == b"\x00\x01"
    with pytest.raises(ValueError):
        application_block(b"abc", b"", False)

def test_application_set_duplicate_id_last_wins():
    """Repeated --set-application with the SAME id keeps one block with
    the last payload (metaflac set semantics), whether or not a block
    with that id already exists; pre-existing duplicate blocks of a set
    id collapse to one."""
    flac = encode_wav_bytes(_wav_bytes(seed=37), backend="golden")
    # no existing block: two specs for one id -> ONE block, last payload
    out, plan = edit_metadata_bytes(
        flac, set_applications=[(b"Xabc", b"a"), (b"Xabc", b"b")])
    assert plan.applications_set == 1
    assert _app_ids(out) == [b"Xabc"]
    bodies = {bytes(b[:4]): bytes(b[4:]) for t, b in metadata_blocks(out)
              if t == BlockType.Application}
    assert bodies[b"Xabc"] == b"b"
    # a stream that genuinely carries TWO Xabc blocks (encode-time
    # extra_metadata imposes no uniqueness): set collapses them to one
    from zigflac_tpu.metadata import application_block

    dup_stream = encode_wav_bytes(
        _wav_bytes(seed=37), backend="golden",
        extra_metadata=[application_block(b"Xabc", b"one", False),
                        application_block(b"Xabc", b"two", False)])
    assert _app_ids(dup_stream) == [b"Xabc", b"Xabc"]
    out_dup2, plan2 = edit_metadata_bytes(
        dup_stream, set_applications=[(b"Xabc", b"final")])
    assert plan2.applications_set == 1
    assert _app_ids(out_dup2) == [b"Xabc"]
    bodies2 = {bytes(b[:4]): bytes(b[4:])
               for t, b in metadata_blocks(out_dup2)
               if t == BlockType.Application}
    assert bodies2[b"Xabc"] == b"final"
    from zigflac_tpu.decoder import verify_flac

    assert verify_flac(out_dup2)


def test_cli_remove_application_non_ascii_id(tmp_path, capsys):
    """--edit --remove-application with a non-ASCII id is a clean exit-1
    error, not a UnicodeEncodeError traceback."""
    from zigflac_tpu.cli import main

    wav = tmp_path / "in.wav"
    wav.write_bytes(_wav_bytes(seconds=0.4, seed=39))
    out = tmp_path / "out.flac"
    assert main([str(wav), str(out), "--backend", "golden"]) == 0
    assert main([str(out), "--edit",
                 "--remove-application", "Zté"]) == 1
    assert "ASCII" in capsys.readouterr().err
