"""FLAC metadata blocks: STREAMINFO packing, block headers, vorbis comment.

Mirrors the reference's metadata layer (libFLAC/metadata.zig) and the
header/vorbis-comment writers (libFLAC/Encoder.zig:384-419), including the
exact 34-byte big-endian STREAMINFO packing (libFLAC/metadata.zig:42-68) and
the min/max frame-size update quirk (libFLAC/metadata.zig:35-40: `else if`
means a frame that raises the max never lowers the min in the same step).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np

HEADER_SIZE = 4 + 1 + 3 + 34  # fLaC + BlockHeader + u24 length + STREAMINFO
VENDOR_STRING = b"toastori FLAC 0.0.0"  # byte-compat vendor (libFLAC/Encoder.zig:410)

U24_MAX = (1 << 24) - 1


class BlockType(enum.IntEnum):
    StreamInfo = 0
    Padding = 1
    Application = 2
    SeekTable = 3
    VorbisComment = 4
    CueSheet = 5
    Picture = 6
    Forbidden = 127


def block_header_byte(block_type: BlockType, is_last: bool) -> int:
    """1 = last-metadata flag (MSB), 7 bits block type."""
    return (0x80 if is_last else 0) | int(block_type)


@dataclass
class StreamInfo:
    sample_rate: int
    channels: int
    bit_depth: int
    interchannel_samples: int
    min_block_size: int
    max_block_size: int
    md5: bytes = b"\x00" * 16
    min_frame_size: int = U24_MAX
    max_frame_size: int = 0

    def update_frame_size(self, frame_size: int) -> None:
        # NOTE the `else if`: replicates libFLAC/metadata.zig:35-40 exactly.
        if frame_size > self.max_frame_size:
            self.max_frame_size = frame_size
        elif frame_size < self.min_frame_size:
            self.min_frame_size = frame_size

    def update_frame_sizes(self, frame_sizes: np.ndarray) -> None:
        """Vectorized equivalent of calling update_frame_size per frame in
        order. A frame updates min iff it is not a strict new running max."""
        if frame_sizes.size == 0:
            return
        s = np.asarray(frame_sizes, dtype=np.int64)
        run_max_before = np.empty_like(s)
        run_max_before[0] = self.max_frame_size
        if s.size > 1:
            np.maximum.accumulate(s[:-1], out=run_max_before[1:])
            np.maximum(run_max_before[1:], self.max_frame_size, out=run_max_before[1:])
        not_new_max = s <= run_max_before
        if not_new_max.any():
            self.min_frame_size = min(self.min_frame_size, int(s[not_new_max].min()))
        self.max_frame_size = max(self.max_frame_size, int(s.max()))

    def bytes(self) -> bytes:
        """Exact 34-byte big-endian STREAMINFO (libFLAC/metadata.zig:42-68)."""
        out = bytearray(34)
        out[0:2] = self.min_block_size.to_bytes(2, "big")
        out[2:4] = self.max_block_size.to_bytes(2, "big")
        out[4:7] = self.min_frame_size.to_bytes(3, "big")
        out[7:10] = self.max_frame_size.to_bytes(3, "big")
        sr = (self.sample_rate << 4) & 0xFFFFFF
        sr_be = bytearray(sr.to_bytes(3, "big"))
        sr_be[2] |= ((self.channels - 1) << 1) & 0xFF
        sr_be[2] |= ((self.bit_depth - 1) >> 4) & 0xFF
        out[10:13] = sr_be
        ics = (self.interchannel_samples << 24) & ((1 << 64) - 1)
        ics_be = bytearray(ics.to_bytes(8, "big"))
        ics_be[0] |= ((self.bit_depth - 1) << 4) & 0xFF
        out[13:18] = ics_be[0:5]
        out[18:34] = self.md5
        return bytes(out)


def set_last_flag(block: bytes) -> bytes:
    """Mark a metadata block as the last in the chain."""
    return bytes([block[0] | 0x80]) + block[1:]


def streaminfo_block(info: StreamInfo, is_last: bool) -> bytes:
    """fLaC signature + STREAMINFO block (libFLAC/Encoder.zig:394-403)."""
    return (
        b"fLaC"
        + bytes([block_header_byte(BlockType.StreamInfo, is_last)])
        + (34).to_bytes(3, "big")
        + info.bytes()
    )


def padding_block(n_bytes: int, is_last: bool) -> bytes:
    """PADDING block (reference queued feature, readme.md:32)."""
    return (
        bytes([block_header_byte(BlockType.Padding, is_last)])
        + n_bytes.to_bytes(3, "big")
        + b"\x00" * n_bytes
    )


def application_block(app_id: bytes, data: bytes, is_last: bool) -> bytes:
    """APPLICATION block: 4-byte registered id + opaque payload (spec
    §8.4; the reference writes none — metaflac-parity extension)."""
    if len(app_id) != 4:
        raise ValueError(
            f"APPLICATION id must be exactly 4 bytes, got {app_id!r}"
        )
    body = bytes(app_id) + bytes(data)
    if len(body) > U24_MAX:
        raise ValueError(
            f"APPLICATION body too large ({len(body)} > {U24_MAX} bytes)"
        )
    return (
        bytes([block_header_byte(BlockType.Application, is_last)])
        + len(body).to_bytes(3, "big")
        + body
    )


def seek_table_block(
    seekpoints: "list[tuple[int, int, int]]", is_last: bool
) -> bytes:
    """SEEKTABLE block (reference queued feature, readme.md:41).

    ``seekpoints``: (sample_number, byte_offset_from_first_frame,
    samples_in_frame) triples, ascending by sample number.
    """
    body = bytearray()
    for sample, offset, nsamples in seekpoints:
        body += sample.to_bytes(8, "big")
        body += offset.to_bytes(8, "big")
        body += nsamples.to_bytes(2, "big")
    return (
        bytes([block_header_byte(BlockType.SeekTable, is_last)])
        + len(body).to_bytes(3, "big")
        + bytes(body)
    )


def build_seekpoints(
    frame_sizes, block_size: int, interval_samples: int, total_samples: int
) -> "list[tuple[int, int, int]]":
    """Seek points at most every ``interval_samples``, from the per-frame
    byte sizes (frame f starts at sample f*block_size)."""
    points = []
    next_at = 0
    offset = 0
    for f, size in enumerate(frame_sizes):
        sample = f * block_size
        if sample >= next_at:
            nsamples = min(block_size, total_samples - sample)
            points.append((sample, offset, nsamples))
            next_at = sample + interval_samples
        offset += int(size)
    return points


def picture_block(
    image_data: bytes,
    mime_type: str,
    is_last: bool,
    picture_type: int = 3,  # front cover
    description: str = "",
    width: int = 0,
    height: int = 0,
    depth: int = 0,
    colors: int = 0,
) -> bytes:
    """PICTURE block (reference Future item, readme.md:40)."""
    mt = mime_type.encode("ascii")
    desc = description.encode("utf-8")
    body = (
        picture_type.to_bytes(4, "big")
        + len(mt).to_bytes(4, "big") + mt
        + len(desc).to_bytes(4, "big") + desc
        + width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + depth.to_bytes(4, "big")
        + colors.to_bytes(4, "big")
        + len(image_data).to_bytes(4, "big") + image_data
    )
    if len(body) > U24_MAX:
        raise ValueError(
            f"picture too large for a metadata block "
            f"({len(body)} > {U24_MAX} bytes)"
        )
    return (
        bytes([block_header_byte(BlockType.Picture, is_last)])
        + len(body).to_bytes(3, "big")
        + body
    )


def cuesheet_block(
    catalog_number: str,
    lead_in_samples: int,
    is_cd: bool,
    tracks: "list[tuple[int, int, str, bool, list[tuple[int, int]]]]",
    is_last: bool,
) -> bytes:
    """CUESHEET block (reference Future item, readme.md:39).

    ``tracks``: (offset_samples, number, isrc(12 chars max), is_audio,
    index_points[(offset, number)]) — must include the lead-out track
    (number 170 for CD, with no index points).
    """
    body = bytearray()
    cat = catalog_number.encode("ascii")[:128]
    body += cat + b"\x00" * (128 - len(cat))
    body += lead_in_samples.to_bytes(8, "big")
    body += bytes([0x80 if is_cd else 0x00])
    body += b"\x00" * 258  # reserved
    body += len(tracks).to_bytes(1, "big")
    for offset, number, isrc, is_audio, points in tracks:
        body += offset.to_bytes(8, "big")
        body += number.to_bytes(1, "big")
        isrc_b = isrc.encode("ascii")[:12]
        body += isrc_b + b"\x00" * (12 - len(isrc_b))
        body += bytes([0x00 if is_audio else 0x80])
        body += b"\x00" * 13  # reserved
        body += len(points).to_bytes(1, "big")
        for poff, pnum in points:
            body += poff.to_bytes(8, "big")
            body += pnum.to_bytes(1, "big")
            body += b"\x00" * 3
    return (
        bytes([block_header_byte(BlockType.CueSheet, is_last)])
        + len(body).to_bytes(3, "big")
        + bytes(body)
    )


def parse_cue_sheet(
    text: str, sample_rate: int, total_samples: int
) -> bytes:
    """Parse a standard .cue sheet (CATALOG / TRACK nn AUDIO / INDEX nn
    MM:SS:FF at 75 frames per second) into a CUESHEET metadata block —
    the `flac --cuesheet` behavior. The lead-out track (170 on CD-DA) is
    appended at the stream end; ``is_cd`` follows the CD-DA rate.
    Raises ValueError on malformed sheets."""
    catalog = ""
    tracks: list = []  # mutable [offset, number, isrc, is_audio, points]
    cur = None
    prev_abs = -1  # last absolute index offset, across ALL tracks
    prev_pnum = -1  # last index number within the current track
    for raw in text.splitlines():
        parts = raw.strip().split()
        if not parts:
            continue
        kw = parts[0].upper()
        if kw == "CATALOG" and len(parts) > 1:
            catalog = parts[1]
        elif kw == "TRACK" and len(parts) >= 3:
            try:
                num = int(parts[1])
            except ValueError:
                raise ValueError(f"bad TRACK number: {raw.strip()!r}")
            if not 0 <= num <= 255:
                raise ValueError(f"TRACK number out of range: {num}")
            cur = [0, num, "", parts[2].upper() == "AUDIO", []]
            tracks.append(cur)
            prev_pnum = -1
        elif kw == "ISRC" and cur is not None and len(parts) > 1:
            cur[2] = parts[1]
        elif kw == "INDEX" and len(parts) >= 3:
            if cur is None:
                raise ValueError("INDEX before any TRACK")
            try:
                pnum = int(parts[1])
                mm, ss, ff = (int(x) for x in parts[2].split(":"))
            except ValueError:
                raise ValueError(f"bad INDEX line: {raw.strip()!r}")
            if not 0 <= pnum <= 255:
                raise ValueError(f"INDEX number out of range: {pnum}")
            if mm < 0 or not 0 <= ss < 60 or not 0 <= ff < 75:
                raise ValueError(f"bad INDEX timestamp: {parts[2]}")
            off = (mm * 60 + ss) * sample_rate + ff * sample_rate // 75
            # the FLAC spec requires strictly increasing index offsets
            # within a track AND strictly increasing track offsets; a
            # single global strict-increase over absolute offsets covers
            # both (track offset = its first index point)
            if off <= prev_abs:
                raise ValueError(
                    f"INDEX offsets must strictly increase "
                    f"(got {parts[2]} after an equal-or-later point)"
                )
            if pnum <= prev_pnum:
                raise ValueError(
                    f"INDEX numbers must strictly increase within a "
                    f"track (got {pnum} after {prev_pnum})"
                )
            prev_abs = off
            prev_pnum = pnum
            if not cur[4]:
                cur[0] = off  # track offset = first index point
            cur[4].append((off - cur[0], pnum))
    if not tracks:
        raise ValueError("cue sheet has no TRACK entries")
    is_cd = sample_rate == 44100
    # index points are stored relative to the track offset (= the first
    # index point's absolute offset; decreasing offsets already raised)
    out_tracks = [
        (t[0], t[1], t[2], t[3], t[4] or [(0, 1)]) for t in tracks
    ]
    out_tracks.append(
        (total_samples, 170 if is_cd else 255, "", True, [])
    )
    return cuesheet_block(
        catalog, 2 * sample_rate if is_cd else 0, is_cd, out_tracks,
        is_last=False,
    )


def vorbis_comment_block(
    is_last: bool,
    vendor: bytes = VENDOR_STRING,
    tags: "list[tuple[str, str]] | None" = None,
) -> bytes:
    """VorbisComment block (libFLAC/Encoder.zig:409-419). The reference
    always writes zero tags ("Vorbis Comments" is on its queued list,
    readme.md:31); ``tags`` extends that: (name, value) pairs encoded as
    NAME=value UTF-8 comments."""
    body = bytearray()
    body += len(vendor).to_bytes(4, "little")
    body += vendor
    tags = tags or []
    body += len(tags).to_bytes(4, "little")
    for name, value in tags:
        comment = f"{name}={value}".encode("utf-8")
        body += len(comment).to_bytes(4, "little")
        body += comment
    return (
        bytes([block_header_byte(BlockType.VorbisComment, is_last)])
        + len(body).to_bytes(3, "big")
        + bytes(body)
    )
