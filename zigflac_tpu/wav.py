"""Host-side WAV container feeder.

RIFF/WAVE parsing with PCM and PCM_EXTEND (0xFFFE) codecs and unknown-chunk
skipping, matching the reference parser (src/WavReader.zig:118-171), then
vectorized de-interleave + sign-extension of the sample bytes into a planar
``[channels, n_samples] int32`` array (semantics of src/WavReader.zig:44-93
and :231-245: bytes land in the top bytes of each i32, 1-byte samples get an
unsigned->signed subtraction *before* the arithmetic sign-extension shift —
quirk preserved — and all other depths arithmetic-shift down by
``32 - bit_depth``).

The WAV parse is inherently serial and trivial; it stays on host. Everything
downstream (the encoder core) consumes the planar int32 tensor.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from .metadata import StreamInfo


class WavFormatError(ValueError):
    """Malformed or unsupported WAV input (reference error set:
    src/WavReader.zig:249-270)."""


@dataclass
class WavReader:
    sample_rate: int
    bit_depth: int
    channels: int
    bytes_per_sample: int
    samples_count: int          # per-channel sample count
    data: memoryview            # raw little-endian interleaved PCM bytes

    # -- parsing ------------------------------------------------------------

    @classmethod
    def from_bytes(cls, raw: bytes | memoryview) -> "WavReader":
        buf = memoryview(raw)
        r = _ByteCursor(buf)
        (
            sample_rate,
            bit_depth,
            channels,
            bytes_per_sample,
            samples_count,
            data_len,
        ) = _parse_header(r)
        data = buf[r.pos : r.pos + data_len]
        if len(data) < data_len:
            raise WavFormatError("IncompleteStream")
        return cls(
            sample_rate=sample_rate,
            bit_depth=bit_depth,
            channels=channels,
            bytes_per_sample=bytes_per_sample,
            samples_count=samples_count,
            data=data,
        )

    @classmethod
    def from_file(cls, path: str) -> "WavReader":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    # -- capability envelope ------------------------------------------------

    def flac_streaminfo(self, block_size: int) -> StreamInfo:
        """FLAC-compatibility gate (src/WavReader.zig:97-111)."""
        if (
            self.bit_depth < 4
            or self.bit_depth > 32
            or self.channels == 0
            or self.channels > 8
            or self.sample_rate >= 1 << 20
            or self.samples_count >= 1 << 36
        ):
            raise WavFormatError("flac does not support this wav format")
        return StreamInfo(
            sample_rate=self.sample_rate,
            channels=self.channels,
            bit_depth=self.bit_depth,
            interchannel_samples=self.samples_count,
            min_block_size=block_size,
            max_block_size=block_size,
        )

    # -- planarize ----------------------------------------------------------

    def planar_samples(self) -> np.ndarray:
        """De-interleave + sign-extend to ``[channels, samples_count] int32``.

        Vectorized equivalent of the reference's per-(channels x byte-width)
        specialized loops (src/WavReader.zig:173-245), including:
        * bytes placed little-endian into the TOP bytes of each i32,
        * bytes_per_sample == 1: subtract ``128 >> (8 - bit_depth)`` from the
          top-justified value BEFORE sign extension (quirk preserved,
          src/WavReader.zig:74-81),
        * bit_depth != 32: arithmetic shift right by ``32 - bit_depth``.
        """
        from .native import deinterleave

        nb = self.bytes_per_sample
        n = self.samples_count
        c = self.channels
        return deinterleave(self.data[: n * c * nb], c, nb, self.bit_depth, n)

    def raw_pcm_bytes(self) -> memoryview:
        """The exact byte stream the STREAMINFO MD5 covers
        (src/WavReader.zig:69: MD5 is over raw interleaved LE bytes)."""
        return self.data[: self.samples_count * self.channels * self.bytes_per_sample]


def reconstruct_raw_bytes(samples: np.ndarray, bit_depth: int) -> bytes:
    """Inverse of ``planar_samples``: planar ``[channels, n]`` samples -> the
    raw little-endian interleaved container byte stream the STREAMINFO MD5
    covers (src/WavReader.zig:69: MD5 is over the raw WAV bytes).

    Container stride is ``(bit_depth + 7) // 8`` bytes; non-byte-aligned
    depths (12/20-bit) are stored left-justified with zero padding bits, and
    depth 8 inverts the reference's read quirk (sample = byte - 1,
    src/WavReader.zig:74-81). Shared by the encoder (when no raw bytes were
    captured) and the decoder's MD5 verification so both sides serialize
    identically.
    """
    nb = (bit_depth + 7) // 8
    inter = samples.T.astype(np.int64)  # [n, c]
    if nb == 1:
        # invert the reference 1-byte read quirk (sample = value - 1,
        # src/WavReader.zig:74-81) BEFORE left-justifying: the subtract
        # happens on the top-justified value, so its inverse applies to
        # the d-bit value, not the container byte (exact for 4-8 bit)
        inter = inter + 1
    if bit_depth % 8:
        inter = inter << (8 * nb - bit_depth)  # left-justify in the container
    u = (inter & ((1 << (8 * nb)) - 1)).astype(np.uint64)
    b = u[..., None].view(np.uint8).reshape(*u.shape, 8)[:, :, :nb]
    return np.ascontiguousarray(b).tobytes()


def _parse_header(r) -> tuple:
    """Parse RIFF/WAVE headers from a cursor (take/skip/take_u16le/take_u32le)
    up to and including the ``data`` chunk size; the cursor is left at the
    first PCM byte. Shared by the in-memory (``WavReader.from_bytes``) and
    streaming (``WavStreamReader``) feeders so the two parsers cannot
    diverge. Matches src/WavReader.zig:118-171 (chunk skipping, PCM +
    PCM_EXTEND, error taxonomy).

    Returns ``(sample_rate, bit_depth, channels, bytes_per_sample,
    samples_count, data_len)``.
    """
    if r.take(4) != b"RIFF":
        raise WavFormatError("NotRiffFile")
    r.skip(4)  # chunk size
    if r.take(4) != b"WAVE":
        raise WavFormatError("NotWaveFile")
    # skip chunks until "fmt "
    while True:
        tag = r.take(4)
        if tag == b"fmt ":
            break
        r.skip(r.take_u32le())
    r.skip(4)  # fmt chunk size
    codec = r.take_u16le()
    if codec not in (1, 0xFFFE):
        raise WavFormatError("UnsupportCodec")
    channels = r.take_u16le()
    sample_rate = r.take_u32le()
    byte_rate = r.take_u32le()
    block_align = r.take_u16le()
    bit_depth = r.take_u16le()
    if not (4 <= bit_depth <= 32):
        raise WavFormatError("UnsupportBitDepth")
    if channels == 0:
        raise WavFormatError("UnsupportCodec")
    bytes_per_sample = block_align // channels
    if byte_rate != sample_rate * channels * bytes_per_sample:
        raise WavFormatError("BitRateUnmatch")
    if codec == 0xFFFE:  # PCM_EXTEND
        r.skip(2)  # extension size
        bit_depth = r.take_u16le()  # valid bits per sample
        r.skip(4 + 16)  # channel mask + subformat
        if not (4 <= bit_depth <= 32):
            raise WavFormatError("UnsupportBitDepth")
    # The container stride must be 1..4 bytes and consistent with the
    # bit depth, and block_align must be exactly channels * stride.
    # The reference never decodes via block_align (WavReader.zig
    # bytesToSample switches on bit_depth), so a mismatched stride would
    # be a silent divergence here — and stride 0 or >4 would crash the
    # native de-interleave (division by zero / negative shift).
    if (
        not 1 <= bytes_per_sample <= 4
        or bytes_per_sample != (bit_depth + 7) // 8
        or block_align != channels * bytes_per_sample
    ):
        raise WavFormatError("InvalidBlockAlign")
    # skip chunks until "data"
    while True:
        try:
            tag = r.take(4)
        except EOFError as e:
            raise WavFormatError("DataNotFound") from e
        if tag == b"data":
            break
        r.skip(r.take_u32le())
    data_len = r.take_u32le()
    if block_align == 0 or data_len % block_align != 0:
        raise WavFormatError("InvalidDataLen")
    if bit_depth % 8 == 0:
        samples_count = data_len // (channels * (bit_depth // 8))
    else:
        # non-byte-aligned extension (incl. sub-byte, where the reference
        # divides by bit_depth/8 == 0 and crashes, src/WavReader.zig:170;
        # 12/20-bit miscount + crash later, FrameWriter.zig:207-209) —
        # count by the real container stride
        samples_count = data_len // block_align
    return sample_rate, bit_depth, channels, bytes_per_sample, samples_count, data_len


class WavStreamReader:
    """Streaming WAV feeder: same header parse and sample semantics as
    ``WavReader`` but reads the data chunk in bounded pieces from a file
    object, so host memory stays O(chunk) however large the file
    (src/WavReader.zig:64-75 reads one 4096-sample block at a time; we read
    one device *batch* of blocks at a time).

    Use as a context manager or call ``close()``; ``read_samples(n)`` returns
    ``(raw_bytes, planar_int32[c, m])`` with ``m <= n`` (0 at EOF).
    """

    def __init__(self, f, *, _close: bool = False) -> None:
        self._f = f
        self._close = _close
        cursor = _FileCursor(f)
        (
            self.sample_rate,
            self.bit_depth,
            self.channels,
            self.bytes_per_sample,
            self.samples_count,
            self._data_len,
        ) = _parse_header(cursor)
        # fail up front on a truncated data chunk (the in-memory reader
        # does); otherwise the truncation would only surface mid-encode,
        # after output has been partially written
        if f.tell() + self._data_len > cursor.size:
            if self._close:
                f.close()
            raise WavFormatError("IncompleteStream")
        self._remaining = self.samples_count

    @classmethod
    def open(cls, path: str) -> "WavStreamReader":
        return cls(open(path, "rb"), _close=True)

    def flac_streaminfo(self, block_size: int) -> StreamInfo:
        return WavReader.flac_streaminfo(self, block_size)  # same gate

    def read_samples(self, n: int):
        """Read up to ``n`` per-channel samples: returns ``(raw, planar)``
        where ``raw`` is the exact interleaved container byte stream (what
        the STREAMINFO MD5 covers) and ``planar`` is ``[channels, m] int32``
        with the reference's sign-extension semantics. ``m < n`` only at
        stream end; ``(b"", empty)`` when exhausted."""
        from .native import deinterleave

        m = min(n, self._remaining)
        if m <= 0:
            return b"", np.zeros((self.channels, 0), dtype=np.int32)
        stride = self.channels * self.bytes_per_sample
        raw = self._f.read(m * stride)
        if len(raw) < m * stride:
            raise WavFormatError("IncompleteStream")
        self._remaining -= m
        planar = deinterleave(raw, self.channels, self.bytes_per_sample,
                              self.bit_depth, m)
        return raw, planar

    def close(self) -> None:
        if self._close:
            self._f.close()

    def __enter__(self) -> "WavStreamReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class _FileCursor:
    """Header cursor over a binary file object (bounds-checked skip)."""

    __slots__ = ("f", "size")

    def __init__(self, f) -> None:
        self.f = f
        pos = f.tell()
        f.seek(0, 2)
        self.size = f.tell()
        f.seek(pos)

    def take(self, n: int) -> bytes:
        out = self.f.read(n)
        if len(out) < n:
            raise EOFError("unexpected end of WAV")
        return out

    def skip(self, n: int) -> None:
        if self.f.tell() + n > self.size:
            raise EOFError("unexpected end of WAV")
        self.f.seek(n, 1)

    def take_u16le(self) -> int:
        return int.from_bytes(self.take(2), "little")

    def take_u32le(self) -> int:
        return int.from_bytes(self.take(4), "little")


class _ByteCursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: memoryview) -> None:
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise EOFError("unexpected end of WAV")
        out = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return out

    def skip(self, n: int) -> None:
        if self.pos + n > len(self.buf):
            raise EOFError("unexpected end of WAV")
        self.pos += n

    def take_u16le(self) -> int:
        return int.from_bytes(self.take(2), "little")

    def take_u32le(self) -> int:
        return int.from_bytes(self.take(4), "little")


def wav_pcm_bytes(samples: np.ndarray, bit_depth: int) -> bytes:
    """Planar ``[c, n]`` samples -> the WAV data-chunk byte stream
    (little-endian interleaved; 8-bit is the unsigned container;
    sub-byte-aligned depths left-justified). Chunk-composable: the
    concatenation over sample chunks equals the one-shot serialization."""
    c, n = samples.shape
    nb = (bit_depth + 7) // 8
    interleaved = samples.T.astype(np.int64)  # [n, c]
    if bit_depth % 8:
        interleaved = interleaved << (8 * nb - bit_depth)
    if nb == 1:
        interleaved = interleaved + 128  # unsigned 8-bit container
    u = (interleaved & ((1 << (8 * nb)) - 1)).astype(np.uint64)
    frame_bytes = np.zeros((n, c, 8), dtype=np.uint8)
    frame_bytes[:] = u[..., None].view(np.uint8).reshape(n, c, 8)
    return frame_bytes[:, :, :nb].tobytes()


def wav_header_bytes(
    n_samples: int, channels: int, sample_rate: int, bit_depth: int
) -> bytes:
    """RIFF/WAVE/fmt/data headers for a PCM stream of known length.

    RIFF sizes are u32: a stream past ~4 GB of PCM cannot be represented
    (no RF64 support), so raise a clean ValueError instead of overflowing —
    reachable from a FLAC whose (possibly corrupt) STREAMINFO claims a
    giant total-samples count (found by tools/fuzz_decode.py)."""
    nb = (bit_depth + 7) // 8
    block_align = channels * nb
    byte_rate = sample_rate * block_align
    data_len = n_samples * block_align
    if data_len + 36 > 0xFFFFFFFF:
        raise ValueError(
            f"PCM stream too large for a RIFF/WAVE container "
            f"({data_len} data bytes > u32 size field)"
        )
    hdr = io.BytesIO()
    hdr.write(b"RIFF")
    hdr.write((36 + data_len).to_bytes(4, "little"))
    hdr.write(b"WAVEfmt ")
    hdr.write((16).to_bytes(4, "little"))
    hdr.write((1).to_bytes(2, "little"))
    hdr.write(channels.to_bytes(2, "little"))
    hdr.write(sample_rate.to_bytes(4, "little"))
    hdr.write(byte_rate.to_bytes(4, "little"))
    hdr.write(block_align.to_bytes(2, "little"))
    hdr.write(bit_depth.to_bytes(2, "little"))
    hdr.write(b"data")
    hdr.write(data_len.to_bytes(4, "little"))
    return hdr.getvalue()


def write_wav(
    path_or_buf,
    samples: np.ndarray,
    sample_rate: int,
    bit_depth: int,
) -> None:
    """Minimal WAV writer for tests/benchmarks: planar [c, n] int32 in, PCM
    little-endian out. Inverse of planar_samples for 8/16/24/32-bit."""
    c, n = samples.shape
    payload = wav_header_bytes(n, c, sample_rate, bit_depth) + wav_pcm_bytes(
        samples, bit_depth
    )
    if isinstance(path_or_buf, (str, bytes)):
        with open(path_or_buf, "wb") as f:
            f.write(payload)
    else:
        path_or_buf.write(payload)
