"""Host-side MSB-first bit I/O.

The device path packs bits with prefix-sums + segment-sums (ops/bitpack.py);
this host writer/reader exists as (a) the oracle implementation the device
packer is tested against, and (b) the decoder's input stage.

Semantics mirror the reference bit packer (libFLAC/FrameWriter.zig:36-114):
MSB-first within each byte, values masked to their field width, frames padded
with zero bits to a byte boundary.
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit accumulator over a growing bytearray."""

    __slots__ = ("_buf", "_bitlen")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._bitlen = 0

    @property
    def bit_length(self) -> int:
        return self._bitlen

    def write(self, nbits: int, value: int) -> None:
        """Write the low ``nbits`` bits of ``value`` (MSB first)."""
        if nbits == 0:
            return
        nbits = int(nbits)
        value = int(value) & ((1 << nbits) - 1)  # int(): numpy scalars wrap
        pos = self._bitlen
        self._bitlen += nbits
        # grow buffer
        need = (self._bitlen + 7) // 8
        if len(self._buf) < need:
            self._buf.extend(b"\x00" * (need - len(self._buf)))
        # deposit: big int shifted into place
        end_bit = self._bitlen
        # Bits [pos, end_bit) get value MSB-aligned at pos.
        byte0 = pos // 8
        byte1 = (end_bit + 7) // 8
        span_bits = (byte1 - byte0) * 8
        shifted = value << (span_bits - (end_bit - byte0 * 8))
        chunk = int.from_bytes(self._buf[byte0:byte1], "big") | shifted
        self._buf[byte0:byte1] = chunk.to_bytes(byte1 - byte0, "big")

    def write_signed(self, nbits: int, value: int) -> None:
        """Two's-complement write (reference writeBitsWrapped,
        libFLAC/FrameWriter.zig:65-71)."""
        self.write(nbits, value & ((1 << nbits) - 1))

    def write_zeros(self, nbits: int) -> None:
        if nbits == 0:
            return
        self._bitlen += int(nbits)
        need = (self._bitlen + 7) // 8
        if len(self._buf) < need:
            self._buf.extend(b"\x00" * (need - len(self._buf)))

    def write_unary(self, q: int) -> None:
        """q zero bits followed by a one bit (Rice quotient)."""
        self.write_zeros(q)
        self.write(1, 1)

    def align_to_byte(self) -> None:
        rem = self._bitlen % 8
        if rem:
            self.write_zeros(8 - rem)

    def getvalue(self) -> bytes:
        assert self._bitlen % 8 == 0, "unaligned bitstream"
        return bytes(self._buf)

    def bytes_so_far(self) -> bytes:
        """Bytes covering all written bits (last byte zero-padded)."""
        return bytes(self._buf[: (self._bitlen + 7) // 8])


class BitReader:
    """MSB-first bit reader over a bytes-like object."""

    __slots__ = ("_data", "_pos", "_bitlen")

    def __init__(self, data: bytes, start_bit: int = 0) -> None:
        self._data = data
        self._pos = start_bit
        self._bitlen = 8 * len(data)

    @property
    def bit_position(self) -> int:
        return self._pos

    @property
    def bits_remaining(self) -> int:
        return self._bitlen - self._pos

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self._pos + nbits > self._bitlen:
            raise EOFError("bitstream exhausted")
        pos = self._pos
        self._pos += nbits
        byte0 = pos // 8
        byte1 = (pos + nbits + 7) // 8
        chunk = int.from_bytes(self._data[byte0:byte1], "big")
        tail = byte1 * 8 - (pos + nbits)
        return (chunk >> tail) & ((1 << nbits) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align_to_byte(self) -> None:
        rem = self._pos % 8
        if rem:
            self._pos += 8 - rem

    def seek_bit(self, bitpos: int) -> None:
        self._pos = bitpos
