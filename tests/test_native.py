"""Native C++ runtime vs Python fallbacks: identical results, and the
standard check vectors hold in both."""

import hashlib

import numpy as np
import pytest

from zigflac_tpu import native
from zigflac_tpu.crc import crc8 as py_crc8, crc16 as py_crc16


def test_md5_matches_hashlib(rng):
    for n in [0, 1, 63, 64, 65, 1000, 100_000]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.md5(data) == hashlib.md5(data).digest()


def test_crc_vectors():
    assert native.crc16(b"123456789") == 0xFEE8
    assert native.crc8(b"123456789") == 0xF4


def test_crc_matches_python(rng):
    for n in [0, 1, 7, 8, 9, 63, 64, 65, 4096]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc16(data) == py_crc16(data)
        assert native.crc8(data) == py_crc8(data)
    # chained updates
    data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    c = native.crc16(data[:400])
    assert native.crc16(data[400:], c) == native.crc16(data)


@pytest.mark.parametrize("depth,nb", [(8, 1), (16, 2), (24, 3), (32, 4)])
@pytest.mark.parametrize("channels", [1, 2, 6])
def test_deinterleave_matches_numpy(rng, depth, nb, channels):
    n = 997
    data = rng.integers(0, 256, n * channels * nb, dtype=np.uint8).tobytes()
    a = native.deinterleave(data, channels, nb, depth, n)
    # force the numpy fallback path
    b = np.frombuffer(data, dtype=np.uint8).reshape(n, channels, nb)
    top = np.zeros((n, channels, 4), dtype=np.uint8)
    top[:, :, 4 - nb:] = b
    s = top.view("<u4").reshape(n, channels).astype(np.uint32).view(np.int32).T.copy()
    if nb == 1:
        s -= np.int32(128 >> (8 - depth))
    if depth != 32:
        s >>= np.int32(32 - depth)
    np.testing.assert_array_equal(a, s)


def test_assemble_matches_python(rng):
    nf, W = 5, 16
    words = rng.integers(0, 2**32, (nf, W), dtype=np.uint64).astype(np.uint32)
    lens = np.array([7, 64, 1, 33, 40], dtype=np.int64)
    crcs = rng.integers(0, 2**16, nf, dtype=np.uint32)
    got = native.assemble_frames(words, lens, crcs)
    raw = np.ascontiguousarray(words.astype(">u4")).tobytes()
    expect = bytearray()
    for i in range(nf):
        expect += raw[i * W * 4 : i * W * 4 + int(lens[i])]
        expect += int(crcs[i]).to_bytes(2, "big")
    assert got == bytes(expect)


def test_native_is_built():
    # the build should exist in this environment; fallbacks cover others
    assert native.HAVE_NATIVE
