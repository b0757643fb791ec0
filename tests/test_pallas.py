"""Pallas compaction kernel vs the XLA formulation (interpret mode on CPU;
the real-TPU path is exercised by bench/pipeline when enabled)."""

import numpy as np
import jax.numpy as jnp

from zigflac_tpu.ops.bitpack import compact_stream_aligned
from zigflac_tpu.ops.pallas_compact import compact_stream_pallas


def _mk(rng, n, W):
    wn = rng.integers(0, 2**32, (n, W), dtype=np.uint64).astype(np.uint32)
    fb = rng.integers(5, W * 4 - 3, n).astype(np.int32)
    for i in range(n):
        wcnt = int((fb[i] + 3) >> 2)
        wn[i, wcnt:] = 0
        extra = int(wcnt * 4 - fb[i])
        if extra:
            wn[i, wcnt - 1] &= np.uint32((0xFFFFFFFF << (8 * extra)) & 0xFFFFFFFF)
    return jnp.asarray(wn), jnp.asarray(fb), fb


def test_pallas_compact_matches_xla(rng):
    for n, W in [(4, 8), (16, 40), (64, 17)]:
        words, fbj, fb = _mk(rng, n, W)
        capw = int(((fb + 3) // 4).sum()) + 8
        a, ta = compact_stream_aligned(words, fbj, capw)
        b, tb = compact_stream_pallas(words, fbj, capw, interpret=True)
        ta, tb = int(ta), int(tb)
        assert ta == tb
        np.testing.assert_array_equal(np.asarray(a)[:ta], np.asarray(b)[:tb])


def test_pallas_compact_single_frame(rng):
    words, fbj, fb = _mk(rng, 1, 12)
    capw = int(((fb + 3) // 4).sum()) + 4
    a, ta = compact_stream_aligned(words, fbj, capw)
    b, tb = compact_stream_pallas(words, fbj, capw, interpret=True)
    np.testing.assert_array_equal(np.asarray(a)[: int(ta)], np.asarray(b)[: int(tb)])
