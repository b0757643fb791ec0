"""Pallas TPU kernel for frame-stream compaction.

The XLA formulation (ops/bitpack.py::compact_stream_aligned) moves every
output word through a flat per-element gather plus index bookkeeping. On
TPU the same job is one DMA per frame: copy frame f's padded word row to
dynamic offset ``woff[f]`` in the dense output. Consecutive frames' windows
abut (``woff[f+1] = woff[f] + wcnt[f] <= woff[f] + W``), and a frame's
words beyond its byte length are zero, so each full-width copy lays down
the next frame's leading zeros and is then overwritten by it — the grid
runs frames in ascending order, leaving exactly the concatenated stream.

The frame offsets arrive via scalar prefetch so each grid step can compute
its DMA destination before the body runs.

STATUS: correct and tested in interpret mode (tests/test_pallas.py), but the
current Mosaic lowering rejects DMA slices that aren't aligned to the
(8, 128) memref tiling — and unaligned frame offsets are the whole point of
compaction. Padding frames to tile boundaries would inflate the d2h stream
by more than the kernel saves on this transfer-bound harness, so the XLA
formulation (ops/bitpack.py::compact_stream_aligned, ~52ms/1024 frames)
stays the production path. Revisit when Mosaic grows unaligned DMA.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compact_kernel(woff_ref, words_ref, out_ref, sem):
    f = pl.program_id(0)
    w = words_ref.shape[1]
    # HBM -> HBM DMA: frame f's padded row lands at its stream offset
    dst = out_ref.at[pl.ds(woff_ref[f], w)]
    copy = pltpu.make_async_copy(words_ref.at[f], dst, sem)
    copy.start()
    copy.wait()


def compact_stream_pallas(
    words: jnp.ndarray,
    frame_bytes: jnp.ndarray,
    capw: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as compact_stream_aligned: (stream u32 [capw],
    total_words i32). Positions beyond total_words are unspecified (the
    callers slice to total)."""
    n, W = words.shape
    wcnt = (frame_bytes + 3) >> 2
    woff = (jnp.cumsum(wcnt) - wcnt).astype(jnp.int32)
    total = (woff[-1] + wcnt[-1]).astype(jnp.int32)
    # clamp offsets so an overflowing batch still writes in-bounds (the
    # caller detects overflow via total > capw and re-runs at higher tier)
    woff = jnp.minimum(woff, capw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            # whole array, unblocked, pinned to HBM: the kernel DMAs row f
            # directly (VMEM would impose (8,128) slice tiling and capacity)
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _compact_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((capw + W,), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(woff, words)
    return out[:capw], total
