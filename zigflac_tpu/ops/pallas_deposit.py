"""Pallas bit-deposit kernel: windowed binning of sorted word deposits.

Replaces the per-element segment-sum scatter path (``bitpack.deposit_words``,
the parallel equivalent of libFLAC/FrameWriter.zig:36-114) on TPU. XLA
lowers sorted scatters at ~16 ns/element — ~150 ms of the round-1 device
program for the [N, ~8K] deposit stream. This kernel exploits what the
scatter cannot: the word keys are MONOTONE (they come from a prefix sum of
field widths), so a chunk of ``CHUNK`` consecutive deposits lands in a
bounded window of output words. Each chunk accumulates into a [CHUNK,
window] compare-against-iota matrix on the VPU (disjoint bit ranges make
add == or) and lands with one dynamic-slice read-modify-write per chunk.

Chunks whose deposits out-span the window (pathological Rice quotient runs)
are detected in the XLA prologue and reported via the ``overflow`` flag; the
caller falls back to the exact segment-sum path (the existing capacity-
ladder protocol in models/pipeline.py handles this).

Mosaic constraints baked into the shape of this code (discovered on the
v5e remote-compile stack, 2026-08):
  * grid/BlockSpec invocations fail to legalize ('func.return'); the kernel
    is GRIDLESS over a [GROUP, S] tile with the batch split outside,
  * fori_loop bounds must be explicit i32 — under x64, Python-int bounds
    trace the index as i64 but materialize it as i32 (muli type mismatch /
    tracer dispatch recursion),
  * u64 never appears (x64 sum promotion) and reductions are signed i32
    (unsigned reductions unimplemented); wrapping i32 adds are bit-identical
    to u32 adds,
  * dynamic lane offsets must be provably 128-aligned: stores use a
    lane-aligned base plus a window widened by 128 to absorb the remainder.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Tunables (env-overridable for hardware sweeps; defaults are the measured
# v5e optimum). WINDOW trades VPU work per chunk against span-overflow
# frequency — chunks whose deposits span more words fall back to the exact
# segment-sum path via the overflow flag.
CHUNK = max(1, int(_os.environ.get("ZF_DEP_CHUNK", "128")))  # deposits/window
# WINDOW rounds up to a lane multiple: _STORE = WINDOW + 128 must stay
# 128-aligned or the kernel's aligned-base store-window assumption breaks
WINDOW = max(128, -(-int(_os.environ.get("ZF_DEP_WINDOW", "256")) // 128) * 128)
_STORE = WINDOW + 128  # store window: aligned base + 0..127 remainder
GROUP = max(1, int(_os.environ.get("ZF_DEP_GROUP", "64")))   # frames/invocation
_UNROLL = max(1, int(_os.environ.get("ZF_DEP_UNROLL", "8")))  # chunk unroll
assert _STORE % 128 == 0, "store window must be 128-lane aligned"
# Sweep notes (v5e, 1024x4096 batch): the kernel itself is ~19 ms of the
# ~40 ms program and plateaus across CHUNK 64..512 / WINDOW 192..512 /
# UNROLL 1..16; giving each unroll lane an independent scratch accumulator
# (breaking the RMW dependency chain) measured identical — the bound is
# VMEM transaction throughput of the ~33K windowed load/store pairs, not
# loop overhead, compare-matrix width, or dependencies. 128/256/8 measured
# best (2410x) with the most generous span budget (254 words per 128
# deposits). Next step is fusing symbol construction in (ROADMAP item 1).


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _deposit_kernel(n_chunks: int, group: int, pk_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    tio = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _STORE), 1)

    def one_chunk(r, row):
        # the three streams ride ONE interleaved array
        # [group * n_chunks, 3*CHUNK] = [w0 | hi | lo] per chunk row: one
        # dynamic-sublane load instead of three (VMEM transactions are the
        # kernel's bound), then static lane slices (Mosaic rejects loads
        # that are dynamic in both dimensions)
        row_data = pk_ref[pl.ds(row, 1), :]  # [1, 3*CHUNK]
        w0c = row_data[:, :CHUNK]
        hic = row_data[:, CHUNK : 2 * CHUNK]
        loc = row_data[:, 2 * CHUNK :]
        # window base = the chunk's first key, lane-aligned down (keys
        # are monotone, so every rel lands in [0, _STORE-2] given the
        # span check). Static [0, 0] indexing avoids traced 2D scalar
        # reads, whose index math promotes to i64 and hits a Mosaic
        # convert-lowering recursion.
        ba_val = (w0c[0, 0] >> 7) << 7
        # the multiple_of-wrapped value participates ONLY in slicing:
        # mixing it into vector arithmetic recurses in tracer dispatch
        ba = pl.multiple_of(ba_val, 128)
        rel = w0c.reshape(CHUNK, 1) - ba_val  # [0, _STORE-2] (span check)
        # value bits are globally disjoint -> sum == or; each deposit
        # touches words ba+rel (hi) and ba+rel+1 (lo) only. The zero is
        # an explicit i32: a bare literal traces as weak i64 under x64,
        # and i64->i32 converts recurse in Mosaic's lowering.
        zero = jnp.zeros((), jnp.int32)
        acc = jnp.sum(
            jnp.where(rel == tio, hic.reshape(CHUNK, 1), zero)
            + jnp.where(rel + 1 == tio, loc.reshape(CHUNK, 1), zero),
            axis=0,
            dtype=jnp.int32,
        )
        cur = out_ref[pl.ds(r, 1), pl.ds(ba, _STORE)]
        out_ref[pl.ds(r, 1), pl.ds(ba, _STORE)] = cur + acc[None, :]

    def row_body(r, carry):
        def ch_body(ch, carry2):
            # manual unroll: Mosaic's fori_loop carries real per-iteration
            # overhead (~300-700 ns) and rejects `unroll=` with traced i32
            # bounds, so the body processes _UNROLL chunks per iteration
            # (the caller pads the chunk count to a multiple)
            base_row = r * jnp.int32(n_chunks) + ch * jnp.int32(_UNROLL)
            for u in range(_UNROLL):
                one_chunk(r, base_row + jnp.int32(u))
            return carry2

        jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_chunks // _UNROLL), ch_body,
            jnp.int32(0),
        )
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(group), row_body, jnp.int32(0))


def _call_group(packed, n_chunks: int, w_pad: int,
                interpret: bool) -> jnp.ndarray:
    group = packed.shape[0] // n_chunks  # frames in this tile
    kern = partial(_deposit_kernel, n_chunks, group)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((group, w_pad), jnp.int32),
        interpret=interpret,
    )(packed)


def deposit_words_binned(
    w0: jnp.ndarray,
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    max_words: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bin sorted per-deposit word contributions into dense output words.

    ``w0``  i32 [N, S] word index of each deposit's hi contribution,
            monotone non-decreasing along S (from the offset prefix sum);
    ``hi``  u32 [N, S] contribution to word w0;
    ``lo``  u32 [N, S] contribution to word w0 + 1.

    Returns (words u32 [N, max_words], overflow bool). ``overflow`` is True
    when some chunk's deposits span more than WINDOW-2 words — the result is
    then unusable and the caller must take the exact segment-sum path.
    """
    n, s = w0.shape
    # Elements beyond the word budget clamp into a slack region past
    # max_words (monotonicity is preserved); any frame that actually needed
    # them has frame_bytes > 4*max_words and trips the caller's capacity
    # check, so the slack garbage is never read.
    w0 = jnp.minimum(w0, max_words + 1)

    hi = jax.lax.bitcast_convert_type(hi, jnp.int32)
    lo = jax.lax.bitcast_convert_type(lo, jnp.int32)
    s_pad = _round_up(max(s, CHUNK * _UNROLL), CHUNK * _UNROLL)
    if s_pad != s:
        padn = s_pad - s
        w0 = jnp.concatenate(
            [w0, jnp.broadcast_to(w0[:, -1:], (n, padn))], axis=1
        )
        z = jnp.zeros((n, padn), jnp.int32)
        hi = jnp.concatenate([hi, z], axis=1)
        lo = jnp.concatenate([lo, z], axis=1)
    n_chunks = s_pad // CHUNK

    bases = w0[:, ::CHUNK]  # [N, n_chunks]
    ends = w0[:, CHUNK - 1 :: CHUNK]
    # the window must cover remainder (<=127) + chunk span + the lo spill
    overflow = jnp.any(ends - bases > WINDOW - 2)

    w_pad = _round_up(max_words + 2 + _STORE, 128)
    group = min(GROUP, n)
    n_pad = _round_up(n, group)
    if n_pad != n:
        padr = n_pad - n
        w0 = jnp.concatenate([w0, jnp.zeros((padr, s_pad), jnp.int32)])
        hi = jnp.concatenate([hi, jnp.zeros((padr, s_pad), jnp.int32)])
        lo = jnp.concatenate([lo, jnp.zeros((padr, s_pad), jnp.int32)])

    # flatten chunks into the sublane axis for single-dynamic-index loads,
    # and interleave the three streams into one [rows, 3*CHUNK] array so
    # each chunk costs one VMEM load instead of three
    w0 = w0.reshape(n_pad * n_chunks, CHUNK)
    hi = hi.reshape(n_pad * n_chunks, CHUNK)
    lo = lo.reshape(n_pad * n_chunks, CHUNK)
    packed = jnp.concatenate([w0, hi, lo], axis=1)
    gc = group * n_chunks
    outs = []
    for g in range(n_pad // group):
        sl = slice(g * gc, (g + 1) * gc)
        outs.append(_call_group(packed[sl], n_chunks, w_pad, interpret))
    words = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    words = jax.lax.bitcast_convert_type(words, jnp.uint32)
    return words[:n, :max_words], overflow
