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

Round-3 restructure — the kernel was measured VMEM-transaction bound at
~575 ns/chunk (sweeps over CHUNK/WINDOW/UNROLL and scratch layouts all
flat), so the lever is transactions per deposited bit, not compute:

* PAIR-MERGED deposits: adjacent symbol pairs of the frame stream fuse
  into one deposit ((val_a << width_b) | val_b, up to 64 deposited bits
  spanning up to 3 output words) before the kernel — the deposit stream,
  and with it the chunk count and every per-chunk transaction, HALVES.
  Pairs whose combined span exceeds 64 bits (a pathological unary
  quotient run) raise the same overflow flag as a window out-span and the
  batch falls back to the exact segment-sum path.
* BULK ROW LOADS: the ``_UNROLL`` chunks of an unroll group load their
  interleaved [w0 | s0 | s1 | s2] rows with ONE dynamic-sublane VMEM read
  ([_UNROLL, 4*CHUNK]) instead of one per chunk.

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

# Tunables (env-overridable for hardware sweeps). WINDOW trades VPU work
# per chunk against span-overflow frequency — chunks whose deposits span
# more words fall back to the exact segment-sum path via the overflow flag.
# The merged stream doubles the PCM covered per chunk, so the default
# window is 384 (merged worst case without a long unary run: 128 pairs of
# 33-bit fields = 264 words < 382 budget; 256 kept overflowing depth-32
# escape partitions).
CHUNK = max(1, int(_os.environ.get("ZF_DEP_CHUNK", "128")))  # deposits/window
# WINDOW rounds up to a lane multiple: _STORE = WINDOW + 128 must stay
# 128-aligned or the kernel's aligned-base store-window assumption breaks
WINDOW = max(128, -(-int(_os.environ.get("ZF_DEP_WINDOW", "384")) // 128) * 128)
_STORE = WINDOW + 128  # store window: aligned base + 0..127 remainder
GROUP = max(1, int(_os.environ.get("ZF_DEP_GROUP", "64")))   # frames/invocation
_UNROLL = max(1, int(_os.environ.get("ZF_DEP_UNROLL", "8")))  # chunk unroll
# pair-merge the deposit stream before binning (ZF_DEP_MERGE=0 for A/B)
MERGE = _os.environ.get("ZF_DEP_MERGE", "1") != "0"
assert _STORE % 128 == 0, "store window must be 128-lane aligned"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _deposit_kernel(n_chunks: int, group: int, chunk: int, store: int,
                    unroll: int, pk_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    tio = jax.lax.broadcasted_iota(jnp.int32, (chunk, store), 1)

    def one_chunk(r, bulk, u):
        # the four streams ride ONE interleaved array
        # [group * n_chunks, 4*CHUNK] = [w0 | s0 | s1 | s2] per chunk row;
        # ``bulk`` is the unroll group's [_UNROLL, 4*CHUNK] block (one
        # dynamic-sublane load shared by _UNROLL chunks — VMEM transactions
        # are the kernel's bound), sliced statically per chunk.
        row_data = bulk[u : u + 1, :]  # [1, 4*chunk]
        w0c = row_data[:, :chunk]
        s0c = row_data[:, chunk : 2 * chunk]
        s1c = row_data[:, 2 * chunk : 3 * chunk]
        s2c = row_data[:, 3 * chunk :]
        # window base = the chunk's first key, lane-aligned down (keys
        # are monotone, so every rel lands in [0, _STORE-3] given the
        # span check). Static [0, 0] indexing avoids traced 2D scalar
        # reads, whose index math promotes to i64 and hits a Mosaic
        # convert-lowering recursion.
        ba_val = (w0c[0, 0] >> 7) << 7
        # the multiple_of-wrapped value participates ONLY in slicing:
        # mixing it into vector arithmetic recurses in tracer dispatch
        ba = pl.multiple_of(ba_val, 128)
        rel = w0c.reshape(chunk, 1) - ba_val  # [0, store-3] (span check)
        # value bits are globally disjoint -> sum == or; each deposit
        # touches words ba+rel (s0), ba+rel+1 (s1), ba+rel+2 (s2). The
        # zero is an explicit i32: a bare literal traces as weak i64 under
        # x64, and i64->i32 converts recurse in Mosaic's lowering.
        zero = jnp.zeros((), jnp.int32)
        acc = jnp.sum(
            jnp.where(rel == tio, s0c.reshape(chunk, 1), zero)
            + jnp.where(rel + 1 == tio, s1c.reshape(chunk, 1), zero)
            + jnp.where(rel + 2 == tio, s2c.reshape(chunk, 1), zero),
            axis=0,
            dtype=jnp.int32,
        )
        cur = out_ref[pl.ds(r, 1), pl.ds(ba, store)]
        out_ref[pl.ds(r, 1), pl.ds(ba, store)] = cur + acc[None, :]

    def row_body(r, carry):
        def ch_body(ch, carry2):
            # manual unroll: Mosaic's fori_loop carries real per-iteration
            # overhead (~300-700 ns) and rejects `unroll=` with traced i32
            # bounds, so the body processes _UNROLL chunks per iteration
            # (the caller pads the chunk count to a multiple) off one
            # shared bulk row load
            base_row = r * jnp.int32(n_chunks) + ch * jnp.int32(unroll)
            bulk = pk_ref[pl.ds(base_row, unroll), :]
            for u in range(unroll):
                one_chunk(r, bulk, u)
            return carry2

        jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_chunks // unroll), ch_body,
            jnp.int32(0),
        )
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(group), row_body, jnp.int32(0))


def _call_group(packed, n_chunks: int, w_pad: int, chunk: int, store: int,
                unroll: int, interpret: bool) -> jnp.ndarray:
    group = packed.shape[0] // n_chunks  # frames in this tile
    kern = partial(_deposit_kernel, n_chunks, group, chunk, store, unroll)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((group, w_pad), jnp.int32),
        interpret=interpret,
    )(packed)


def _shl_pair(h, lo, b):
    """(h, lo) u32 pair << b for b in [0, 31], returning the three limbs
    (carry-out, hi, lo) of the 96-bit result. Branchless: TPU has no
    native 64-bit lanes and XLA's emulated u64 VARIABLE shifts lower
    through per-column gathers (measured in the optimized HLO), so all
    wide shifts here are hand-rolled u32 limb math."""
    bu = b.astype(jnp.uint32)
    inv = jnp.clip(32 - b, 1, 31).astype(jnp.uint32)
    nz = b > 0
    z = jnp.uint32(0)
    spill = lambda x: jnp.where(nz, x >> inv, z)  # x >> (32-b), 0 at b==0
    return spill(h), (h << bu) | spill(lo), lo << bu


def _merge_pairs(d_cum, val, nbv):
    """Fuse adjacent deposit pairs: (val_a << width_b) | val_b deposited at
    pair-field end, nbv_a + width_b bits. Width-0 / masked partners are
    identities; pairs whose combined deposited span exceeds 64 bits cannot
    merge and raise ``cannot`` (the caller ORs it into the overflow flag).
    Returns (d_cum, (val_hi, val_lo) u32 pair, nbv, cannot) over ceil(S/2)
    columns."""
    n, s = val.shape
    if s % 2:
        d_cum = jnp.concatenate([d_cum, d_cum[:, -1:]], axis=1)
        val = jnp.concatenate([val, jnp.zeros((n, 1), val.dtype)], axis=1)
        nbv = jnp.concatenate([nbv, jnp.zeros((n, 1), nbv.dtype)], axis=1)
    # u64 -> u32 limbs first (constant-distance shift = a limb move); all
    # variable-distance math below stays in u32
    vh = (val >> jnp.uint64(32)).astype(jnp.uint32)
    vl = val.astype(jnp.uint32)
    ca, cb = d_cum[:, 0::2], d_cum[:, 1::2]
    ha, la = vh[:, 0::2], vl[:, 0::2]
    hb, lb = vh[:, 1::2], vl[:, 1::2]
    na, nb_ = nbv[:, 0::2], nbv[:, 1::2]
    width_b = cb - ca  # field b's TOTAL width (unary zeros included)
    a_live = na > 0
    tot = na + width_b
    cannot = jnp.any(a_live & (tot > 64))
    # (ha, la) << width_b over u32 limbs; width_b in [0, 63] when mergeable
    small = width_b < 32
    b_lo = jnp.clip(width_b, 0, 31)
    b_hi = jnp.clip(width_b - 32, 0, 31)
    _, sh_h, sh_l = _shl_pair(ha, la, b_lo)
    big_h = la << b_hi.astype(jnp.uint32)  # low limb crosses into hi
    sa_h = jnp.where(small, sh_h, big_h)
    sa_l = jnp.where(small, sh_l, jnp.uint32(0))
    # field b's value occupies the low width_b bits: disjoint from the
    # shifted field-a bits whenever the pair merges, so or == add
    hm = jnp.where(a_live, sa_h | hb, hb)
    lm = jnp.where(a_live, sa_l | lb, lb)
    nm = jnp.where(a_live, tot, nb_)
    return cb, (hm, lm), nm, cannot


def _merge_quads(d_cum, val, nbv):
    """Two merge rounds: pairs (<=64-bit, _merge_pairs) then adjacent PAIR
    deposits into <=96-bit quads — (val_a << width_b) | val_b over three
    u32 limbs, deposited at the quad-field end. The deposit stream shrinks
    to ceil(S/4) columns, and dword-granular binning needs only 3 slot
    compares per deposit (5 live word contributions — the 6th word is
    provably untouched), so stage-1 compare work drops ~37% vs pairs.
    Gate by content width: 4 symbols of ~(depth+2) bits must fit 96, so
    callers use quads for depth <= 16 only (pairs cover the rest).
    Returns (d_cum, (h, m, l) u32 limbs, nbv, cannot)."""
    d_cum, (ha_all, la_all), nbv, cannot1 = _merge_pairs(d_cum, val, nbv)
    n, s = d_cum.shape
    if s % 2:
        d_cum = jnp.concatenate([d_cum, d_cum[:, -1:]], axis=1)
        z = jnp.zeros((n, 1), jnp.uint32)
        ha_all = jnp.concatenate([ha_all, z], axis=1)
        la_all = jnp.concatenate([la_all, z], axis=1)
        nbv = jnp.concatenate([nbv, jnp.zeros((n, 1), nbv.dtype)], axis=1)
    ca, cb = d_cum[:, 0::2], d_cum[:, 1::2]
    ha, la = ha_all[:, 0::2], la_all[:, 0::2]
    hb, lb = ha_all[:, 1::2], la_all[:, 1::2]
    na, nb_ = nbv[:, 0::2], nbv[:, 1::2]
    width_b = cb - ca  # field b's TOTAL width (unary zeros included)
    a_live = na > 0
    tot = na + width_b
    cannot = cannot1 | jnp.any(a_live & (tot > 96))
    # (ha, la) << width_b over three limbs; width_b in [0, 95] if mergeable
    k = jnp.clip(width_b >> 5, 0, 2)
    b = width_b & 31
    c2, c1, c0 = _shl_pair(ha, la, b)
    z = jnp.uint32(0)
    k1 = k == 1
    k2 = k == 2
    # limb-rotate by k: value < 2^(96 - 32k) when merging, so nothing spills
    sh_h = jnp.where(k2, c0, jnp.where(k1, c1, c2))
    sh_m = jnp.where(k2, z, jnp.where(k1, c0, c1))
    sh_l = jnp.where(k2, z, jnp.where(k1, z, c0))
    # field b's value (<= 64 bits, right-aligned) is disjoint when merging
    hm = jnp.where(a_live, sh_h, z)
    mm = jnp.where(a_live, sh_m | hb, hb)
    lm = jnp.where(a_live, sh_l | lb, lb)
    nm = jnp.where(a_live, tot, nb_)
    return cb, (hm, mm, lm), nm, cannot


def _split3d(d_cum, val3, nbv):
    """Per-deposit first-DWORD index + five u32 word contributions: a
    <=96-bit value at in-dword bit offset r <= 63 ends by bit r + 96 <=
    159, so it spans at most THREE dwords but only FIVE words of the
    192-bit window (the 6th word starts at bit 160 — provably untouched).
    Left-justify over limbs: shift 192 - r - nbv in [33, 191].
    Returns (dw0, s0, s1, s2, s3, s4) with s_i the contribution to word
    2*dw0 + i (MSB-first stream order)."""
    h, m, l = val3
    d_start = d_cum - nbv
    dw0 = (d_start >> 6).astype(jnp.int32)
    r = (d_start & 63).astype(jnp.int32)
    sh = 192 - r - nbv
    k = sh >> 5  # in [1, 5]
    b = sh & 31
    # (h, m, l) << b over four limbs
    bu = b.astype(jnp.uint32)
    inv = jnp.clip(32 - b, 1, 31).astype(jnp.uint32)
    nz = b > 0
    z = jnp.uint32(0)
    spill = lambda x: jnp.where(nz, x >> inv, z)
    d3 = spill(h)
    d2 = (h << bu) | spill(m)
    d1 = (m << bu) | spill(l)
    d0 = l << bu
    # word 5-k gets limb 0 (low), upward: s_{5-k-j} = d_j
    def pick(*cases):
        # cases: list of (k value, limb) pairs; where-chain select
        out = z
        for kv, limb in cases:
            out = jnp.where(k == kv, limb, out)
        return out

    s0 = pick((5, d0), (4, d1), (3, d2), (2, d3))
    s1 = pick((4, d0), (3, d1), (2, d2), (1, d3))
    s2 = pick((3, d0), (2, d1), (1, d2))
    s3 = pick((2, d0), (1, d1))
    s4 = pick((1, d0))
    live = nbv > 0
    msk = lambda x: jnp.where(live, x, z)
    return dw0, msk(s0), msk(s1), msk(s2), msk(s3), msk(s4)


def _split2d(d_cum, val, nbv):
    """Per-deposit first-DWORD index + four u32 word contributions: a
    <=64-bit value at any bit offset spans at most TWO 64-bit dwords
    (words [2*dw0 .. 2*dw0+3]), so dword-granular binning needs only two
    slot compares per deposit where word-granular needs three, over half
    the slots. Left-justify the value in the 128-bit window starting at
    its first dword: shift 128 - r - nbv with r the in-dword bit offset.
    Returns (dw0, s0, s1, s2, s3) with s_i the contribution to word
    2*dw0 + i (MSB-first stream order)."""
    if isinstance(val, tuple):
        vh, vl = val
    else:
        vh = (val >> jnp.uint64(32)).astype(jnp.uint32)
        vl = val.astype(jnp.uint32)
    d_start = d_cum - nbv
    dw0 = (d_start >> 6).astype(jnp.int32)
    r = (d_start & 63).astype(jnp.int32)
    sh = 128 - r - nbv  # in [1, 127]; nbv == 0 rows are masked below
    # v << sh over limbs: sh = 32*k + b with k in {0..3}, b in [0, 31]
    k = sh >> 5
    b = sh & 31
    a2, a1, a0 = _shl_pair(vh, vl, b)
    z = jnp.uint32(0)
    k1 = k == 1
    k2 = k == 2
    k3 = k == 3
    # stream word i of the window = limb (3 - i) of (v << sh)
    s0 = jnp.where(k3, a0, jnp.where(k2, a1, jnp.where(k1, a2, z)))
    s1 = jnp.where(k3, z, jnp.where(k2, a0, jnp.where(k1, a1, a2)))
    s2 = jnp.where(k3, z, jnp.where(k2, z, jnp.where(k1, a0, a1)))
    s3 = jnp.where(k3, z, jnp.where(k2, z, jnp.where(k1, z, a0)))
    live = nbv > 0
    return (
        dw0,
        jnp.where(live, s0, z),
        jnp.where(live, s1, z),
        jnp.where(live, s2, z),
        jnp.where(live, s3, z),
    )


def _split3(d_cum, val, nbv):
    """Per-deposit word index + three u32 word contributions (a <=64-bit
    value at any bit offset spans at most 3 output words). Left-justify the
    value in the 96-bit window starting at its first word: shift
    96 - r - nbv with r the in-word bit offset. ``val`` is a (hi, lo) u32
    limb pair (from _merge_pairs) or a u64 array."""
    if isinstance(val, tuple):
        vh, vl = val
    else:
        vh = (val >> jnp.uint64(32)).astype(jnp.uint32)
        vl = val.astype(jnp.uint32)
    d_start = d_cum - nbv
    w0 = (d_start >> 5).astype(jnp.int32)
    r = (d_start & 31).astype(jnp.int32)
    sh = 96 - r - nbv  # in [1, 96]; nbv == 0 rows are masked below
    # v << sh over limbs: sh = 32*k + b with k in {0, 1, 2}, b in [0, 31];
    # first shift by b (96-bit limbs), then rotate whole limbs by k
    k = sh >> 5
    b = sh & 31
    a2, a1, a0 = _shl_pair(vh, vl, b)
    z = jnp.uint32(0)
    k1 = k == 1
    k2 = k == 2
    s0 = jnp.where(k2, a0, jnp.where(k1, a1, a2))
    s1 = jnp.where(k2, z, jnp.where(k1, a0, a1))
    s2 = jnp.where(k2, z, jnp.where(k1, z, a0))
    live = nbv > 0
    return (
        w0,
        jnp.where(live, s0, z),
        jnp.where(live, s1, z),
        jnp.where(live, s2, z),
    )


def _binned_core(
    w0: jnp.ndarray,
    s0: jnp.ndarray,
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    max_words: int,
    interpret: bool = False,
    chunk: int = None,
    window: int = None,
    unroll: int = None,
    group_rows: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bin sorted 3-word deposits into dense output words.

    ``w0``  i32 [N, S] word index of each deposit's first contribution,
            monotone non-decreasing along S (from the offset prefix sum);
    ``s0/s1/s2``  u32 [N, S] contributions to words w0 / w0+1 / w0+2.

    Returns (words u32 [N, max_words], overflow bool). ``overflow`` is True
    when some chunk's deposits span more than WINDOW-2 words — the result is
    then unusable and the caller must take the exact segment-sum path.
    """
    chunk = CHUNK if chunk is None else chunk
    window = WINDOW if window is None else max(128, -(-window // 128) * 128)
    store = window + 128
    unroll = _UNROLL if unroll is None else unroll
    group_rows = GROUP if group_rows is None else group_rows
    n, s = w0.shape
    # Elements beyond the word budget clamp into a slack region past
    # max_words (monotonicity is preserved); any frame that actually needed
    # them has frame_bytes > 4*max_words and trips the caller's capacity
    # check, so the slack garbage is never read.
    w0 = jnp.minimum(w0, max_words + 1)

    s0 = jax.lax.bitcast_convert_type(s0, jnp.int32)
    s1 = jax.lax.bitcast_convert_type(s1, jnp.int32)
    s2 = jax.lax.bitcast_convert_type(s2, jnp.int32)
    s_pad = _round_up(max(s, chunk * unroll), chunk * unroll)
    if s_pad != s:
        padn = s_pad - s
        w0 = jnp.concatenate(
            [w0, jnp.broadcast_to(w0[:, -1:], (n, padn))], axis=1
        )
        z = jnp.zeros((n, padn), jnp.int32)
        s0 = jnp.concatenate([s0, z], axis=1)
        s1 = jnp.concatenate([s1, z], axis=1)
        s2 = jnp.concatenate([s2, z], axis=1)
    n_chunks = s_pad // chunk

    bases = w0[:, ::chunk]  # [N, n_chunks]
    ends = w0[:, chunk - 1 :: chunk]
    # the window must cover remainder (<=127) + chunk span + the s2 spill
    overflow = jnp.any(ends - bases > window - 2)

    w_pad = _round_up(max_words + 3 + store, 128)
    group = min(group_rows, n)
    n_pad = _round_up(n, group)
    if n_pad != n:
        padr = n_pad - n
        w0 = jnp.concatenate([w0, jnp.zeros((padr, s_pad), jnp.int32)])
        s0 = jnp.concatenate([s0, jnp.zeros((padr, s_pad), jnp.int32)])
        s1 = jnp.concatenate([s1, jnp.zeros((padr, s_pad), jnp.int32)])
        s2 = jnp.concatenate([s2, jnp.zeros((padr, s_pad), jnp.int32)])

    # flatten chunks into the sublane axis for single-dynamic-index loads,
    # and interleave the four streams into one [rows, 4*CHUNK] array so
    # each chunk costs one slice of the unroll group's single bulk load
    w0 = w0.reshape(n_pad * n_chunks, chunk)
    s0 = s0.reshape(n_pad * n_chunks, chunk)
    s1 = s1.reshape(n_pad * n_chunks, chunk)
    s2 = s2.reshape(n_pad * n_chunks, chunk)
    packed = jnp.concatenate([w0, s0, s1, s2], axis=1)
    gc = group * n_chunks
    outs = []
    for g in range(n_pad // group):
        sl = slice(g * gc, (g + 1) * gc)
        outs.append(
            _call_group(packed[sl], n_chunks, w_pad, chunk, store, unroll,
                        interpret)
        )
    words = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    words = jax.lax.bitcast_convert_type(words, jnp.uint32)
    return words[:n, :max_words], overflow


def deposit_stream_binned(
    d_cum: jnp.ndarray,
    val: jnp.ndarray,
    nbv: jnp.ndarray,
    max_words: int,
    interpret: bool = False,
    merge: bool = None,
    **tunables,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Production binned deposit: pair-merge the (d_cum, val, nbv) symbol
    stream (halving the kernel's chunk count), split each merged deposit
    into its <=3 word contributions, and bin. ``val`` must be u64. The
    returned overflow flag ORs merge-impossibility with window out-span;
    either sends the caller to the exact path."""
    if MERGE if merge is None else merge:
        d_cum, val, nbv, cannot = _merge_pairs(d_cum, val, nbv)
    else:
        cannot = jnp.asarray(False)
    w0, s0, s1, s2 = _split3(d_cum, val, nbv)
    words, overflow = _binned_core(
        w0, s0, s1, s2, max_words, interpret=interpret, **tunables
    )
    return words, overflow | cannot


def deposit_words_binned(
    w0: jnp.ndarray,
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    max_words: int,
    interpret: bool = False,
    **tunables,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-word-contribution compatibility surface (unmerged streams whose
    deposits span at most words w0/w0+1): bin via the 3-stream kernel with
    an all-zero third word."""
    return _binned_core(
        w0, hi, lo, jnp.zeros_like(hi), max_words, interpret=interpret,
        **tunables
    )
