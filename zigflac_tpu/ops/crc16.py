"""Parallel CRC-16/UMTS over packed frame words — the TPU replacement for
the reference's serial PCLMULQDQ folding (libFLAC/Crc16.zig).

CRC is GF(2)-linear: CRC(M) = sum_i b_i(x) * x^(8*(L-1-i)+16) mod G. Over
the *fixed-width* padded word buffer every byte position has a static
distance-from-end, so the per-byte multiplier is a compile-time constant
vector — no gathers in the hot path. The CRC of the real (shorter) frame
follows by multiplying with x^(-8*pad) mod G (x is invertible mod G since G
has a constant term), one 16x16 GF(2) multiply per frame.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..crc import CRC16_POLY, reduce24_table, xpow_neg8_table, xpow_shift_table


@lru_cache(maxsize=16)
def _static_tables(max_bytes: int):
    t1 = xpow_shift_table(max_bytes)      # x^(8e+16) mod G for e = dist-from-end
    inv = xpow_neg8_table(max_bytes)      # x^(-8k) mod G
    r24 = reduce24_table()                # top-8-bit reduction
    return t1, inv, r24


def _tree_xor(x: jnp.ndarray) -> jnp.ndarray:
    """XOR-reduce the last axis with a halving tree of elementwise xors."""
    n = x.shape[-1]
    while n > 1:
        if n % 2:
            x = jnp.concatenate([x, jnp.zeros_like(x[..., :1])], -1)
            n += 1
        half = n // 2
        x = x[..., :half] ^ x[..., half:]
        n = half
    return x[..., 0]


def _gf2_mulmod16_vec(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Vectorized (a * b) mod G over GF(2) for 16-bit operands (u32 in/out)."""
    acc = jnp.zeros_like(a)
    for i in range(16):
        acc = acc ^ jnp.where((b >> i) & 1 == 1, a << i, 0)
    for i in range(30, 15, -1):
        acc = jnp.where((acc >> i) & 1 == 1, acc ^ (CRC16_POLY << (i - 16)), acc)
    return acc


def crc16_words(words: jnp.ndarray, byte_len: jnp.ndarray) -> jnp.ndarray:
    """CRC-16/UMTS of the first ``byte_len`` bytes of each frame.

    ``words``: u32 [N, W], MSB-first bitstream (byte j = bits 8j..8j+8 of the
    stream); bytes at and beyond ``byte_len`` must be zero.
    Returns u32 [N] CRCs.
    """
    n, w = words.shape
    max_bytes = w * 4
    t1_np, inv_np, r24_np = _static_tables(max_bytes)

    # contribution of each WORD via its two 16-bit halves — no [N, 4W]
    # byte expansion (4x the traffic of the word buffer; measured ~1.2 ms
    # per 1024-frame batch): clmul16x16 products stay < 2^31, so the
    # whole sweep runs on the [N, W] u32 tensor directly. The half at
    # half-index h multiplies by x^(16*(2W-1-h)+16) = byte-table[2h+1].
    tpos = t1_np[::-1].astype(np.uint32)  # [maxB], byte-position-indexed
    t_hi = jnp.asarray(tpos[1::4])  # [W] multiplier of word j's high half
    t_lo = jnp.asarray(tpos[3::4])  # [W] multiplier of word j's low half
    hi = words >> jnp.uint32(16)
    lo = words & jnp.uint32(0xFFFF)
    p = jnp.zeros((n, w), jnp.uint32)
    z = jnp.uint32(0)
    for i in range(16):
        bit = jnp.uint32(1 << i)
        sh = jnp.uint32(i)
        p = (
            p
            ^ jnp.where(hi & bit != 0, t_hi << sh, z)
            ^ jnp.where(lo & bit != 0, t_lo << sh, z)
        )
    # xor-reduce the UNREDUCED 31-bit products via halving tree (custom
    # lax.reduce computations can serialize on TPU; log2(maxB) elementwise
    # xors stay on the VPU). XOR never carries, so the tree result stays
    # < 2^31, and mod-G is GF(2)-linear: reducing once per FRAME after the
    # tree equals reducing every element first — which moved the 15-select
    # reduction loop off the [N, W] hot sweep (~0.07 ms/batch, r5).
    crc31 = _tree_xor(p)
    # reduce the 31-bit value mod G bitwise (a table gather lowers as
    # per-element gathers on TPU; 15 selects on [N] are free)
    for i in range(30, 15, -1):
        crc31 = jnp.where(
            (crc31 >> i) & 1 == 1,
            crc31 ^ jnp.uint32(CRC16_POLY << (i - 16)),
            crc31,
        )
    crc_full = crc31 & jnp.uint32(0xFFFF)

    # cancel the zero padding: multiply by x^(-8 * (maxB - L)) mod G
    pad = (max_bytes - byte_len).astype(jnp.int64)
    inv = jnp.asarray(inv_np.astype(np.uint32))[pad]
    return _gf2_mulmod16_vec(crc_full, inv)
