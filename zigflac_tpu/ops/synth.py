"""Device batch synthesis — the decoder's compute stage.

The native host parser (zf_native.parse_frames) normalizes every subframe
type to one predictor form: ``values`` (warmup samples then residuals, or
literal samples for constant/verbatim), integer ``qcoeffs`` (q[j] multiplies
s[i-1-j]; binomial coefficients for fixed orders, quantized LPC coefficients
otherwise), ``shift``, ``order``, ``wasted``. Synthesis is then ONE program
for the whole batch: a lax.scan over sample positions with every subframe
vectorized in the batch axis — the decoding dual of the encoder's
frames-as-batch design. The recurrence is s[i] = r[i] + (Σ q_j·s[i-1-j] >>
shift) in int64 (the per-step arithmetic shift is nonlinear, so this is a
true sequential scan, not a prefix sum — but all M subframes advance in
lockstep on the VPU).

Stereo recombination (the inverse of ops/analyze stereo decorrelation,
golden.py:301-310) is a branch-free where-chain on the frame channel codes.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _compiled_synth(B: int):
    @jax.jit
    def synth(values, qcoeffs, shift, order, wasted):
        # values i64 [M, B]; qcoeffs i64 [M, 32]; shift/order/wasted i64 [M]
        M = values.shape[0]

        def step(state, inp):
            i, v = inp  # i scalar i64, v [M] i64
            pred = (state * qcoeffs).sum(axis=-1) >> shift
            out = jnp.where(i < order, v, v + pred)
            state = jnp.concatenate([out[:, None], state[:, :-1]], axis=1)
            return state, out

        init = jnp.zeros((M, 32), jnp.int64)
        _, outs = jax.lax.scan(
            step, init, (jnp.arange(B, dtype=jnp.int64), values.T)
        )
        return outs.T << wasted[:, None]

    return synth


def synthesize_batch(
    values: np.ndarray,
    qcoeffs: np.ndarray,
    shift: np.ndarray,
    order: np.ndarray,
    wasted: np.ndarray,
) -> jnp.ndarray:
    """[M, B] normalized subframes -> [M, B] int64 decoded wire samples."""
    B = values.shape[1]
    f = _compiled_synth(B)
    return f(
        jnp.asarray(values, jnp.int64),
        jnp.asarray(qcoeffs, jnp.int64),
        jnp.asarray(shift, jnp.int64),
        jnp.asarray(order, jnp.int64),
        jnp.asarray(wasted, jnp.int64),
    )


@lru_cache(maxsize=32)
def _compiled_recombine():
    @jax.jit
    def rec(wire, ch_code):
        # wire i64 [F, 2, B]; ch_code i64 [F]
        a, b = wire[:, 0], wire[:, 1]
        cc = ch_code[:, None]
        # 8 left-side: (left, side) -> (left, left - side)
        # 9 side-right: (side, right) -> (side + right, right)
        # 10 mid-side: (mid, side); left = mid + ((side + (side&1)) >> 1)
        left = jnp.where(
            cc == 8, a,
            jnp.where(cc == 9, a + b,
                      jnp.where(cc == 10, a + ((b + (b & 1)) >> 1), a)),
        )
        right = jnp.where(
            cc == 8, a - b,
            jnp.where(cc == 9, b,
                      jnp.where(cc == 10, left - b, b)),
        )
        return jnp.stack([left, right], axis=1)

    return rec


def recombine_stereo(wire: jnp.ndarray, ch_code: np.ndarray) -> jnp.ndarray:
    """Invert stereo decorrelation for a [F, 2, B] wire-sample batch."""
    return _compiled_recombine()(
        jnp.asarray(wire, jnp.int64), jnp.asarray(ch_code, jnp.int64)
    )
