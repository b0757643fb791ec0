"""LPC (linear-prediction) subframes — the extension the reference stubs.

The reference lists LPC under "Progressing" and comments out its subframe
type (libFLAC/Encoder.zig:498-503, readme.md:24-27); BASELINE.json config 3
requires it: windowed autocorrelation + Levinson-Durbin + quantized
coefficients with error feedback + shifted integer prediction.

This module is used by BOTH the golden host path (via numpy-compatible jnp
code executed on CPU) and the device pipeline, so the two stay bit-identical
by construction: quantization runs in float64 (deterministic, platform
independent for these magnitudes) and the residual math in int64.

Encoding behavior (ours to define — there is no reference bitstream to
match): analyze at the configured max order, Tukey(0.5) window, precision
``config.lpc_precision`` bits, pick LPC over fixed/verbatim/constant by the
same header-less estimated-bits comparison the reference uses between
fixed and verbatim.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_LPC_ORDER = 32


@lru_cache(maxsize=32)
def tukey_window(n: int, alpha: float = 0.5) -> np.ndarray:
    """Tukey (tapered cosine) window, float64."""
    if n == 1:
        return np.ones(1)
    t = np.linspace(0.0, 1.0, n)
    w = np.ones(n)
    edge = alpha / 2.0
    lo = t < edge
    hi = t >= 1.0 - edge
    w[lo] = 0.5 * (1.0 + np.cos(np.pi * (2.0 * t[lo] / alpha - 1.0)))
    w[hi] = 0.5 * (1.0 + np.cos(np.pi * (2.0 * t[hi] / alpha - 2.0 / alpha + 1.0)))
    return w


def autocorrelation(planes: jnp.ndarray, order: int) -> jnp.ndarray:
    """Windowed autocorrelation lags 0..order, float64: [..., order+1]."""
    B = planes.shape[-1]
    w = jnp.asarray(tukey_window(B))
    x = planes.astype(jnp.float64) * w
    lags = []
    for k in range(order + 1):
        if k == 0:
            lags.append((x * x).sum(axis=-1))
        else:
            lags.append((x[..., k:] * x[..., :-k]).sum(axis=-1))
    return jnp.stack(lags, axis=-1)


def levinson_durbin(autoc: jnp.ndarray, order: int, capture=()):
    """LPC coefficients via Levinson-Durbin, float64.

    Returns (coeffs [..., order], pred_err [...], captured): ``coeffs[j]``
    multiplies s[i-1-j] in the predictor; ``captured`` maps each order in
    ``capture`` to its intermediate coefficient array (the recursion yields
    every lower order for free)."""
    batch = autoc.shape[:-1]
    eps = jnp.float64(1e-9)
    err = autoc[..., 0] + eps
    coeffs = jnp.zeros(batch + (order,), jnp.float64)
    captured = {}
    for i in range(order):
        acc = autoc[..., i + 1]
        for j in range(i):
            acc = acc - coeffs[..., j] * autoc[..., i - j]
        k = acc / err
        # update: new[i] = k; new[j] = old[j] - k * old[i-1-j]
        new = coeffs
        for j in range(i):
            new = new.at[..., j].set(coeffs[..., j] - k * coeffs[..., i - 1 - j])
        new = new.at[..., i].set(k)
        coeffs = new
        err = err * (1.0 - k * k)
        err = jnp.maximum(err, eps)
        if (i + 1) in capture:
            captured[i + 1] = coeffs[..., : i + 1]
    return coeffs, err, captured


class QuantizedLpc(NamedTuple):
    qcoeffs: jnp.ndarray  # i32 [..., order]
    shift: jnp.ndarray    # i32 [...], in [0, 15]
    ok: jnp.ndarray       # bool [...]: quantization usable


def quantize_coeffs(coeffs: jnp.ndarray, precision: int) -> QuantizedLpc:
    """Quantize float coefficients to ``precision`` signed bits with error
    feedback (the standard FLAC scheme): shift = precision-1 - ilog2(cmax)-1,
    clamped to [0, 15]; q_j = clamp(round(c_j * 2^shift + err))."""
    order = coeffs.shape[-1]
    cmax = jnp.abs(coeffs).max(axis=-1)
    cmax = jnp.maximum(cmax, jnp.float64(1e-9))
    log2_cmax = jnp.floor(jnp.log2(cmax)).astype(jnp.int32)
    shift = (precision - 1) - (log2_cmax + 1)
    shift = jnp.clip(shift, 0, 15)
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    scale = jnp.exp2(shift.astype(jnp.float64))
    err = jnp.zeros(coeffs.shape[:-1], jnp.float64)
    qs = []
    for j in range(order):
        target = coeffs[..., j] * scale + err
        q = jnp.clip(jnp.round(target), qmin, qmax)
        err = target - q
        qs.append(q.astype(jnp.int32))
    qcoeffs = jnp.stack(qs, axis=-1)
    ok = jnp.isfinite(cmax) & (cmax < jnp.float64(1 << 20))
    return QuantizedLpc(qcoeffs=qcoeffs, shift=shift, ok=ok)


def lpc_residuals(
    planes: jnp.ndarray, qcoeffs: jnp.ndarray, shift: jnp.ndarray, order: int
):
    """r[i] = s[i] - (sum_j q_j * s[i-1-j] >> shift) for i >= order, first
    ``order`` slots zeroed. Returns (residuals i32 [..., B], fits_i32 bool)."""
    B = planes.shape[-1]
    s = planes.astype(jnp.int64)
    pred = jnp.zeros_like(s)
    for j in range(order):
        sh = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(j + 1, 0)])[..., :B]
        pred = pred + qcoeffs[..., j : j + 1].astype(jnp.int64) * sh
    pred = pred >> shift[..., None].astype(jnp.int64)
    res = s - pred
    idx = jax.lax.broadcasted_iota(jnp.int32, planes.shape, planes.ndim - 1)
    res = jnp.where(idx < order, 0, res)
    i32max = jnp.int64((1 << 31) - 1)
    fits = ((res <= i32max) & (res >= -i32max - 1)).all(axis=-1)
    return res.astype(jnp.int32), fits


def analyze_lpc(planes: jnp.ndarray, order: int, precision: int):
    """Full LPC analysis at one order. Returns
    (residuals i32 [..., B], qcoeffs i32 [..., order], shift i32, ok bool)."""
    autoc = autocorrelation(planes, order)
    coeffs, _err, _ = levinson_durbin(autoc, order)
    q = quantize_coeffs(coeffs, precision)
    res, fits = lpc_residuals(planes, q.qcoeffs, q.shift, order)
    return res, q.qcoeffs, q.shift, q.ok & fits


def lpc_candidate_orders(lpc_order: int):
    """Static candidate orders for the order search: powers of two up to the
    configured max, plus the max itself — the Levinson recursion produces
    every lower order for free, so extra candidates only pay their
    quantization + residual + Rice-estimate cost."""
    cands = {lpc_order}
    o = 1
    while o < lpc_order:
        cands.add(o)
        o *= 2
    return tuple(sorted(cands))


def analyze_lpc_multi(planes: jnp.ndarray, lpc_order: int, precision: int):
    """LPC analysis at every candidate order (one autocorrelation + one
    Levinson recursion). Returns a list of
    (order, residuals i32 [..., B], qcoeffs, shift, ok) in candidate order."""
    orders = lpc_candidate_orders(lpc_order)
    autoc = autocorrelation(planes, lpc_order)
    _, _err, captured = levinson_durbin(autoc, lpc_order, capture=set(orders))
    out = []
    for o in orders:
        q = quantize_coeffs(captured[o], precision)
        res, fits = lpc_residuals(planes, q.qcoeffs, q.shift, o)
        out.append((o, res, q.qcoeffs, q.shift, q.ok & fits))
    return out
