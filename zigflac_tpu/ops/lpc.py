"""LPC (linear-prediction) subframes — the extension the reference stubs.

The reference lists LPC under "Progressing" and comments out its subframe
type (libFLAC/Encoder.zig:498-503, readme.md:24-27); BASELINE.json config 3
requires it: windowed autocorrelation + Levinson-Durbin + quantized
coefficients with error feedback + shifted integer prediction.

Determinism architecture (golden == device == any platform, by construction):

* The autocorrelation — the only heavy float reduction — is EXACT integer
  arithmetic: samples are windowed by a Q15 fixed-point Tukey(0.5) window
  and each lag sum is carried as three int64 limb partial sums (hi·hi,
  hi·lo+lo·hi, lo·lo over 24-bit limbs). Integer ops are bit-identical on
  every backend, so the device computes lag sums on TPU and the golden
  oracle computes the same integers in numpy.
* Everything float — combining limbs into f64 lags, Levinson-Durbin, and
  coefficient quantization — is ONE host numpy implementation shared by both
  paths (`coeffs_from_lags`). Each step is a fixed IEEE-754 expression over
  identical inputs, deterministic across hosts. TPU-emulated f64 (not
  correctly rounded) never touches coefficients.
* Residual computation from quantized coefficients is integer (jnp on
  device, numpy in golden — exact either way).

Encoding behavior (ours to define — there is no reference bitstream to
match): analyze at the candidate orders below, Q15 Tukey(0.5) window,
precision ``config.lpc_precision`` bits, pick LPC over fixed/verbatim/
constant by the same header-less estimated-bits comparison the reference
uses between fixed and verbatim.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_LPC_ORDER = 32

_LIMB = 24  # limb width: |windowed sample| <= 2^47 -> hi <= 2^23; products
#             <= 2^48, summed over <= 2^15 samples -> < 2^63 (no overflow)


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


@lru_cache(maxsize=32)
def tukey_q15(n: int) -> np.ndarray:
    """The window the format actually uses: Q15 fixed point, int64."""
    return np.round(tukey_window(n) * 32768.0).astype(np.int64)


def _normalize_limbs_jnp(hh, hl, ll):
    """Carry-propagate the limb triple so hl/ll land in [0, 2^24):
    hh2*2^48 + rhl*2^24 + rll == hh*2^48 + hl*2^24 + ll exactly (arithmetic
    shifts floor-divide two's-complement i64). After normalization the
    value's full magnitude lives in hh2, which fits int32 whenever
    2*ss - 8 <= 31 (ss = per-plane sample bits incl. the side +1) — the
    16-bit path ships lag blocks at half the d2h bytes, which is the LPC
    mode's sustained bottleneck on thin links (~40 ms of a ~47 ms batch
    measured on the axon relay)."""
    m24 = jnp.int64((1 << _LIMB) - 1)
    qll = ll >> _LIMB
    rll = ll & m24
    hl2 = hl + qll
    qhl = hl2 >> _LIMB
    rhl = hl2 & m24
    return hh + qhl, rhl, rll


def lag_sums(planes: jnp.ndarray, order: int, compact: bool = False) -> jnp.ndarray:
    """Exact integer windowed autocorrelation limb sums on device.

    ``planes`` int [..., B] -> [..., order+1, 3] where lag k's exact
    value is ``l0·2^48 + l1·2^24 + l2`` (a ~96-bit integer carried as
    three normalized partials). Bit-identical to ``lag_sums_np`` on any
    backend. ``compact=True`` returns int32 limbs (valid for sample sizes
    <= 19 bits — see _normalize_limbs_jnp); otherwise int64.
    """
    B = planes.shape[-1]
    wq = jnp.asarray(tukey_q15(B))
    x = planes.astype(jnp.int64) * wq
    hi = x >> _LIMB
    lo = x & ((1 << _LIMB) - 1)
    out = []
    for k in range(order + 1):
        ah = hi[..., k:] if k else hi
        al = lo[..., k:] if k else lo
        bh = hi[..., : B - k] if k else hi
        bl = lo[..., : B - k] if k else lo
        hh = (ah * bh).sum(axis=-1)
        hl = (ah * bl).sum(axis=-1) + (al * bh).sum(axis=-1)
        ll = (al * bl).sum(axis=-1)
        out.append(jnp.stack(_normalize_limbs_jnp(hh, hl, ll), axis=-1))
    res = jnp.stack(out, axis=-2)
    return res.astype(jnp.int32) if compact else res


def lag_sums_np(planes: np.ndarray, order: int) -> np.ndarray:
    """numpy mirror of ``lag_sums`` (golden path) — same exact integers,
    same limb normalization (so device and golden hand coeffs_from_lags
    byte-identical float inputs)."""
    B = planes.shape[-1]
    x = planes.astype(np.int64) * tukey_q15(B)
    hi = x >> _LIMB
    lo = x & ((1 << _LIMB) - 1)
    m24 = np.int64((1 << _LIMB) - 1)
    out = []
    for k in range(order + 1):
        ah, al = (hi[..., k:], lo[..., k:]) if k else (hi, lo)
        bh, bl = (hi[..., : B - k], lo[..., : B - k]) if k else (hi, lo)
        hh = (ah * bh).sum(axis=-1)
        hl = (ah * bl).sum(axis=-1) + (al * bh).sum(axis=-1)
        ll = (al * bl).sum(axis=-1)
        qll = ll >> _LIMB
        rll = ll & m24
        hl2 = hl + qll
        qhl = hl2 >> _LIMB
        rhl = hl2 & m24
        out.append(np.stack([hh + qhl, rhl, rll], axis=-1))
    return np.stack(out, axis=-2)


def coeffs_from_lags(
    lags: np.ndarray, orders: Tuple[int, ...], precision: int
) -> List[Tuple[int, np.ndarray, np.ndarray, np.ndarray]]:
    """Limb lag sums -> quantized coefficients, on host, deterministically.

    ``lags`` int64 [..., max_order+1, 3] -> list of
    ``(order, qcoeffs i32 [..., 32] zero-padded, shift i32 [...], ok bool)``
    per candidate order (one Levinson recursion captures all of them).
    """
    r = (
        lags[..., 0].astype(np.float64) * float(1 << (2 * _LIMB))
        + lags[..., 1].astype(np.float64) * float(1 << _LIMB)
        + lags[..., 2].astype(np.float64)
    )
    max_order = max(orders)
    batch = r.shape[:-1]
    eps = 1e-9
    err = r[..., 0] + eps
    coeffs = np.zeros(batch + (max_order,), np.float64)
    out = []
    for i in range(max_order):
        acc = r[..., i + 1].copy()
        for j in range(i):
            acc -= coeffs[..., j] * r[..., i - j]
        k = acc / err
        new = coeffs.copy()
        for j in range(i):
            new[..., j] = coeffs[..., j] - k * coeffs[..., i - 1 - j]
        new[..., i] = k
        coeffs = new
        err = err * (1.0 - k * k)
        err = np.maximum(err, eps)
        if (i + 1) in orders:
            qc, shift, ok = _quantize_np(coeffs[..., : i + 1], precision)
            qc32 = np.zeros(batch + (32,), np.int32)
            qc32[..., : i + 1] = qc
            out.append((i + 1, qc32, shift, ok))
    return out


def _quantize_np(coeffs: np.ndarray, precision: int):
    """Quantize float coefficients to ``precision`` signed bits with error
    feedback (the standard FLAC scheme): shift = precision-1 - ilog2(cmax)-1,
    clamped to [0, 15]; q_j = clamp(round(c_j * 2^shift + err))."""
    order = coeffs.shape[-1]
    cmax = np.maximum(np.abs(coeffs).max(axis=-1), 1e-9)
    with np.errstate(invalid="ignore"):
        log2_cmax = np.floor(np.log2(cmax))
    log2_cmax = np.where(np.isfinite(log2_cmax), log2_cmax, 30).astype(np.int32)
    shift = np.clip((precision - 1) - (log2_cmax + 1), 0, 15).astype(np.int32)
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    scale = np.exp2(shift.astype(np.float64))
    err = np.zeros(coeffs.shape[:-1], np.float64)
    qs = []
    with np.errstate(invalid="ignore"):
        for j in range(order):
            target = coeffs[..., j] * scale + err
            target = np.where(np.isfinite(target), target, 0.0)
            q = np.clip(np.round(target), qmin, qmax)
            err = target - q
            qs.append(q.astype(np.int32))
    qcoeffs = np.stack(qs, axis=-1)
    ok = np.isfinite(cmax) & (cmax < float(1 << 20))
    return qcoeffs, shift, ok


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


def lpc_residuals_np(
    planes: np.ndarray, qcoeffs: np.ndarray, shift: np.ndarray, order: int
):
    """numpy mirror of ``lpc_residuals`` (golden path) — exact integers."""
    B = planes.shape[-1]
    s = planes.astype(np.int64)
    pred = np.zeros_like(s)
    for j in range(order):
        sh = np.zeros_like(s)
        sh[..., j + 1 :] = s[..., : B - j - 1]
        pred += qcoeffs[..., j : j + 1].astype(np.int64) * sh
    pred >>= shift[..., None].astype(np.int64)
    res = s - pred
    res[..., :order] = 0
    i32max = (1 << 31) - 1
    fits = ((res <= i32max) & (res >= -i32max - 1)).all(axis=-1)
    return res.astype(np.int32), fits


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


def analyze_lpc_multi_np(planes: np.ndarray, lpc_order: int, precision: int):
    """Full host LPC analysis (golden path): numpy lag sums + the shared
    host coefficient derivation + numpy residuals. Returns a list of
    (order, residuals i32 [..., B], qcoeffs i32 [..., 32], shift, ok)."""
    orders = lpc_candidate_orders(lpc_order)
    lags = lag_sums_np(planes, lpc_order)
    out = []
    for o, qc, shift, ok in coeffs_from_lags(lags, orders, precision):
        res, fits = lpc_residuals_np(planes, qc, shift, o)
        out.append((o, res, qc, shift, ok & fits))
    return out
