"""Sustained device-only wall for fixed + LPC at the current head.

One process, both modes back-to-back (CLAUDE.md: cross-session numbers
are not baselines). N executions amortized against one closing fetch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from dataclasses import replace as _replace

from zigflac_tpu.models.pipeline import _compiled_encode_compact
from zigflac_tpu.utils.config import EncoderConfig

BLOCK, N_FRAMES = 4096, 1024
rate = 44100
rng = np.random.default_rng(0xBEEF)
t = np.arange(N_FRAMES * BLOCK)
base = 9000 * np.sin(2 * np.pi * 440 * t / rate) + 3000 * np.sin(
    2 * np.pi * 97 * t / rate
)
L = np.clip(np.round(base + rng.normal(0, 120, t.size)), -32768, 32767)
R = np.clip(np.round(0.8 * base + rng.normal(0, 120, t.size)), -32768, 32767)
fr = np.stack([L.reshape(N_FRAMES, BLOCK), R.reshape(N_FRAMES, BLOCK)], 1)
batch = jnp.asarray(fr.astype(np.int16))
fns = jnp.arange(N_FRAMES, dtype=jnp.int64)

audio_s = N_FRAMES * BLOCK / rate


def wall(fn, N=10, rounds=3):
    out = fn(batch, fns)
    jax.block_until_ready(out)
    np.asarray(out[1])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(batch, fns)
        np.asarray(out[1])
        best = min(best, (time.perf_counter() - t0) / N)
    return best


modes = sys.argv[1:] or ["fixed", "lpc"]
for mode in modes:
    cfg = EncoderConfig.default(2)
    if mode == "lpc":
        cfg = _replace(cfg, prediction="lpc")
    print(f"[{mode}] compiling...", flush=True)
    t0 = time.perf_counter()
    fn, _cap = _compiled_encode_compact(cfg, 16, 2, BLOCK, rate, 0, N_FRAMES)
    ms = wall(fn) * 1e3
    print(
        f"[{mode}] wall {ms:.2f} ms/batch  = {audio_s / (ms / 1e3):.0f}x RT"
        f"  (compile+measure {time.perf_counter() - t0:.0f}s)",
        flush=True,
    )
