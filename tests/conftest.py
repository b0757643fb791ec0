"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
and the full device pipeline are exercised without TPU hardware."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel with remote compiles) and a sitecustomize imports jax at interpreter
# startup, so the env var alone is too late — override via jax.config before
# any backend is touched.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compilation cache: the suite is compile-bound (measured:
# test_lpc.py 140s cold -> 35s warm), so repeat runs reuse compiled CPU
# executables. zigflac_tpu/__init__.py wires the cache when this env var is
# set; it stays off by default in production (the axon TPU backend cannot
# serialize executables).
os.environ.setdefault(
    "ZIGFLAC_TPU_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)

import jax

jax.config.update("jax_platforms", "cpu")

# Build the C++ host runtime in place when absent (fresh clones ship no
# .so): without it the native decoder/MD5/CRC tests silently skip — 23
# tests in a fresh checkout. Failure to build is non-fatal (those tests
# keep skipping, as before).
import glob as _glob
import pathlib as _pathlib
import subprocess as _subprocess
import sys as _sys

_root = _pathlib.Path(__file__).resolve().parent.parent
if not _glob.glob(str(_root / "_zf_native*.so")):
    _subprocess.run(
        [_sys.executable, str(_root / "native" / "setup.py"), "build_ext",
         "--inplace"],
        cwd=str(_root), check=False, capture_output=True,
    )

import numpy as np
import pytest

# Memoize the golden oracle's per-frame encode across the whole session:
# the scalar host encode (~40 ms/frame on this 1-core host) is the suite's
# remaining tail, and parity tests re-encode identical (content, config)
# frames across test files. encode_frame is pure (samples + frame number +
# streaminfo + config -> bytes), so memoization is exact; every call site
# resolves it via module attribute access.
import zigflac_tpu.golden as _golden

_golden_encode_frame = _golden.encode_frame
_golden_memo = {}


def _memo_encode_frame(samples, frame_number, info, config):
    key = (
        tuple((s.tobytes(), s.dtype.str) for s in samples),
        frame_number,
        info.sample_rate,
        info.bit_depth,
        info.channels,
        config,
    )
    got = _golden_memo.get(key)
    if got is None:
        got = _golden_memo[key] = _golden_encode_frame(
            samples, frame_number, info, config
        )
    return got


_golden.encode_frame = _memo_encode_frame


@pytest.fixture(autouse=True, scope="module")
def _clear_compiled_programs():
    """Drop every live compiled XLA executable between test MODULES.

    Measured on the 1-core CI host: once a few GB of compiled programs +
    their constants accumulate (the suite builds hundreds of shapes), every
    later test runs 3-8x slower with ~60% kernel time — a fuzz case that
    takes 12-16 s in a fresh process took 49-121 s late in the suite.
    Clearing jax's executable caches and the package's compiled-program
    lru_caches at module teardown restores fresh-process speed; recompiles
    in later modules reload from the persistent .jax_cache disk cache
    instead of compiling."""
    yield
    import gc

    from zigflac_tpu.models import pipeline
    from zigflac_tpu.ops import synth
    from zigflac_tpu.parallel import mesh

    pipeline._compiled_encode_batch.cache_clear()
    pipeline._compiled_encode_compact.cache_clear()
    mesh._sharded_compact_fn.cache_clear()
    synth._compiled_synth.cache_clear()
    synth._compiled_recombine.cache_clear()
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xF1AC)


def make_signal(rng, n, channels=2, depth=16, kind="mixed"):
    """Synthetic PCM covering the encoder's decision space."""
    lo = -(1 << (depth - 1))
    hi = (1 << (depth - 1)) - 1
    t = np.arange(n)
    if kind == "silence":
        x = np.zeros((channels, n))
    elif kind == "constant":
        x = np.full((channels, n), 1234 % hi)
    elif kind == "sine":
        x = 0.4 * hi * np.sin(2 * np.pi * 440 * t / 44100)
        x = np.stack([x * (1 - 0.1 * c) for c in range(channels)])
    elif kind == "noise":
        x = rng.uniform(lo, hi, size=(channels, n))
    elif kind == "ramp":
        x = np.stack([(t * (c + 3)) % (hi // 2) for c in range(channels)])
    elif kind == "quiet_noise":
        x = rng.normal(0, max(hi >> 10, 2), size=(channels, n))
    elif kind == "mixed":
        base = 0.3 * hi * np.sin(2 * np.pi * 220 * t / 44100)
        noise = rng.normal(0, max(hi >> 8, 2), size=(channels, n))
        x = np.stack([base + noise[c] for c in range(channels)])
    elif kind == "alternating":
        x = np.stack([((-1) ** t) * (hi >> 2) for _ in range(channels)])
    elif kind == "extreme":
        x = rng.choice([lo, hi, 0, -1, 1], size=(channels, n))
    else:
        raise ValueError(kind)
    return np.clip(np.round(x), lo, hi).astype(np.int32)
