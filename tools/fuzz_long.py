"""Long-running device==golden fuzz (not collected by pytest): extends
tests/test_fuzz_property.py with many more seeds, depths, block sizes,
and config corners, reusing one compiled shape per (depth, block, config)
bucket so the time goes into content coverage, not compiles.

Usage:  JAX_PLATFORMS=cpu python tools/fuzz_long.py [n_cases] [seed]

Prints one line per bucket; exits non-zero on the first mismatch with a
reproducible (seed, case) tag.
"""

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.decoder import verify_flac
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import write_wav

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
from test_fuzz_property import _random_signal  # noqa: E402


def run(n_cases: int, seed: int) -> int:
    rng = np.random.default_rng(seed)
    # (depth, block, config-overrides) buckets: one compile each, many
    # contents. Covers both sweep precisions, speculation, escapes, LPC,
    # wasted bits, 5-bit params, and small partitions.
    buckets = [
        (16, 4096, {}),
        (16, 1024, {"max_rice_param": 14}),
        (24, 2048, {}),
        (8, 512, {}),
        (20, 1024, {"wasted_bits": True}),
        (16, 2048, {"prediction": "lpc", "lpc_order": 6}),
        (24, 1024, {"prediction": "lpc", "lpc_order": 4}),
        (32, 1024, {}),
        (16, 256, {"max_rice_order": 4}),
        (12, 1024, {}),
    ]
    per_bucket = max(1, n_cases // len(buckets))
    total = 0
    for depth, block, over in buckets:
        cfg = EncoderConfig(
            channels="stereo_auto", block_size=block, **over
        )
        nf = int(rng.integers(2, 6))
        n = nf * block + int(rng.integers(0, block))  # ragged tails too
        for case in range(per_bucket):
            x = _random_signal(rng, n, 2, depth)
            buf = io.BytesIO()
            write_wav(buf, x, 44100, depth)
            wav = buf.getvalue()
            d = encode_wav_bytes(wav, config=cfg, backend="device")
            g = encode_wav_bytes(wav, config=cfg, backend="golden")
            if d != g:
                print(
                    f"MISMATCH depth={depth} block={block} over={over} "
                    f"case={case} seed={seed} (len d={len(d)} g={len(g)})"
                )
                return 1
            if not verify_flac(d):
                print(
                    f"VERIFY FAIL depth={depth} block={block} over={over} "
                    f"case={case} seed={seed}"
                )
                return 1
            total += 1
        print(
            f"bucket depth={depth} block={block} over={over}: "
            f"{per_bucket} cases ok",
            flush=True,
        )
    print(f"ALL OK: {total} cases, seed {seed}")
    return 0


if __name__ == "__main__":
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0xF1AC
    sys.exit(run(n_cases, seed))
