"""Fuzz smoke tier: 30 seeded cases spanning the 10 tools/fuzz_long.py
buckets (depth x block x config corners), each asserting device == golden
byte identity AND a full decode + MD5 verify — the in-suite slice of the
350-case manual battery that caught the round-3 native shift-by-64 bug.

Shapes are DETERMINISTIC (fixed frame count + ragged tail per bucket), so
each bucket compiles exactly two device shapes (batch + tail) once,
persisted in .jax_cache across runs; the content (seeded per case) is
where the coverage goes. Run the full battery manually for depth:

    JAX_PLATFORMS=cpu python tools/fuzz_long.py 350
"""

import io
import sys

import numpy as np
import pytest

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from test_fuzz_property import _random_signal  # noqa: E402

from zigflac_tpu.decoder import verify_flac
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.utils.config import EncoderConfig
from zigflac_tpu.wav import write_wav

# the tools/fuzz_long.py buckets, verbatim (one compile pair each)
BUCKETS = [
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
CASES_PER_BUCKET = 3


@pytest.mark.parametrize(
    "depth,block,over",
    BUCKETS,
    ids=[
        f"d{d}b{b}" + ("".join(f"-{k}" for k in o) if o else "")
        for d, b, o in BUCKETS
    ],
)
def test_fuzz_smoke_bucket(depth, block, over):
    cfg = EncoderConfig(channels="stereo_auto", block_size=block, **over)
    # 2 full frames + a ragged device tail (>= 64 samples, fixed size so
    # the tail shape compiles once per bucket)
    n = 2 * block + max(64, block // 3)
    for case in range(CASES_PER_BUCKET):
        rng = np.random.default_rng(0xF1AC ^ (depth << 16) ^ block ^ case)
        x = _random_signal(rng, n, 2, depth)
        buf = io.BytesIO()
        write_wav(buf, x, 44100, depth)
        wav = buf.getvalue()
        d = encode_wav_bytes(wav, config=cfg, backend="device")
        g = encode_wav_bytes(wav, config=cfg, backend="golden")
        assert d == g, (
            f"device != golden: depth={depth} block={block} over={over} "
            f"case={case} (len d={len(d)} g={len(g)})"
        )
        assert verify_flac(d), (
            f"verify failed: depth={depth} block={block} over={over} "
            f"case={case}"
        )
