"""DevicePipeline — the batched TPU encode path.

frames [N, C, B] int32  ──(device)──>  packed words + byte lengths + CRCs
                                        │
                             (host) slice + concat into the FLAC stream

One jitted program per (batch_size, block_size) covers: plane construction,
stereo-mode + subframe selection, Rice parameter search, bit packing, and
CRC-16 — everything between the WAV feeder and the output byte stream
(replaces libFLAC/{samples,fixed,rice}.zig + FrameWriter.zig + Crc16.zig).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..metadata import StreamInfo
from ..utils.config import EncoderConfig
from ..ops.analyze import plan_frames
from ..ops.bitpack import max_frame_words, pack_frames
from ..ops.crc16 import crc16_words
from ..ops.header import HeaderStatic, header_static

DEFAULT_BATCH = 1024


class DevicePipeline:
    """Holds the jit cache + static config for one (config, bit_depth)."""

    def __init__(
        self,
        config: EncoderConfig,
        bit_depth: int,
        batch_size: int = DEFAULT_BATCH,
    ) -> None:
        self.config = config
        self.bit_depth = bit_depth
        self.batch_size = batch_size
        self._jit_cache = {}

    # -- the jitted program -------------------------------------------------

    def _encode_batch_fn(self, n: int, c: int, block_size: int, sample_rate: int):
        return _compiled_encode_batch(
            self.config, self.bit_depth, c, block_size, sample_rate
        )

    # -- public API ---------------------------------------------------------

    def encode_frames(
        self, frames: np.ndarray, first_frame_number: int, info: StreamInfo
    ) -> List[bytes]:
        """[F, C, B] int32 full frames -> list of frame byte strings."""
        f, c, B = frames.shape
        out: List[bytes] = []
        bs = self.batch_size
        for start in range(0, f, bs):
            chunk = frames[start : start + bs]
            nreal = chunk.shape[0]
            # bucket to power-of-two batch shapes so the number of compiled
            # programs stays O(log batch_size) regardless of file length
            bucket = min(bs, _next_pow2(nreal))
            if nreal < bucket:
                pad = np.repeat(chunk[-1:], bucket - nreal, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            n = chunk.shape[0]
            fn = self._encode_batch_fn(n, c, B, info.sample_rate)
            fns = np.arange(start, start + n, dtype=np.int64) + first_frame_number
            words, total_bits, crcs = fn(jnp.asarray(chunk), jnp.asarray(fns))
            out.extend(
                _assemble_frames(
                    np.asarray(words),
                    np.asarray(total_bits),
                    np.asarray(crcs),
                    nreal,
                )
            )
        return out


from functools import lru_cache


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length() if n > 1 else 1


@lru_cache(maxsize=64)
def _compiled_encode_batch(
    config: EncoderConfig, depth: int, c: int, block_size: int, sample_rate: int
):
    """Process-wide jit cache: one compiled program per static signature
    (batch size specializes at first call via jit's own shape cache)."""
    hstatic = header_static(block_size, sample_rate, depth)
    n_wire = 2 if config.stereo_auto else c
    max_words = max_frame_words(block_size, n_wire, depth)
    return jax.jit(
        partial(
            _encode_batch,
            config=config,
            depth=depth,
            hstatic=hstatic,
            block_size=block_size,
            max_words=max_words,
        )
    )


def _encode_batch(
    frames: jnp.ndarray,
    frame_numbers: jnp.ndarray,
    *,
    config: EncoderConfig,
    depth: int,
    hstatic: HeaderStatic,
    block_size: int,
    max_words: int,
):
    plan = plan_frames(frames, depth, config)
    words, total_bits = pack_frames(
        plan, frame_numbers, hstatic, block_size, config.max_rice_order,
        max_words,
        lpc_order=config.lpc_order if config.prediction == "lpc" else 0,
        lpc_precision=config.lpc_precision,
    )
    byte_len = (total_bits + 7) >> 3
    crcs = crc16_words(words, byte_len)
    return words, total_bits, crcs


def _assemble_frames(
    words: np.ndarray, total_bits: np.ndarray, crcs: np.ndarray, nreal: int
) -> List[bytes]:
    """Slice each frame's bytes out of its padded words and append the CRC."""
    byte_len = (total_bits + 7) // 8
    cap = words.shape[1] * 4
    if (byte_len > cap).any():
        raise RuntimeError(
            "frame exceeded packer capacity — pathological input; "
            "use the golden backend for this stream"
        )
    raw = words.astype(">u4").tobytes()
    stride = cap
    out = []
    for i in range(nreal):
        L = int(byte_len[i])
        base = i * stride
        out.append(raw[base : base + L] + int(crcs[i]).to_bytes(2, "big"))
    return out
