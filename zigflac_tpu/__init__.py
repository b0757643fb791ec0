"""zigflac_tpu — a TPU-native FLAC encoding framework.

A from-scratch re-design of the capabilities of the ``toastori/zig-flac``
reference encoder (wav2flac CLI + libFLAC module) for TPU hardware:

* Frames are the batch axis: all per-frame hot loops — stereo-mode selection,
  fixed-predictor order search, residual computation, Rice parameter sweep —
  run as batched JAX/XLA integer tensor ops over an HBM-resident
  ``[n_frames, block_size]`` sample tensor (reference hot loops:
  libFLAC/fixed.zig:88-168, libFLAC/rice.zig:237-375,
  libFLAC/Encoder.zig:233-376).
* Bitstream assembly is parallelized: per-symbol bit lengths -> prefix-sum bit
  offsets -> segment-sum bit deposits into packed words on device (reference
  serial bit packer: libFLAC/FrameWriter.zig:36-114).
* CRC-16 runs as an on-device GF(2)-linear reduction (reference serial/clmul
  path: libFLAC/Crc16.zig).
* The serial WAV parse stays on host as a thin feeder
  (reference: src/WavReader.zig).

Public API mirrors the reference's ``libFLAC`` module surface:
``Encoder``, ``EncoderConfig``, ``StreamInfo``, plus the ``wav2flac``
CLI (``python -m zigflac_tpu.cli``).
"""

import os as _os

import jax as _jax

# The 32-bit-depth side channel is 33-bit signed (libFLAC/Encoder.zig:50,95-100)
# and the Rice cost sweep uses u64 wrapping arithmetic (libFLAC/rice.zig:344-375);
# both need x64 mode. Hot kernels stay in 32-bit dtypes explicitly.
_jax.config.update("jax_enable_x64", True)

# Optional persistent compilation cache (opt-in): the axon TPU backend does
# not support executable serialization, and the CPU AOT loader can emit
# feature-mismatch warnings, so this is off unless explicitly requested.
_cache_dir = _os.environ.get("ZIGFLAC_TPU_CACHE")
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization only
        pass

from .metadata import StreamInfo, BlockType  # noqa: E402
from .utils.config import EncoderConfig  # noqa: E402
from .wav import WavReader, WavStreamReader, WavFormatError  # noqa: E402
from .models.encoder import (  # noqa: E402
    Encoder,
    encode_wav_bytes,
    encode_wav_bytes_many,
    encode_file,
    encode_file_streaming,
    encode_to_file,
)
from .decoder import (  # noqa: E402
    decode_file,
    decode_flac,
    decode_range,
    verify_flac,
)

__version__ = "0.1.0"

__all__ = [
    "StreamInfo",
    "BlockType",
    "EncoderConfig",
    "WavReader",
    "WavStreamReader",
    "WavFormatError",
    "Encoder",
    "encode_wav_bytes",
    "encode_wav_bytes_many",
    "encode_file",
    "encode_file_streaming",
    "encode_to_file",
    "decode_file",
    "decode_flac",
    "decode_range",
    "verify_flac",
    "__version__",
]
