"""Multi-chip scaling: frame-axis data parallelism over a device mesh.

The reference is single-threaded with no communication backend (SURVEY.md §2
checklist); the TPU-native equivalent is SPMD over a ``jax.sharding.Mesh``
with the frame batch sharded across chips. Frames are independent, so the
only cross-shard traffic is the STREAMINFO min/max frame-size reduction
(here: ``lax.pmin``/``lax.pmax`` over the mesh axis, riding ICI) and the
final gather of packed bytes (left sharded; the host assembles per shard).

``encode_step_sharded`` is the full per-step program — plane construction,
subframe/stereo decisions, Rice search, bit packing, CRC — run under
``shard_map`` so XLA sees one SPMD program per chip.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.config import EncoderConfig
from ..ops.bitpack import max_frame_words, pack_frames
from ..ops.crc16 import crc16_words
from ..ops.header import header_static
from ..ops.analyze import plan_frames

FRAME_AXIS = "frames"


def default_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (FRAME_AXIS,))


def _encode_shard(
    frames, frame_numbers, *, config, depth, hstatic, block_size, max_words
):
    """Per-shard encode (runs on each chip over its local frames)."""
    plan = plan_frames(frames, depth, config)
    words, total_bits, _ovf = pack_frames(
        plan, frame_numbers, hstatic, block_size, config.max_rice_order,
        max_words,
        lpc_order=config.lpc_order if config.prediction == "lpc" else 0,
        lpc_precision=config.lpc_precision,
    )
    byte_len = (total_bits + 7) >> 3
    crcs = crc16_words(words, byte_len)
    frame_bytes = byte_len + 2  # + CRC-16 footer
    # STREAMINFO frame-size bounds: the only cross-shard reduction
    local_min = frame_bytes.min()
    local_max = frame_bytes.max()
    gmin = jax.lax.pmin(local_min, FRAME_AXIS)
    gmax = jax.lax.pmax(local_max, FRAME_AXIS)
    return words, total_bits, crcs, gmin, gmax


@lru_cache(maxsize=16)
def _sharded_fn(config: EncoderConfig, depth: int, c: int, block_size: int,
                sample_rate: int, mesh_key):
    mesh = _MESHES[mesh_key]
    hstatic = header_static(block_size, sample_rate, depth)
    n_wire = 2 if config.stereo_auto else c
    max_words = max_frame_words(block_size, n_wire, depth)
    fn = partial(
        _encode_shard,
        config=config,
        depth=depth,
        hstatic=hstatic,
        block_size=block_size,
        max_words=max_words,
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(FRAME_AXIS), P(FRAME_AXIS)),
        out_specs=(P(FRAME_AXIS), P(FRAME_AXIS), P(FRAME_AXIS), P(), P()),
    )
    return jax.jit(mapped)


_MESHES = {}


def _encode_shard_compact(frames, frame_numbers, *lpc_args, config, depth,
                          hstatic, block_size, max_words, capb, deposit):
    """Per-shard production compact-stream encode: each chip packs and
    byte-compacts its local frames; the host assembles shard streams in
    frame order (frames are independent, so no collective is needed —
    STREAMINFO min/max comes from the fetched per-frame sizes). ``lpc_args``
    is () or the (qc, shift, ok) coefficient inputs, sharded on frames."""
    from ..models.pipeline import _encode_batch_compact

    stream, meta = _encode_batch_compact(
        frames, frame_numbers, *lpc_args, config=config, depth=depth,
        hstatic=hstatic, block_size=block_size, max_words=max_words,
        capb=capb, deposit=deposit,
    )
    return stream[None], meta[None]


@lru_cache(maxsize=32)
def _sharded_compact_fn(config: EncoderConfig, depth: int, c: int,
                        block_size: int, sample_rate: int, tier: int,
                        batch_local: int, deposit: str, n_lpc_args: int,
                        mesh_key):
    """The sharded twin of pipeline._compiled_encode_compact: one SPMD
    program over the mesh, each shard running the tier's compact program on
    ``batch_local`` frames. Returns (fn, per-frame word cap in bytes)."""
    from ..models.pipeline import CAPACITY_LADDER

    mesh = _MESHES[mesh_key]
    hstatic = header_static(block_size, sample_rate, depth)
    n_wire = 2 if config.stereo_auto else c
    stream_ratio, words_ratio = CAPACITY_LADDER[tier]
    max_words = max_frame_words(block_size, n_wire, depth, words_ratio)
    raw_bytes = batch_local * block_size * c * max(depth, 8) // 8
    capb = int(raw_bytes * stream_ratio) + 64 * batch_local
    fn = partial(
        _encode_shard_compact,
        config=config,
        depth=depth,
        hstatic=hstatic,
        block_size=block_size,
        max_words=max_words,
        capb=capb,
        deposit=deposit,
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(FRAME_AXIS),) * (2 + n_lpc_args),
        out_specs=(P(FRAME_AXIS), P(FRAME_AXIS)),
    )
    return jax.jit(mapped), max_words * 4


def encode_compact_sharded(
    frames: jnp.ndarray,
    frame_numbers: jnp.ndarray,
    config: EncoderConfig,
    depth: int,
    sample_rate: int,
    tier: int,
    deposit: str,
    mesh: Mesh,
    lpc_pre=(),
):
    """Production sharded encode: [N, C, B] frames (N divisible by mesh
    size) -> (stream u32 [ndev, capw_local], meta i64 [ndev, local+2]).
    Row s of each output is shard s's compact stream / metadata vector, in
    frame order — the host collects each row exactly like a single-device
    batch. ``lpc_pre`` is () or the (qc, shift, ok) host-derived coefficient
    arrays, frame-major (sharded like frames)."""
    mesh_key = tuple(d.id for d in mesh.devices.flat)
    _MESHES[mesh_key] = mesh
    n, c, B = frames.shape
    ndev = mesh.devices.size
    if n % ndev != 0:
        raise ValueError(f"frame count {n} not divisible by mesh size {ndev}")
    fn, frame_cap = _sharded_compact_fn(
        config, depth, c, B, sample_rate, tier, n // ndev, deposit,
        len(lpc_pre), mesh_key
    )
    stream, meta = fn(frames, frame_numbers, *lpc_pre)
    return stream, meta, frame_cap


def encode_step_sharded(
    frames: jnp.ndarray,
    frame_numbers: jnp.ndarray,
    config: EncoderConfig,
    depth: int,
    sample_rate: int,
    mesh: Mesh | None = None,
):
    """Run the full encode step SPMD over the mesh.

    ``frames``: [N, C, B] int32 with N divisible by the mesh size.
    Returns (words, total_bits, crcs, min_frame_bytes, max_frame_bytes).
    """
    mesh = mesh or default_mesh()
    mesh_key = tuple(d.id for d in mesh.devices.flat)
    _MESHES[mesh_key] = mesh
    n, c, B = frames.shape
    if n % mesh.devices.size != 0:
        raise ValueError(
            f"frame count {n} not divisible by mesh size {mesh.devices.size}"
        )
    fn = _sharded_fn(config, depth, c, B, sample_rate, mesh_key)
    return fn(frames, frame_numbers)
