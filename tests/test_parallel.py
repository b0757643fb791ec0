"""Multi-chip sharding: the encode step under shard_map on the virtual
8-device CPU mesh must execute and produce frames byte-identical to the
single-device pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zigflac_tpu.metadata import StreamInfo
from zigflac_tpu.models.pipeline import DevicePipeline
from zigflac_tpu.native import assemble_frames
from zigflac_tpu.parallel.mesh import default_mesh, encode_step_sharded
from zigflac_tpu.utils.config import EncoderConfig

from conftest import make_signal


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    return default_mesh(jax.devices())


def test_sharded_matches_single(rng, mesh):
    B = 256
    ndev = mesh.devices.size
    nf = 2 * ndev
    cfg = EncoderConfig(block_size=B, channels="stereo_auto")
    samples = make_signal(rng, nf * B, channels=2, depth=16, kind="mixed")
    frames = samples.reshape(2, nf, B).transpose(1, 0, 2)
    info = StreamInfo(44100, 2, 16, nf * B, B, B)

    words, total_bits, crcs, gmin, gmax = encode_step_sharded(
        jnp.asarray(frames),
        jnp.asarray(np.arange(nf, dtype=np.int64)),
        cfg,
        depth=16,
        sample_rate=44100,
        mesh=mesh,
    )
    byte_len = (np.asarray(total_bits) + 7) // 8
    stream = assemble_frames(np.asarray(words), byte_len, np.asarray(crcs))
    sharded = []
    pos = 0
    for L in (byte_len + 2).tolist():
        sharded.append(stream[pos : pos + int(L)])
        pos += int(L)

    pipe = DevicePipeline(cfg, 16, batch_size=nf)
    single = pipe.encode_frames(frames, 0, info)
    assert sharded == single

    sizes = np.array([len(b) for b in single])
    assert int(gmin) == sizes.min()
    assert int(gmax) == sizes.max()


def test_graft_entry_compiles(mesh):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    words, total_bits, crcs = out
    assert np.asarray(total_bits).min() > 0


def test_graft_dryrun_multichip(mesh):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(len(jax.devices()), 8))


def test_product_pipeline_shards_by_default(rng, mesh):
    """DevicePipeline auto-shards over all local devices: encode_wav_bytes
    on the virtual 8-CPU mesh is byte-identical to forced single-device
    (ZIGFLAC_MESH=0) and to golden."""
    import io
    import os

    from zigflac_tpu.models.encoder import encode_wav_bytes
    from zigflac_tpu.models.pipeline import DevicePipeline as DP
    from zigflac_tpu.wav import write_wav

    B = 512
    cfg = EncoderConfig(block_size=B)
    samples = make_signal(rng, 11 * B + 100, channels=2, depth=16, kind="mixed")
    buf = io.BytesIO()
    write_wav(buf, samples.astype(np.int32), 44100, 16)
    wav_bytes = buf.getvalue()

    pipe = DP(cfg, 16)
    assert pipe._mesh is not None and pipe._mesh.devices.size >= 2

    sharded = encode_wav_bytes(wav_bytes, config=cfg, backend="device")
    golden = encode_wav_bytes(wav_bytes, config=cfg, backend="golden")
    assert sharded == golden

    os.environ["ZIGFLAC_MESH"] = "0"
    try:
        assert DP(cfg, 16)._mesh is None
        single = encode_wav_bytes(wav_bytes, config=cfg, backend="device")
    finally:
        del os.environ["ZIGFLAC_MESH"]
    assert sharded == single
