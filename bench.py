"""Headline benchmark: end-to-end wav2flac throughput on the device backend.

16-bit / 44.1 kHz stereo PCM -> FLAC (BASELINE.json config 1), measured as
x-realtime of input audio encoded per wall-clock second, WAV bytes in ->
valid FLAC bytes out (includes host WAV parse, MD5, and stream assembly).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 1000 — the driver-assigned north-star target is
>1000x realtime on one chip (BASELINE.md; the reference publishes no
numbers of its own).
"""

import io
import json
import os
import sys
import time

import numpy as np


def make_wav_bytes(seconds: float, rate: int = 44100) -> bytes:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from zigflac_tpu.wav import write_wav

    rng = np.random.default_rng(0xBEEF)
    n = int(seconds * rate)
    t = np.arange(n)
    base = 9000 * np.sin(2 * np.pi * 440 * t / rate) + 3000 * np.sin(
        2 * np.pi * 97 * t / rate
    )
    noise = rng.normal(0, 120, size=(2, n))
    x = np.stack([base + noise[0], 0.8 * base + noise[1]])
    samples = np.clip(np.round(x), -32768, 32767).astype(np.int32)
    buf = io.BytesIO()
    write_wav(buf, samples, rate, 16)
    return buf.getvalue()


def main() -> None:
    # one full 1024-frame batch + a ragged tail; measured: batch pipelining
    # doesn't overlap on the relay, so longer runs only repeat this
    seconds = float(os.environ.get("BENCH_SECONDS", "95"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from zigflac_tpu.models.encoder import encode_wav_bytes

    wav_bytes = make_wav_bytes(seconds)

    # warmup: compile + first run
    flac = encode_wav_bytes(wav_bytes, backend="device")
    assert flac[:4] == b"fLaC"

    reps = int(os.environ.get("BENCH_REPS", "3"))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        flac = encode_wav_bytes(wav_bytes, backend="device")
        dt = time.perf_counter() - t0
        best = min(best, dt)

    x_realtime = seconds / best

    # device-only throughput: the batched encode program alone, excluding
    # the tunnel transfers (the relay moves ~30MB/s in / ~20MB/s out, which
    # bounds the end-to-end number on this harness)
    import jax
    import jax.numpy as jnp
    import numpy as np_
    from zigflac_tpu.models.pipeline import _compiled_encode_compact
    from zigflac_tpu.utils.config import EncoderConfig
    from zigflac_tpu.wav import WavReader

    wav = WavReader.from_bytes(wav_bytes)
    samples = wav.planar_samples()
    nf = min(samples.shape[1] // 4096, 1024)
    fr = samples[:, : nf * 4096].reshape(2, nf, 4096).transpose(1, 0, 2)
    if nf < 1024:  # pad to the pipeline's bucket so no extra program compiles
        fr = np_.concatenate([fr, np_.repeat(fr[-1:], 1024 - nf, axis=0)], axis=0)
    batch = jnp.asarray(fr.astype(np_.int16))
    fns = jnp.arange(batch.shape[0], dtype=jnp.int64)
    fn, _cap = _compiled_encode_compact(
        EncoderConfig.default(2), 16, 2, 4096, 44100, 0, batch.shape[0]
    )
    out = fn(batch, fns)
    jax.block_until_ready(out)
    np_.asarray(out[1])
    # amortize over N executions with one closing d2h fetch: a single
    # block_until_ready round trip carries ~30-50 ms of relay latency,
    # which would swamp the per-batch program time
    N = 10
    dev_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _i in range(N):
            out = fn(batch, fns)
        np_.asarray(out[1])
        dev_s = min(dev_s, (time.perf_counter() - t0) / N)
    device_x = batch.shape[0] * 4096 / 44100 / dev_s

    # LPC-mode device-only throughput: since the Q28 integer Levinson
    # moved INSIDE the encode program (no lag fetch, no host pre-pass, no
    # coefficient upload), LPC is just another single-program measurement.
    from dataclasses import replace as _replace

    lpc_cfg = _replace(EncoderConfig.default(2), prediction="lpc")
    lfn, _lcap = _compiled_encode_compact(
        lpc_cfg, 16, 2, 4096, 44100, 0, batch.shape[0]
    )
    out_l = lfn(batch, fns)  # warmup/compile
    jax.block_until_ready(out_l)
    np_.asarray(out_l[1])
    lpc_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _i in range(N):
            out_l = lfn(batch, fns)
        np_.asarray(out_l[1])
        lpc_s = min(lpc_s, (time.perf_counter() - t0) / N)
    lpc_x = batch.shape[0] * 4096 / 44100 / lpc_s

    pcm_bytes = seconds * 44100 * 2 * 2
    result = {
        "metric": "wav2flac 16-bit/44.1kHz stereo encode speed (device backend, end-to-end)",
        "value": round(x_realtime, 1),
        "unit": "x realtime",
        "vs_baseline": round(x_realtime / 1000.0, 3),
        "detail": {
            "wall_s": round(best, 4),
            "audio_s": seconds,
            "input_MBps": round(pcm_bytes / best / 1e6, 1),
            "flac_bytes": len(flac),
            "ratio": round(len(flac) / len(wav_bytes), 4),
            "device_only_x_realtime": round(device_x, 1),
            "lpc_device_only_x_realtime": round(lpc_x, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
