"""Stage attribution of the native flac2wav decode path (CPU host).

Generates the bench recipe's content (tonal+noise, 16/44.1 stereo),
encodes it on the CPU backend (cached compile), then times:

  * decode_frames_pcm   — the fused product path (parse + IIR + serialize)
  * parse_frames        — bit extraction alone (Rice/unary hot loop)
  * synthesize          — IIR + stereo recombination alone
  * Md5Stream           — the --verify hash over the output PCM

Run ALONE on a quiet host; numbers are best-of-3.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

import bench
from zigflac_tpu import native as _native
from zigflac_tpu.decoder import _parse_metadata
from zigflac_tpu.models.encoder import encode_wav_bytes

SECONDS = float(os.environ.get("PROBE_SECONDS", "60"))
LPC = os.environ.get("PROBE_LPC", "0") == "1"

wav = bench.make_wav_bytes(None, n_samples=int(SECONDS * 44100))
cfg = None
if LPC:
    from dataclasses import replace

    from zigflac_tpu.utils.config import EncoderConfig

    cfg = replace(EncoderConfig.default(2), prediction="lpc")
flac = encode_wav_bytes(wav, config=cfg, backend="device")
info, _v, _t, _s, pos0 = _parse_metadata(flac)
print(f"flac: {len(flac)/1e6:.1f} MB, {SECONDS:.0f}s, lpc={LPC}", flush=True)
_n = _native._n


def timeit(name, fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:22s} {best*1e3:8.1f} ms   ({SECONDS/best:7.0f}x RT)",
          flush=True)
    return best, out


def run_fused():
    pos, total = pos0, 0
    while True:
        nfr, pos, _B, pcm, bad, maxabs = _n.decode_frames_pcm(
            flac, pos, 4096, info.bit_depth, info.channels
        )
        if nfr == 0:
            break
        total += len(pcm)
    return total


def run_parse():
    pos = pos0
    keep = []
    while True:
        (n, pos, B, vb, qb, sb, cb, fb, kb, eb) = _n.parse_frames(
            flac, pos, 4096, info.bit_depth, info.channels
        )
        if n == 0:
            break
        keep.append((n, B, vb, qb, sb, cb))
    return keep


t_fused, _ = timeit("decode_frames_pcm", run_fused)
t_parse, parsed = timeit("parse_frames", run_parse)


def run_synth():
    out = 0
    for n, B, vb, qb, sb, cb in parsed:
        out += len(_n.synthesize(vb, qb, sb, cb, n, info.channels, B))
    return out


t_synth, _ = timeit("synthesize", run_synth)

pcm_bytes = int(SECONDS * 44100) * 2 * 2
payload = np.random.default_rng(0).integers(0, 255, pcm_bytes, np.uint8).tobytes()


def run_md5():
    m = _native.Md5Stream()
    m.update(payload)
    return m.digest()


t_md5, _ = timeit("md5 (verify)", run_md5)

print(f"\nfused split: parse~{t_parse*1e3:.0f} ms, "
      f"synth+serialize~{(t_fused-t_parse)*1e3:.0f} ms "
      f"(standalone synth {t_synth*1e3:.0f} ms incl. [n,C,B] i64 alloc)",
      flush=True)
print(f"per-sample: fused {t_fused/ (SECONDS*44100*2) * 1e9:.1f} ns/subframe-sample",
      flush=True)
