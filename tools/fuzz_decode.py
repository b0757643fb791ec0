"""Decode-side adversarial fuzz: corrupted / truncated / garbage FLAC and
Ogg-FLAC inputs must produce a CLEAN failure (FlacDecodeError / ValueError /
EOFError / IndexError, or a verify=False result) — never a crash, hang, or
out-of-bounds access in the native parser. Complements tools/fuzz_long.py
(which fuzzes encode-side content on VALID streams).

Usage: python tools/fuzz_decode.py [n_mutations_per_seed]  (default 400)
"""
import io
import itertools
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from zigflac_tpu.decoder import FlacDecodeError, decode_flac, decode_file
from zigflac_tpu.models.encoder import encode_wav_bytes
from zigflac_tpu.ogg import flac_to_ogg
from zigflac_tpu.wav import write_wav

OK_ERRORS = (FlacDecodeError, ValueError, EOFError, IndexError)


def make_seed_streams():
    """A few valid streams across depths/configs (golden backend: no jax)."""
    rng = np.random.default_rng(0xDEC0DE)
    out = []
    for depth, n, kind in [(16, 4096 * 2 + 333, "mixed"),
                           (24, 4096 + 100, "noise"),
                           (8, 2048, "tone")]:
        lo, hi = -(1 << (depth - 1)), (1 << (depth - 1)) - 1
        t = np.arange(n)
        if kind == "tone":
            x = 0.4 * hi * np.sin(2 * np.pi * 440 * t / 44100)[None, :].repeat(2, 0)
        elif kind == "noise":
            x = rng.uniform(lo, hi, (2, n))
        else:
            x = 0.3 * hi * np.sin(2 * np.pi * 220 * t / 44100) + rng.normal(
                0, max(hi * 0.01, 2), (2, n))
        pcm = np.clip(np.round(x), lo, hi).astype(np.int32)
        buf = io.BytesIO()
        write_wav(buf, pcm, 44100, depth)
        out.append(encode_wav_bytes(buf.getvalue(), backend="golden"))
    return out


_MT_THREADS = itertools.cycle((2, 3, 4, 6, 8, 12, 16))


def try_decode(blob: bytes) -> str:
    """Decode a (possibly corrupt) blob through every public surface;
    returns a short outcome tag. Raises only on a non-clean failure.
    The frame-parallel leg cycles worker counts over 2-16 so the sweep
    exercises the stitcher at every boundary-split granularity."""
    outcomes = []
    try:
        dec = decode_flac(blob, check_crc=True)
        outcomes.append("host-ok" if dec.md5_ok else "host-md5bad")
    except OK_ERRORS:
        outcomes.append("host-err")
    # the native fused file path (mmap + C++ parser + synthesis)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.flac")
        with open(p, "wb") as f:
            f.write(blob)
        try:
            decode_file(p, os.path.join(td, "x.wav"), check_crc=True,
                        verify=True, backend="native", threads=1)
            outcomes.append("native-ok")
        except OK_ERRORS:
            outcomes.append("native-err")
        # frame-parallel path: same outcome AND byte-identical output
        try:
            decode_file(p, os.path.join(td, "mt.wav"), check_crc=True,
                        verify=True, backend="native",
                        threads=next(_MT_THREADS))
            outcomes.append("mt-ok")
        except OK_ERRORS:
            outcomes.append("mt-err")
        assert outcomes[-1].replace("mt", "native") == outcomes[-2], (
            f"serial/MT outcome mismatch: {outcomes[-2]} vs {outcomes[-1]}"
        )
        if outcomes[-1] == "mt-ok":
            with open(os.path.join(td, "x.wav"), "rb") as a, open(
                    os.path.join(td, "mt.wav"), "rb") as b:
                assert a.read() == b.read(), "serial/MT byte mismatch"
    return "+".join(outcomes)


def main() -> None:
    n_mut = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    rng = np.random.default_rng(0xBADF00D)
    seeds = make_seed_streams()
    stats = {}
    cases = 0
    for si, seed in enumerate(seeds):
        oga = io.BytesIO()
        flac_to_ogg(seed, oga)
        for blob0 in (seed, oga.getvalue()):
            for _ in range(n_mut):
                b = bytearray(blob0)
                mode = rng.integers(0, 4)
                if mode == 0:  # single random byte flip
                    b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
                elif mode == 1:  # burst corruption
                    at = int(rng.integers(0, len(b)))
                    ln = int(rng.integers(1, 64))
                    b[at : at + ln] = bytes(
                        rng.integers(0, 256, min(ln, len(b) - at), dtype=np.uint8)
                    )
                elif mode == 2:  # truncation
                    b = b[: rng.integers(0, len(b))]
                else:  # random bit flip in the frame region (past metadata)
                    at = int(rng.integers(min(len(b) - 1, 64), len(b)))
                    b[at] ^= 1 << int(rng.integers(0, 8))
                tag = try_decode(bytes(b))
                stats[tag] = stats.get(tag, 0) + 1
                cases += 1
        print(f"seed {si}: {cases} cases so far, outcomes {stats}", flush=True)
    # garbage / pathological headers
    for _ in range(200):
        n = int(rng.integers(0, 4096))
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for prefix in (b"", b"fLaC", b"OggS"):
            tag = try_decode(prefix + blob)
            stats[tag] = stats.get(tag, 0) + 1
            cases += 1
    print(f"DONE: {cases} cases, outcomes {stats}")


if __name__ == "__main__":
    main()
