"""A/B the e2e collect strategy (sequential vs overlapped page fetch +
meta prefetch) on the real chip, in ONE process — the only comparison the
relay's time-varying load allows (CLAUDE.md). Config-1 geometry only
(fixed-1024 + tail): two compiled programs.

Usage: python tools/probe_e2e_fetch.py [seconds] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 95.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import make_wav_bytes
    from zigflac_tpu.models.encoder import encode_wav_bytes

    wav = make_wav_bytes(seconds)
    t0 = time.perf_counter()
    flac = encode_wav_bytes(wav, backend="device")  # compile + warm
    print(f"warmup (compiles): {time.perf_counter() - t0:.1f}s "
          f"flac={len(flac)} bytes", flush=True)

    results = {}
    for mode in ("seq", "ovl") * reps:
        os.environ["ZIGFLAC_FETCH_SEQ"] = "1" if mode == "seq" else "0"
        t0 = time.perf_counter()
        f2 = encode_wav_bytes(wav, backend="device")
        dt = time.perf_counter() - t0
        assert f2 == flac
        results.setdefault(mode, []).append(dt)
        print(f"{mode}: {dt:.3f}s  {seconds / dt:7.1f}x RT", flush=True)
    for mode, ts in results.items():
        print(f"best {mode}: {min(ts):.3f}s  {seconds / min(ts):7.1f}x RT")


if __name__ == "__main__":
    main()
