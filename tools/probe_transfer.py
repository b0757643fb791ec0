"""Transfer-budget probe for the axon relay (VERDICT r4 item 1).

Measures, back-to-back in one process (the only comparison the relay's
time-varying load allows):
  1. h2d bandwidth at several sizes,
  2. d2h bandwidth vs fetch page size, sequential pages,
  3. d2h with overlapped pages (copy_to_host_async on all slices first),
  4. full-duplex: h2d of batch k+1 concurrent with d2h of batch k,
  5. the production batch's actual byte budget (16.8 MB i16 in,
     ~10.8 MB aligned stream + 8 KB meta out per 1024-frame batch).

Usage: python tools/probe_transfer.py [reps]
"""

import sys
import time

import numpy as np


def _t():
    return time.perf_counter()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}")

    # warm the link
    w = jax.device_put(np.zeros(1 << 16, np.int16))
    np.asarray(w)

    # -- 1. h2d bandwidth --
    for mb in (1, 4, 16):
        a = np.zeros(mb << 19, np.int16)  # mb MiB
        best = float("inf")
        for _ in range(reps):
            t0 = _t()
            jax.device_put(a).block_until_ready()
            best = min(best, _t() - t0)
        print(f"h2d {mb:3d} MiB: {best:7.3f}s  {mb / best:7.1f} MB/s")

    # device-resident source for d2h tests: make it the OUTPUT of a tiny
    # computation (matches production: the stream is a program output).
    # IMPORTANT: jax caches the host copy after the first np.asarray of an
    # Array, so every timed rep must fetch a FRESH array (a fresh slice or
    # a freshly recomputed source) or the number is a no-op read.
    total_mb = 12
    n = total_mb << 18  # i32 words
    base = jnp.arange(n, dtype=jnp.int32)
    base.block_until_ready()

    def fresh_src(k):
        s = base * jnp.int32(3 + k)
        s.block_until_ready()
        return s

    # -- 2. d2h page-size sweep, sequential --
    for page_mb in (1, 2, 4, 8, 12):
        P = page_mb << 18
        npages = (n + P - 1) // P
        best = float("inf")
        for r in range(reps):
            src = fresh_src(r)
            t0 = _t()
            parts = [np.asarray(src[i * P:(i + 1) * P]) for i in range(npages)]
            best = min(best, _t() - t0)
        del parts
        print(f"d2h seq  page={page_mb:2d} MiB x{npages}: {best:7.3f}s "
              f"{total_mb / best:7.1f} MB/s")

    # -- 3. d2h overlapped: issue all async copies first --
    for page_mb in (1, 2, 4, 6, 12):
        P = page_mb << 18
        npages = (n + P - 1) // P
        best = float("inf")
        for r in range(reps):
            src = fresh_src(10 + r)
            t0 = _t()
            slices = [src[i * P:(i + 1) * P] for i in range(npages)]
            for s in slices:
                s.copy_to_host_async()
            parts = [np.asarray(s) for s in slices]
            best = min(best, _t() - t0)
        del parts
        print(f"d2h ovl  page={page_mb:2d} MiB x{npages}: {best:7.3f}s "
              f"{total_mb / best:7.1f} MB/s")

    # single-shot whole-array fetch (fresh array per rep)
    best = float("inf")
    for r in range(reps):
        src = fresh_src(20 + r)
        t0 = _t()
        np.asarray(src)
        best = min(best, _t() - t0)
    print(f"d2h single {total_mb} MiB: {best:7.3f}s {total_mb / best:7.1f} MB/s")

    # -- 4. duplex: h2d 16 MiB while d2h 12 MiB is in flight --
    h = np.zeros(16 << 19, np.int16)
    best_dup = best_ser = float("inf")
    for _ in range(reps):
        t0 = _t()
        slices = [src[i * (4 << 18):(i + 1) * (4 << 18)] for i in range(3)]
        for s in slices:
            s.copy_to_host_async()
        up = jax.device_put(h)
        parts = [np.asarray(s) for s in slices]
        up.block_until_ready()
        best_dup = min(best_dup, _t() - t0)
        # serial form
        t0 = _t()
        parts = [np.asarray(src[i * (4 << 18):(i + 1) * (4 << 18)])
                 for i in range(3)]
        jax.device_put(h).block_until_ready()
        best_ser = min(best_ser, _t() - t0)
    print(f"duplex h2d16+d2h12: overlapped {best_dup:7.3f}s  "
          f"serial {best_ser:7.3f}s")
    del parts


if __name__ == "__main__":
    main()
