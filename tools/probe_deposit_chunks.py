import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import zigflac_tpu.ops.bitpack as bp
from zigflac_tpu.ops.analyze import plan_frames
from zigflac_tpu.ops.header import header_static
from zigflac_tpu.utils.config import EncoderConfig

B, n = 4096, 1024
cfg = EncoderConfig.default(2)
rate = 44100
rng = np.random.default_rng(0xBEEF)
t = np.arange(n * B)
base = 9000*np.sin(2*np.pi*440*t/rate) + 3000*np.sin(2*np.pi*97*t/rate)
L = np.clip(np.round(base + rng.normal(0,120,t.size)), -32768, 32767)
R = np.clip(np.round(0.8*base + rng.normal(0,120,t.size)), -32768, 32767)
batch = jnp.asarray(np.stack([L.reshape(n,B), R.reshape(n,B)], axis=1).astype(np.int32))
fns = jnp.arange(n, dtype=jnp.int64)
hs = header_static(B, rate, 16)
W = bp.max_frame_words(B, 2, 16, 1.25)

def red(x):
    return jnp.sum(jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32), dtype=jnp.int32)

def make(chunk, wr):
    @jax.jit
    def f(fr, fnum):
        plan = plan_frames(fr, 16, cfg)
        dep_cum, total_bits, parts, nbv = bp.frame_symbol_stream(plan, fnum, hs, B, cfg.max_rice_order)
        dep_val = jnp.concatenate([v.astype(jnp.uint64) for v in parts], axis=1)
        words, ovf = bp.deposit_stream_windowed(dep_cum, dep_val, nbv, W, chunk=chunk, win_rows=wr, row_words=32)
        return red(words) + red(total_bits) + red(ovf)
    return f

def timeit(name, fn, *args, N=10):
    out = fn(*args); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:16s} {best*1e3:8.2f} ms", flush=True)
    return best

print("device:", jax.devices()[0].platform, flush=True)
timeit("chunk16 wr2", make(16, 2), batch, fns)
timeit("chunk32 wr3b", make(32, 3), batch, fns)
timeit("chunk8 wr2", make(8, 2), batch, fns)
