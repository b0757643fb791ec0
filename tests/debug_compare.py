"""Debug harness: compare device plan + packed frames against golden,
field by field. Run directly: python tests/debug_compare.py"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from conftest import make_signal
from zigflac_tpu import golden
from zigflac_tpu.metadata import StreamInfo
from zigflac_tpu.models.pipeline import DevicePipeline
from zigflac_tpu.ops.analyze import plan_frames
from zigflac_tpu.utils.config import EncoderConfig
import jax.numpy as jnp


def compare(samples, depth, B, rate=44100):
    cfg = EncoderConfig(block_size=B, channels="stereo_auto" if samples.shape[0] == 2 else samples.shape[0])
    c, n = samples.shape
    nf = n // B
    frames = samples[:, : nf * B].reshape(c, nf, B).transpose(1, 0, 2)
    info = StreamInfo(rate, c, depth, n, B, B)

    plan = plan_frames(jnp.asarray(frames), depth, cfg)
    plan = {k: np.asarray(v) for k, v in plan._asdict().items()}

    for i in range(nf):
        gplan = golden.plan_frame([frames[i, ch] for ch in range(c)], depth, cfg)
        # golden wire channels
        if gplan.ch_type == 0:
            gcode = info.channels - 1 if not cfg.stereo_auto else 1
        else:
            gcode = gplan.ch_type + 7
        dcode = plan["channels_code"][i]
        if gcode != dcode:
            print(f"frame {i}: channels_code golden={gcode} device={dcode} (ch_type={gplan.ch_type})")
            continue
        for w, (pl, ch, ss, _k) in enumerate(gplan.subframes):
            kindmap = {"constant": 0, "verbatim": 1, "fixed": 2}
            gk = kindmap[ch.kind]
            dk = plan["kind"][w, i]
            if gk != dk:
                print(f"frame {i} wire {w}: kind golden={ch.kind} device={dk}")
                continue
            if plan["sample_size"][w, i] != ss:
                print(f"frame {i} wire {w}: ss golden={ss} device={plan['sample_size'][w, i]}")
            if not np.array_equal(np.asarray(pl, dtype=np.int64), plan["planes"][w, i]):
                print(f"frame {i} wire {w}: plane data differs")
            if ch.kind == "fixed":
                if ch.order != plan["order"][w, i]:
                    print(f"frame {i} wire {w}: order golden={ch.order} device={plan['order'][w, i]}")
                if ch.rice.method != plan["method"][i, w]:
                    print(f"frame {i} wire {w}: method golden={ch.rice.method} device={plan['method'][i, w]}")
                if ch.rice.part_order != plan["part_order"][i, w]:
                    print(
                        f"frame {i} wire {w}: part_order golden={ch.rice.part_order} "
                        f"device={plan['part_order'][i, w]}"
                    )
                npart = 1 << ch.rice.part_order
                gp = np.array(ch.rice.params[:npart])
                dp = plan["params"][i, w, :npart]
                if not np.array_equal(gp, dp):
                    bad = np.nonzero(gp != dp)[0]
                    print(
                        f"frame {i} wire {w}: params differ at partitions {bad[:10]}: "
                        f"golden={gp[bad[:10]]} device={dp[bad[:10]]}"
                    )
                if not np.array_equal(ch.residuals, plan["residuals"][i, w]):
                    bad = np.nonzero(ch.residuals != plan["residuals"][i, w])[0]
                    print(
                        f"frame {i} wire {w}: residuals differ at {bad[:10]} "
                        f"golden={ch.residuals[bad[:5]]} device={plan['residuals'][i, w][bad[:5]]}"
                    )

    # full frame bytes
    gframes = [
        golden.encode_frame([frames[i, ch] for ch in range(c)], i, info, cfg)
        for i in range(nf)
    ]
    pipe = DevicePipeline(cfg, depth, batch_size=nf)
    dframes = pipe.encode_frames(frames, 0, info)
    for i, (a, b) in enumerate(zip(gframes, dframes)):
        if a != b:
            j = next((j for j in range(min(len(a), len(b))) if a[j] != b[j]), None)
            print(f"frame {i}: BYTES DIFFER len g={len(a)} d={len(b)} first diff byte {j}")
            if j is not None:
                print(f"  golden around: {a[max(0,j-4):j+8].hex()}")
                print(f"  device around: {b[max(0,j-4):j+8].hex()}")
        else:
            print(f"frame {i}: identical ({len(a)} bytes)")


def _main():
    rng = np.random.default_rng(0xF1AC)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    kind = sys.argv[2] if len(sys.argv) > 2 else "sine"
    frame_i = int(os.environ.get("DEBUG_FRAME", "0"))
    samples = make_signal(rng, 4 * B, channels=2, depth=16, kind=kind)
    if os.environ.get("DEBUG_SYMBOLS"):
        compare_symbols(samples, 16, B, frame_i=frame_i)
    else:
        compare(samples, 16, B)


def compare_symbols(samples, depth, B, rate=44100, frame_i=0):
    """Symbol-level diff: golden's instrumented BitWriter log vs device
    symbol arrays."""
    from zigflac_tpu.utils import bits as bits_mod
    from zigflac_tpu.ops.bitpack import channel_symbols, header_symbols
    from zigflac_tpu.ops.header import build_headers, header_static

    cfg = EncoderConfig(block_size=B, channels="stereo_auto" if samples.shape[0] == 2 else samples.shape[0])
    c, n = samples.shape
    nf = n // B
    frames = samples[:, : nf * B].reshape(c, nf, B).transpose(1, 0, 2)
    info = StreamInfo(rate, c, depth, n, B, B)

    # --- golden log ---
    log = []
    orig_write = bits_mod.BitWriter.write
    orig_zeros = bits_mod.BitWriter.write_zeros

    def log_write(self, nbits, value):
        log.append(("w", nbits, value & ((1 << nbits) - 1) if nbits else 0))
        orig_write(self, nbits, value)

    def log_zeros(self, nbits):
        log.append(("z", nbits, 0))
        orig_zeros(self, nbits)

    bits_mod.BitWriter.write = log_write
    bits_mod.BitWriter.write_zeros = log_zeros
    try:
        golden.encode_frame([frames[frame_i, ch] for ch in range(c)], frame_i, info, cfg)
    finally:
        bits_mod.BitWriter.write = orig_write
        bits_mod.BitWriter.write_zeros = orig_zeros
    # merge zero-runs into following write; drop the final byte-align zeros
    merged = []
    pending_zeros = 0
    for kind_, nb, v in log:
        if kind_ == "z":
            pending_zeros += nb
        else:
            merged.append((pending_zeros + nb, v, nb))
            pending_zeros = 0

    # --- device symbols ---
    plan = plan_frames(jnp.asarray(frames), depth, cfg)
    hstatic = header_static(B, rate, depth)
    hb, hlen = build_headers(
        jnp.arange(nf, dtype=jnp.int64), plan.channels_code, hstatic
    )
    blocks = [header_symbols(hb, hlen)]
    for w in range(plan.kind.shape[0]):
        blocks.append(
            channel_symbols(
                plan.kind[w], plan.order[w], plan.method[w],
                plan.part_order[w], plan.sample_size[w],
                plan.params[w], plan.planes[w], plan.residuals[w],
                B, cfg.max_rice_order,
            )
        )
    nb = np.concatenate([np.asarray(b.nb)[frame_i] for b in blocks])
    val = np.concatenate([np.asarray(b.val)[frame_i] for b in blocks])
    nbv = np.concatenate([np.asarray(b.nbv)[frame_i] for b in blocks])
    dev = [(int(a), int(b_), int(cc)) for a, b_, cc in zip(nb, val, nbv) if a > 0]

    print(f"golden {len(merged)} symbols, device {len(dev)} symbols")
    for i, (g, d) in enumerate(zip(merged, dev)):
        if g != d:
            print(f"first symbol mismatch at {i}: golden(nb,val,nbv)={g} device={d}")
            for j in range(max(0, i - 3), min(len(merged), i + 4)):
                print(f"  [{j}] golden={merged[j]} device={dev[j] if j < len(dev) else None}")
            return
    if len(merged) != len(dev):
        print(f"length mismatch; golden tail: {merged[len(dev):][:5]} device tail: {dev[len(merged):][:5]}")
    else:
        print("symbol streams identical")


if __name__ == "__main__":
    _main()
