"""Full-depth MEASURED bench for the remaining model families (wan /
hyvid / aura / lumina2 / qwen-image / ltxv / cosmos) — the same
methodology as bench.py / tools_sd3_bench.py: real depth, packed planar
weights generated directly stacked (models/testing.py
random_stacked_from_spec), an actual N-step Euler denoise as ONE jitted
lax.scan, executions timed. Every family's first real full-depth run is
a generalization test for code tuned on flux's dims (the sd3.5 run found
two: power-of-two-only tile lists and the hd%128 flash gate —
docs/NOTES_ROUND2.md).

Usage:
  python tools_arch_bench.py --arch wan [--steps 8] [--reps 2]
  python tools_arch_bench.py --arch wan --frames 81 --height 480 --width 832
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _wan(args, on_tpu, Q, log):
    """Wan2.1-T2V-14B: 40 blocks dim 5120, UMT5 ctx 512. Default video
    config 480p (832×480) × 81 frames → latent (21, 60, 104) → 32 760
    tokens (VAE 8× spatial / 4× temporal, (1,2,2) patch)."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import testing, wan

    if on_tpu:
        d = testing.WAN_14B_DIMS
        frames, height, width = args.frames, args.height, args.width
        ctx_len = 512
    else:
        d = testing.WanDims()
        frames, height, width = 5, 64, 64
        ctx_len = 16
    F = (frames - 1) // 4 + 1
    H, W = height // 8, width // 8
    sp = testing.wan_random_stacked_params(d, qtype=getattr(Q, args.qtype))
    cfg = d.config()
    log(f"wan {d.n_layers} blocks dim {d.dim}, latent ({F},{H},{W}) "
        f"= {F * (H // 2) * (W // 2)} tokens, ctx {ctx_len}")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, F, H, W, d.in_ch), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, ctx_len, d.text_dim), jnp.bfloat16)

    def fwd(params, x, ts):
        return wan.forward_stacked(params, cfg, x, ctx, ts)

    label = (f"wan2.1-t2v-14B dims {args.qtype}, "
             f"{width}x{height}x{frames}f")
    return sp, fwd, x0, label


def _hyvid(args, on_tpu, Q, log):
    """HunyuanVideo 13B: 20+40 blocks hidden 3072, llama ctx 256.
    Default video config 960×544 × 65 frames → latent (17, 68, 120) →
    34 680 tokens (VAE 8× spatial / 4× temporal, (1,2,2) patch)."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import hyvid, testing

    if on_tpu:
        d = testing.HYVID_13B_DIMS
        frames, height, width = args.frames, args.height, args.width
        ctx_len = 256
    else:
        d = testing.HyVidDims(refiner_depth=2)
        frames, height, width = 5, 64, 64
        ctx_len = 16
    F = (frames - 1) // 4 + 1
    H, W = height // 8, width // 8
    sp = testing.hyvid_random_stacked_params(d,
                                             qtype=getattr(Q, args.qtype))
    cfg = d.config()
    log(f"hyvid {d.depth_double}+{d.depth_single} blocks hidden "
        f"{d.hidden}, latent ({F},{H},{W}) = {F * (H // 2) * (W // 2)} "
        f"tokens, ctx {ctx_len}")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, F, H, W, d.in_ch), jnp.bfloat16)
    txt = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, ctx_len, d.text_dim), jnp.bfloat16)

    def fwd(params, x, ts):
        g = jnp.full((x.shape[0],), 6.0, jnp.float32)
        return hyvid.forward_stacked(params, cfg, x, txt, ts, g)

    label = (f"hunyuanvideo-13B dims {args.qtype}, "
             f"{width}x{height}x{frames}f")
    return sp, fwd, x0, label


ARCHS = {"wan": _wan, "hyvid": _hyvid}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True, choices=sorted(ARCHS))
    ap.add_argument("--qtype", default="Q4_K")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    args = ap.parse_args()

    os.environ.setdefault("GGUF_TPU_COMPILE_CACHE",
                          "/tmp/gguf_tpu_compile_cache")
    from comfyui_gguf_tpu import compile_cache
    compile_cache.enable(os.environ["GGUF_TPU_COMPILE_CACHE"])

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q

    def log(m):
        print(m, file=sys.stderr, flush=True)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    steps = args.steps if on_tpu else 2
    reps = args.reps if on_tpu else 1

    t0 = time.perf_counter()
    sp, fwd, x0, label = ARCHS[args.arch](args, on_tpu, Q, log)
    jax.block_until_ready(sp)
    log(f"params in {time.perf_counter() - t0:.1f}s")

    sigmas = jnp.linspace(1.0, 0.0, steps + 1)

    @jax.jit
    def denoise(params, x0):
        def step(x, i):
            s, sn = sigmas[i], sigmas[i + 1]
            ts = jnp.full((x.shape[0],), s, jnp.float32)
            v = fwd(params, x, ts)
            return (x.astype(jnp.float32)
                    + (sn - s) * v.astype(jnp.float32)).astype(x.dtype), None

        x, _ = jax.lax.scan(step, x0, jnp.arange(steps))
        return x

    tc = time.perf_counter()
    jax.block_until_ready(denoise(sp, x0))
    log(f"compile+first-run {time.perf_counter() - tc:.1f}s")
    times = []
    for _ in range(reps):
        t1 = time.perf_counter()
        jax.block_until_ready(denoise(sp, x0))
        times.append(time.perf_counter() - t1)
    sec = statistics.median(times)
    log(f"{steps}-step denoise: {sec:.3f}s ({sec / steps * 1e3:.1f} ms/step; "
        f"runs {[round(t, 3) for t in times]})")
    print(json.dumps({
        "metric": (f"ms/step MEASURED full-depth denoise ({label}"
                   f"{'' if on_tpu else ', cpu-smoke'})"),
        "value": round(sec / steps * 1e3, 1),
        "unit": "ms/step",
        "denoise_s": round(sec, 3),
        "steps": steps,
    }))


if __name__ == "__main__":
    sys.exit(main())
