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
        frames = args.frames or 81
        height, width = args.height or 480, args.width or 832
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
        frames = args.frames or 65
        height, width = args.height or 544, args.width or 960
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


def _aura(args, on_tpu, Q, log):
    """AuraFlow v0.3 (6.8B): 4 double + 32 single blocks hidden 3072
    (hd-256 heads), pile-t5-xl cond 2048. Default 1024² → 4096 img
    tokens (2×2 patch on the 8×-VAE 128² latent; learned positional
    table covers 9216 = 1536²)."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import aura, testing

    if on_tpu:
        d = testing.AURA_V03_DIMS
        height, width = args.height or 1024, args.width or 1024
        ctx_len = 256
    else:
        d = testing.AuraDims()
        height, width = 64, 64
        ctx_len = 16
    H, W = height // 8, width // 8
    sp = testing.aura_random_stacked_params(d, qtype=getattr(Q, args.qtype))
    cfg = d.config()
    log(f"aura {d.depth_double}+{d.depth_single} blocks hidden {d.hidden}, "
        f"latent ({H},{W}) = {(H // 2) * (W // 2)} tokens, ctx {ctx_len}")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, H, W, d.in_ch), jnp.bfloat16)
    cond = jax.random.normal(jax.random.fold_in(rng, 1),
                             (1, ctx_len, d.cond_dim), jnp.bfloat16)

    def fwd(params, x, ts):
        return aura.forward_stacked(params, cfg, x, cond, ts)

    return sp, fwd, x0, f"auraflow-v0.3 dims {args.qtype}, {width}x{height}"


def _lumina2(args, on_tpu, Q, log):
    """Lumina-Image-2.0 (2.6B NextDiT): 26 layers dim 2304 + 2+2
    refiner blocks, Gemma-2-2b cap 2304. Default 1024² → 4096 img
    tokens (2×2 patch on the 8×-VAE 128² latent)."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import lumina2, testing

    if on_tpu:
        d = testing.LUMINA2_DIMS
        height, width = args.height or 1024, args.width or 1024
        ctx_len = 256
    else:
        d = testing.Lumina2Dims()
        height, width = 64, 64
        ctx_len = 8
    H, W = height // 8, width // 8
    sp = testing.lumina2_random_stacked_params(d,
                                               qtype=getattr(Q, args.qtype))
    cfg = d.config()
    log(f"lumina2 {d.n_layers} layers (+{d.n_refiner}+{d.n_context_refiner}"
        f" refiners) dim {d.dim}, latent ({H},{W}) = "
        f"{(H // 2) * (W // 2)} tokens, cap {ctx_len}")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, H, W, d.in_ch), jnp.bfloat16)
    cap = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, ctx_len, d.cap_dim), jnp.bfloat16)

    def fwd(params, x, ts):
        return lumina2.forward_stacked(params, cfg, x, cap, ts)

    return sp, fwd, x0, (f"lumina-image-2.0 dims {args.qtype}, "
                         f"{width}x{height}")


def _qwen_image(args, on_tpu, Q, log):
    """Qwen-Image (20B MMDiT): 60 joint blocks hidden 3072 (hd 128),
    Qwen2.5-VL-7B txt states 3584. Default 1024² → 4096 img tokens
    (64-feature input = 16-ch latents × 2×2 patch)."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import flux, qwen_image, testing

    if on_tpu:
        d = testing.QWEN_IMAGE_20B_DIMS
        height, width = args.height or 1024, args.width or 1024
        ctx_len = 256
    else:
        d = testing.QwenImageDims()
        height, width = 64, 64
        ctx_len = 8
    h_tok, w_tok = height // 16, width // 16
    sp = testing.qwen_image_random_stacked_params(
        d, qtype=getattr(Q, args.qtype))
    cfg = d.config()
    log(f"qwen-image {d.n_layers} blocks hidden {d.hidden}, "
        f"{h_tok * w_tok} img tokens, txt {ctx_len}")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, h_tok * w_tok, d.in_ch), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_img_ids(h_tok, w_tok, 1))
    txt = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, ctx_len, d.context_dim), jnp.bfloat16)
    txt_ids = jnp.zeros((1, ctx_len, 3), jnp.int32)

    def fwd(params, x, ts):
        return qwen_image.forward_stacked(params, cfg, x, img_ids, txt,
                                          txt_ids, ts)

    return sp, fwd, x0, f"qwen-image-20B dims {args.qtype}, {width}x{height}"


def _ltxv(args, on_tpu, Q, log):
    """LTX-Video 2B: 28 blocks dim 2048 (hd 64), T5-xxl captions 4096.
    Default 768×512 × 121 frames → voxel grid (16, 16, 24) = 6144
    tokens (VAE 32× spatial / 8× temporal, no patching)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from comfyui_gguf_tpu.models import ltxv, testing

    if on_tpu:
        d = testing.LTXV_2B_DIMS
        frames = args.frames or 121
        height, width = args.height or 512, args.width or 768
        ctx_len = 128
    else:
        d = testing.LTXVDims()
        frames, height, width = 9, 64, 64
        ctx_len = 8
    F = (frames - 1) // 8 + 1
    H, W = height // 32, width // 32
    sp = testing.ltxv_random_stacked_params(d, qtype=getattr(Q, args.qtype))
    cfg = d.config()
    log(f"ltxv {d.n_layers} blocks dim {d.dim}, voxels ({F},{H},{W}) "
        f"= {F * H * W} tokens, cap {ctx_len}")
    grid = np.stack(np.meshgrid(np.arange(F), np.arange(H), np.arange(W),
                                indexing="ij"), axis=-1)
    ids = jnp.asarray(grid.reshape(1, -1, 3).astype(np.int32))
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, F * H * W, d.in_ch), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, ctx_len, d.caption_dim), jnp.bfloat16)

    def fwd(params, x, ts):
        return ltxv.forward_stacked(params, cfg, x, ids, ctx, ts)

    return sp, fwd, x0, (f"ltx-video-2B dims {args.qtype}, "
                         f"{width}x{height}x{frames}f")


def _cosmos(args, on_tpu, Q, log):
    """Cosmos-1.0-Diffusion-7B: 28 blocks dim 4096 (hd 128), T5 text
    1024. Default 1280×704 × 33 frames → latent (5, 88, 160) → 17 600
    tokens (CV8×8×8 tokenizer, (1,2,2) patch); the full t2w config is
    --frames 121 (56 320 tokens)."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import cosmos, testing

    if on_tpu:
        d = testing.COSMOS_7B_DIMS
        frames = args.frames or 33
        height, width = args.height or 704, args.width or 1280
        ctx_len = 512
    else:
        d = testing.CosmosDims()
        frames, height, width = 9, 64, 64
        ctx_len = 8
    F = (frames - 1) // 8 + 1
    H, W = height // 8, width // 8
    sp = testing.cosmos_random_stacked_params(d,
                                              qtype=getattr(Q, args.qtype))
    cfg = d.config()
    log(f"cosmos {d.n_layers} blocks dim {d.dim}, latent ({F},{H},{W}) "
        f"= {F * (H // 2) * (W // 2)} tokens, ctx {ctx_len}")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, F, H, W, d.in_ch), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, ctx_len, d.text_dim), jnp.bfloat16)

    def fwd(params, x, ts):
        return cosmos.forward_stacked(params, cfg, x, ctx, ts)

    return sp, fwd, x0, (f"cosmos-7B dims {args.qtype}, "
                         f"{width}x{height}x{frames}f")


def _sdxl(args, on_tpu, Q, log):
    """SDXL base (sgm UNet, ~2.6B): mc 320 × (1,2,4), transformer depth
    (0,2,10), hd-64 attention at 4096 tokens (level 1) / 1024 (level 2),
    CLIP ctx 2048, adm 2816. The conv2d + UNet path's first full-depth
    run (VERDICT r3 item 3) — eps-model, but the Euler-update arithmetic
    costs the same either way; this measures the forward."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import testing, unet

    if on_tpu:
        d = testing.SDXL_DIMS
        height, width = args.height or 1024, args.width or 1024
        ctx_len = 77
    else:
        d = testing.SDXLDims()
        height, width = 64, 64
        ctx_len = 7
    H, W = height // 8, width // 8
    sp = testing.sdxl_random_params(d, qtype=getattr(Q, args.qtype))
    cfg = unet.UNetConfig.from_state_dict(sp)
    log(f"sdxl mc {d.model_channels} mult {d.channel_mult} depths "
        f"{d.depths}, latent ({H},{W}), ctx {ctx_len}")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, H, W, d.in_ch), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, ctx_len, d.ctx), jnp.bfloat16)
    y = jax.random.normal(jax.random.fold_in(rng, 2), (1, d.adm),
                          jnp.bfloat16)

    def fwd(params, x, ts):
        return unet.forward(params, cfg, x, ts * 1000.0, ctx, y)

    return sp, fwd, x0, f"sdxl-base dims {args.qtype}, {width}x{height}"


def _sd1(args, on_tpu, Q, log):
    """SD1.5 (860M sgm UNet): mc 320 × (1,2,4,4), depth-1 transformers
    at every level but the last (8 fixed heads, hd 40/80/160), CLIP-L
    ctx 768, conv-form proj_in/out. Default 512²."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import testing, unet

    if on_tpu:
        d = testing.SD1_DIMS
        height, width = args.height or 512, args.width or 512
        ctx_len = 77
    else:
        d = testing.SDXLDims(channel_mult=(1, 2, 4), depths=(1, 1, 0),
                             ctx=48, adm=None)
        height, width = 64, 64
        ctx_len = 7
    H, W = height // 8, width // 8
    sp = testing.sdxl_random_params(d, qtype=getattr(Q, args.qtype))
    cfg = unet.UNetConfig.from_state_dict(sp)
    log(f"sd1 mc {d.model_channels} mult {d.channel_mult} depths "
        f"{d.depths}, latent ({H},{W}), ctx {ctx_len}")
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, H, W, d.in_ch), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, ctx_len, d.ctx), jnp.bfloat16)

    def fwd(params, x, ts):
        return unet.forward(params, cfg, x, ts * 1000.0, ctx, None)

    return sp, fwd, x0, f"sd1.5 dims {args.qtype}, {width}x{height}"


ARCHS = {"wan": _wan, "hyvid": _hyvid, "aura": _aura, "lumina2": _lumina2,
         "qwen_image": _qwen_image, "ltxv": _ltxv, "cosmos": _cosmos,
         "sdxl": _sdxl, "sd1": _sd1}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True, choices=sorted(ARCHS))
    ap.add_argument("--qtype", default="Q4_K")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--frames", type=int, default=None,
                    help="video frames (per-arch default)")
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--i8", action="store_true",
                    help="requantize to the w8a8 integer-MXU path "
                         "(modulation projections stay planar)")
    ap.add_argument("--single-fwd", action="store_true",
                    help="time one jitted forward instead of the N-step "
                         "scan (workaround: very long single dispatches "
                         "hit device faults on the shared tunnel)")
    ap.add_argument("--window", type=int, default=0,
                    help="steps per jitted dispatch (0 = whole scan in "
                         "one dispatch). Bounds dispatch length for the "
                         "video archs whose full N-step scan wedges the "
                         "worker (the round-3/4 long-dispatch fault) — "
                         "the PRODUCT multi-step path, unlike "
                         "--single-fwd which never integrates")
    ap.add_argument("--i8-budget", type=float, default=13.5e9,
                    help="total packed-weight byte cap for --i8 (14B+ "
                         "models exceed the 16 GB chip fully-int8; "
                         "plan_i8_budget keeps the overflow planar)")
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

    if args.i8:
        from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                               is_modulation_key)

        t0 = time.perf_counter()
        sp = convert_tree_i8(sp, free_source=True,
                             pred=lambda k, v: not is_modulation_key(k),
                             max_bytes=int(args.i8_budget))
        jax.block_until_ready(jax.tree_util.tree_leaves(sp))
        log(f"requantize_i8 in {time.perf_counter() - t0:.1f}s")
        label += "→w8a8"

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

    from bench_util import timed_reps

    if args.single_fwd:
        @jax.jit
        def one(params, x):
            ts = jnp.full((x.shape[0],), 0.5, jnp.float32)
            return fwd(params, x, ts)

        ms, _ = timed_reps(lambda xr: one(sp, xr), x0,
                           reps=reps, steps=1, tag=f"{args.arch}(fwd)",
                           log=log)
        sec = ms * steps
    elif args.window:
        @jax.jit
        def denoise_win(params, x, sig):
            def step(x, i):
                s, sn = sig[i], sig[i + 1]
                ts = jnp.full((x.shape[0],), s, jnp.float32)
                v = fwd(params, x, ts)
                return (x.astype(jnp.float32)
                        + (sn - s) * v.astype(jnp.float32)
                        ).astype(x.dtype), None

            x, _ = jax.lax.scan(step, x, jnp.arange(sig.shape[0] - 1))
            return x

        def denoise_chunked(x):
            for s in range(0, steps, args.window):
                k = min(args.window, steps - s)
                x = denoise_win(sp, x, sigmas[s: s + k + 1])
                x.block_until_ready()  # sync between dispatch windows
            return x

        sec, _ = timed_reps(denoise_chunked, x0, reps=reps, steps=steps,
                            tag=f"{args.arch}(win{args.window})", log=log)
    else:
        sec, _ = timed_reps(lambda xr: denoise(sp, xr), x0,
                            reps=reps, steps=steps, tag=args.arch, log=log)
    print(json.dumps({
        "metric": (f"ms/step MEASURED full-depth denoise ({label}"
                   f"{', per-forward' if args.single_fwd else ''}"
                   f"{f', window={args.window}' if args.window else ''}"
                   f"{'' if on_tpu else ', cpu-smoke'})"),
        "value": round(sec / steps * 1e3, 1),
        "unit": "ms/step",
        "denoise_s": round(sec, 3),
        "steps": steps,
    }))


if __name__ == "__main__":
    sys.exit(main())
