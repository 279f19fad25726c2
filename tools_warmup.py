"""Compile-cache warmup CLI (round-4 verdict item 7).

Cold compiles are the framework's worst operational cost: the mixed
nib4+i8 HiDream denoise took ~56 min cold through the tunnel vs 403 s
with a warm cache (BASELINE.md "Operational"). This tool pre-seeds
GGUF_TPU_COMPILE_CACHE (default /tmp/gguf_tpu_compile_cache) with the
denoise program for a target arch/config so a deployment's first real
request rides the cache — entries are content-addressed and survive
process churn, so run this once per (arch, resolution, steps, quant
path) after an image/driver update.

Usage:
  python tools_warmup.py --arch flux [--steps 20] [--lat 128]
  python tools_warmup.py --arch hidream --i8 --i8-budget 14.0e9
  python tools_warmup.py --arch wan --window 4
  python tools_warmup.py --arch sd3 --i8

Covers flux / sd3 / hidream natively and every tools_arch_bench family
(wan hyvid aura lumina2 qwen_image ltxv cosmos sdxl sd1) through the
same builders the benches use, so the warmed program IS the measured
program. XLA's cache key is the whole program — warm the exact
(resolution, steps, window, i8) combination you will serve.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_ARCHS = ("wan", "hyvid", "aura", "lumina2", "qwen_image", "ltxv",
               "cosmos", "sdxl", "sd1")


def main():
    ap = argparse.ArgumentParser(
        description="pre-seed the XLA compile cache for a target config")
    ap.add_argument("--arch", required=True,
                    choices=("flux", "sd3", "hidream") + BENCH_ARCHS)
    ap.add_argument("--qtype", default="Q4_K")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lat", type=int, default=128,
                    help="latent h=w for the image archs (128 → 1024²)")
    ap.add_argument("--txt-len", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--i8", action="store_true")
    ap.add_argument("--i8-budget", type=float, default=0,
                    help="packed-byte cap for --i8 (0 = unbudgeted); "
                         "budgeted conversions host-stage automatically")
    ap.add_argument("--window", type=int, default=0,
                    help="dispatch-window steps (video archs; 0 = one "
                         "scan dispatch)")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--cache", default=None,
                    help="cache dir (default $GGUF_TPU_COMPILE_CACHE or "
                         "/tmp/gguf_tpu_compile_cache)")
    args = ap.parse_args()

    cache_dir = (args.cache or os.environ.get("GGUF_TPU_COMPILE_CACHE")
                 or "/tmp/gguf_tpu_compile_cache")
    os.environ["GGUF_TPU_COMPILE_CACHE"] = cache_dir
    from comfyui_gguf_tpu import compile_cache
    compile_cache.enable(cache_dir)

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    def log(m):
        print(m, file=sys.stderr, flush=True)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    steps = args.steps if on_tpu else 2
    qcfg = QuantConfig(prefer_pallas=on_tpu)
    qtype = getattr(Q, args.qtype)

    t0 = time.perf_counter()
    if args.arch == "flux":
        from comfyui_gguf_tpu.models import flux, testing
        from comfyui_gguf_tpu.sampling import flow_match

        dims = testing.FLUX_DEV_DIMS if on_tpu else testing.TinyFluxDims()
        h = args.lat if on_tpu else 16
        tl = args.txt_len if on_tpu else 16
        sp = testing.flux_random_stacked_params(dims, qtype=qtype, seed=0)
        cfg = dims.config()
        img, img_ids, txt, txt_ids, _t, y, g = testing.flux_example_inputs(
            dims, batch=args.batch, h_lat=h, w_lat=h, txt_len=tl)
        sigmas = flow_match.flux_schedule(steps, img.shape[1])
        x0 = img

        def fwd(params, x, ts):
            return flux.forward_stacked(params, cfg, x, img_ids, txt,
                                        txt_ids, ts, y, g, qcfg=qcfg)
    elif args.arch == "sd3":
        from comfyui_gguf_tpu.models import sd3, testing
        from comfyui_gguf_tpu.sampling import flow_match

        dims = (testing.SD35_LARGE_DIMS if on_tpu
                else testing.TinySD3Dims(depth=3))
        h = args.lat if on_tpu else 8
        cl = 154 if on_tpu else 8
        sp = testing.sd3_random_stacked_params(dims, qtype=qtype, seed=0)
        cfg = dims.config()
        x0, context, pooled, _t = testing.sd3_example_inputs(
            dims, h_lat=h, w_lat=h, ctx_len=cl)
        sigmas = flow_match.shift_sigmas(
            flow_match.linear_schedule(steps), 3.0)

        def fwd(params, x, ts):
            return sd3.forward_stacked(params, cfg, x, context, pooled,
                                       ts, qcfg=qcfg)
    elif args.arch == "hidream":
        from comfyui_gguf_tpu.models import hidream, testing

        dims = (testing.HIDREAM_I1_DIMS if on_tpu
                else testing.TinyHiDreamDims())
        h = args.lat if on_tpu else 8
        t5l, lll = (128, 128) if on_tpu else (6, 5)
        sp = testing.hidream_random_stacked_params(dims, qtype=qtype,
                                                   seed=0)
        cfg = dims.config()
        rng = jax.random.key(0)
        x0 = jax.random.normal(rng, (1, h, h, dims.in_ch), jnp.bfloat16)
        t5 = jax.random.normal(jax.random.fold_in(rng, 1),
                               (1, t5l, dims.t5_dim), jnp.bfloat16)
        ll = jax.random.normal(jax.random.fold_in(rng, 2),
                               (1, lll, dims.llama_dim), jnp.bfloat16)
        pool = jax.random.normal(jax.random.fold_in(rng, 3),
                                 (1, dims.pooled), jnp.bfloat16)
        sigmas = jnp.linspace(1.0, 0.0, steps + 1)

        def fwd(params, x, ts):
            return hidream.forward_stacked(params, cfg, x, t5, ll, pool,
                                           ts, qcfg=qcfg)
    else:
        import tools_arch_bench as tab

        sp, fwd, x0, _label = tab.ARCHS[args.arch](args, on_tpu, Q, log)
        sigmas = jnp.linspace(1.0, 0.0, steps + 1)
    jax.block_until_ready(jax.tree_util.tree_leaves(sp))
    log(f"params in {time.perf_counter() - t0:.1f}s")

    if args.i8:
        from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                               is_modulation_key)

        t0 = time.perf_counter()
        budget = int(args.i8_budget) if args.i8_budget else None
        sp = convert_tree_i8(sp, free_source=True,
                             pred=lambda k, v: not is_modulation_key(k),
                             max_bytes=budget,
                             host_stage=budget is not None)
        jax.block_until_ready(jax.tree_util.tree_leaves(sp))
        log(f"requantize_i8 in {time.perf_counter() - t0:.1f}s")

    sigmas = jnp.asarray(sigmas, jnp.float32)

    @jax.jit
    def denoise_win(params, x, sig):
        def step(x, i):
            s, sn = sig[i], sig[i + 1]
            ts = jnp.full((x.shape[0],), s, jnp.float32)
            v = fwd(params, x, ts)
            return (x.astype(jnp.float32)
                    + (sn - s) * v.astype(jnp.float32)).astype(x.dtype), None

        x, _ = jax.lax.scan(step, x, jnp.arange(sig.shape[0] - 1))
        return x

    def run():
        x = x0
        win = args.window or steps
        for s in range(0, steps, win):
            k = min(win, steps - s)
            x = denoise_win(sp, x, sigmas[s: s + k + 1])
            x.block_until_ready()
        return x

    t0 = time.perf_counter()
    run()
    cold = time.perf_counter() - t0
    log(f"compile+first-run {cold:.1f}s")
    t0 = time.perf_counter()
    run()
    warm = time.perf_counter() - t0

    n_entries = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) \
        else 0
    print(json.dumps({
        "arch": args.arch, "steps": steps, "i8": bool(args.i8),
        "window": args.window, "cache_dir": cache_dir,
        "cache_entries": n_entries,
        "compile_first_run_s": round(cold, 1),
        "warm_run_s": round(warm, 1),
        "tpu": on_tpu,
    }))


if __name__ == "__main__":
    main()
