"""Full-depth SD3.5-large MEASURED bench (BASELINE config 4, round-2).

Round 1 reported 21.4 s/image (Q4_K) for sd3.5-large dims from per-block
differencing; this RUNS the real thing: hidden 2432, 38 joint blocks
(final block pre-only), Q4_K packed planar weights, 1024² latents
(4096 image tokens + 154 ctx tokens = 4250 joint tokens), an actual
28-step Euler denoise (SD3 shift=3.0 schedule) as ONE jitted lax.scan
via sd3.forward_stacked (scan over the 37 homogeneous blocks +
unrolled pre-only tail).

Also times one reference-algorithm forward (XLA dequant→dot, the
reference's per-forward strategy — reference dequant.py:30-44 +
ops.py:244) at identical depth for the same-chip algorithm comparison.

Usage: python tools_sd3_bench.py [--qtype Q4_K] [--steps 28] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    # persistent XLA compile cache (content-addressed, survives
    # process churn) — the other benches and tools_warmup share it
    os.environ.setdefault("GGUF_TPU_COMPILE_CACHE",
                          "/tmp/gguf_tpu_compile_cache")
    from comfyui_gguf_tpu import compile_cache
    compile_cache.enable(os.environ["GGUF_TPU_COMPILE_CACHE"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--qtype", default="Q4_K")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--medium", action="store_true",
                    help="sd3.5-MEDIUM dims (hidden 1536, 24 blocks, "
                         "13 dual-attention prefix blocks — the MMDiT-X "
                         "stacked path)")
    ap.add_argument("--i8", action="store_true",
                    help="requantize to the w8a8 integer-MXU path "
                         "(modulation projections stay planar)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models import sd3, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.sampling import flow_match

    on_tpu = any(d.platform == "tpu" for d in jax.devices())

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    if on_tpu:
        dims = (testing.SD35_MEDIUM_DIMS if args.medium
                else testing.SD35_LARGE_DIMS)
        h_lat = w_lat = 128             # 1024² pixels
        ctx_len = 154                   # 77 clip-pooled + 77 t5 rows
        steps, reps = args.steps, args.reps
    else:  # CPU smoke
        dims = testing.TinySD3Dims(depth=3, dual_prefix=1 if args.medium
                                   else 0)
        h_lat = w_lat = 8
        ctx_len = 8
        steps, reps = 2, 1

    cfg = dims.config()
    qtype = getattr(Q, args.qtype)
    t0 = time.perf_counter()
    sparams = testing.sd3_random_stacked_params(dims, qtype=qtype, seed=0)
    log(f"stacked params built in {time.perf_counter()-t0:.1f}s "
        f"(depth {dims.depth}, hidden {dims.hidden}, {args.qtype})")

    if args.i8:
        from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                               is_modulation_key)

        t0 = time.perf_counter()
        sparams = convert_tree_i8(
            sparams, free_source=True,
            pred=lambda k, v: not is_modulation_key(k))
        jax.block_until_ready(jax.tree_util.tree_leaves(sparams))
        log(f"requantize_i8 in {time.perf_counter()-t0:.1f}s")

    latent, context, pooled, _t = testing.sd3_example_inputs(
        dims, h_lat=h_lat, w_lat=w_lat, ctx_len=ctx_len)
    sigmas = flow_match.shift_sigmas(
        flow_match.linear_schedule(steps), 3.0)

    qcfg = QuantConfig(prefer_pallas=on_tpu)

    @jax.jit
    def denoise(sparams, x0, context):
        def velocity(x, sigma):
            tt = jnp.full((x.shape[0],), sigma, jnp.float32)
            return sd3.forward_stacked(sparams, cfg, x, context, pooled,
                                       tt, qcfg=qcfg)
        return flow_match.euler_sample(velocity, x0, sigmas)

    from bench_util import timed_reps

    sec_image, _ = timed_reps(
        lambda xr: denoise(sparams, xr, context), latent,
        reps=reps, steps=steps, tag="fused", log=log)

    speedup = float("nan")
    if args.i8 and not args.skip_ref:
        # the planar tree was destroyed by the in-place conversion; the
        # labeled reference (Q4_K XLA dequant->dot) can't be measured
        # here — compare against the non-i8 run's vs_baseline instead
        log("--i8: skipping ref row (planar source freed by conversion)")
    elif not args.skip_ref:
        qcfg_ref = QuantConfig(prefer_pallas=False)

        @jax.jit
        def fwd_ref(sparams, x, context):
            tt = jnp.full((x.shape[0],), 1.0, jnp.float32)
            return sd3.forward_stacked(sparams, cfg, x, context, pooled,
                                       tt, qcfg=qcfg_ref)

        step_ref, _ = timed_reps(
            lambda xr: fwd_ref(sparams, xr, context), latent,
            reps=max(1, reps - 1), steps=1, tag="ref(xla-dequant)",
            log=log)
        log(f"ref(xla-dequant) step {step_ref*1e3:.1f} ms "
            f"→ {steps * step_ref:.2f} s/image")
        speedup = steps * step_ref / sec_image

    print(json.dumps({
        "metric": f"sec/image MEASURED full-depth {steps}-step denoise "
                  f"(sd3.5-{'medium' if args.medium else 'large'}-dims {args.qtype}"
                  f"{'→w8a8' if args.i8 else ''}, 1024², "
                  + ("v5e-1)" if on_tpu else "cpu-smoke)"),
        "value": round(sec_image, 3),
        "unit": "s",
        "ms_per_step": round(sec_image / steps * 1e3, 1),
        "vs_baseline": None if speedup != speedup else round(speedup, 2),
    }))


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    main()
