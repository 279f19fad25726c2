"""Parametrized full-depth flux MEASURED bench (BASELINE configs 2 + 3).

Round 1 reported the flux1-schnell (Q4_0, 512², 4-step) and the K-quant
sweep (Q4_K/Q5_K/Q6_K at 1024²) rows from per-block differencing; this
RUNS each config for real: full 19+38 blocks, packed planar weights, one
jitted ``lax.scan`` denoise (models/flux.py forward_stacked), actual
executions timed — the same methodology bench.py uses for the headline
Q4_K row.

Usage:
  python tools_flux_bench.py --qtype Q4_0 --lat 64 --txt-len 256 --steps 4
  python tools_flux_bench.py --qtype Q5_K --steps 20 --skip-ref
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
    ap.add_argument("--lat", type=int, default=128,
                    help="latent h=w (128 → 1024² pixels, 64 → 512²)")
    ap.add_argument("--txt-len", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.sampling import flow_match

    on_tpu = any(d.platform == "tpu" for d in jax.devices())

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    if on_tpu:
        dims = testing.FLUX_DEV_DIMS
        h_lat = w_lat = args.lat
        txt_len, steps, reps = args.txt_len, args.steps, args.reps
        batch = args.batch
    else:  # CPU smoke
        dims = testing.TinyFluxDims(depth_double=2, depth_single=2)
        h_lat = w_lat = 16
        txt_len, steps, reps = 32, 2, 1
        batch = args.batch

    qtype = getattr(Q, args.qtype)
    t0 = time.perf_counter()
    sparams = testing.flux_random_stacked_params(dims, qtype=qtype, seed=0)
    cfg = dims.config()
    log(f"params built in {time.perf_counter()-t0:.1f}s "
        f"({dims.depth_double}+{dims.depth_single} blocks, {args.qtype})")

    img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
        dims, batch=batch, h_lat=h_lat, w_lat=w_lat, txt_len=txt_len)
    sigmas = flow_match.flux_schedule(steps, img.shape[1])

    qcfg = QuantConfig(prefer_pallas=on_tpu)

    @jax.jit
    def denoise(sparams, x0, txt):
        def velocity(x, sigma):
            tt = jnp.full((x.shape[0],), sigma, jnp.float32)
            return flux.forward_stacked(sparams, cfg, x, img_ids, txt,
                                        txt_ids, tt, y, g, qcfg=qcfg)
        return flow_match.euler_sample(velocity, x0, sigmas)

    tc = time.perf_counter()
    denoise(sparams, img, txt).block_until_ready()
    log(f"fused compile+first-run {time.perf_counter()-tc:.1f}s")
    times = []
    for _ in range(reps):
        tr = time.perf_counter()
        denoise(sparams, img, txt).block_until_ready()
        times.append(time.perf_counter() - tr)
    sec_image = statistics.median(times)
    log(f"fused {steps}-step denoise: {sec_image:.3f}s "
        f"({sec_image/steps*1e3:.1f} ms/step; "
        f"runs {[round(x, 3) for x in times]})")

    speedup = float("nan")
    if not args.skip_ref:
        qcfg_ref = QuantConfig(prefer_pallas=False)

        @jax.jit
        def fwd_ref(sparams, x, txt):
            tt = jnp.full((x.shape[0],), 1.0, jnp.float32)
            return flux.forward_stacked(sparams, cfg, x, img_ids, txt,
                                        txt_ids, tt, y, g, qcfg=qcfg_ref)

        tc = time.perf_counter()
        fwd_ref(sparams, img, txt).block_until_ready()
        log(f"ref(xla-dequant) compile+first-run {time.perf_counter()-tc:.1f}s")
        rtimes = []
        for _ in range(max(1, reps - 1)):
            tr = time.perf_counter()
            fwd_ref(sparams, img, txt).block_until_ready()
            rtimes.append(time.perf_counter() - tr)
        step_ref = statistics.median(rtimes)
        log(f"ref(xla-dequant) step {step_ref*1e3:.1f} ms "
            f"→ {steps * step_ref:.2f} s/image")
        speedup = steps * step_ref / (sec_image / batch)

    px = h_lat * 8
    sec_image /= batch
    print(json.dumps({
        "metric": f"sec/image MEASURED full-depth {steps}-step denoise "
                  f"(flux-dims {args.qtype}, {px}², txt {txt_len}, batch {batch}, "
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
