"""Benchmark driver — prints ONE JSON line.

Measures the BASELINE.md headline config by RUNNING it: the full-depth
flux1-dev-shaped DiT (hidden 3072, 19 double + 38 single blocks, ~12B
params), Q4_K packed planar weights (~7 GB HBM), 1024² latents (4096 image
tokens + 512 text tokens), and an ACTUAL 20-step Euler denoise executed as
one jitted ``lax.scan`` on the chip — no per-block differencing, no
extrapolation (VERDICT r1 item 1). Block params are stacked along a depth
axis so the forward is one scanned trace per block kind
(models/flux.py forward_stacked).

The headline value is the round-3 w8a8 integer-MXU path (quant/i8.py:
per-column int8 weights + dynamic per-token int8 activations, s8xs8->s32
on the MXU at ~2x the bf16 rate; modulation projections stay planar).
The bf16 fused-dequant path (the round-2 headline) is measured in the
same process and reported as ``bf16_fused_s``; the end-to-end accuracy
cost of the 8-bit activations is reported as ``latent_rel_delta``
(relative L2 between the two paths' final latents, measured ~1%).

The reference publishes no numbers (BASELINE.md: "none published"), so
``vs_baseline`` is the speedup over the unfused dequant-then-matmul
execution the reference's algorithm maps to on the same chip (reference
dequant.py:30-44 + ops.py:244 per-forward strategy), measured at the same
full depth (single forward, scaled to 20 steps).

Weight contents are random at the exact packed HBM layout (throughput is
content-independent).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    # persistent XLA compile cache: the ~8-min full-depth compile becomes
    # a disk read on any warm re-run of this bench (same code + shapes)
    os.environ.setdefault("GGUF_TPU_COMPILE_CACHE",
                          "/tmp/gguf_tpu_compile_cache")
    from comfyui_gguf_tpu import compile_cache
    compile_cache.enable(os.environ["GGUF_TPU_COMPILE_CACHE"])

    import jax
    import jax.numpy as jnp

    # the environment's sitecustomize pre-imports jax and overwrites
    # jax.config.jax_platforms (see tests/conftest.py) — honor an
    # explicit JAX_PLATFORMS=cpu request here too
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.sampling import flow_match

    on_tpu = any(d.platform == "tpu" for d in jax.devices())

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    if on_tpu:
        dims = testing.FLUX_DEV_DIMS  # 19 + 38 blocks, hidden 3072
        batch, h_lat, w_lat, txt_len = 1, 128, 128, 512  # 1024² image
        steps, reps = 20, 3
    else:  # CPU smoke mode so the script always runs
        dims = testing.TinyFluxDims(depth_double=2, depth_single=2)
        batch, h_lat, w_lat, txt_len = 1, 16, 16, 32
        steps, reps = 2, 1

    t0 = time.perf_counter()
    sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    cfg = dims.config()
    log(f"params built in {time.perf_counter()-t0:.1f}s "
        f"({dims.depth_double}+{dims.depth_single} blocks)")

    img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
        dims, batch=batch, h_lat=h_lat, w_lat=w_lat, txt_len=txt_len)
    sigmas = flow_match.flux_schedule(steps, img.shape[1])

    def make_denoise(prefer_pallas):
        qcfg = QuantConfig(prefer_pallas=prefer_pallas)

        # params travel as a jit argument — closing over them would embed
        # the packed weights as HLO constants (blows the compile payload)
        @jax.jit
        def denoise(sparams, x0, txt):
            def velocity(x, sigma):
                tt = jnp.full((x.shape[0],), sigma, jnp.float32)
                return flux.forward_stacked(sparams, cfg, x, img_ids, txt,
                                            txt_ids, tt, y, g, qcfg=qcfg)
            return flow_match.euler_sample(velocity, x0, sigmas)

        return denoise

    from bench_util import timed_reps

    def time_fn(fn, params, reps, tag):
        return timed_reps(lambda xr: fn(params, xr, txt), img,
                          reps=reps, steps=steps, tag=tag, log=log)

    denoise = make_denoise(on_tpu)
    sec_bf16, out_bf16 = time_fn(denoise, sparams, reps, "bf16-fused")
    import numpy as np
    out_bf16 = np.asarray(out_bf16, np.float32)

    if os.environ.get("BENCH_SKIP_REF"):
        step_ref = None
    else:
        # reference algorithm at identical depth: ONE forward (XLA
        # dequantizes every weight then dots, the reference's per-forward
        # strategy), scaled to the step count
        qcfg_ref = QuantConfig(prefer_pallas=False)

        @jax.jit
        def fwd_ref(sparams, x, txt):
            tt = jnp.full((x.shape[0],), 1.0, jnp.float32)
            return flux.forward_stacked(sparams, cfg, x, img_ids, txt,
                                        txt_ids, tt, y, g, qcfg=qcfg_ref)

        step_ref, _ = timed_reps(
            lambda xr: fwd_ref(sparams, xr, txt), img,
            reps=max(1, reps - 1), steps=1, tag="ref(xla-dequant)", log=log)
        log(f"ref(xla-dequant) step {step_ref*1e3:.1f} ms "
            f"→ {steps * step_ref:.2f} s/image")

    # w8a8 integer-MXU path: convert IN PLACE (planar + int8 trees don't
    # fit HBM together at full depth), then re-measure
    from comfyui_gguf_tpu.quant.i8 import convert_tree_i8, is_modulation_key

    tc = time.perf_counter()
    sp8 = convert_tree_i8(sparams, free_source=True,
                          pred=lambda k, v: not is_modulation_key(k))
    jax.block_until_ready(jax.tree_util.tree_leaves(sp8))
    log(f"requantize_i8 took {time.perf_counter()-tc:.1f}s")
    del sparams

    sec_image, out_i8 = time_fn(denoise, sp8, reps, "w8a8")
    rel = float(np.linalg.norm(np.asarray(out_i8, np.float32) - out_bf16)
                / (np.linalg.norm(out_bf16) + 1e-9))
    log(f"w8a8 final-latent rel delta vs bf16-fused: {rel:.4f}")
    speedup = (float("nan") if step_ref is None
               else steps * step_ref / sec_image)

    print(json.dumps({
        "metric": "sec/image MEASURED full-depth 20-step denoise "
                  "(flux1-dev-dims Q4_K→w8a8 int-MXU, 1024², "
                  + ("v5e-1)" if on_tpu else "cpu-smoke)"),
        "value": round(sec_image, 3),
        "unit": "s",
        # speedup of the w8a8 integer-MXU path over the reference's
        # dequant-then-matmul algorithm on the SAME chip at the same depth
        "vs_baseline": None if speedup != speedup else round(speedup, 2),
        # the round-2 headline path, same process, for continuity
        "bf16_fused_s": round(sec_bf16, 3),
        # accuracy cost of 8-bit dynamic activations (rel L2, final latents)
        "latent_rel_delta": round(rel, 4),
    }))


if __name__ == "__main__":
    # honor JAX_PLATFORMS even though the environment's sitecustomize
    # overwrites jax.config.jax_platforms for the remote-TPU plugin
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    main()
