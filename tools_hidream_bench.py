"""Full-depth HiDream-I1 MEASURED bench — the third model family run for
real (after flux, sd3.5-large): 16 double + 32 single MoE blocks at
hidden 2560 (~17B params), Q4_K packed planar weights, 1024² latents,
an actual N-step Euler denoise as one jitted lax.scan through the
scanned stacked forward (models/hidream.py forward_stacked, dense MoE
dispatch — every expert computed, mask-weighted; the exact mode).

Usage: python tools_hidream_bench.py [steps=20] [reps=3]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
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
    from comfyui_gguf_tpu.models import hidream, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_i8 = "--i8" in sys.argv[1:]
    dense_only = "--dense-only" in sys.argv[1:]
    i8_budget = 14.4e9  # round-5 default: the f=19.8% plan, OOM-free
    # under the host-staged conversion (BASELINE.md round 5)
    for a in sys.argv[1:]:
        if a.startswith("--i8-budget="):
            i8_budget = float(a.split("=", 1)[1])
    steps = int(argv[0]) if len(argv) > 0 else 20
    reps = int(argv[1]) if len(argv) > 1 else 3

    def log(m):
        print(m, file=sys.stderr, flush=True)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        dims = testing.HIDREAM_I1_DIMS
        h_lat = w_lat = 128  # 1024² pixels
        t5_len, ll_len = 128, 128
    else:  # cpu smoke
        dims = testing.TinyHiDreamDims()
        h_lat = w_lat = 8
        t5_len, ll_len = 6, 5
        steps, reps = 2, 1

    t0 = time.perf_counter()
    sparams = testing.hidream_random_stacked_params(dims, qtype=Q.Q4_K,
                                                    seed=0)
    jax.block_until_ready(sparams)
    log(f"params in {time.perf_counter()-t0:.1f}s "
        f"({dims.depth_double}+{dims.depth_single} blocks, "
        f"{dims.n_experts}-expert MoE)")

    if use_i8:
        import logging
        logging.getLogger("comfyui_gguf_tpu.quant.i8").setLevel(
            logging.INFO)
        logging.basicConfig(stream=sys.stderr)
        from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                               is_modulation_key)

        t0 = time.perf_counter()
        # 18 GB fully-int8 > 16 GB HBM (measured OOM), and the PLANAR
        # tree is already 13.51 GB packed — the first campaign used a
        # 13.5 GB budget, which converted NOTHING (plan_i8_budget now
        # warns). Round-4: 14.4 GB (10 leaves, 19.8% of tree bytes)
        # OOM'd because the ON-DEVICE conversion transient held the full
        # planar tree + the 2.35 GB expert-stack int8 copy (~15.9 GB
        # peak); 14.0 GB (5 leaves, 11.0%) fit. Round-5: host_stage
        # frees each planar source leaf BEFORE its int8 copy exists, so
        # the device peak = the final converted footprint and the 14.4
        # budget becomes the default campaign (--i8-budget= overrides).
        sparams = convert_tree_i8(
            sparams, free_source=True,
            pred=lambda k, v: not is_modulation_key(k),
            max_bytes=int(i8_budget), host_stage=on_tpu)
        jax.block_until_ready(jax.tree_util.tree_leaves(sparams))
        log(f"requantize_i8 (budget {i8_budget / 1e9:.1f} GB, "
            f"host_stage={on_tpu}) in {time.perf_counter()-t0:.1f}s")

    cfg = dims.config()
    qcfg = QuantConfig()
    rng = jax.random.key(0)
    lat = jax.random.normal(rng, (1, h_lat, w_lat, dims.in_ch),
                            jnp.bfloat16)
    t5 = jax.random.normal(jax.random.fold_in(rng, 1),
                           (1, t5_len, dims.t5_dim), jnp.bfloat16)
    ll = jax.random.normal(jax.random.fold_in(rng, 2),
                           (1, ll_len, dims.llama_dim), jnp.bfloat16)
    pool = jax.random.normal(jax.random.fold_in(rng, 3),
                             (1, dims.pooled), jnp.bfloat16)
    sigmas = jnp.linspace(1.0, 0.0, steps + 1)

    def denoise(params, x0):
        def step(x, i):
            s, sn = sigmas[i], sigmas[i + 1]
            ts = jnp.full((1,), s, jnp.float32)
            v = hidream.forward_stacked(params, cfg, x, t5, ll, pool, ts,
                                        qcfg=qcfg)
            return (x.astype(jnp.float32)
                    + (sn - s) * v.astype(jnp.float32)).astype(x.dtype), None

        x, _ = jax.lax.scan(step, x0, jnp.arange(steps))
        return x

    results = {}
    for mode in (("dense",) if dense_only else ("dense", "capacity")):
        hidream.MOE_DISPATCH = mode
        # MOE_DISPATCH is read at trace time; a fresh jit per mode
        # forces a retrace
        dn = jax.jit(denoise)
        from bench_util import timed_reps

        sec, _ = timed_reps(lambda xr: dn(sparams, xr), lat,
                            reps=reps, steps=steps, tag=mode, log=log)
        results[mode] = sec
    hidream.MOE_DISPATCH = "dense"

    print(json.dumps({
        "metric": ("sec/image MEASURED full-depth denoise (hidream-I1 "
                   f"dims Q4_K{'→w8a8' if use_i8 else ''}, 1024², "
                   f"{steps} steps{'' if on_tpu else ', cpu-smoke'})"),
        "dense_s": round(results["dense"], 3),
        "unit": "s",
        "dense_ms_per_step": round(results["dense"] / steps * 1e3, 1),
        **({} if dense_only else {
            "capacity_s": round(results["capacity"], 3),
            "capacity_ms_per_step": round(
                results["capacity"] / steps * 1e3, 1)}),
    }))


if __name__ == "__main__":
    sys.exit(main())
