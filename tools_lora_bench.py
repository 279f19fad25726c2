"""LoRA epilogue overhead at FULL depth (BASELINE config 5).

Measures the real per-step cost of rank-16 patches attached to every
packed block weight, riding the zero-copy scan (stacked patches sliced
per block; base weights via scalar-prefetch). Direct measurement — no
differencing. Run on chip.

--i8: measure on the w8a8 integer-MXU path (the rank epilogue is fused
into ops/i8mm too — the rank matmuls ride the same f32 accumulator), the
round-3 VERDICT item 6 row. Timing goes through bench_util.timed_reps
(perturbed inputs — the remote tunnel value-memoizes identical
dispatches; the round-2 numbers predate that guard).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RANK = 16


def attach_stacked_lora(sparams, rng):
    """Rank-16 patches on every packed leaf of the stacked block trees
    (up/down carry the depth axis, like stack_flux_params would build
    from per-block attachments)."""
    import jax.numpy as jnp

    from comfyui_gguf_tpu import lora
    from comfyui_gguf_tpu.quant.planar import PlanarQuant

    out = dict(sparams)
    for kind in ("double_blocks", "single_blocks"):
        blk = dict(sparams[kind])
        for k, v in blk.items():
            if not isinstance(v, PlanarQuant):
                continue
            depth = v.qs.shape[0]
            R, K = v.shape
            up = jnp.asarray(rng.standard_normal(
                (depth, R, RANK)) * 0.01, jnp.bfloat16)
            down = jnp.asarray(rng.standard_normal(
                (depth, RANK, K)) * 0.01, jnp.bfloat16)
            patch = lora.LoRAPatch(up=up, down=down, mid=None, diff=None,
                                   scale=0.8)
            blk[k] = lora.PatchedWeight(v, (patch,))
        out[kind] = blk
    return out


def main():
    os.environ.setdefault("GGUF_TPU_COMPILE_CACHE",
                          "/tmp/gguf_tpu_compile_cache")
    from comfyui_gguf_tpu import compile_cache
    compile_cache.enable(os.environ["GGUF_TPU_COMPILE_CACHE"])

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from bench_util import timed_reps

    use_i8 = "--i8" in sys.argv[1:]

    def log(m):
        print(m, file=sys.stderr, flush=True)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        dims = testing.FLUX_DEV_DIMS
        h_lat = w_lat = 128
        txt_len, reps = 512, 4
    else:
        dims = testing.TinyFluxDims(depth_double=2, depth_single=2)
        h_lat = w_lat = 16
        txt_len, reps = 16, 1

    t0 = time.perf_counter()
    sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    jax.block_until_ready(sparams)
    log(f"params in {time.perf_counter()-t0:.0f}s")
    cfg = dims.config()
    img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
        dims, batch=1, h_lat=h_lat, w_lat=w_lat, txt_len=txt_len)
    qcfg = QuantConfig(prefer_pallas=on_tpu)

    # attach BEFORE i8 conversion: convert_tree_i8 converts the packed
    # base of a PatchedWeight and keeps the patches (the tested path)
    patched = attach_stacked_lora(sparams, np.random.default_rng(1))
    if use_i8:
        from comfyui_gguf_tpu import lora
        from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                               is_modulation_key)

        t0 = time.perf_counter()
        # `patched` wraps the SAME PlanarQuant leaves as `sparams`, so
        # convert once (freeing the shared planar sources) and derive the
        # un-patched tree by unwrapping the bases — one weight set in HBM
        patched = convert_tree_i8(
            patched, free_source=True,
            pred=lambda k, v: not is_modulation_key(k))
        unwrap = lambda v: v.base if isinstance(v, lora.PatchedWeight) \
            else v
        sparams = {
            k: ({kk: unwrap(vv) for kk, vv in v.items()}
                if isinstance(v, dict) else v)
            for k, v in patched.items()}
        jax.block_until_ready(jax.tree_util.tree_leaves(patched))
        log(f"requantize_i8 in {time.perf_counter()-t0:.1f}s")

    def measure(params, tag):
        @jax.jit
        def fwd(params, img):
            tt = jnp.full((img.shape[0],), 1.0, jnp.float32)
            return flux.forward_stacked(params, cfg, img, img_ids, txt,
                                        txt_ids, tt, y, g, qcfg=qcfg)

        sec, _ = timed_reps(lambda x: fwd(params, x), img,
                            reps=reps, steps=1, tag=tag, log=log)
        return sec

    base = measure(sparams, "base" + (" w8a8" if use_i8 else ""))
    lor = measure(patched, f"rank-{RANK} LoRA"
                  + (" w8a8" if use_i8 else ""))
    log(f"LoRA overhead: +{(lor-base)*1e3:.1f} ms/step "
        f"({(lor/base-1)*100:.1f}%)")
    print(json.dumps({
        "metric": ("LoRA rank-16 on every packed weight, full-depth flux "
                   f"step ({'w8a8' if use_i8 else 'nib4 planar'}"
                   + (", 1024²)" if on_tpu else ", cpu-smoke)")),
        "base_ms": round(base * 1e3, 1),
        "lora_ms": round(lor * 1e3, 1),
        "overhead_pct": round((lor / base - 1) * 100, 1),
        "unit": "ms/step",
    }))


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    main()
