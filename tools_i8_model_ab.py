"""Full-depth flux A/B: bf16 fused-dequant path vs the w8a8 integer-MXU
path (quant/i8.py + ops/i8mm.py), measured on the chip.

Runs the exact bench.py methodology (19+38 blocks, one jitted lax.scan
20-step denoise), then converts the tree IN PLACE (free_source — both
trees don't fit HBM at full depth) and re-measures. Also reports the
end-to-end latent delta between the two paths (the accuracy cost of
8-bit dynamic activations) and times the conversion itself.

  python tools_i8_model_ab.py                 # mod projections stay planar
  python tools_i8_model_ab.py --all-i8        # convert everything
  python tools_i8_model_ab.py --lat 64 --steps 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qtype", default="Q4_K")
    ap.add_argument("--lat", type=int, default=128)
    ap.add_argument("--txt-len", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all-i8", action="store_true",
                    help="convert modulation projections too (default: "
                         "keep the M=1 BW-bound mod weights planar)")
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--i8attn", choices=("", "qk", "pv"), default="",
                    help="route joint attention through the int8 kernel "
                         "(ops/i8attn) in the w8a8 row")
    args = ap.parse_args()

    os.environ.setdefault("GGUF_TPU_COMPILE_CACHE",
                          "/tmp/gguf_tpu_compile_cache")
    from comfyui_gguf_tpu import compile_cache
    compile_cache.enable(os.environ["GGUF_TPU_COMPILE_CACHE"])

    import jax
    import jax.numpy as jnp
    import numpy as np

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.quant.i8 import convert_tree_i8
    from comfyui_gguf_tpu.sampling import flow_match

    on_tpu = any(d.platform == "tpu" for d in jax.devices())

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    if on_tpu:
        dims = testing.FLUX_DEV_DIMS
        h_lat = w_lat = args.lat
        txt_len, steps, reps = args.txt_len, args.steps, args.reps
    else:
        dims = testing.TinyFluxDims(depth_double=2, depth_single=2)
        h_lat = w_lat = 16
        txt_len, steps, reps = 32, 2, 1

    qtype = getattr(Q, args.qtype)
    t0 = time.perf_counter()
    sparams = testing.flux_random_stacked_params(dims, qtype=qtype, seed=0)
    cfg = dims.config()
    log(f"params built in {time.perf_counter()-t0:.1f}s")

    img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
        dims, batch=1, h_lat=h_lat, w_lat=w_lat, txt_len=txt_len)
    sigmas = flow_match.flux_schedule(steps, img.shape[1])
    qcfg = QuantConfig(prefer_pallas=on_tpu)

    from comfyui_gguf_tpu.nn.attention import attention_i8

    @jax.jit
    def denoise(sp, x0, txt):
        def velocity(x, sigma):
            tt = jnp.full((x.shape[0],), sigma, jnp.float32)
            return flux.forward_stacked(sp, cfg, x, img_ids, txt,
                                        txt_ids, tt, y, g, qcfg=qcfg)
        return flow_match.euler_sample(velocity, x0, sigmas)

    @jax.jit
    def denoise_i8attn(sp, x0, txt):
        # attention_i8 is read at TRACE time; entering it inside the
        # jitted body guarantees the traced graph carries the int8 path
        with attention_i8(args.i8attn):
            def velocity(x, sigma):
                tt = jnp.full((x.shape[0],), sigma, jnp.float32)
                return flux.forward_stacked(sp, cfg, x, img_ids, txt,
                                            txt_ids, tt, y, g, qcfg=qcfg)
            return flow_match.euler_sample(velocity, x0, sigmas)

    from bench_util import timed_reps

    def timed(sp, tag, fn=None):
        fn = fn or denoise
        med, out = timed_reps(lambda xr: fn(sp, xr, txt), img,
                              reps=reps, steps=steps, tag=tag, log=log)
        return med, np.asarray(out, np.float32)

    sec_bf16, out_bf16 = (None, None)
    if not args.skip_bf16:
        sec_bf16, out_bf16 = timed(sparams, "bf16-fused")

    pred = None
    if not args.all_i8:
        from comfyui_gguf_tpu.quant.i8 import is_modulation_key

        # adaLN modulation projections only ever see M=batch rows:
        # BW-bound, so int8's ~8 bpw loses to 4.5-bpw planar there
        pred = lambda k, v: not is_modulation_key(k)
    tc = time.perf_counter()
    sp8 = convert_tree_i8(sparams, free_source=True, pred=pred)
    jax.block_until_ready(jax.tree_util.tree_leaves(sp8))
    log(f"requantize_i8 (free_source, pred={'all' if args.all_i8 else 'no-mod'}) "
        f"took {time.perf_counter()-tc:.1f}s")
    del sparams

    if args.i8attn:
        sec_i8, out_i8 = timed(sp8, f"w8a8+i8attn[{args.i8attn}]",
                               fn=denoise_i8attn)
    else:
        sec_i8, out_i8 = timed(sp8, "w8a8")

    rel = None
    if out_bf16 is not None:
        rel = float(np.linalg.norm(out_i8 - out_bf16)
                    / (np.linalg.norm(out_bf16) + 1e-9))
        log(f"final-latent rel delta w8a8 vs bf16: {rel:.4f}")

    print(json.dumps({
        "metric": f"sec/image w8a8 full-depth {steps}-step "
                  f"(flux-dims {args.qtype}->i8, {h_lat*8}², "
                  + ("v5e-1)" if on_tpu else "cpu-smoke)"),
        "value": round(sec_i8, 3),
        "unit": "s",
        "ms_per_step": round(sec_i8 / steps * 1e3, 1),
        "bf16_fused_s": None if sec_bf16 is None else round(sec_bf16, 3),
        "speedup_vs_bf16": None if sec_bf16 is None
        else round(sec_bf16 / sec_i8, 3),
        "latent_rel_delta": rel,
        "mod_planar": not args.all_i8,
        "i8attn": args.i8attn or None,
    }))


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    main()
