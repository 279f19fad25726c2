"""Model-level attention A/B: flash vs splash at full flux depth.

Acceptance protocol (ops/autotune.py): kernel-level wins are candidates
only — this measures the FULL-model step with each attention impl.
Kernel-level result (tools_attn_ab.py): splash bq=512/full-kv ~0.4 ms
faster per call x 57 calls/step => up to ~20 ms/step candidate win.

Run on chip: python tools_attn_model_ab.py
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models import flux, testing
from comfyui_gguf_tpu.nn import attention as attn
from comfyui_gguf_tpu.nn.layers import QuantConfig


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    dims = testing.FLUX_DEV_DIMS
    t0 = time.perf_counter()
    sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    jax.block_until_ready(sparams)
    log(f"params in {time.perf_counter()-t0:.0f}s")
    cfg = dims.config()
    inputs = testing.flux_example_inputs(dims, batch=1, h_lat=128,
                                         w_lat=128, txt_len=512)
    img, img_ids, txt, txt_ids, t, y, g = inputs
    qcfg = QuantConfig()

    def measure(tag):
        @jax.jit
        def fwd(sparams, img, txt):
            tt = jnp.full((img.shape[0],), 1.0, jnp.float32)
            return flux.forward_stacked(sparams, cfg, img, img_ids, txt,
                                        txt_ids, tt, y, g, qcfg=qcfg)

        tc = time.perf_counter()
        out = fwd(sparams, img, txt)
        out.block_until_ready()
        log(f"{tag}: compile {time.perf_counter()-tc:.0f}s")
        ts = []
        for _ in range(5):
            tr = time.perf_counter()
            fwd(sparams, img, txt).block_until_ready()
            ts.append(time.perf_counter() - tr)
        med = statistics.median(ts)
        log(f"{tag}: step {med*1e3:.1f} ms "
            f"({[round(x*1e3,1) for x in ts]})")
        return med, out

    results = {}
    attn.ATTN_IMPL = "flash"
    results["flash"], out_flash = measure("flash (512,512) baseline")

    attn.ATTN_IMPL = "splash"
    results["splash"], out_splash = measure("splash bq512/full-kv")

    # numerics guard: both are exact softmax-attention, difference should
    # be bf16-accumulation-level only
    d = jnp.max(jnp.abs(out_flash.astype(jnp.float32)
                        - out_splash.astype(jnp.float32)))
    s = jnp.max(jnp.abs(out_flash.astype(jnp.float32)))
    log(f"max |flash - splash| = {float(d):.4g} (scale {float(s):.4g})")

    attn.ATTN_IMPL = "flash"
    best = min(results, key=results.get)
    log(f"BEST: {best}  "
        f"{ {k: round(v*1e3, 1) for k, v in results.items()} }")
    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
