"""Round-2 late A/B on chip: splash attention + fused LoRA epilogue.

One full-depth flux param build, three measured configs:
  1. base     — flash(512,512) attention, no LoRA  (control, expect ~554 ms)
  2. splash   — splash kernel bq=512/bkv=full/compute=1536
  3. lora     — rank-16 patches on every packed weight, FUSED epilogue
                (unfused round-2 measurement was +77.5 ms; docs/NOTES_ROUND2)

Timed calls perturb the input per run (distinct executions) to sidestep
any result memoization in the tunnel (tools_attn_ab.py observation).
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models import flux, testing
from comfyui_gguf_tpu.nn import attention as attn
from comfyui_gguf_tpu.nn.layers import QuantConfig
from tools_lora_bench import attach_stacked_lora


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

    def measure(params, tag):
        @jax.jit
        def fwd(params, img, txt):
            tt = jnp.full((img.shape[0],), 1.0, jnp.float32)
            return flux.forward_stacked(params, cfg, img, img_ids, txt,
                                        txt_ids, tt, y, g, qcfg=qcfg)

        tc = time.perf_counter()
        fwd(params, img, txt).block_until_ready()
        log(f"{tag}: compile {time.perf_counter()-tc:.0f}s")
        ts = []
        for i in range(5):
            imgi = img + (i + 1) * 1e-6
            jax.block_until_ready(imgi)
            tr = time.perf_counter()
            fwd(params, imgi, txt).block_until_ready()
            ts.append(time.perf_counter() - tr)
        med = statistics.median(ts)
        log(f"{tag}: step {med*1e3:.1f} ms "
            f"({[round(x*1e3,1) for x in ts]})")
        return med

    results = {}
    attn.ATTN_IMPL = "flash"
    results["base_flash"] = measure(sparams, "base flash")

    attn.ATTN_IMPL = "splash"
    results["splash"] = measure(sparams, "splash bq512/full-kv/c1536")

    attn.ATTN_IMPL = "flash"
    patched = attach_stacked_lora(sparams, np.random.default_rng(1))
    results["lora_fused"] = measure(patched, "rank-16 LoRA fused epilogue")

    log(f"splash delta: {(results['splash']-results['base_flash'])*1e3:+.1f}"
        f" ms; lora overhead: "
        f"{(results['lora_fused']-results['base_flash'])*1e3:+.1f} ms "
        f"(unfused was +77.5)")
    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
