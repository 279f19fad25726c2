"""LoRA epilogue overhead at FULL depth (BASELINE config 5, round 2).

Measures the real per-step cost of rank-16 patches attached to every
packed block weight, riding the zero-copy scan (stacked patches sliced
per block; base weights via scalar-prefetch). Direct measurement — no
differencing. Run on chip.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu import lora
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models import flux, testing
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.quant.planar import PlanarQuant


def log(m):
    print(m, file=sys.stderr, flush=True)


RANK = 16


def attach_stacked_lora(sparams, rng):
    """Rank-16 patches on every packed leaf of the stacked block trees
    (up/down carry the depth axis, like stack_flux_params would build
    from per-block attachments)."""
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
        for _ in range(5):
            tr = time.perf_counter()
            fwd(params, img, txt).block_until_ready()
            ts.append(time.perf_counter() - tr)
        med = statistics.median(ts)
        log(f"{tag}: step {med*1e3:.1f} ms "
            f"({[round(x*1e3,1) for x in ts]})")
        return med

    base = measure(sparams, "base")
    patched = attach_stacked_lora(sparams, np.random.default_rng(1))
    lor = measure(patched, f"rank-{RANK} LoRA on every packed weight")
    log(f"LoRA overhead: +{(lor-base)*1e3:.1f} ms/step "
        f"({(lor/base-1)*100:.1f}%)")
    print({"base_ms": round(base * 1e3, 1), "lora_ms": round(lor * 1e3, 1)})


if __name__ == "__main__":
    main()
