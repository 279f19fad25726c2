"""Model-level tile A/B at full depth (round 2).

Round-1 rule: accept tuned tiles only on a model-step win. This re-runs
the wide-r-tile and deep-k-tile candidates against the scalar-prefetch
indexed kernel path (the VMEM picture changed: no more sliced-weight
double buffers).

Run on chip: python tools_tile_ab.py
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
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.ops import qmatmul


def log(m):
    print(m, file=sys.stderr, flush=True)


# flux-dev matmul shapes (R, K) at M=4608
SHAPES = {
    "qkv": (9216, 3072), "proj": (3072, 3072),
    "mlp0": (12288, 3072), "mlp2": (3072, 12288),
    "mod_d": (18432, 3072), "lin1": (21504, 3072),
    "lin2": (3072, 15360), "mod_s": (9216, 3072),
}
WIDE = {"qkv", "mlp0", "mod_d", "lin1", "mod_s"}
M = 4608


def keys_for(names):
    out = []
    for n in names:
        R, K = SHAPES[n]
        kp = -(-K // 512) * 512
        out.append(qmatmul.shape_key(M, kp // 2, R, "nib4"))
    return out


def set_tiles(mapping):
    qmatmul.SHAPE_TILES.clear()
    qmatmul.SHAPE_TILES.update(mapping)
    qmatmul.pallas_qmm.clear_cache()
    qmatmul.pallas_qmm_indexed.clear_cache()


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
        fwd(sparams, img, txt).block_until_ready()
        log(f"{tag}: compile {time.perf_counter()-tc:.0f}s")
        ts = []
        for _ in range(5):
            tr = time.perf_counter()
            fwd(sparams, img, txt).block_until_ready()
            ts.append(time.perf_counter() - tr)
        med = statistics.median(ts)
        log(f"{tag}: step {med*1e3:.1f} ms "
            f"({[round(x*1e3,1) for x in ts]})")
        return med

    results = {}
    set_tiles({k: (512, 512, 512) for k in keys_for(SHAPES)})
    results["C_kt512"] = measure("C all kt=512 (+fused epilogue)")

    m = {k: (512, 512, 512) for k in keys_for(SHAPES)}
    m.update({k: (512, 512, 1024) for k in keys_for(WIDE)})
    set_tiles(m)
    results["D_kt512_wide_rt1024"] = measure("D kt=512 + wide rt=1024")

    m = {k: (512, 256, 1024) for k in keys_for(WIDE)}
    set_tiles(m)
    results["B_wide_rt1024"] = measure("B wide rt=1024 (+fused epilogue)")

    best = min(results, key=results.get)
    log(f"BEST: {best}  {results}")
    print(results)


if __name__ == "__main__":
    main()
