"""A/B round 3: config D baseline vs deeper k-tiles and flash-attention
block variants. Run on chip."""

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
from comfyui_gguf_tpu.ops import qmatmul


def log(m):
    print(m, file=sys.stderr, flush=True)


SHAPES = {
    "qkv": (9216, 3072), "proj": (3072, 3072),
    "mlp0": (12288, 3072), "mlp2": (3072, 12288),
    "mod_d": (18432, 3072), "lin1": (21504, 3072),
    "lin2": (3072, 15360), "mod_s": (9216, 3072),
}
WIDE = {"qkv", "mlp0", "mod_d", "lin1", "mod_s"}
K3072 = {k for k, (r, kk) in SHAPES.items() if kk == 3072}
M = 4608


def key_of(n):
    R, K = SHAPES[n]
    kp = -(-K // 512) * 512
    return qmatmul.shape_key(M, kp // 2, R, "nib4")


def tiles_D():
    m = {key_of(n): (512, 512, 512) for n in SHAPES}
    m.update({key_of(n): (512, 512, 1024) for n in WIDE})
    return m


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

    def tiles_E():
        m = tiles_D()
        m.update({key_of(n): (512, 1536, 512) for n in K3072})
        return m

    results = {}
    set_tiles(tiles_E())
    results["E"] = measure("E (baseline: kt1536 K=3072, kt512 K-heavy)")

    m = tiles_E()
    m.update({key_of(n): (512, 1536, 512)
              for n in ("mlp2", "lin2")})
    set_tiles(m)
    results["H_kt1536_all"] = measure("H kt=1536 on K-heavy too")

    m = tiles_E()
    m.update({key_of("mlp2"): (512, 3072, 512),
              key_of("lin2"): (512, 2560, 512)})
    set_tiles(m)
    results["I_deepest"] = measure("I kt=3072 mlp2 / 2560 lin2")

    m = tiles_E()
    m.update({key_of(n): (512, 1536, 1024) for n in K3072 & WIDE})
    set_tiles(m)
    results["J_kt1536_rt1024"] = measure("J kt1536+rt1024 wide")

    best = min(results, key=results.get)
    log(f"BEST: {best}  {results}")
    print(results)


if __name__ == "__main__":
    main()
