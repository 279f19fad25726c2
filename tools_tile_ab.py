"""Model-level tile/flash A/B ladder runner (round-2 provenance).

The acceptance protocol for kernel knobs: measure the FULL-model step,
never the isolated kernel (ops/autotune.py docstring). This script ran
the round-2 ladder (687 -> 554 ms; docs/NOTES_ROUND2.md); edit the
configs list at the bottom to run new candidates on chip."""

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

    results = {}
    set_tiles(tiles_D())
    results["D"] = measure("D kt512+wide-rt1024 (baseline)")

    m = tiles_D()
    m.update({key_of(n): (512, 1536, 512) for n in K3072})
    set_tiles(m)
    results["E_kt1536_K3072"] = measure("E kt=1536 on K=3072 shapes")

    set_tiles(tiles_D())
    attn.FLASH_BLOCK_Q, attn.FLASH_BLOCK_K = 768, 768
    results["F_flash768"] = measure("F flash (768,768)")

    attn.FLASH_BLOCK_Q, attn.FLASH_BLOCK_K = 512, 1536
    results["G_flash_512_1536"] = measure("G flash (512,1536)")

    attn.FLASH_BLOCK_Q, attn.FLASH_BLOCK_K = 512, 512
    best = min(results, key=results.get)
    log(f"BEST: {best}  {results}")
    print(results)


if __name__ == "__main__":
    main()
