"""Conv-path A/B: is an im2col-int8 conv worth building for the UNets?

VERDICT r4 weak item 5: SD1/SDXL run dense-bf16 convs (loader planarizes
2-D projections only) and sdxl w8a8 measured +2% — either measure an
im2col-planar conv path or write the negative verdict. This tool
measures, at SDXL-base's three resnet 3x3 conv geometries (1024**2
generation => 128/64/32 latent grids, 320/640/1280 channels):

  A. XLA bf16 ``lax.conv_general_dilated`` (the current nn.layers.conv2d
     path — NHWC, channel-minor, MXU-tiled by XLA)
  B. im2col (conv_general_dilated_patches) + bf16 matmul — isolates the
     patch-extraction cost from the contraction
  C. im2col + the w8a8 int8-MXU kernel (quant.i8.I8Planar via
     convert_tree_i8, nn.layers.linear dispatch) — what a planar-conv
     path would run

Timing: ITERS chained iterations inside one jit (per-dispatch timing
through the tunnel is RTT-dominated), distinct perturbed inputs per rep
(tunnel memoization), median of n. Correctness: B==A tight, C~=A within
int8 tolerance, checked before timing.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


ITERS = 30

# (channels, latent grid) for SDXL-base resnet convs at 1024**2
GEOMS = [(320, 128), (640, 64), (1280, 32)]


def bench(fn, x, n=3):
    out = fn(x)
    jax.block_until_ready(out)

    @jax.jit
    def many(x):
        def body(c, _):
            o = fn(x + c * jnp.asarray(1e-6, x.dtype))
            return jnp.mean(o[..., :1]).astype(x.dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                            length=ITERS)
        return c

    variants = [x + jnp.asarray((i + 1) * 1e-3, x.dtype)
                for i in range(n + 1)]
    jax.block_until_ready(variants)
    many(variants[0]).block_until_ready()  # compile + link warm-up
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        many(variants[i + 1]).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / ITERS, out


def patches_nhwc(x):
    """3x3 SAME patches, feature dim ordered (C, kh, kw)-major —
    matches an (O, I, kh, kw) weight flattened to (O, I*9)."""
    return jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"))


def run_geom(C, HW):
    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.nn import layers
    from comfyui_gguf_tpu.quant import codecs, i8
    from comfyui_gguf_tpu.quant.planar import planarize

    rng = np.random.default_rng(C)
    x = jnp.asarray(rng.standard_normal((1, HW, HW, C)) * 0.5,
                    jnp.bfloat16)
    w = (rng.standard_normal((C, C, 3, 3)) * 0.02).astype(np.float32)
    wj = jnp.asarray(w, jnp.bfloat16)
    w2d = w.reshape(C, C * 9)  # (O, I*kh*kw), channel-major features
    pq = planarize(codecs.quantize(w2d, Q.Q8_0), Q.Q8_0, w2d.shape)
    leaf8 = convert_one(pq)
    flops = 2 * HW * HW * 9 * C * C

    def conv_a(x):
        return layers.conv2d(x, wj, padding=1)

    def im2col_b(x):
        p = patches_nhwc(x)
        return jnp.einsum("bhwk,ok->bhwo", p, wj.reshape(C, C * 9),
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)

    def im2col_c(x):
        p = patches_nhwc(x)
        B, H, W, K = p.shape
        y = layers.linear(p.reshape(B, H * W, K), leaf8)
        return y.reshape(B, H, W, C)

    t_a, o_a = bench(conv_a, x)
    t_b, o_b = bench(im2col_b, x)
    t_c, o_c = bench(im2col_c, x)

    oa = np.asarray(o_a, np.float32)
    err_b = np.abs(np.asarray(o_b, np.float32) - oa).max()
    err_c = np.abs(np.asarray(o_c, np.float32) - oa).max()
    scale = np.abs(oa).max()
    log(f"C={C:4d} {HW}x{HW}: conv {t_a*1e3:7.3f} ms "
        f"({flops/t_a/1e12:5.1f} TF/s) | im2col-bf16 {t_b*1e3:7.3f} ms "
        f"| im2col-i8 {t_c*1e3:7.3f} ms ({flops/t_c/1e12:5.1f} TOP/s) "
        f"| i8/conv {t_a/t_c:4.2f}x | err b={err_b:.3g} c={err_c:.3g} "
        f"(|y|max {scale:.3g})")
    assert err_b < 0.1 * scale, "im2col mismatch vs conv"
    assert err_c < 0.2 * scale, "i8 im2col mismatch vs conv"
    return t_a, t_b, t_c


def convert_one(pq):
    from comfyui_gguf_tpu.quant import i8

    tree = i8.convert_tree_i8({"w": pq})
    return tree["w"]


def main():
    log(f"devices: {jax.devices()}")
    tot = np.zeros(3)
    for C, HW in GEOMS:
        tot += np.asarray(run_geom(C, HW))
    log(f"TOTAL per-conv-sweep: conv {tot[0]*1e3:.3f} ms | im2col-bf16 "
        f"{tot[1]*1e3:.3f} ms | im2col-i8 {tot[2]*1e3:.3f} ms "
        f"| speedup {tot[0]/tot[2]:.2f}x")


if __name__ == "__main__":
    main()
