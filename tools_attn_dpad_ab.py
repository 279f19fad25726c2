"""Kernel A/B: sub-lane head_dim flash attention vs zero-padding D→128.

sd3.5-large's joint attention (H=38, hd=64, L 4250→4608) measures
~4.91 ms/call on the flash kernel = ~42 TF/s effective, vs flux's
splash at 167 TF/s (hd=128). Hypothesis: D=64 half-fills the MXU minor
dim in both dots; zero-padding q/k/v to D=128 is EXACT (zero dims
contribute nothing to logits; padded V channels slice off) and doubles
the FLOPs but at full tile efficiency — net win iff the kernel's D=64
path is worse than 50%-efficient.

Run on the chip:  python tools_attn_dpad_ab.py [--L 4608 --H 38 --D 64]
Prints per-call times for (a) the dispatcher's current choice, (b) the
explicit flash kernel at D, (c) flash at D padded to 128, plus the
effective TF/s against the UNPADDED algorithmic FLOPs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=4608)
    ap.add_argument("--H", type=int, default=38)
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--B", type=int, default=1)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from comfyui_gguf_tpu.nn import attention as att

    B, H, L, D = args.B, args.H, args.L, args.D
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, D)),
                           jnp.bfloat16) for _ in range(3))
    flops = 4 * L * L * D * H * B  # QK + PV, unpadded

    def flash_at(dpad):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        bq = att.FLASH_BLOCK_Q
        bs = fa.BlockSizes(
            block_q=bq, block_k_major=bq, block_k=bq, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bq, block_k_dkv=bq,
            block_q_dkv=bq, block_k_major_dq=bq, block_k_dq=bq,
            block_q_dq=bq)

        @jax.jit
        def f(q, k, v):
            if dpad and D < dpad:
                pad = ((0, 0), (0, 0), (0, 0), (0, dpad - D))
                qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
            else:
                qp, kp, vp = q, k, v
            out = fa.flash_attention(qp, kp, vp, causal=False,
                                     sm_scale=D ** -0.5, block_sizes=bs)
            return out[..., :D]

        return f

    @jax.jit
    def dispatcher(q, k, v):
        return att.dot_product_attention(q, k, v)

    warmed = []

    def timeit(f, tag):
        f(q, k, v).block_until_ready()  # compile
        if not warmed:
            # FOURTH tunnel trap (found by this tool): the FIRST chained
            # timing loop in a process reads ~30x slow (~160 ms/call of
            # link warm-up absorbed into the chain); one throwaway chain
            # fixes every subsequent measurement
            x = q
            for _ in range(8):
                x = f(x, k, v)
            jax.device_get(x[0, 0, 0, :8])
            warmed.append(True)
        t0 = time.perf_counter()
        x = q
        for i in range(args.reps):
            x = f(x, k, v).astype(jnp.bfloat16)
        jax.device_get(x[0, 0, 0, :8])
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{tag:28s} {dt * 1e3:8.3f} ms/call   "
              f"{flops / dt / 1e12:6.1f} TF/s (unpadded flops)",
              file=sys.stderr, flush=True)
        return dt

    print(f"B{B} H{H} L{L} D{D}; {flops / 1e9:.1f} GFLOP/call",
          file=sys.stderr, flush=True)
    t_disp = timeit(dispatcher, "dispatcher (current)")
    t_d = timeit(flash_at(None), f"flash D={D}")
    t_128 = timeit(flash_at(128), "flash D->128 zero-pad")

    # exactness of the pad trick at this geometry
    a = np.asarray(flash_at(None)(q, k, v), np.float32)
    b = np.asarray(flash_at(128)(q, k, v), np.float32)
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    print(f"pad-vs-native rel L2: {rel:.2e}", file=sys.stderr)

    import json

    print(json.dumps({"L": L, "H": H, "D": D,
                      "dispatcher_ms": round(t_disp * 1e3, 3),
                      "flash_native_ms": round(t_d * 1e3, 3),
                      "flash_dpad128_ms": round(t_128 * 1e3, 3),
                      "rel_l2": float(rel)}))


if __name__ == "__main__":
    main()
