"""Benchmark driver — prints ONE JSON line.

Measures the BASELINE.md headline config on the available TPU chip:
flux1-dev-shaped DiT (real dims: hidden 3072, 19 double + 38 single blocks),
Q4_K packed weights, 1024² (4096 image tokens + 512 text tokens), batch 1.
Reports estimated sec/image at 20 denoise steps: per-block times are
measured exactly (by differencing 1-block vs 2-block jitted forwards) and
summed to full depth.

The reference publishes no numbers (BASELINE.md: "none published"), so
``vs_baseline`` is the speedup of the fused Pallas path over the unfused
dequant-then-matmul execution the reference's algorithm maps to on the same
chip (reference dequant.py:30-44 + ops.py:244 per-forward strategy).

Weight contents are random at the exact packed HBM layout (throughput is
content-independent).
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    on_tpu = any(d.platform == "tpu" for d in jax.devices())

    dims = testing.FLUX_DEV_DIMS
    # two physical blocks of each kind; per-block cost from differencing
    bench_dims = dataclasses.replace(dims, depth_double=2, depth_single=2)
    n_double, n_single = dims.depth_double, dims.depth_single

    params = testing.flux_random_quant_params(bench_dims, qtype=Q.Q4_K,
                                              seed=0)

    if on_tpu:
        batch, h_lat, w_lat, txt_len = 1, 128, 128, 512  # 1024² image
        reps = 5
    else:  # CPU smoke mode so the script always runs
        batch, h_lat, w_lat, txt_len = 1, 16, 16, 32
        reps = 2
    steps_per_image = 20

    inputs = testing.flux_example_inputs(bench_dims, batch=batch,
                                         h_lat=h_lat, w_lat=w_lat,
                                         txt_len=txt_len)
    img, img_ids, txt, txt_ids, t, y, g = inputs

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    def make_fn(dd, ds, prefer_pallas):
        cfg = dataclasses.replace(bench_dims.config(), depth_double=dd,
                                  depth_single=ds)
        qcfg = QuantConfig(prefer_pallas=prefer_pallas)

        # params passed as a jit argument — closing over them would embed
        # the packed weights as HLO constants (blows the compile payload)
        @jax.jit
        def fn(params, img, txt):
            return flux.forward(params, cfg, img, img_ids, txt, txt_ids,
                                t, y, g, qcfg=qcfg)
        return fn

    def time_fn(fn, reps):
        fn(params, img, txt).block_until_ready()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(params, img, txt).block_until_ready()
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    def measure(prefer_pallas, reps, tag):
        t11 = time_fn(make_fn(1, 1, prefer_pallas), reps)
        log(f"{tag} t(1d,1s)={t11*1e3:.1f}ms")
        t21 = time_fn(make_fn(2, 1, prefer_pallas), reps)
        log(f"{tag} t(2d,1s)={t21*1e3:.1f}ms")
        t12 = time_fn(make_fn(1, 2, prefer_pallas), reps)
        log(f"{tag} t(1d,2s)={t12*1e3:.1f}ms")
        t_d = max(t21 - t11, 0.0)
        t_s = max(t12 - t11, 0.0)
        overhead = max(t11 - t_d - t_s, 0.0)
        step = overhead + n_double * t_d + n_single * t_s
        log(f"{tag} per-double={t_d*1e3:.1f}ms per-single={t_s*1e3:.1f}ms "
            f"step={step*1e3:.1f}ms")
        return step

    step_fused = measure(on_tpu, reps, "fused")
    if os.environ.get("BENCH_SKIP_REF"):
        step_ref = float("nan")
    else:
        step_ref = measure(False, max(1, reps // 2), "ref(xla-dequant)")

    sec_image = steps_per_image * step_fused
    speedup = step_ref / step_fused if step_fused > 0 else float("nan")

    print(json.dumps({
        "metric": "sec/image (flux1-dev-dims Q4_K, 1024², 20 steps, "
                  + ("v5e-1)" if on_tpu else "cpu-smoke)"),
        "value": round(sec_image, 3),
        "unit": "s",
        "vs_baseline": None if speedup != speedup else round(speedup, 2),
    }))


if __name__ == "__main__":
    main()
