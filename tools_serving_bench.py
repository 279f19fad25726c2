"""Serving-engine benchmark on the real chip (VERDICT r1 item 6).

Drives ContinuousBatchEngine through pipeline.flux_engine with the
FULL-DEPTH flux model (19+38 blocks, Q4_K, stacked zero-copy scan) at
1024², records steps/s, batch occupancy, and request latency P50/P95.

Run: python tools_serving_bench.py [n_requests] [steps] [max_batch]
         [pipeline_depths, comma-sep (default "1,4")]
Prints one JSON line per pipeline depth with the serving metrics —
depth > 1 chains that many dispatches per host sync (the tunnel pays
~0.45 s of RTT per synced tick; see serving.ContinuousBatchEngine).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from comfyui_gguf_tpu import pipeline
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models import testing
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.sampling import flow_match


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    argv = [a for a in sys.argv[1:] if a != "--i8"]
    n_req = int(argv[0]) if len(argv) > 0 else 6
    steps = int(argv[1]) if len(argv) > 1 else 8
    max_batch = int(argv[2]) if len(argv) > 2 else 2
    depths = [int(d) for d in
              (argv[3] if len(argv) > 3 else "1,4").split(",")]
    sampler = argv[4] if len(argv) > 4 else "euler"

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        dims = testing.FLUX_DEV_DIMS
        h_lat = w_lat = 128
        txt_len = 512
    else:
        dims = testing.TinyFluxDims(depth_double=2, depth_single=2)
        h_lat = w_lat = 16
        txt_len = 16

    t0 = time.perf_counter()
    params = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    jax.block_until_ready(params)
    log(f"params in {time.perf_counter()-t0:.0f}s")

    model = pipeline.DiffusionModel(arch="flux", params=params,
                                    config=dims.config(),
                                    qcfg=QuantConfig())
    use_i8 = "--i8" in sys.argv[1:]
    if use_i8:
        t0 = time.perf_counter()
        model = model.requantize_i8()
        jax.block_until_ready(jax.tree_util.tree_leaves(model.params))
        log(f"requantize_i8 in {time.perf_counter()-t0:.0f}s")
    eng = pipeline.flux_engine(model, h_lat, w_lat, txt_len,
                               max_batch=max_batch, sampler=sampler)

    rng = np.random.default_rng(0)
    L = (h_lat // 2) * (w_lat // 2)
    sigmas = flow_match.flux_schedule(steps, L)

    def cond(seed):
        r = np.random.default_rng(seed)
        return {
            "txt": r.standard_normal((txt_len, dims.ctx)).astype(
                np.float32),
            "y": r.standard_normal((dims.vec,)).astype(np.float32),
            "guidance": np.float32(4.0),
        }

    # warm the jit for each batch bucket before timing
    t0 = time.perf_counter()
    warm = [eng.submit(rng.standard_normal((L, dims.in_ch)).astype(
        np.float32), cond(99), sigmas[:2]) for _ in range(max_batch)]
    eng.run_until_drained(timeout_s=3600)
    log(f"warmup (compile) {time.perf_counter()-t0:.0f}s")
    eng.stats.__init__()  # reset counters after warmup

    for depth in depths:
        eng.pipeline_depth = depth
        eng.stats.__init__()
        reqs = []
        t_start = time.perf_counter()
        for i in range(n_req):
            lat = rng.standard_normal((L, dims.in_ch)).astype(np.float32)
            reqs.append(eng.submit(lat, cond(i), sigmas))
        eng.run_until_drained(timeout_s=3600)
        wall = time.perf_counter() - t_start

        for r in reqs:
            assert r.error is None, r.error
            assert r.result is not None
        snap = eng.stats.snapshot()
        lats = sorted(r.latency_s for r in reqs)
        p50 = lats[len(lats) // 2]
        p95 = lats[min(len(lats) - 1, int(0.95 * len(lats)))]

        out = {
            "config": f"flux-dev-dims Q4_K{'→w8a8' if use_i8 else ''}"
                      f" 1024² serving, {n_req} req × "
                      f"{steps} steps, max_batch {max_batch}, "
                      f"pipeline_depth {depth}, sampler {sampler}"
                      + ("" if on_tpu else " (cpu-smoke)"),
            "wall_s": round(wall, 2),
            "steps_per_second": snap["steps_per_second"],
            "mean_batch_occupancy": snap["mean_batch_occupancy"],
            "latency_p50_s": round(p50, 2),
            "latency_p95_s": round(p95, 2),
            "throughput_img_per_s": round(n_req / wall, 3),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    main()
