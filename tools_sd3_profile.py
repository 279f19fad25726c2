"""Full-depth sd3.5-large xplane profile: where do the 526 ms/step go?

Builds the stacked 38-joint-block model once, times a single forward, then
captures a device trace and prints top-op + per-module totals
(tools/read_xplane) — the same methodology tools_profile_full.py used to
find flux's copy/fusion overheads.

Run on the chip: python tools_sd3_profile.py
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models import sd3, testing
from comfyui_gguf_tpu.nn.layers import QuantConfig


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    t0 = time.perf_counter()
    if on_tpu:
        dims = testing.SD35_LARGE_DIMS
        h_lat = w_lat = 128
        ctx_len = 154
    else:
        dims = testing.TinySD3Dims(depth=3)
        h_lat = w_lat = 8
        ctx_len = 8
    sparams = testing.sd3_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    jax.block_until_ready(sparams)
    log(f"params in {time.perf_counter()-t0:.0f}s")
    cfg = dims.config()
    latent, context, pooled, _t = testing.sd3_example_inputs(
        dims, h_lat=h_lat, w_lat=w_lat, ctx_len=ctx_len)
    qcfg = QuantConfig(prefer_pallas=on_tpu)

    @jax.jit
    def fwd(sparams, x, context):
        tt = jnp.full((x.shape[0],), 1.0, jnp.float32)
        return sd3.forward_stacked(sparams, cfg, x, context, pooled, tt,
                                   qcfg=qcfg)

    t0 = time.perf_counter()
    fwd(sparams, latent, context).block_until_ready()
    log(f"compile+run {time.perf_counter()-t0:.0f}s")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fwd(sparams, latent, context).block_until_ready()
        ts.append(time.perf_counter() - t0)
    log(f"step {statistics.median(ts)*1e3:.1f} ms "
        f"(runs {[round(x*1e3, 1) for x in ts]})")

    from comfyui_gguf_tpu.tools.read_xplane import module_ms, summarize

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            fwd(sparams, latent, context).block_until_ready()
        rows = summarize(td, top_n=28)
        mods = module_ms(td)
    print("== top ops (one full-depth sd3 forward) ==")
    for r in rows:
        print(f"{r['ms']:9.2f} ms  x{r['count']:<5d} {r['op']}")
    print("== module totals ==")
    for name, (ms, n) in sorted(mods.items(), key=lambda kv: -kv[1][0]):
        print(f"{ms:9.1f} ms  x{n}  {name[:80]}")


if __name__ == "__main__":
    import os

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    main()
