"""One-process full-depth flux profiling + A/B harness (round 2).

Builds the full 19+38-block Q4_K model ONCE, then:
  1. times a single full forward (the step cost),
  2. captures a device trace of a chained forward and prints the top ops
     + per-module totals (tools/read_xplane),
  3. optionally A/Bs knobs passed on the CLI.

Run directly on the chip: python tools_profile_full.py [trace|ab:<knob>]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models import flux, testing
from comfyui_gguf_tpu.nn.layers import QuantConfig


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build():
    t0 = time.perf_counter()
    dims = testing.FLUX_DEV_DIMS
    sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    jax.block_until_ready(sparams)
    log(f"params in {time.perf_counter()-t0:.0f}s")
    inputs = testing.flux_example_inputs(dims, batch=1, h_lat=128,
                                         w_lat=128, txt_len=512)
    return dims, sparams, inputs


def make_fwd(cfg, inputs, qcfg):
    img, img_ids, txt, txt_ids, t, y, g = inputs

    @jax.jit
    def fwd(sparams, img, txt):
        tt = jnp.full((img.shape[0],), 1.0, jnp.float32)
        return flux.forward_stacked(sparams, cfg, img, img_ids, txt,
                                    txt_ids, tt, y, g, qcfg=qcfg)

    return fwd


def time_fwd(fwd, sparams, inputs, reps=5, tag=""):
    from bench_util import timed_reps

    img = inputs[0]
    txt = inputs[2]
    med, _ = timed_reps(lambda xr: fwd(sparams, xr, txt), img,
                        reps=reps, steps=1, tag=tag, log=log)
    return med


def trace(fwd, sparams, inputs):
    from comfyui_gguf_tpu.tools.read_xplane import module_ms, summarize

    img, txt = inputs[0], inputs[2]
    # fresh input value: an identical dispatch would be value-memoized by
    # the tunnel and leave an empty device trace
    img = img + jnp.asarray(17e-3, img.dtype)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            fwd(sparams, img, txt).block_until_ready()
        rows = summarize(td, top_n=28)
        mods = module_ms(td)
    print("== top ops (one full-depth forward) ==")
    for r in rows:
        print(f"{r['ms']:9.2f} ms  x{r['count']:<5d} {r['op']}")
    print("== module totals ==")
    for name, (ms, n) in sorted(mods.items(), key=lambda kv: -kv[1][0]):
        print(f"{ms:9.1f} ms  x{n}  {name[:80]}")


def main():
    argv = [a for a in sys.argv[1:] if a != "--i8"]
    use_i8 = "--i8" in sys.argv[1:]
    mode = argv[0] if argv else "trace"
    dims, sparams, inputs = build()
    cfg = dims.config()
    qcfg = QuantConfig()

    if use_i8:
        from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                               is_modulation_key)

        t0 = time.perf_counter()
        sparams = convert_tree_i8(
            sparams, free_source=True,
            pred=lambda k, v: not is_modulation_key(k))
        jax.block_until_ready(jax.tree_util.tree_leaves(sparams))
        log(f"requantize_i8 in {time.perf_counter()-t0:.0f}s")

    fwd = make_fwd(cfg, inputs, qcfg)
    base = time_fwd(fwd, sparams, inputs, tag="base")

    if mode == "trace":
        trace(fwd, sparams, inputs)
    print(f"BASE step {base*1e3:.1f} ms")


if __name__ == "__main__":
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # the sitecustomize remote-TPU plugin overwrites jax_platforms;
        # honor an explicit CPU request (tests/conftest.py trick) — and
        # NEVER let a smoke run land on the shared chip by accident
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    main()
