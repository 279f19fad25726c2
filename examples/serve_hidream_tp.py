"""Example: serve HiDream-I1 (17B MoE) tensor-parallel over a TPU mesh.

One 16 GB chip holds HiDream's planar tree (13.51 GB measured) but caps
the w8a8 conversion at ~20% of tree bytes (full int8 ≈ 18 GB). At tp=2
the spec-driven sharder (parallel/tp_spec.hidream_rules) splits every
block weight's EXISTING packed GGUF blocks per shard — per-expert MoE
SwiGLUs included — and the FULL tree converts to the int-MXU format at
~9.0 GB/shard (tp_spec.i8_plan_report / `tools.tp_plan --arch
hidream`); the unmodified hidream forward serves through one shard_map.

    python examples/serve_hidream_tp.py \
        --unet hidream-i1-Q4_K_S.gguf --tp 2 [--i8] --smoke \
        --size 1024 --steps 16

Text conditioning: HiDream takes quad-encoder states (t5 + llama taps +
pooled clip); pass precomputed .npy states (--t5-states/--llama-states/
--pooled) or run --smoke on random states (layout/perf check).
"""

from __future__ import annotations

import argparse
import contextlib
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--unet", required=True)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--i8", action="store_true",
                    help="requantize each shard to the w8a8 int-MXU "
                         "format (per-shard scales); at tp>=2 the FULL "
                         "tree converts — no single-chip budget cap")
    ap.add_argument("--t5-states")
    ap.add_argument("--llama-states")
    ap.add_argument("--pooled")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true",
                    help="random encoder states (layout/perf check)")
    args = ap.parse_args()

    import jax

    from comfyui_gguf_tpu import loader, pipeline
    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models.hidream import HiDreamConfig
    from comfyui_gguf_tpu.parallel import tp_spec
    from comfyui_gguf_tpu.sampling import linear_schedule
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < args.tp:
        print(f"error: tp={args.tp} needs {args.tp} devices, have "
              f"{len(devs)}", file=sys.stderr)
        return 1
    mesh = Mesh(np.array(devs[: args.tp]), (tp_spec.AXIS,))

    sd = loader.gguf_sd_loader(args.unet)
    cfg = HiDreamConfig.from_state_dict(sd)
    # Build (and optionally convert) on the HOST cpu backend so the
    # default device never holds the whole tree + transient; shards
    # stream to their mesh devices at placement (same pattern as
    # examples/serve_qwen_tp.py — see the comment there).
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
        print("warning: no cpu backend — building on the default device",
              file=sys.stderr)
    with (jax.default_device(cpu) if cpu is not None
          else contextlib.nullcontext()):
        params = tp_spec.shard_hidream_params(sd, cfg, args.tp, Q.Q4_K)
        if args.i8:
            from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                                   is_modulation_key)

            params = convert_tree_i8(
                params, free_source=True,
                pred=lambda k, v: not is_modulation_key(k),
                host_stage=True)
    block_keys = ("double_stream_blocks", "single_stream_blocks")
    params = tp_spec.place_tp_params(params, mesh, block_keys)

    from comfyui_gguf_tpu.nn.layers import QuantConfig

    model = pipeline.DiffusionModel(
        arch="hidream", params=params, config=cfg,
        qcfg=QuantConfig(prefer_pallas=any(d.platform == "tpu"
                                           for d in devs)))

    lat = args.size // 8  # 8x VAE; the model patchifies 2x2 internally
    rng = np.random.default_rng(args.seed)

    def states(path, shape):
        if path:
            return np.load(path).astype(np.float32)
        if args.smoke:
            return rng.standard_normal(shape).astype(np.float32)
        print("error: need encoder-state .npys or --smoke",
              file=sys.stderr)
        raise SystemExit(1)

    # published HiDream-I1 conditioning widths (t5-xxl 4096 / llama
    # 4096 / pooled 2048); smoke shapes follow the checkpoint's own
    # caption-projection input dims — projections 0..N-2 take llama
    # taps, the LAST takes t5 (models/hidream.py _prelude ordering)
    n_proj = 0
    while f"caption_projection.{n_proj}.linear.weight" in sd:
        n_proj += 1
    t5_dim = sd[f"caption_projection.{n_proj - 1}.linear.weight"].shape[1]
    ll_dim = sd["caption_projection.0.linear.weight"].shape[1]
    pooled_dim = sd["p_embedder.mlp.0.weight"].shape[1]
    cond = {"t5": states(args.t5_states, (128, t5_dim)),
            "llama": states(args.llama_states, (128, ll_dim)),
            "pooled": states(args.pooled, (pooled_dim,))}

    eng = pipeline.hidream_engine(model, max_batch=2, mesh=mesh)
    x0 = np.asarray(jax.random.normal(
        jax.random.key(args.seed),
        (lat, lat, cfg.in_channels)), np.float32)
    req = eng.submit(x0, cond, linear_schedule(args.steps))
    eng.run_until_drained()
    if req.error is not None:
        print(f"error: {req.error}", file=sys.stderr)
        return 1
    out = np.asarray(req.result)
    print(f"latent: {out.shape}, finite={np.isfinite(out).all()}")
    np.save("hidream_latent.npy", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
