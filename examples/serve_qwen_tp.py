"""Example: serve Qwen-Image-20B tensor-parallel over a TPU mesh.

The 20B is the one allowlist model a single 16 GB chip cannot hold in
the w8a8 integer-MXU format (15.29 GB planar → ~20 GB int8). At tp=2
the spec-driven sharder (parallel/tp_spec) splits every block weight's
EXISTING packed GGUF blocks per shard (~7.6 GB planar / ~10.2 GB int8
per chip — see tp_spec.i8_plan_report), and the unmodified qwen_image
forward serves through one shard_map.

    python examples/serve_qwen_tp.py \
        --unet qwen-image-Q4_K_S.gguf --tp 2 [--i8] \
        --txt-states ctx.npy --prompt-tokens 512 --size 1024

Text conditioning: pass precomputed Qwen2.5-VL hidden states (--txt-
states, (L, 3584) .npy) or the engine runs on random states (--smoke) —
the text tower loads exactly as in examples/generate_flux.py's T5 flow.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--unet", required=True)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--i8", action="store_true",
                    help="requantize each shard to the w8a8 int-MXU "
                         "format (per-shard scales)")
    ap.add_argument("--txt-states")
    ap.add_argument("--prompt-tokens", type=int, default=512)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true",
                    help="random text states (layout/perf check)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from comfyui_gguf_tpu import loader, pipeline
    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models.qwen_image import QwenImageConfig
    from comfyui_gguf_tpu.parallel import tp_spec
    from comfyui_gguf_tpu.sampling import linear_schedule

    devs = jax.devices()
    if len(devs) < args.tp:
        print(f"error: tp={args.tp} needs {args.tp} devices, have "
              f"{len(devs)}", file=sys.stderr)
        return 1
    mesh = Mesh(np.array(devs[: args.tp]), (tp_spec.AXIS,))

    sd = loader.gguf_sd_loader(args.unet)
    cfg = QwenImageConfig.from_state_dict(sd)
    # Build (and optionally convert) the sharded tree on the HOST cpu
    # backend: the whole point of tp=2 is that one chip cannot hold the
    # 20B (~15.3 GB planar / ~20 GB int8) — the default-device build
    # would land it all on device 0 before placement. place_tp_params
    # then streams each shard to its mesh device; the per-chip peak is
    # the final per-shard footprint.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
        print("warning: no cpu backend — building on the default device "
              "(fine for small models, OOMs at 20B/tp<4)",
              file=sys.stderr)
    import contextlib

    with (jax.default_device(cpu) if cpu is not None
          else contextlib.nullcontext()):
        # the sharder consumes the QTensors directly: quantized weights
        # split their existing packed blocks, no decode/re-encode
        params = tp_spec.shard_qwen_image_params(sd, cfg, args.tp,
                                                 Q.Q4_K)
        if args.i8:
            from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                                   is_modulation_key)

            # host_stage keeps the dequant+requant in numpy and the
            # results on the host until placement
            params = convert_tree_i8(
                params, free_source=True,
                pred=lambda k, v: not is_modulation_key(k),
                host_stage=True)
    params = tp_spec.place_tp_params(params, mesh,
                                     ("transformer_blocks",))

    from comfyui_gguf_tpu.nn.layers import QuantConfig

    model = pipeline.DiffusionModel(
        arch="qwen_image", params=params, config=cfg,
        qcfg=QuantConfig(prefer_pallas=any(d.platform == "tpu"
                                           for d in devs)))

    h_tok = w_tok = args.size // 16  # 8x VAE, 2x2 patch
    if args.txt_states:
        txt = np.load(args.txt_states).astype(np.float32)
    elif args.smoke:
        txt = np.random.default_rng(0).standard_normal(
            (args.prompt_tokens, cfg.context_dim)).astype(np.float32)
    else:
        print("error: need --txt-states or --smoke", file=sys.stderr)
        return 1

    eng = pipeline.qwen_image_engine(model, h_tok, w_tok, txt.shape[0],
                                     max_batch=2, mesh=mesh)
    x0 = np.asarray(jax.random.normal(
        jax.random.key(args.seed),
        (h_tok * w_tok, cfg.in_channels)), np.float32)
    req = eng.submit(x0, {"txt": txt}, linear_schedule(args.steps))
    eng.run_until_drained()
    lat = np.asarray(req.result)
    print(f"latent tokens: {lat.shape}, finite={np.isfinite(lat).all()}")
    np.save("qwen_latent.npy", lat)
    return 0


if __name__ == "__main__":
    sys.exit(main())
