"""Example: continuous-batch serving of flux generation requests.

    python examples/serve_flux.py --unet flux1-dev-Q4_K_S.gguf \
        --t5 t5-xxl-Q8_0.gguf --clip-l clip_l.safetensors \
        --prompts prompts.txt --width 1024 --height 1024 --max-batch 4
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--unet", required=True)
    ap.add_argument("--t5", required=True)
    ap.add_argument("--clip-l", required=True)
    ap.add_argument("--prompts", required=True,
                    help="text file, one prompt per line")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--sampler", default="euler",
                    choices=("euler", "dpmpp_2m"),
                    help="per-lane integrator (dpmpp_2m = 2nd-order "
                         "multistep at the same cost)")
    ap.add_argument("--vae", help="ae.safetensors for --preview-every")
    ap.add_argument("--preview-every", type=int, default=0,
                    help="write a latent->RGB preview .npy every N steps")
    ap.add_argument("--t5-len", type=int, default=512)
    ap.add_argument("--i8", action="store_true",
                    help="serve on the w8a8 integer-MXU path (~1.4x "
                         "faster step, ~1%% latent delta; adaLN "
                         "projections stay planar)")
    args = ap.parse_args()

    import jax

    # the round-2 model-level A/B winners (deep k-tiles, wide r-tiles)
    # are the _pick_tiles defaults now — no overrides needed; pin
    # per-shape tables via $GGUF_TPU_TILE_CACHE for other chip gens
    from comfyui_gguf_tpu.models import flux as flux_model
    from comfyui_gguf_tpu.pipeline import (
        FluxPipeline,
        flux_engine,
    )
    from comfyui_gguf_tpu.sampling import flux_schedule

    pipe = FluxPipeline.load(args.unet, args.t5, args.clip_l)
    if pipe.t5.tokenizer is None or pipe.clip_l.tokenizer is None:
        print("error: encoder lacks an embedded tokenizer (safetensors "
              "CLIP ships no vocab) — use GGUF encoders with tokenizer "
              "metadata for this example", file=sys.stderr)
        return 1
    model = pipe.model.stack()  # depth-stacked: scanned zero-copy forward
    if args.i8:
        model = model.requantize_i8()  # in place; planar tree is freed
    h_lat, w_lat = args.height // 8, args.width // 8
    lat_c = pipe.model.config.in_channels // 4
    L_img = (h_lat // 2) * (w_lat // 2)

    previewer = on_step = None
    if args.preview_every and not args.vae:
        print("warning: --preview-every needs --vae to calibrate the "
              "latent->RGB projection; previews disabled", file=sys.stderr)
    if args.preview_every:
        # VAE-calibrated latent->RGB sketch, written every N engine ticks
        from comfyui_gguf_tpu.preview import previewer_for_vae

        if args.vae:
            from comfyui_gguf_tpu.pipeline import _load_safetensors_sd
            from comfyui_gguf_tpu.models import vae as vae_model

            import jax.numpy as jnp
            vp = {k: jnp.asarray(v)
                  for k, v in _load_safetensors_sd(args.vae).items()}
            vc = vae_model.VAEConfig.from_state_dict(vp)
            previewer = previewer_for_vae(vp, vc)

            def on_step(requests):
                for r in requests:
                    if r.step % args.preview_every:
                        continue
                    lat = flux_model.unpatchify(
                        np.asarray(r.latent)[None], h_lat, w_lat)
                    rgb = previewer(np.asarray(lat[0]))
                    np.save(f"preview_{r.request_id:03d}_{r.step:03d}.npy",
                            rgb)

    eng = flux_engine(model, h_lat, w_lat, args.t5_len,
                      max_batch=args.max_batch, sampler=args.sampler)
    eng.on_step = on_step
    eng.start()

    prompts = [ln.strip() for ln in open(args.prompts) if ln.strip()]
    sigmas = flux_schedule(args.steps, L_img)
    reqs = []
    for i, prompt in enumerate(prompts):
        ids, mask = pipe.t5.tokenizer.encode_batch([prompt],
                                                   max_length=args.t5_len)
        txt = np.asarray(pipe.t5.encode(ids, mask))[0]
        cids, _ = pipe.clip_l.tokenizer.encode_batch(
            [prompt], max_length=min(77, pipe.clip_l.config.max_positions))
        pooled = np.asarray(pipe.clip_l.encode(cids)["pooled"])[0]
        noise = np.asarray(jax.random.normal(
            jax.random.key(i), (L_img, lat_c * 4)))
        reqs.append(eng.submit(
            noise,
            {"txt": txt, "y": pooled, "guidance": np.float32(args.guidance)},
            sigmas))

    for i, r in enumerate(reqs):
        r.done_event.wait()
        lat = flux_model.unpatchify(r.result[None], h_lat, w_lat)
        np.save(f"out_{i:03d}.latent.npy", np.asarray(lat[0]))
        print(f"request {i} done")
    eng.stop()
    print(eng.stats.snapshot())


if __name__ == "__main__":
    sys.exit(main())
