"""END-TO-END prompt→image bench: tokenize → T5-xxl encode → CLIP-L
encode → 20-step denoise → VAE decode, each stage timed separately on
chip at flux-dev 1024² dims (VERDICT r3 item 2 — the headline sec/image
previously excluded text-encode and VAE decode; the reference's
user-visible metric is the whole image, reference nodes.py:149-177
feeding a complete ComfyUI pipeline).

Stages run SEQUENTIALLY with explicit free between models (T5-xxl Q8_0
~4.7 GB + flux w8a8 ~12 GB don't fit one 16 GB chip together — the same
residency reality ComfyUI's model management handles by offload,
reference nodes.py:80-119). Reported total = sum of stage medians, the
serial pipeline cost of one image.

Weights are random at the exact packed HBM layout (throughput is
content-independent); the tokenizer stage runs our real unigram
tokenizer over a synthetic 32k-piece vocab (host-side, reported for
completeness).

Usage: python tools_e2e_bench.py [steps=20] [reps=3] [--i8|--bf16]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _free(tree):
    from comfyui_gguf_tpu.lifecycle import free_tree

    free_tree(tree)


def main():
    os.environ.setdefault("GGUF_TPU_COMPILE_CACHE",
                          "/tmp/gguf_tpu_compile_cache")
    from comfyui_gguf_tpu import compile_cache
    compile_cache.enable(os.environ["GGUF_TPU_COMPILE_CACHE"])

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models import clip as clip_mod
    from comfyui_gguf_tpu.models import (flux, sd3 as sd3_mod,
                                         t5 as t5_mod, testing, vae)
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.sampling import flow_match
    from bench_util import timed_reps

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_i8 = "--bf16" not in sys.argv[1:]
    use_sd3 = "--sd3" in sys.argv[1:]  # sd3.5-large family e2e
    steps = int(argv[0]) if len(argv) > 0 else (28 if use_sd3 else 20)
    reps = int(argv[1]) if len(argv) > 1 else 3

    def log(m):
        print(m, file=sys.stderr, flush=True)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    rng = np.random.default_rng(0)

    if on_tpu:
        dims = (testing.SD35_LARGE_DIMS if use_sd3
                else testing.FLUX_DEV_DIMS)
        h_lat = w_lat = 128             # 1024² pixels
        t5_len, clip_len = (77, 77) if use_sd3 else (512, 77)
        t5_cfg = t5_mod.T5Config(d_model=4096, d_ff=10240, n_layers=24,
                                 n_heads=64, d_kv=64, vocab_size=32128)
        cl_cfg = clip_mod.CLIPTextConfig(hidden=768, n_layers=12,
                                         n_heads=12, intermediate=3072)
        vae_cfg = vae.VAEConfig()       # real flux VAE geometry
    else:  # cpu smoke
        dims = (testing.TinySD3Dims(depth=3) if use_sd3
                else testing.TinyFluxDims(depth_double=2, depth_single=2))
        h_lat = w_lat = 16
        t5_len, clip_len = 16, 8
        steps, reps = 2, 1
        t5_cfg = t5_mod.T5Config(d_model=64, d_ff=128, n_layers=2,
                                 n_heads=4, d_kv=16, vocab_size=512)
        cl_cfg = clip_mod.CLIPTextConfig(hidden=64, n_layers=2, n_heads=4,
                                         intermediate=128, vocab_size=512,
                                         eos_token_id=None)
        vae_cfg = vae.VAEConfig(z_channels=dims.in_ch, base_ch=32,
                                ch_mult=(1, 1, 1), num_res_blocks=1)

    qcfg = QuantConfig(prefer_pallas=on_tpu)
    results: dict[str, float] = {}

    # ---- stage 0: tokenize (host; real unigram tokenizer, synth vocab)
    from comfyui_gguf_tpu.loader import TokenizerSpec
    from comfyui_gguf_tpu.tokenizer import build_tokenizer

    pieces = ["<pad>", "</s>", "<unk>"] + [
        f"▁w{i}" for i in range(t5_cfg.vocab_size - 3)]
    spec = TokenizerSpec(
        model="t5", tokens=pieces,
        scores=[0.0, 0.0, 0.0] + [-float(np.log(i + 4))
                                  for i in range(len(pieces) - 3)],
        token_types=[3, 3, 2] + [1] * (len(pieces) - 3),
        eos_id=1, unk_id=2, pad_id=0)
    tok = build_tokenizer(spec)
    prompt = " ".join(f"w{rng.integers(0, 1000)}" for _ in range(60))
    tok.encode(prompt)  # warm
    tt = time.perf_counter()
    for _ in range(10):
        ids_list = tok.encode(prompt)
    results["tokenize_s"] = (time.perf_counter() - tt) / 10
    log(f"tokenize: {results['tokenize_s']*1e6:.0f} µs "
        f"({len(ids_list)} tokens)")

    # ---- stage 1: T5-xxl encode (Q8_0, BASELINE config 1 geometry)
    t0 = time.perf_counter()
    t5p = {"shared.weight": jnp.asarray(
        (rng.standard_normal((t5_cfg.vocab_size, t5_cfg.d_model)) * 0.02
         ).astype(np.float16)),
        "encoder.final_layer_norm.weight": jnp.ones(t5_cfg.d_model,
                                                    jnp.float32),
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
        ".weight": jnp.asarray(rng.standard_normal(
            (t5_cfg.rel_buckets, t5_cfg.n_heads)).astype(np.float32))}
    inner = t5_cfg.n_heads * t5_cfg.d_kv
    for i in range(t5_cfg.n_layers):
        pre = f"encoder.block.{i}."
        for name, shape in (
                ("layer.0.SelfAttention.q.weight", (inner, t5_cfg.d_model)),
                ("layer.0.SelfAttention.k.weight", (inner, t5_cfg.d_model)),
                ("layer.0.SelfAttention.v.weight", (inner, t5_cfg.d_model)),
                ("layer.0.SelfAttention.o.weight", (t5_cfg.d_model, inner)),
                ("layer.1.DenseReluDense.wi_0.weight",
                 (t5_cfg.d_ff, t5_cfg.d_model)),
                ("layer.1.DenseReluDense.wi_1.weight",
                 (t5_cfg.d_ff, t5_cfg.d_model)),
                ("layer.1.DenseReluDense.wo.weight",
                 (t5_cfg.d_model, t5_cfg.d_ff))):
            t5p[pre + name] = testing.random_planar(Q.Q8_0, shape, rng)
        for name in ("layer.0.layer_norm.weight", "layer.1.layer_norm.weight"):
            t5p[pre + name] = jnp.ones(t5_cfg.d_model, jnp.float32)
    jax.block_until_ready(jax.tree_util.tree_leaves(t5p))
    log(f"t5-xxl params in {time.perf_counter()-t0:.1f}s")

    def chained_encode_time(tag, params, encode_fn, ids, n=10):
        """Per-encode seconds via an N-chained on-device scan, synced
        with device_get on a scalar: encoder outputs are small enough
        that block_until_ready returns EARLY through the tunnel
        (observed 0.000 s reps), and a lone dispatch is RTT-dominated —
        the round-1 chained-device-timing methodology."""
        @jax.jit
        def chain(params, ids):
            def body(acc, i):
                out = encode_fn(params, jnp.roll(ids, i, axis=-1))
                return acc + out.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return acc

        jax.device_get(chain(params, ids))  # compile + warm
        ts = []
        for r in range(reps):
            idr = jnp.roll(ids, 100 + r, axis=-1)
            jax.block_until_ready(idr)
            tr = time.perf_counter()
            jax.device_get(chain(params, idr))
            ts.append((time.perf_counter() - tr) / n)
        sec = statistics.median(ts)
        log(f"{tag}: {sec*1e3:.1f} ms/encode (chained n={n}; "
            f"runs {[round(t*1e3, 2) for t in ts]})")
        return sec

    ids = jnp.asarray(rng.integers(0, t5_cfg.vocab_size,
                                   (1, t5_len)).astype(np.int32))
    results["t5_encode_s"] = chained_encode_time(
        "t5-encode", t5p,
        lambda p, i: t5_mod.encode(p, t5_cfg, i, qcfg=qcfg), ids)
    _free(t5p)
    del t5p

    # ---- stage 2: CLIP-L encode (pooled vec; safetensors-typical bf16)
    t0 = time.perf_counter()
    clp = {"text_model.embeddings.token_embedding.weight": jnp.asarray(
        (rng.standard_normal((cl_cfg.vocab_size, cl_cfg.hidden)) * 0.02
         ).astype(np.float32)),
        "text_model.embeddings.position_embedding.weight": jnp.asarray(
            rng.standard_normal((cl_cfg.max_positions, cl_cfg.hidden))
            .astype(np.float32)),
        "text_model.final_layer_norm.weight": jnp.ones(cl_cfg.hidden,
                                                       jnp.float32),
        "text_model.final_layer_norm.bias": jnp.zeros(cl_cfg.hidden,
                                                      jnp.float32)}
    for i in range(cl_cfg.n_layers):
        p = f"text_model.encoder.layers.{i}"
        for nm, shp in (("self_attn.q_proj", (cl_cfg.hidden, cl_cfg.hidden)),
                        ("self_attn.k_proj", (cl_cfg.hidden, cl_cfg.hidden)),
                        ("self_attn.v_proj", (cl_cfg.hidden, cl_cfg.hidden)),
                        ("self_attn.out_proj",
                         (cl_cfg.hidden, cl_cfg.hidden)),
                        ("mlp.fc1", (cl_cfg.intermediate, cl_cfg.hidden)),
                        ("mlp.fc2", (cl_cfg.hidden, cl_cfg.intermediate))):
            clp[f"{p}.{nm}.weight"] = jnp.asarray(
                (rng.standard_normal(shp) * 0.02).astype(np.float32))
            clp[f"{p}.{nm}.bias"] = jnp.zeros(shp[0], jnp.float32)
        for nm in ("layer_norm1", "layer_norm2"):
            clp[f"{p}.{nm}.weight"] = jnp.ones(cl_cfg.hidden, jnp.float32)
            clp[f"{p}.{nm}.bias"] = jnp.zeros(cl_cfg.hidden, jnp.float32)
    jax.block_until_ready(jax.tree_util.tree_leaves(clp))
    log(f"clip-l params in {time.perf_counter()-t0:.1f}s")

    cl_ids = jnp.asarray(rng.integers(0, cl_cfg.vocab_size,
                                      (1, clip_len)).astype(np.int32))
    results["clip_encode_s"] = chained_encode_time(
        "clip-encode", clp,
        lambda p, i: clip_mod.encode(p, cl_cfg, i, qcfg=qcfg)["pooled"],
        cl_ids)
    _free(clp)
    del clp

    # ---- stage 2b (sd3 only): CLIP-G encode (penultimate + pooled)
    if use_sd3:
        if on_tpu:
            cg_cfg = clip_mod.CLIPTextConfig(hidden=1280, n_layers=32,
                                             n_heads=20, intermediate=5120)
        else:
            cg_cfg = clip_mod.CLIPTextConfig(hidden=64, n_layers=2,
                                             n_heads=4, intermediate=128,
                                             vocab_size=512,
                                             eos_token_id=None)
        t0 = time.perf_counter()
        cgp = {"text_model.embeddings.token_embedding.weight": jnp.asarray(
            (rng.standard_normal((cg_cfg.vocab_size, cg_cfg.hidden)) * 0.02
             ).astype(np.float32)),
            "text_model.embeddings.position_embedding.weight": jnp.asarray(
                rng.standard_normal((cg_cfg.max_positions, cg_cfg.hidden))
                .astype(np.float32)),
            "text_model.final_layer_norm.weight": jnp.ones(
                cg_cfg.hidden, jnp.float32),
            "text_model.final_layer_norm.bias": jnp.zeros(
                cg_cfg.hidden, jnp.float32)}
        for i in range(cg_cfg.n_layers):
            pfx = f"text_model.encoder.layers.{i}"
            for nm, shp in (
                    ("self_attn.q_proj", (cg_cfg.hidden, cg_cfg.hidden)),
                    ("self_attn.k_proj", (cg_cfg.hidden, cg_cfg.hidden)),
                    ("self_attn.v_proj", (cg_cfg.hidden, cg_cfg.hidden)),
                    ("self_attn.out_proj", (cg_cfg.hidden, cg_cfg.hidden)),
                    ("mlp.fc1", (cg_cfg.intermediate, cg_cfg.hidden)),
                    ("mlp.fc2", (cg_cfg.hidden, cg_cfg.intermediate))):
                cgp[f"{pfx}.{nm}.weight"] = jnp.asarray(
                    (rng.standard_normal(shp) * 0.02).astype(np.float32))
                cgp[f"{pfx}.{nm}.bias"] = jnp.zeros(shp[0], jnp.float32)
            for nm in ("layer_norm1", "layer_norm2"):
                cgp[f"{pfx}.{nm}.weight"] = jnp.ones(cg_cfg.hidden,
                                                     jnp.float32)
                cgp[f"{pfx}.{nm}.bias"] = jnp.zeros(cg_cfg.hidden,
                                                    jnp.float32)
        jax.block_until_ready(jax.tree_util.tree_leaves(cgp))
        log(f"clip-g params in {time.perf_counter()-t0:.1f}s")
        cg_ids = jnp.asarray(rng.integers(
            0, cg_cfg.vocab_size, (1, clip_len)).astype(np.int32))
        results["clip_g_encode_s"] = chained_encode_time(
            "clip-g-encode", cgp,
            lambda p, i: clip_mod.encode(p, cg_cfg, i, qcfg=qcfg)["pooled"],
            cg_ids)
        _free(cgp)
        del cgp

    # ---- stage 3: denoise (the existing headline, same machinery)
    t0 = time.perf_counter()
    if use_sd3:
        sparams = testing.sd3_random_stacked_params(dims, qtype=Q.Q4_K,
                                                    seed=0)
    else:
        sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K,
                                                     seed=0)
    cfg = dims.config()
    log(f"dit params in {time.perf_counter()-t0:.1f}s")
    if use_i8:
        from comfyui_gguf_tpu.quant.i8 import (convert_tree_i8,
                                               is_modulation_key)

        t0 = time.perf_counter()
        sparams = convert_tree_i8(sparams, free_source=True,
                                  pred=lambda k, v: not is_modulation_key(k))
        jax.block_until_ready(jax.tree_util.tree_leaves(sparams))
        log(f"requantize_i8 in {time.perf_counter()-t0:.1f}s")

    if use_sd3:
        img, context, pooled, _tv = testing.sd3_example_inputs(
            dims, h_lat=h_lat, w_lat=w_lat,
            ctx_len=154 if on_tpu else 8)
        sigmas = flow_match.shift_sigmas(
            flow_match.linear_schedule(steps), 3.0)

        @jax.jit
        def denoise(sparams, x0, ctx):
            def velocity(x, sigma):
                tt = jnp.full((x.shape[0],), sigma, jnp.float32)
                return sd3_mod.forward_stacked(sparams, cfg, x, ctx,
                                               pooled, tt, qcfg=qcfg)
            return flow_match.euler_sample(velocity, x0, sigmas)

        sec, lat = timed_reps(lambda x: denoise(sparams, x, context), img,
                              reps=reps, steps=steps, tag="denoise",
                              log=log)
    else:
        img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
            dims, batch=1, h_lat=h_lat, w_lat=w_lat, txt_len=t5_len)
        sigmas = flow_match.flux_schedule(steps, img.shape[1])

        @jax.jit
        def denoise(sparams, x0, txt):
            def velocity(x, sigma):
                tt = jnp.full((x.shape[0],), sigma, jnp.float32)
                return flux.forward_stacked(sparams, cfg, x, img_ids, txt,
                                            txt_ids, tt, y, g, qcfg=qcfg)
            return flow_match.euler_sample(velocity, x0, sigmas)

        sec, lat = timed_reps(lambda x: denoise(sparams, x, txt), img,
                              reps=reps, steps=steps, tag="denoise",
                              log=log)
    results["denoise_s"] = sec
    _free(sparams)
    del sparams

    # ---- stage 4: VAE decode (real flux VAE geometry, z=16 128·(1,2,4,4))
    t0 = time.perf_counter()
    vp = testing.vae_random_params(
        z_channels=vae_cfg.z_channels, base_ch=vae_cfg.base_ch,
        ch_mult=vae_cfg.ch_mult, num_res_blocks=vae_cfg.num_res_blocks)
    vp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.ndim >= 4 else a, vp)
    jax.block_until_ready(jax.tree_util.tree_leaves(vp))
    log(f"vae params in {time.perf_counter()-t0:.1f}s")

    z = jax.random.normal(jax.random.key(0),
                          (1, h_lat, w_lat, vae_cfg.z_channels),
                          jnp.bfloat16)

    @jax.jit
    def vae_decode(params, z):
        return vae.decode_auto(params, vae_cfg, z)

    sec, img_out = timed_reps(lambda x: vae_decode(vp, x), z,
                              reps=reps, steps=1, tag="vae-decode", log=log)
    results["vae_decode_s"] = sec
    log(f"decoded image {img_out.shape}")

    total = sum(v for k, v in results.items())
    arch_lbl = "sd3.5-large-dims" if use_sd3 else "flux-dev-dims"
    enc_lbl = ("t5 + clip-l + clip-g" if use_sd3
               else "t5-xxl Q8_0 + clip-l")
    print(json.dumps({
        "metric": ("sec/image END-TO-END prompt→image (tokenize + "
                   f"{enc_lbl} + {steps}-step {arch_lbl} "
                   f"Q4_K{'→w8a8' if use_i8 else ''} denoise + VAE decode, "
                   + ("1024², v5e-1)" if on_tpu else "cpu-smoke)")),
        "value": round(total, 3),
        "unit": "s",
        **{k: round(v, 4) for k, v in results.items()},
        "denoise_pct": round(100 * results["denoise_s"] / total, 1),
        "vae_pct": round(100 * results["vae_decode_s"] / total, 1),
        "encode_pct": round(100 * (results["t5_encode_s"]
                                   + results["clip_encode_s"]
                                   + results.get("clip_g_encode_s", 0.0))
                            / total, 1),
    }))


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    sys.exit(main())
