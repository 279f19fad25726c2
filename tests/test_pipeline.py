"""End-to-end pipeline test: prompt → tokenize → T5+CLIP encode → flux
denoise (jitted scan) → VAE decode, all tiny, all through public API."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu import pipeline
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.loader import TokenizerSpec
from comfyui_gguf_tpu.models import clip as clip_model
from comfyui_gguf_tpu.models import t5 as t5_model
from comfyui_gguf_tpu.models import testing
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.tokenizer import UnigramTokenizer

CTX, VEC = 64, 32  # flux context/vec dims; t5 d_model == CTX

F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                  prefer_pallas=False)


def _tok():
    tokens = ["<pad>", "</s>", "<unk>", "▁a", "▁cat"]
    scores = [0.0, 0.0, 0.0, -1.0, -2.0]
    types = [3, 3, 2, 1, 1]
    return UnigramTokenizer(TokenizerSpec(
        model="t5", tokens=tokens, scores=scores, token_types=types,
        eos_id=1, pad_id=0, unk_id=2))


def _tiny_t5_params(rng):
    d, ff, v = CTX, 128, 16

    def t(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)

    params = {"shared.weight": t(v, d),
              "encoder.final_layer_norm.weight": t(d) + 1}
    for i in range(2):
        p = f"encoder.block.{i}."
        params[p + "layer.0.SelfAttention.q.weight"] = t(d, d)
        params[p + "layer.0.SelfAttention.k.weight"] = t(d, d)
        params[p + "layer.0.SelfAttention.v.weight"] = t(d, d)
        params[p + "layer.0.SelfAttention.o.weight"] = t(d, d)
        params[p + "layer.0.layer_norm.weight"] = t(d) + 1
        params[p + "layer.1.DenseReluDense.wi_0.weight"] = t(ff, d)
        params[p + "layer.1.DenseReluDense.wi_1.weight"] = t(ff, d)
        params[p + "layer.1.DenseReluDense.wo.weight"] = t(d, ff)
        params[p + "layer.1.layer_norm.weight"] = t(d) + 1
    params["encoder.block.0.layer.0.SelfAttention."
           "relative_attention_bias.weight"] = t(32, 4)
    return params


def _tiny_clip_params(rng):
    d, inter, v, maxp = 48, 96, 24, 16

    def t(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)

    params = {
        "text_model.embeddings.token_embedding.weight": t(v, d),
        "text_model.embeddings.position_embedding.weight": t(maxp, d),
        "text_model.final_layer_norm.weight": t(d) + 1,
        "text_model.final_layer_norm.bias": t(d),
        "text_projection.weight": t(VEC, d),
    }
    for i in range(2):
        p = f"text_model.encoder.layers.{i}"
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            params[f"{p}.self_attn.{n}.weight"] = t(d, d)
            params[f"{p}.self_attn.{n}.bias"] = t(d)
        params[f"{p}.layer_norm1.weight"] = t(d) + 1
        params[f"{p}.layer_norm1.bias"] = t(d)
        params[f"{p}.layer_norm2.weight"] = t(d) + 1
        params[f"{p}.layer_norm2.bias"] = t(d)
        params[f"{p}.mlp.fc1.weight"] = t(inter, d)
        params[f"{p}.mlp.fc1.bias"] = t(inter)
        params[f"{p}.mlp.fc2.weight"] = t(d, inter)
        params[f"{p}.mlp.fc2.bias"] = t(d)
    return params


@pytest.fixture(scope="module")
def flux_pipe():
    rng = np.random.default_rng(0)
    dims = testing.TinyFluxDims(ctx=CTX, vec=VEC)
    sd = testing.flux_state_dict(dims, seed=1)
    params = testing.quantize_flux_params(sd, qtype=Q.Q8_0)
    model = pipeline.DiffusionModel(
        arch="flux", params=params, config=dims.config(), qcfg=F32)

    t5p = _tiny_t5_params(rng)
    t5e = pipeline.TextEncoder(
        "t5", t5p, t5_model.T5Config.from_state_dict(t5p), _tok(), F32)
    clp = _tiny_clip_params(rng)
    clip_cfg = dataclasses.replace(
        clip_model.CLIPTextConfig.from_state_dict(clp), n_heads=4)
    cle = pipeline.TextEncoder("clip_l", clp, clip_cfg, _tok(), F32)
    return pipeline.FluxPipeline(model, t5e, cle)


def test_generate_latent(flux_pipe):
    out = flux_pipe.generate("a cat", width=64, height=64, steps=2,
                             max_t5_len=8)
    assert out.shape == (8, 8, 4)  # latent (no VAE attached)
    assert np.isfinite(out).all()


def test_generate_deterministic_per_seed(flux_pipe):
    a = flux_pipe.generate("a cat", width=64, height=64, steps=2, seed=7,
                           max_t5_len=8)
    b = flux_pipe.generate("a cat", width=64, height=64, steps=2, seed=7,
                           max_t5_len=8)
    c = flux_pipe.generate("a cat", width=64, height=64, steps=2, seed=8,
                           max_t5_len=8)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_lora_lifecycle_changes_output(flux_pipe, tmp_path):
    import safetensors.torch
    import torch

    base = flux_pipe.generate("a cat", width=64, height=64, steps=2,
                              max_t5_len=8)
    rng = np.random.default_rng(9)
    key = "double_blocks.0.img_attn.qkv"
    mangled = "lora_unet_" + key.replace(".", "_")
    lora_sd = {
        mangled + ".lora_up.weight": torch.from_numpy(
            (rng.standard_normal((3 * 128, 4)) * 0.5).astype(np.float32)),
        mangled + ".lora_down.weight": torch.from_numpy(
            (rng.standard_normal((4, 128)) * 0.5).astype(np.float32)),
        mangled + ".alpha": torch.tensor(4.0),
    }
    lp = tmp_path / "lora.safetensors"
    safetensors.torch.save_file(lora_sd, str(lp))

    flux_pipe.model.apply_lora(str(lp), strength=1.0)
    patched = flux_pipe.generate("a cat", width=64, height=64, steps=2,
                                 max_t5_len=8)
    flux_pipe.model.unapply_loras()
    restored = flux_pipe.generate("a cat", width=64, height=64, steps=2,
                                  max_t5_len=8)

    assert not np.allclose(base, patched)
    np.testing.assert_array_equal(base, restored)


def test_img2img_requires_vae(flux_pipe):
    with pytest.raises(ValueError, match="VAE"):
        flux_pipe.generate("a cat", width=64, height=64, steps=2,
                           max_t5_len=8,
                           init_image=np.zeros((64, 64, 3), np.float32),
                           denoise=0.5)


def test_kontext_ref_latents(flux_pipe):
    """Kontext editing: reference latents condition the output (joint
    attention sees the appended span), results are seed-deterministic,
    and txt2img behavior is unchanged when no refs are passed."""
    rng = np.random.default_rng(11)
    c_lat = flux_pipe.model.config.in_channels // 4
    ref_a = rng.standard_normal((8, 8, c_lat)).astype(np.float32)
    ref_b = rng.standard_normal((8, 8, c_lat)).astype(np.float32)

    base = flux_pipe.generate("a cat", width=64, height=64, steps=2,
                              seed=5, max_t5_len=8)
    # bare ndarray (not a list): must normalize, not hit numpy truthiness
    a1 = flux_pipe.generate("a cat", width=64, height=64, steps=2, seed=5,
                            max_t5_len=8, ref_latents=ref_a)
    a2 = flux_pipe.generate("a cat", width=64, height=64, steps=2, seed=5,
                            max_t5_len=8, ref_latents=[ref_a])
    b = flux_pipe.generate("a cat", width=64, height=64, steps=2, seed=5,
                           max_t5_len=8, ref_latents=[ref_b])
    assert a1.shape == base.shape
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, base)
    assert not np.allclose(a1, b)

    with pytest.raises(ValueError, match="VAE"):
        flux_pipe.generate("a cat", width=64, height=64, steps=2,
                           max_t5_len=8,
                           ref_images=[np.zeros((64, 64, 3), np.float32)])


def test_flux_per_call_sampler(flux_pipe):
    """Per-call flow sampler selection: different integrators give
    different (finite) endpoints at 2 steps; unknown names raise."""
    base = flux_pipe.generate("a cat", width=64, height=64, steps=2,
                              seed=3, max_t5_len=8)
    upc = flux_pipe.generate("a cat", width=64, height=64, steps=2,
                             seed=3, max_t5_len=8, sampler="uni_pc")
    assert np.isfinite(upc).all()
    assert not np.allclose(base, upc)
    with pytest.raises(ValueError, match="unknown flow sampler"):
        flux_pipe.generate("a cat", width=64, height=64, steps=2,
                           max_t5_len=8, sampler="nope")


def test_stacked_model_forward_and_lora_guard(flux_pipe, tmp_path):
    """DiffusionModel.forward on a stacked tree routes to the scanned
    forward (previously KeyError); apply_lora on a stacked tree raises
    with guidance instead of silently attaching nothing."""
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models.flux import make_img_ids

    mdl = flux_pipe.model
    stacked = mdl.stack()
    assert stacked.is_stacked and not mdl.is_stacked

    rng = np.random.default_rng(0)
    L, C = 16, mdl.config.in_channels
    img = jnp.asarray(rng.standard_normal((1, L, C)), jnp.float32)
    ids = jnp.asarray(make_img_ids(4, 4, 1))
    txt = jnp.asarray(rng.standard_normal((1, 8, mdl.config.context_dim)),
                      jnp.float32)
    tids = jnp.zeros((1, 8, 3), jnp.int32)
    t = jnp.asarray([0.5], jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, mdl.config.vec_dim)),
                    jnp.float32)
    g = jnp.asarray([4.0], jnp.float32)

    a = mdl.forward(img, ids, txt, tids, t, y, g)
    b = stacked.forward(img, ids, txt, tids, t, y, g)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-2,
                               atol=2e-2)

    with pytest.raises(ValueError, match="before"):
        stacked.apply_lora(str(tmp_path / "nope.safetensors"))
