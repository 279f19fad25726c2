"""HyVid / LTXV / Qwen-Image pipeline smoke tests (stub encoders)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from comfyui_gguf_tpu import pipeline
from comfyui_gguf_tpu.nn.layers import QuantConfig

F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                  prefer_pallas=False)


class StubTok:
    def encode_batch(self, texts, max_length=None):
        L = max_length or 8
        return (np.zeros((len(texts), L), np.int32),
                np.ones((len(texts), L), np.int32))


@dataclasses.dataclass
class StubLLM:
    kind: str
    dim: int
    tokenizer: object = dataclasses.field(default_factory=StubTok)

    def encode(self, ids, mask=None, **kw):
        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.standard_normal((ids.shape[0], ids.shape[1],
                                             self.dim)), jnp.float32)
        return {"last_hidden": h}


@dataclasses.dataclass
class StubT5:
    dim: int
    tokenizer: object = dataclasses.field(default_factory=StubTok)

    def encode(self, ids, mask=None, **kw):
        rng = np.random.default_rng(1)
        return jnp.asarray(rng.standard_normal(
            (ids.shape[0], ids.shape[1], self.dim)), jnp.float32)


def test_hyvid_pipeline_latent():
    from tests.test_hyvid import _tiny_hyvid, TDIM, C
    from comfyui_gguf_tpu.models import hyvid

    rng = np.random.default_rng(0)
    params = {k: jnp.asarray(v) for k, v in _tiny_hyvid(rng).items()}
    cfg = hyvid.HyVidConfig.from_state_dict(params)
    model = pipeline.DiffusionModel(arch="hyvid", params=params, config=cfg,
                                    qcfg=F32)
    pipe = pipeline.HyVidPipeline(model, text=StubLLM("llama", TDIM))
    out = pipe.generate("a cat", latent_frames=3, latent_height=4,
                        latent_width=4, steps=2, max_len=6)
    assert out.shape == (3, 4, 4, C)
    assert np.isfinite(out).all()


def test_wan_pipeline_dispatch_window_identical():
    """Dispatch-window chunking (the long-dispatch-fault fix: sync every
    K steps instead of one multi-minute scan dispatch) must be pure
    scheduling — the chunked denoise equals the single-dispatch denoise,
    including a remainder window (5 steps, window 2 → 2+2+1)."""
    from comfyui_gguf_tpu.models import testing, wan

    d = testing.WanDims()
    nonblock, groups = testing.wan_shape_spec(d)
    sd = testing.random_flat_sd_from_spec(nonblock, groups, seed=2)
    params = {k: jnp.asarray(v) for k, v in sd.items()}
    model = pipeline.DiffusionModel(arch="wan", params=params,
                                    config=d.config(), qcfg=F32)
    pipe = pipeline.WanPipeline(model, t5=StubT5(d.text_dim))

    kw = dict(latent_frames=2, latent_height=4, latent_width=4, steps=5,
              cfg_scale=3.0, seed=1, max_t5_len=6)
    full = pipe.generate("a fox", dispatch_window=None, **kw)
    win = pipe.generate("a fox", dispatch_window=2, **kw)
    assert full.shape == (2, 4, 4, d.in_ch)
    np.testing.assert_allclose(win, full, rtol=1e-6, atol=1e-6)

    # window=0 means "one dispatch" (the bench/warmup CLI convention),
    # not range(.., 0) — must behave exactly like None
    win0 = pipe.generate("a fox", dispatch_window=0, **kw)
    np.testing.assert_allclose(win0, full, rtol=1e-6, atol=1e-6)

    # history-carrying samplers refuse chunking — including when they
    # arrive via the PROCESS-DEFAULT flow sampler, not the explicit
    # argument (round-5 review finding)
    with pytest.raises(ValueError, match="window"):
        pipeline._jit_cfg_denoise(lambda p, xc, ts, c: xc,
                                  np.linspace(1, 0, 6), 1.0,
                                  sampler="multistep", window=2)
    from comfyui_gguf_tpu.sampling import flow_match as fm

    fm.set_flow_sampler("multistep")
    try:
        with pytest.raises(ValueError, match="process-default"):
            pipeline._jit_cfg_denoise(lambda p, xc, ts, c: xc,
                                      np.linspace(1, 0, 6), 1.0,
                                      window=2)
    finally:
        fm.set_flow_sampler("euler")


def test_ltxv_pipeline_latent():
    from tests.test_ltxv import _tiny_ltxv
    from comfyui_gguf_tpu.models import ltxv

    rng = np.random.default_rng(1)
    params = {k: jnp.asarray(v) for k, v in _tiny_ltxv(rng).items()}
    cfg = ltxv.LTXVConfig.from_state_dict(params)
    model = pipeline.DiffusionModel(arch="ltxv", params=params, config=cfg,
                                    qcfg=F32)
    pipe = pipeline.LTXVPipeline(model, t5=StubT5(cfg.caption_dim))
    out = pipe.generate("a dog", latent_frames=2, latent_height=4,
                        latent_width=4, steps=2, cfg_scale=2.0,
                        max_t5_len=6)
    assert out.shape == (2, 4, 4, cfg.in_channels)
    assert np.isfinite(out).all()


def test_qwen_image_pipeline_latent():
    from tests.test_cosmos_qwen import _tiny_qwen
    from comfyui_gguf_tpu.models import qwen_image

    rng = np.random.default_rng(2)
    params = {k: jnp.asarray(v) for k, v in _tiny_qwen(rng).items()}
    cfg = qwen_image.QwenImageConfig.from_state_dict(params)
    model = pipeline.DiffusionModel(arch="qwen_image", params=params,
                                    config=cfg, qcfg=F32)
    pipe = pipeline.QwenImagePipeline(model,
                                      text=StubLLM("qwen", cfg.context_dim))
    out = pipe.generate("a bird", width=64, height=64, steps=2,
                        cfg_scale=2.0, max_len=6)
    assert out.shape == (16, cfg.in_channels)
    assert np.isfinite(out).all()


@dataclasses.dataclass
class StubCLIP:
    kind: str
    dim: int
    pool: int

    def encode(self, ids, **kw):
        rng = np.random.default_rng(3)
        B, L = ids.shape
        return {"last_hidden": jnp.asarray(
                    rng.standard_normal((B, L, self.dim)), jnp.float32),
                "penultimate": jnp.asarray(
                    rng.standard_normal((B, L, self.dim)), jnp.float32),
                "pooled": jnp.asarray(
                    rng.standard_normal((B, self.pool)), jnp.float32)}


def test_aura_pipeline_latent():
    from tests.test_aura import _tiny_aura, COND
    from comfyui_gguf_tpu.models import aura

    rng = np.random.default_rng(3)
    params = {k: jnp.asarray(v) for k, v in _tiny_aura(rng).items()}
    cfg = aura.AuraConfig.from_state_dict(params)
    model = pipeline.DiffusionModel(arch="aura", params=params, config=cfg,
                                    qcfg=F32)
    pipe = pipeline.AuraPipeline(model, t5=StubT5(COND))
    out = pipe.generate("x", width=64, height=64, steps=2, cfg_scale=2.0,
                        max_len=6)
    assert out.shape == (8, 8, cfg.in_channels)
    assert np.isfinite(out).all()


def test_cosmos_pipeline_latent():
    from tests.test_cosmos_qwen import _tiny_cosmos, CCTX
    from comfyui_gguf_tpu.models import cosmos

    rng = np.random.default_rng(4)
    params = {k: jnp.asarray(v) for k, v in _tiny_cosmos(rng).items()}
    cfg = cosmos.CosmosConfig.from_state_dict(params)
    model = pipeline.DiffusionModel(arch="cosmos", params=params, config=cfg,
                                    qcfg=F32)
    pipe = pipeline.CosmosPipeline(model, t5=StubT5(CCTX))
    out = pipe.generate("x", latent_frames=1, latent_height=8,
                        latent_width=8, steps=2, cfg_scale=2.0, max_len=6)
    assert out.shape == (1, 8, 8, cfg.in_channels)
    assert np.isfinite(out).all()


def test_hidream_pipeline_latent():
    from tests.test_hidream import _tiny_hidream, T5D, LLD, POOL
    from comfyui_gguf_tpu.models import hidream

    rng = np.random.default_rng(5)
    params = {k: jnp.asarray(v) for k, v in _tiny_hidream(rng).items()}
    cfg = hidream.HiDreamConfig.from_state_dict(params)
    model = pipeline.DiffusionModel(arch="hidream", params=params,
                                    config=cfg, qcfg=F32)
    half = POOL // 2
    pipe = pipeline.HiDreamPipeline(
        model, clip_l=StubCLIP("clip_l", 24, half),
        clip_g=StubCLIP("clip_g", 32, POOL - half),
        t5=StubLLM("t5", T5D), llama=StubLLM("llama", LLD))
    ids = jnp.zeros((1, 6), jnp.int32)
    out = pipe.generate_from_ids(ids, ids, ids, ids, width=64, height=64,
                                 steps=2)
    assert out.shape == (8, 8, cfg.in_channels)
    assert np.isfinite(out).all()


def test_load_vae_detects_families(tmp_path):
    import torch
    from safetensors.torch import save_file

    from comfyui_gguf_tpu.pipeline import load_vae

    wan = {"decoder.middle.0.residual.0.gamma": torch.zeros(4),
           "decoder.conv1.weight": torch.zeros(8, 4, 3, 3, 3)}
    f1 = str(tmp_path / "wan.safetensors")
    save_file(wan, f1)
    kind, params, cfg = load_vae(f1)
    assert kind == "wan" and cfg.z_channels == 4

    hy = {"vae.decoder.mid_block.resnets.0.norm1.weight": torch.zeros(4),
          "vae.decoder.conv_in.conv.weight": torch.zeros(8, 5, 3, 3, 3)}
    f2 = str(tmp_path / "hy.safetensors")
    save_file(hy, f2)
    kind, params, cfg = load_vae(f2)
    assert kind == "hyvid" and cfg.z_channels == 5
    assert "decoder.conv_in.conv.weight" in params  # prefix stripped

    # diffusers-format IMAGE VAE also carries decoder.mid_block.* but has
    # 4-D convs — must be rejected with guidance, not decoded as hyvid
    img = {"decoder.mid_block.resnets.0.norm1.weight": torch.zeros(4),
           "decoder.conv_in.weight": torch.zeros(8, 4, 3, 3)}
    f3 = str(tmp_path / "img_diffusers.safetensors")
    save_file(img, f3)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="diffusers-format"):
        load_vae(f3)


def test_ltxv_pipeline_pixels():
    """LTXVPipeline emits PIXELS when a VAE is attached (VERDICT r1
    item 7 / PARITY gap 3 closed)."""
    from tests.test_ltxv import _tiny_ltxv
    from tests.test_ltxv_vae import _tiny_sd as _tiny_vae
    from comfyui_gguf_tpu.models import ltxv

    rng = np.random.default_rng(3)
    params = {k: jnp.asarray(v) for k, v in _tiny_ltxv(rng).items()}
    cfg = ltxv.LTXVConfig.from_state_dict(params)
    vae = _tiny_vae(rng, lat=cfg.in_channels)
    model = pipeline.DiffusionModel(arch="ltxv", params=params, config=cfg,
                                    qcfg=F32)
    pipe = pipeline.LTXVPipeline(model, t5=StubT5(cfg.caption_dim),
                                 vae_params=vae)
    out = pipe.generate("a dog", latent_frames=2, latent_height=2,
                        latent_width=2, steps=2, cfg_scale=1.0,
                        max_t5_len=6)
    assert out.shape == (1 + 8 * 1, 2 * 32, 2 * 32, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_qwen_image_edit_pipeline():
    """generate_edit: reference latents ride the image stream (frame-1+
    rope ids), velocity sliced back to the generation span; the
    references must INFLUENCE the output (joint attention sees them) and
    identical refs must reproduce identical results."""
    from tests.test_cosmos_qwen import _tiny_qwen
    from comfyui_gguf_tpu.models import qwen_image

    rng = np.random.default_rng(3)
    params = {k: jnp.asarray(v) for k, v in _tiny_qwen(rng).items()}
    cfg = qwen_image.QwenImageConfig.from_state_dict(params)
    model = pipeline.DiffusionModel(arch="qwen_image", params=params,
                                    config=cfg, qcfg=F32)
    pipe = pipeline.QwenImagePipeline(model,
                                      text=StubLLM("qwen", cfg.context_dim))
    c_lat = cfg.in_channels // 4
    ref_a = rng.standard_normal((8, 8, c_lat)).astype(np.float32)
    ref_b = rng.standard_normal((8, 8, c_lat)).astype(np.float32)

    out_a = pipe.generate_edit("make it red", ref_a, width=64, height=64,
                               steps=2, cfg_scale=2.0, max_len=6, seed=1)
    out_a2 = pipe.generate_edit("make it red", ref_a, width=64, height=64,
                                steps=2, cfg_scale=2.0, max_len=6, seed=1)
    out_b = pipe.generate_edit("make it red", ref_b, width=64, height=64,
                               steps=2, cfg_scale=2.0, max_len=6, seed=1)
    assert out_a.shape == (16, cfg.in_channels)
    assert np.isfinite(out_a).all()
    np.testing.assert_array_equal(out_a, out_a2)
    assert not np.allclose(out_a, out_b)  # the reference conditions it

    # two references: both spans concatenated, distinct frame indices
    out_two = pipe.generate_edit("merge", [ref_a, ref_b], width=64,
                                 height=64, steps=2, cfg_scale=1.0,
                                 max_len=6, seed=1)
    assert out_two.shape == (16, cfg.in_channels)
    assert np.isfinite(out_two).all()
