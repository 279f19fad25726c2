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
