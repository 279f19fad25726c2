"""Qwen2-VL vision tower (mmproj forward) vs HF transformers.

The HF ``Qwen2VisionTransformerPretrainedModel`` is an independent,
battle-tested implementation of the same published architecture; random
weights are mapped into our ``visual.*`` key naming and the full tower
forward (patch embed → rope'd blocks → 2×2 merger) is compared.

Token-order note: the HF processor feeds patches in spatial-merge-block
order and the model's ``rot_pos_emb`` assigns (row, col) ids matching that
order; our graph runs in plain raster order with raster rope/merger. The
two are permutation-equivalent — the test feeds HF the block-ordered
permutation of the same patches and compares final merged cells (both end
up in raster-over-cells order).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from comfyui_gguf_tpu.models import qwen_vl_vision as qv
from comfyui_gguf_tpu.nn.layers import QuantConfig

F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                  prefer_pallas=False)

torch.manual_seed(0)


def _block_order(hp, wp, m):
    """raster index -> position in merge-block order."""
    idx = np.arange(hp * wp).reshape(hp, wp)
    blocks = idx.reshape(hp // m, m, wp // m, m).transpose(0, 2, 1, 3)
    return blocks.reshape(-1)  # perm[i] = raster index of i-th HF token


def test_qwen2_vl_vision_tower_parity():
    mq = pytest.importorskip("transformers.models.qwen2_vl.modeling_qwen2_vl")

    D, H, OUT, DEPTH = 160, 2, 96, 2  # head_dim 80, like the real tower
    hp = wp = 4
    cfg_hf = mq.Qwen2VLVisionConfig(
        depth=DEPTH, embed_dim=D, num_heads=H, mlp_ratio=2,
        hidden_size=OUT, in_channels=3, patch_size=14,
        spatial_merge_size=2, temporal_patch_size=2)
    torch.manual_seed(1)
    model = mq.Qwen2VisionTransformerPretrainedModel(cfg_hf)
    model.eval()

    # map HF weights into our (loader-output) key naming
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = {}
    params["visual.patch_embed.proj.weight"] = sd["patch_embed.proj.weight"]
    for i in range(DEPTH):
        for src, dst in (
                ("norm1.weight", "norm1.weight"),
                ("norm1.bias", "norm1.bias"),
                ("norm2.weight", "norm2.weight"),
                ("norm2.bias", "norm2.bias"),
                ("attn.qkv.weight", "attn.qkv.weight"),
                ("attn.qkv.bias", "attn.qkv.bias"),
                ("attn.proj.weight", "attn.proj.weight"),
                ("attn.proj.bias", "attn.proj.bias"),
                ("mlp.fc1.weight", "mlp.up_proj.weight"),
                ("mlp.fc1.bias", "mlp.up_proj.bias"),
                ("mlp.fc2.weight", "mlp.down_proj.weight"),
                ("mlp.fc2.bias", "mlp.down_proj.bias"),
        ):
            params[f"visual.blocks.{i}.{dst}"] = sd[f"blocks.{i}.{src}"]
    params["visual.merger.ln_q.weight"] = sd["merger.ln_q.weight"]
    params["visual.merger.ln_q.bias"] = sd["merger.ln_q.bias"]
    params["visual.merger.mlp.0.weight"] = sd["merger.mlp.0.weight"]
    params["visual.merger.mlp.0.bias"] = sd["merger.mlp.0.bias"]
    params["visual.merger.mlp.2.weight"] = sd["merger.mlp.2.weight"]
    params["visual.merger.mlp.2.bias"] = sd["merger.mlp.2.bias"]
    jp = {k: jnp.asarray(v) for k, v in params.items()}

    rng = np.random.default_rng(2)
    feat = 3 * 2 * 14 * 14
    patches = (rng.standard_normal((hp, wp, feat)) * 0.5).astype(np.float32)

    perm = _block_order(hp, wp, 2)
    hf_in = torch.from_numpy(patches.reshape(-1, feat)[perm])
    grid = torch.tensor([[1, hp, wp]])
    with torch.no_grad():
        want = model(hf_in, grid_thw=grid).numpy()

    cfg = qv.QwenVLVisionConfig(dim=D, n_layers=DEPTH, n_heads=H,
                                out_dim=OUT, use_window_attention=False)
    got = np.asarray(qv.forward(jp, cfg, jnp.asarray(patches), qcfg=F32))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # bf16 activations inside our tower: assert agreement well inside the
    # bf16 noise floor relative to signal scale
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 0.02 * scale


def test_qwen25_vl_vision_tower_parity():
    """Qwen2.5-VL variant: window attention (112 px windows, full-attn
    block exceptions), RMS norms, biased SwiGLU MLP — vs HF
    Qwen2_5_VisionTransformerPretrainedModel with the same random
    weights. hp=wp=16 patches → 8×8 merged cells → 2×2 windows, block 0
    windowed, block 1 full."""
    mq = pytest.importorskip(
        "transformers.models.qwen2_5_vl.modeling_qwen2_5_vl")

    D, H, OUT, DEPTH = 160, 2, 96, 2
    hp = wp = 16
    cfg_hf = mq.Qwen2_5_VLVisionConfig(
        depth=DEPTH, hidden_size=D, num_heads=H, intermediate_size=320,
        in_channels=3, patch_size=14, spatial_merge_size=2,
        temporal_patch_size=2, window_size=112, out_hidden_size=OUT,
        fullatt_block_indexes=[1])
    torch.manual_seed(3)
    model = mq.Qwen2_5_VisionTransformerPretrainedModel(cfg_hf)
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = {"visual.patch_embed.proj.weight": sd["patch_embed.proj.weight"]}
    for i in range(DEPTH):
        for src, dst in (
                ("norm1.weight", "norm1.weight"),
                ("norm2.weight", "norm2.weight"),
                ("attn.qkv.weight", "attn.qkv.weight"),
                ("attn.qkv.bias", "attn.qkv.bias"),
                ("attn.proj.weight", "attn.proj.weight"),
                ("attn.proj.bias", "attn.proj.bias"),
                ("mlp.gate_proj.weight", "mlp.gate_proj.weight"),
                ("mlp.gate_proj.bias", "mlp.gate_proj.bias"),
                ("mlp.up_proj.weight", "mlp.up_proj.weight"),
                ("mlp.up_proj.bias", "mlp.up_proj.bias"),
                ("mlp.down_proj.weight", "mlp.down_proj.weight"),
                ("mlp.down_proj.bias", "mlp.down_proj.bias"),
        ):
            params[f"visual.blocks.{i}.{dst}"] = sd[f"blocks.{i}.{src}"]
    params["visual.merger.ln_q.weight"] = sd["merger.ln_q.weight"]
    for j in (0, 2):
        params[f"visual.merger.mlp.{j}.weight"] = sd[f"merger.mlp.{j}.weight"]
        params[f"visual.merger.mlp.{j}.bias"] = sd[f"merger.mlp.{j}.bias"]
    jp = {k: jnp.asarray(v) for k, v in params.items()}

    rng = np.random.default_rng(4)
    feat = 3 * 2 * 14 * 14
    patches = (rng.standard_normal((hp, wp, feat)) * 0.5).astype(np.float32)

    perm = _block_order(hp, wp, 2)
    hf_in = torch.from_numpy(patches.reshape(-1, feat)[perm])
    grid = torch.tensor([[1, hp, wp]])
    with torch.no_grad():
        want = model(hf_in, grid_thw=grid).numpy()

    cfg = qv.QwenVLVisionConfig(dim=D, n_layers=DEPTH, n_heads=H,
                                out_dim=OUT, use_window_attention=True,
                                fullatt_block_indexes=(1,))
    got = np.asarray(qv.forward(jp, cfg, jnp.asarray(patches), qcfg=F32))

    assert got.shape == want.shape
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 0.02 * scale
