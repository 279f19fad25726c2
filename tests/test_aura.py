"""AuraFlow DiT tests (tiny config through GGUF)."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import aura
from comfyui_gguf_tpu.nn.layers import QuantConfig

HID, COND, C, DD, DS, REG = 256, 64, 4, 2, 2, 3
MLP = 2 * HID

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _tiny_aura(rng):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "init_x_linear.weight": t(HID, C * 4),
        "init_x_linear.bias": t(HID),
        "positional_encoding": t(1, 64, HID),
        "register_tokens": t(1, REG, HID),
        "cond_seq_linear.weight": t(HID, COND),
        "t_embedder.mlp.0.weight": t(HID, 256),
        "t_embedder.mlp.0.bias": t(HID),
        "t_embedder.mlp.2.weight": t(HID, HID),
        "t_embedder.mlp.2.bias": t(HID),
        "modF.1.weight": t(2 * HID, HID),
        "modF.1.bias": t(2 * HID),
        "final_linear.weight": t(C * 4, HID),
    }

    def mlp(prefix):
        return {
            f"{prefix}.c_fc1.weight": t(MLP, HID),
            f"{prefix}.c_fc2.weight": t(MLP, HID),
            f"{prefix}.c_proj.weight": t(HID, MLP),
        }

    for i in range(DD):
        p = f"double_layers.{i}"
        sd[f"{p}.modC.1.weight"] = t(6 * HID, HID)
        sd[f"{p}.modX.1.weight"] = t(6 * HID, HID)
        for w in ("w1q", "w1k", "w1v", "w1o", "w2q", "w2k", "w2v", "w2o"):
            sd[f"{p}.attn.{w}.weight"] = t(HID, HID)
        sd.update(mlp(f"{p}.mlpC"))
        sd.update(mlp(f"{p}.mlpX"))
    for i in range(DS):
        p = f"single_layers.{i}"
        sd[f"{p}.modCX.1.weight"] = t(6 * HID, HID)
        for w in ("w1q", "w1k", "w1v", "w1o"):
            sd[f"{p}.attn.{w}.weight"] = t(HID, HID)
        sd.update(mlp(f"{p}.mlp"))
    return sd


@pytest.fixture(scope="module")
def aura_params(tmp_path_factory):
    sd = _tiny_aura(np.random.default_rng(0))
    p = tmp_path_factory.mktemp("aura") / "a.gguf"
    w = GGUFWriter("aura")
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k, v)
    w.write_to_file(str(p))
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "aura"
    return to_jax_params(raw, F32CFG)


def test_aura_config(aura_params):
    cfg = aura.AuraConfig.from_state_dict(aura_params)
    assert cfg.hidden == HID
    assert cfg.depth_double == DD and cfg.depth_single == DS
    assert cfg.in_channels == C
    assert cfg.n_register_tokens == REG
    assert cfg.n_heads == 1  # 256-dim heads


def test_aura_forward(aura_params):
    cfg = aura.AuraConfig.from_state_dict(aura_params)
    rng = np.random.default_rng(1)
    B, H, W = 2, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, 7, COND)), jnp.float32)
    t = jnp.asarray([1.0, 0.2], jnp.float32)
    out = aura.forward(aura_params, cfg, lat, cond, t, qcfg=F32CFG)
    assert out.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(out)).all()
