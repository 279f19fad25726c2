"""CLIP text encoder parity vs HF transformers (torch CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from comfyui_gguf_tpu.models import clip
from comfyui_gguf_tpu.nn.layers import QuantConfig

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


@pytest.fixture(scope="module")
def hf_clip():
    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, max_position_embeddings=32,
        hidden_act="quick_gelu", projection_dim=48,
        eos_token_id=98,  # EOT = highest id, matching real CLIP vocab layout
    )
    torch.manual_seed(0)
    return transformers.CLIPTextModelWithProjection(cfg).eval()


def test_clip_parity(hf_clip):
    import dataclasses

    sd = {k: v.numpy() for k, v in hf_clip.state_dict().items()}
    params = {k: jnp.asarray(v) for k, v in sd.items()}
    cfg = clip.CLIPTextConfig.from_state_dict(params)
    assert cfg.n_layers == 3 and cfg.hidden == 64
    assert cfg.act == "quick_gelu"
    # head-dim-64 inference only holds for real checkpoints; tiny config
    # uses 16-dim heads
    cfg = dataclasses.replace(cfg, n_heads=4)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 98, size=(2, 13)).astype(np.int64)
    ids[:, -1] = 98  # EOT = highest id
    out = clip.encode(params, cfg, jnp.asarray(ids), qcfg=F32CFG)

    with torch.no_grad():
        hf = hf_clip(input_ids=torch.from_numpy(ids))
    np.testing.assert_allclose(
        np.asarray(out["last_hidden"]),
        hf.last_hidden_state.numpy(), rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), hf.text_embeds.numpy(),
        rtol=2e-3, atol=2e-3,
    )


def test_open_clip_remap():
    rng = np.random.default_rng(1)
    D = 8
    sd = {
        "token_embedding.weight": rng.standard_normal((10, D)),
        "positional_embedding": rng.standard_normal((4, D)),
        "transformer.resblocks.0.ln_1.weight": np.ones(D),
        "transformer.resblocks.0.attn.in_proj_weight":
            rng.standard_normal((3 * D, D)),
        "transformer.resblocks.0.attn.in_proj_bias":
            rng.standard_normal(3 * D),
        "transformer.resblocks.0.attn.out_proj.weight":
            rng.standard_normal((D, D)),
        "transformer.resblocks.0.mlp.c_fc.weight":
            rng.standard_normal((4 * D, D)),
        "ln_final.weight": np.ones(D),
    }
    out = clip.remap_open_clip(sd)
    assert "text_model.embeddings.token_embedding.weight" in out
    assert "text_model.encoder.layers.0.layer_norm1.weight" in out
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in out
    assert out["text_model.encoder.layers.0.self_attn.q_proj.weight"].shape \
        == (D, D)
    assert "text_model.encoder.layers.0.mlp.fc1.weight" in out
    assert "text_model.final_layer_norm.weight" in out
    np.testing.assert_array_equal(
        np.concatenate([
            out["text_model.encoder.layers.0.self_attn.q_proj.weight"],
            out["text_model.encoder.layers.0.self_attn.k_proj.weight"],
            out["text_model.encoder.layers.0.self_attn.v_proj.weight"],
        ]),
        sd["transformer.resblocks.0.attn.in_proj_weight"],
    )
