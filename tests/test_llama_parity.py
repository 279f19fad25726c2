"""Llama text-encoder parity vs HF transformers through the full GGUF
pipeline, including the llama.cpp GQA permutation round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_clip_loader, to_jax_params
from comfyui_gguf_tpu.maps import LLAMA_SD_MAP
from comfyui_gguf_tpu.models import llama
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.quant import codecs

# loader hardcodes (32, 8) GQA un-permute for arch "llama"
# (reference loader.py:399); head_dim 4 keeps the model tiny
N_HEADS, N_KV, HEAD_DIM, HID = 32, 8, 4, 128

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)

_INV = sorted(((dst, src) for src, dst in LLAMA_SD_MAP.items()),
              key=lambda p: -len(p[0]))


def hf_to_gguf_key(k: str) -> str:
    for dst, src in _INV:
        k = k.replace(dst, src)
    return k


def llamacpp_permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """Forward permutation applied by llama.cpp convert scripts."""
    r = w.shape[0]
    return (w.reshape(n_head, 2, r // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=120, hidden_size=HID, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=N_HEADS,
        num_key_value_heads=N_KV, head_dim=HEAD_DIM,
        rope_theta=500000.0, rms_norm_eps=1e-5, max_position_embeddings=64,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.LlamaModel(cfg).eval()


def _write_gguf(model, path, qtype):
    w = GGUFWriter("llama")
    for name, tensor in model.state_dict().items():
        if "rotary_emb" in name:
            continue
        arr = tensor.detach().float().numpy()
        full = "model." + name if not name.startswith("model.") else name
        if full.endswith(("q_proj.weight", "q_proj.bias")):
            arr = llamacpp_permute(arr, N_HEADS)
        elif full.endswith(("k_proj.weight", "k_proj.bias")):
            arr = llamacpp_permute(arr, N_KV)
        gname = hf_to_gguf_key(full)
        if qtype is not None and arr.ndim == 2 and arr.shape[1] % 64 == 0 \
                and "norm" not in gname and "token_embd" not in gname:
            w.add_tensor(gname, codecs.quantize(arr, qtype), raw_dtype=qtype,
                         raw_shape=arr.shape)
        else:
            w.add_tensor(gname, arr.astype(np.float32))
    w.write_to_file(str(path))


def test_llama_key_remap_roundtrip():
    assert hf_to_gguf_key("model.layers.3.self_attn.q_proj.weight") \
        == "blk.3.attn_q.weight"
    assert hf_to_gguf_key("model.embed_tokens.weight") == "token_embd.weight"
    assert hf_to_gguf_key("model.norm.weight") == "output_norm.weight"


@pytest.mark.parametrize("qtype", [None, Q.Q8_0])
def test_llama_parity(hf_model, tmp_path, qtype):
    p = tmp_path / f"llama_{qtype}.gguf"
    _write_gguf(hf_model, p, qtype)
    sd, arch, _tok = gguf_clip_loader(str(p))
    assert arch == "llama"
    params = to_jax_params(sd, F32CFG)
    cfg = llama.LlamaConfig.from_state_dict(params, n_heads=N_HEADS)
    assert cfg.n_kv_heads == N_KV and cfg.head_dim == HEAD_DIM
    assert cfg.n_layers == 2

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 120, size=(2, 9)).astype(np.int32)
    out = llama.encode(params, cfg, jnp.asarray(ids), qcfg=F32CFG,
                       dtype=jnp.float32)

    with torch.no_grad():
        hf = hf_model(input_ids=torch.from_numpy(ids).long())
    want = hf.last_hidden_state.numpy()
    got = np.asarray(out["last_hidden"])
    if qtype is None:
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    else:
        a, b = got.ravel(), want.ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.999, cos


def test_qwen25_vl_mrope_parity():
    """M-RoPE vs HF Qwen2.5-VL text model: identical hidden states for
    3-D (t, h, w) position streams with a nontrivial split (vision-token
    grid positions + offset text) — locks the mrope_section semantics."""
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLTextModel,
    )

    HD = 16
    cfg = Qwen2_5_VLConfig(
        vocab_size=80, hidden_size=4 * HD, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=1_000_000.0,
        rms_norm_eps=1e-6, max_position_embeddings=128,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    )
    torch.manual_seed(1)
    hf = Qwen2_5_VLTextModel(cfg.get_text_config()).eval()

    # our params: direct HF-name mapping (qwen attention carries q/k/v
    # biases; no GQA permutation — qwen GGUFs are not llama-permuted)
    params = {}
    for name, tensor in hf.state_dict().items():
        if "rotary_emb" in name:
            continue
        params[name if name.startswith("model.") else f"model.{name}"] = \
            jnp.asarray(tensor.numpy())
    # HF names lack the "model." prefix on Qwen2_5_VLTextModel? normalize
    params = {(k if k.startswith("model.") else f"model.{k}"): v
              for k, v in params.items()}

    lcfg = llama.LlamaConfig.from_state_dict(params, n_heads=4,
                                             rope_theta=1_000_000.0)
    lcfg = __import__("dataclasses").replace(lcfg,
                                             mrope_section=(2, 3, 3),
                                             eps=1e-6)

    rng = np.random.default_rng(0)
    B, L = 1, 12
    ids = rng.integers(0, 80, (B, L))
    # position streams: 4 text tokens, a 2x3 image grid (6 tokens),
    # then 2 text tokens resuming at offset+max(grid)
    pos = np.zeros((3, B, L), np.int64)
    pos[:, 0, :4] = np.arange(4)
    grid = np.arange(6)
    pos[0, 0, 4:10] = 4
    pos[1, 0, 4:10] = 4 + grid // 3
    pos[2, 0, 4:10] = 4 + grid % 3
    pos[:, 0, 10:] = 4 + 3 + np.arange(2)[None]

    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids),
                  position_ids=torch.from_numpy(pos)
                  ).last_hidden_state.numpy()

    out = llama.encode(params, lcfg, jnp.asarray(ids), None, qcfg=F32CFG,
                       dtype=jnp.float32,
                       position_ids=jnp.asarray(pos))
    got = np.asarray(out["last_hidden"], np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
