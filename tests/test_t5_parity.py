"""End-to-end T5 parity: HF transformers (torch CPU) vs our GGUF pipeline.

Builds a tiny random T5 encoder in transformers, writes its weights to GGUF
with llama.cpp key naming (F16 and Q8_0), loads through gguf_clip_loader →
to_jax_params → models.t5.encode, and compares hidden states. This is the
model-level parity contract from SURVEY.md §4 (quantized ≈ fp within
bitwidth-dependent tolerance).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_clip_loader, to_jax_params
from comfyui_gguf_tpu.maps import T5_SD_MAP
from comfyui_gguf_tpu.models import t5
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.quant import codecs

# inverse of the loader's remap: HF name -> llama.cpp name, longest-first
_INV = sorted(((dst, src) for src, dst in T5_SD_MAP.items()),
              key=lambda p: -len(p[0]))


def hf_to_gguf_key(k: str) -> str:
    for dst, src in _INV:
        k = k.replace(dst, src)
    return k


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.T5Config(
        vocab_size=96, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(cfg).eval()
    return model


def _write_gguf(model, path, qtype):
    w = GGUFWriter("t5")
    for name, tensor in model.state_dict().items():
        arr = tensor.detach().cpu().float().numpy()
        gname = hf_to_gguf_key(name)
        if arr.ndim == 2 and qtype is not None and "norm" not in gname \
                and "rel_b" not in gname and "token_embd" not in gname:
            w.add_tensor(gname, codecs.quantize(arr, qtype), raw_dtype=qtype,
                         raw_shape=arr.shape)
        else:
            w.add_tensor(gname, arr.astype(np.float32))
    w.write_to_file(str(path))


def _run_ours(path):
    sd, arch, _tok = gguf_clip_loader(str(path))
    assert arch == "t5"
    qcfg = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                       prefer_pallas=False)
    params = to_jax_params(sd, qcfg)
    cfg = t5.T5Config.from_state_dict(params)
    assert cfg.n_layers == 2 and cfg.d_model == 64 and cfg.n_heads == 4
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 96, size=(2, 17)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 11:] = 0
    out = t5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                    qcfg=qcfg, dtype=jnp.float32)
    return ids, mask, np.asarray(out)


def _run_hf(model, ids, mask):
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state
    return out.numpy()


def test_t5_parity_f32(hf_model, tmp_path):
    p = tmp_path / "t5_f32.gguf"
    _write_gguf(hf_model, p, qtype=None)
    ids, mask, ours = _run_ours(p)
    want = _run_hf(hf_model, ids, mask)
    # compare only unmasked positions
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], want[m], rtol=2e-3, atol=2e-3)


def test_t5_parity_q8(hf_model, tmp_path):
    p = tmp_path / "t5_q8.gguf"
    _write_gguf(hf_model, p, qtype=Q.Q8_0)
    ids, mask, ours = _run_ours(p)
    want = _run_hf(hf_model, ids, mask)
    m = mask.astype(bool)
    a, b = ours[m].ravel(), want[m].ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, f"cosine {cos}"
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 0.05, f"relative L2 {rel}"
