"""Loader-layer tests: prefix strip, arch detect, remap, eager dequant,
planar device placement (SURVEY.md §2.2-2.4)."""

import numpy as np
import pytest

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.gguf.constants import GGUFValueType
from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu import loader as L
from comfyui_gguf_tpu.maps import T5_SD_MAP, sd_map_replace, unpermute_gqa_rows
from comfyui_gguf_tpu.quant import codecs
from comfyui_gguf_tpu.quant.planar import PlanarQuant


def _write_flux_like(path):
    w = GGUFWriter("flux")
    rng = np.random.default_rng(0)
    big = rng.standard_normal((256, 512), dtype=np.float32)
    small = rng.standard_normal((64, 128), dtype=np.float32)
    bias = rng.standard_normal((256,), dtype=np.float32)
    norm_bf16 = rng.standard_normal((64,), dtype=np.float32)
    pfx = "model.diffusion_model."
    w.add_tensor(pfx + "double_blocks.0.img_attn.proj.weight",
                 codecs.quantize(big, Q.Q4_K), raw_dtype=Q.Q4_K,
                 raw_shape=big.shape)
    w.add_tensor(pfx + "double_blocks.0.img_mod.lin.weight",
                 codecs.quantize(small, Q.Q8_0), raw_dtype=Q.Q8_0,
                 raw_shape=small.shape)
    w.add_tensor(pfx + "double_blocks.0.img_attn.proj.bias",
                 bias.astype(np.float32))
    w.add_tensor(pfx + "norm.weight", codecs.encode_BF16(norm_bf16),
                 raw_dtype=Q.BF16, raw_shape=norm_bf16.shape)
    w.write_to_file(str(path))
    return {"big": big, "small": small, "bias": bias, "norm": norm_bf16}


def test_sd_loader_prefix_arch_and_shapes(tmp_path):
    p = tmp_path / "m.gguf"
    ref = _write_flux_like(p)
    sd, arch = L.gguf_sd_loader(str(p), return_arch=True)
    assert arch == "flux"
    assert set(sd) == {
        "double_blocks.0.img_attn.proj.weight",
        "double_blocks.0.img_mod.lin.weight",
        "double_blocks.0.img_attn.proj.bias",
        "norm.weight",
    }
    qt = sd["double_blocks.0.img_attn.proj.weight"]
    assert qt.qtype == Q.Q4_K and qt.shape == (256, 512)
    # largest quantized tensor is marked (reference loader.py:134-137)
    assert qt.is_largest_weight
    # 1-D BF16 eagerly dequantized to F32 (reference loader.py:122-124)
    nw = sd["norm.weight"]
    assert nw.qtype == Q.F32
    np.testing.assert_allclose(
        nw.dequantize(), ref["norm"].astype(np.float32), atol=0.01, rtol=0.01
    )


def test_sd_loader_rejects_wrong_arch(tmp_path):
    w = GGUFWriter("t5")
    w.add_tensor("x.weight", np.zeros((4, 4), dtype=np.float32))
    p = tmp_path / "t.gguf"
    w.write_to_file(str(p))
    with pytest.raises(ValueError, match="Unexpected architecture"):
        L.gguf_sd_loader(str(p))  # text arch as image model


def test_sd_loader_compat_mode_detects_arch(tmp_path):
    # no general.architecture → sd.cpp compat path via key fingerprints
    w = GGUFWriter("flux")
    w._kv.clear()  # drop the arch key entirely
    w.add_tensor("double_blocks.0.img_attn.proj.weight",
                 np.zeros((8, 8), dtype=np.float32))
    p = tmp_path / "c.gguf"
    w.write_to_file(str(p))
    sd, arch = L.gguf_sd_loader(str(p), return_arch=True)
    assert arch == "flux"


def test_orig_shape_metadata(tmp_path):
    w = GGUFWriter("flux")
    rng = np.random.default_rng(1)
    full = rng.standard_normal((80, 80), dtype=np.float32)  # 80 % 256 != 0
    flat = full.reshape(25, 256)
    name = "model.diffusion_model.double_blocks.0.img_attn.proj.weight"
    w.add_tensor(name, codecs.quantize(flat, Q.Q8_0), raw_dtype=Q.Q8_0,
                 raw_shape=flat.shape)
    w.add_field(f"comfy.gguf.orig_shape.{name}", GGUFValueType.ARRAY,
                [80, 80], GGUFValueType.INT32)
    p = tmp_path / "s.gguf"
    w.write_to_file(str(p))
    sd = L.gguf_sd_loader(str(p))
    qt = sd["double_blocks.0.img_attn.proj.weight"]
    assert qt.shape == (80, 80)
    np.testing.assert_allclose(
        qt.dequantize(),
        codecs.dequantize(codecs.quantize(flat, Q.Q8_0), Q.Q8_0,
                          (25, 256)).reshape(80, 80),
    )


def test_to_jax_params_planarizes_2d(tmp_path):
    p = tmp_path / "m.gguf"
    _write_flux_like(p)
    sd = L.gguf_sd_loader(str(p))
    params = L.to_jax_params(sd)
    assert isinstance(params["double_blocks.0.img_attn.proj.weight"],
                      PlanarQuant)
    assert params["double_blocks.0.img_attn.proj.bias"].ndim == 1


def test_t5_key_remap():
    sd = {"enc.blk.0.attn_q.weight": 1, "enc.blk.0.ffn_norm.weight": 2,
          "token_embd.weight": 3, "output_norm.weight": 4}
    out = sd_map_replace(sd, T5_SD_MAP)
    assert set(out) == {
        "encoder.block.0.layer.0.SelfAttention.q.weight",
        "encoder.block.0.layer.1.layer_norm.weight",
        "shared.weight",
        "final_layer_norm.weight",
    }


def test_gqa_unpermute_inverts_llamacpp_permute():
    # forward permute used by llama.cpp convert scripts
    rng = np.random.default_rng(2)
    h, r, c = 4, 32, 16
    x = rng.standard_normal((r, c))
    fwd = x.reshape(h, 2, r // h // 2, c).swapaxes(1, 2).reshape(r, c)
    np.testing.assert_array_equal(unpermute_gqa_rows(fwd, h), x)


def test_strip_quant_suffix():
    assert L.strip_quant_suffix("t5-v1_1-xxl-Q8_0") == "t5-v1_1-xxl"
    assert L.strip_quant_suffix("model-iq4_nl") == "model"
    assert L.strip_quant_suffix("plain-name") == "plain-name"


def _write_t5_like(path):
    w = GGUFWriter("t5")
    rng = np.random.default_rng(3)
    vocab, d = 256, 64
    emb = rng.standard_normal((vocab, d), dtype=np.float32)
    wq = rng.standard_normal((d, d), dtype=np.float32)
    w.add_tensor("token_embd.weight", codecs.quantize(emb, Q.Q8_0),
                 raw_dtype=Q.Q8_0, raw_shape=emb.shape)
    w.add_tensor("enc.blk.0.attn_q.weight", codecs.quantize(wq, Q.Q8_0),
                 raw_dtype=Q.Q8_0, raw_shape=wq.shape)
    w.add_string("tokenizer.ggml.model", "t5")
    w.add_array("tokenizer.ggml.tokens", ["<pad>", "</s>", "<unk>", "▁hi"],
                GGUFValueType.STRING)
    w.add_array("tokenizer.ggml.scores", [0.0, 0.0, 0.0, -2.0],
                GGUFValueType.FLOAT32)
    w.add_array("tokenizer.ggml.token_type", [3, 3, 2, 1],
                GGUFValueType.INT32)
    w.add_uint32("tokenizer.ggml.eos_token_id", 1)
    w.add_uint32("tokenizer.ggml.padding_token_id", 0)
    w.write_to_file(str(path))
    return emb


def test_clip_loader_t5(tmp_path):
    p = tmp_path / "t5.gguf"
    emb = _write_t5_like(p)
    sd, arch, tok = L.gguf_clip_loader(str(p))
    assert arch == "t5"
    assert tok is not None and tok.model == "t5"
    assert tok.eos_id == 1
    # embed eagerly dequantized, key remapped
    assert "shared.weight" in sd
    assert not sd["shared.weight"].is_quantized
    assert "encoder.block.0.layer.0.SelfAttention.q.weight" in sd
