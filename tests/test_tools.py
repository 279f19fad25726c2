"""Offline toolchain tests: convert → quantize → fix_5d → load round trip
(SURVEY.md §2.16-2.18, §3.5)."""

import numpy as np

from comfyui_gguf_tpu.gguf.constants import (
    GGMLQuantizationType as Q,
    LlamaFileType as F,
)
from comfyui_gguf_tpu.gguf.reader import GGUFReader
from comfyui_gguf_tpu.loader import gguf_sd_loader
from comfyui_gguf_tpu.tools import convert, fix_5d_tensors, quantize


def _flux_like_sd(rng):
    """Minimal key set that fingerprints as flux and exercises the rules."""
    def t(*s):
        return rng.standard_normal(s).astype(np.float32)

    return {
        "double_blocks.0.img_attn.proj.weight": t(256, 512),
        "double_blocks.0.img_attn.qkv.weight": t(768, 512),
        "double_blocks.0.img_mlp.2.weight": t(512, 1024),  # ffn_down-like? no
        "double_blocks.0.img_attn.proj.bias": t(256),
        "img_in.weight": t(256, 64),  # excluded from quantization
        "time_in.in_layer.weight": t(256, 256),  # excluded
        "final_layer.linear.weight": t(64, 256),  # excluded
        "norm.scale": t(32),
        "tiny.weight": t(8, 8),  # ≤1024 params → F32
    }


def test_convert_dtype_policy(tmp_path):
    rng = np.random.default_rng(0)
    sd = _flux_like_sd(rng)
    import safetensors.torch
    import torch

    st = {k: torch.from_numpy(v) for k, v in sd.items()}
    src = tmp_path / "model.safetensors"
    safetensors.torch.save_file(st, str(src))

    out = convert.convert_file(str(src), str(tmp_path / "m-F16.gguf"))
    r = GGUFReader(out)
    by_name = {t.name: t for t in r.tensors}
    assert by_name["double_blocks.0.img_attn.proj.weight"].qtype == Q.F16
    assert by_name["double_blocks.0.img_attn.proj.bias"].qtype == Q.F32  # 1-D
    assert by_name["tiny.weight"].qtype == Q.F32  # ≤1024 params
    assert r.get_int("general.file_type") == int(F.MOSTLY_F16)
    assert r.get_str("general.architecture") == "flux"


def test_quantize_mixed_precision_rules(tmp_path):
    rng = np.random.default_rng(1)
    sd = _flux_like_sd(rng)
    import safetensors.torch
    import torch

    src = tmp_path / "model.safetensors"
    safetensors.torch.save_file(
        {k: torch.from_numpy(v) for k, v in sd.items()}, str(src))
    f16 = convert.convert_file(str(src), str(tmp_path / "m-F16.gguf"))
    q = quantize.quantize_file(f16, str(tmp_path / "m-Q4_K_M.gguf"), "Q4_K_M")

    r = GGUFReader(q)
    by_name = {t.name: t for t in r.tensors}
    # base tensors → Q4_K; fused qkv bumped to Q5_K (Q4_K_M rule)
    assert by_name["double_blocks.0.img_attn.proj.weight"].qtype == Q.Q4_K
    assert by_name["double_blocks.0.img_attn.qkv.weight"].qtype == Q.Q5_K
    # exclusions stay F16 (embedders/final)
    assert by_name["img_in.weight"].qtype == Q.F16
    assert by_name["time_in.in_layer.weight"].qtype == Q.F16
    assert by_name["final_layer.linear.weight"].qtype == Q.F16
    # 1-D stays F32
    assert by_name["double_blocks.0.img_attn.proj.bias"].qtype == Q.F32
    # loadable by the normal loader
    loaded, arch = gguf_sd_loader(q, return_arch=True)
    assert arch == "flux"
    assert loaded["double_blocks.0.img_attn.qkv.weight"].qtype == Q.Q5_K


def test_qtype_row_fallback():
    qs = quantize.QuantState()
    # rows not divisible by 256 → F16 fallback for K-quants
    t = quantize.tensor_qtype("blk.w.weight", (64, 192), F.MOSTLY_Q4_K_S, qs)
    assert t == Q.F16 and qs.n_fallback == 1


def test_qtype_attn_v_ladder():
    qs = quantize.QuantState()
    names = ["a.attn_v.weight", "b.attn_v.weight", "c.attn_v.weight",
             "d.attn_v.weight", "e.attn_v.weight"]
    types = [quantize.tensor_qtype(n, (256, 256), F.MOSTLY_Q4_K_S, qs)
             for n in names]
    # first 4 attn_v bumped to Q5_K, rest Q4_K (reference lcpp.patch:152-156)
    assert types == [Q.Q5_K] * 4 + [Q.Q4_K]


def test_qtype_ffn_down_q4_0():
    qs = quantize.QuantState()
    t = quantize.tensor_qtype("blk.0.ffn_down.weight", (256, 256),
                              F.MOSTLY_Q4_0, qs)
    assert t == Q.Q4_1


def test_fix_5d_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    import safetensors.numpy

    w5 = rng.standard_normal((8, 4, 2, 3, 3)).astype(np.float32)
    sidecar = tmp_path / "fix_5d_tensors_wan.safetensors"
    safetensors.numpy.save_file({"patch_embedding.weight": w5}, str(sidecar))

    from comfyui_gguf_tpu.gguf.writer import GGUFWriter

    w = GGUFWriter("wan")
    w.add_tensor("blocks.0.self_attn.q.weight",
                 rng.standard_normal((16, 16)).astype(np.float32))
    base = tmp_path / "wan-Q8_0.gguf"
    w.write_to_file(str(base))

    out = fix_5d_tensors.fix_file(str(base), str(sidecar))
    sd = gguf_sd_loader(out, return_arch=False)
    got = sd["patch_embedding.weight"]
    assert got.shape == (8, 4, 2, 3, 3)
    np.testing.assert_allclose(got.dequantize(), w5)


def test_bf16_base_conversion_and_quantize(tmp_path):
    rng = np.random.default_rng(5)
    sd = _flux_like_sd(rng)
    import safetensors.torch
    import torch

    src = tmp_path / "model.safetensors"
    safetensors.torch.save_file(
        {k: torch.from_numpy(v) for k, v in sd.items()}, str(src))
    bf16 = convert.convert_file(str(src), str(tmp_path / "m-BF16.gguf"),
                                use_bf16_base=True)
    r = GGUFReader(bf16)
    by_name = {t.name: t for t in r.tensors}
    assert by_name["double_blocks.0.img_attn.proj.weight"].qtype == Q.BF16
    assert r.get_int("general.file_type") == int(F.MOSTLY_BF16)
    # BF16 base quantizes fine
    q = quantize.quantize_file(bf16, str(tmp_path / "m-Q8_0.gguf"), "Q8_0")
    rq = GGUFReader(q)
    byq = {t.name: t for t in rq.tensors}
    assert byq["double_blocks.0.img_attn.proj.weight"].qtype == Q.Q8_0


def test_all_ftype_presets_produce_loadable_files(tmp_path):
    """Every quantizer preset the reference's ftype table supports runs
    end-to-end and loads back."""
    rng = np.random.default_rng(7)
    sd = _flux_like_sd(rng)
    import safetensors.torch
    import torch

    src = tmp_path / "m.safetensors"
    safetensors.torch.save_file(
        {k: torch.from_numpy(v) for k, v in sd.items()}, str(src))
    f16 = convert.convert_file(str(src), str(tmp_path / "m-F16.gguf"))

    for ftype in ("Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0", "Q2_K",
                  "Q3_K_S", "Q3_K_M", "Q3_K_L", "Q4_K_S", "Q4_K_M",
                  "Q5_K_S", "Q5_K_M", "Q6_K"):
        out = quantize.quantize_file(
            f16, str(tmp_path / f"m-{ftype}.gguf"), ftype)
        sd_loaded = gguf_sd_loader(out)
        assert "double_blocks.0.img_attn.proj.weight" in sd_loaded

    # IQ ftypes are rejected for image models (reference lcpp.patch:144-155)
    import pytest as _pytest

    for ftype in ("IQ4_NL", "IQ4_XS"):
        with _pytest.raises(ValueError, match="IQ"):
            quantize.quantize_file(f16, str(tmp_path / "x.gguf"), ftype)


def test_read_xplane_label_collapse():
    from comfyui_gguf_tpu.tools.read_xplane import _label

    assert _label("%pallas_qmm.3 = bf16[...]") == "pallas/custom-call"
    assert _label("%copy.2 = f32[...]") == "copy"
    assert _label("%add_convert_fusion.2") == "fusion"
    assert _label("%while = (...)") == "while-wrapper"
    assert _label("%broadcast.12") == "broadcast"


def test_module_ms_parses_existing_capture():
    import os

    import pytest

    from comfyui_gguf_tpu.tools.read_xplane import module_ms

    path = "/tmp/prof_sq"
    if not os.path.isdir(path):
        pytest.skip("no capture on disk")
    mods = module_ms(path)
    assert mods and all(ms > 0 for ms, n in mods.values())


def _sd1_like_sd(rng):
    """Key set fingerprinting as sd1 (shape_fix=True arch, archs.py)."""
    def t(*s):
        return rng.standard_normal(s).astype(np.float32)

    sd = {k: t(32, 32, 3, 3) for k in (
        "input_blocks.3.0.op.weight", "input_blocks.6.0.op.weight",
        "input_blocks.9.0.op.weight", "output_blocks.2.1.conv.weight",
        "output_blocks.5.2.conv.weight", "output_blocks.8.2.conv.weight",
    )}
    # 4-D conv: 64*16*3*3 = 9216 elements (256-divisible, last dim 3)
    sd["input_blocks.1.1.proj_in.weight"] = t(64, 16, 3, 3)
    # narrow 2-D: last dim 320 not a 256 multiple, 64*320 = 20480 divisible
    sd["input_blocks.1.1.to_q.weight"] = t(64, 320)
    # not 256-divisible in total -> left alone
    sd["input_blocks.1.1.odd.weight"] = t(30, 33)
    return sd


def test_shape_fix_rearranges_convs_and_narrow_2d(tmp_path):
    """Reference convert.py:287-295: any n_dims>1, size>=512, size%256==0,
    last-dim%256!=0 tensor is flattened to (N/256, 256) + orig_shape KV."""
    rng = np.random.default_rng(7)
    sd = _sd1_like_sd(rng)
    import safetensors.torch
    import torch

    src = tmp_path / "model.safetensors"
    safetensors.torch.save_file(
        {k: torch.from_numpy(v) for k, v in sd.items()}, str(src))
    out = convert.convert_file(str(src), str(tmp_path / "m-F16.gguf"))
    r = GGUFReader(out)
    by_name = {t.name: t for t in r.tensors}

    conv = by_name["input_blocks.1.1.proj_in.weight"]
    assert tuple(conv.shape) == (9216 // 256, 256)
    assert r.get_orig_shape("input_blocks.1.1.proj_in.weight") == \
        (64, 16, 3, 3)

    narrow = by_name["input_blocks.1.1.to_q.weight"]
    assert tuple(narrow.shape) == (20480 // 256, 256)
    assert r.get_orig_shape("input_blocks.1.1.to_q.weight") == (64, 320)

    odd = by_name["input_blocks.1.1.odd.weight"]
    assert tuple(odd.shape) == (30, 33)
    assert r.get_orig_shape("input_blocks.1.1.odd.weight") is None

    # loader restores logical shapes
    loaded = gguf_sd_loader(out)
    assert tuple(loaded["input_blocks.1.1.proj_in.weight"].shape) == \
        (64, 16, 3, 3)
    assert tuple(loaded["input_blocks.1.1.to_q.weight"].shape) == (64, 320)


def test_quantize_text_recipe(tmp_path):
    """Text encoders (t5/llama) take stock llama.cpp's type rules
    (llama_tensor_get_type): attn_v / ffn_down bumped to Q6_K on the
    use_more_bits layer pattern at Q4_K_M, output.weight kept Q6_K,
    attn_qkv → Q5_K, rel-bias and 1-D tensors untouched, misaligned rows
    walking the Q4_K→Q5_0 conversion ladder instead of F16."""
    from comfyui_gguf_tpu.gguf.writer import GGUFWriter

    n_layers = 8
    w = GGUFWriter("t5")

    def add(name, rows, cols):
        w.add_tensor(name,
                     np.zeros((rows, cols), np.float16).tobytes(),
                     raw_dtype=Q.F16, raw_shape=(rows, cols))

    for i in range(n_layers):
        add(f"enc.blk.{i}.attn_v.weight", 8, 256)
        add(f"enc.blk.{i}.ffn_down.weight", 8, 512)
    add("enc.blk.0.attn_q.weight", 8, 256)
    add("enc.blk.0.attn_qkv.weight", 24, 256)
    add("enc.blk.0.attn_rel_b.weight", 32, 8)
    add("enc.blk.0.ffn_gate.weight", 8, 160)  # 160 % 256 != 0
    add("token_embd.weight", 32, 256)
    add("output.weight", 32, 256)
    w.add_tensor("enc.blk.0.ffn_up.bias", np.zeros(256, np.float32).tobytes(),
                 raw_dtype=Q.F32, raw_shape=(256,))
    path = tmp_path / "t5-F16.gguf"
    w.write_to_file(str(path))

    out = quantize.quantize_file(str(path), None, "Q4_K_M")
    r = GGUFReader(out)
    got = {t.name: t.qtype for t in r.tensors}

    # use_more_bits(i, 8): i < 1, i >= 7, or (i-1) % 3 == 2 → {0, 3, 6, 7}
    bumped = {0, 3, 6, 7}
    for i in range(n_layers):
        want = Q.Q6_K if i in bumped else Q.Q4_K
        assert got[f"enc.blk.{i}.attn_v.weight"] == want, (i, "attn_v")
        assert got[f"enc.blk.{i}.ffn_down.weight"] == want, (i, "ffn_down")
    assert got["enc.blk.0.attn_q.weight"] == Q.Q4_K
    assert got["enc.blk.0.attn_qkv.weight"] == Q.Q5_K
    assert got["enc.blk.0.attn_rel_b.weight"] == Q.F16  # never quantized
    assert got["enc.blk.0.ffn_gate.weight"] == Q.Q5_0  # conversion ladder
    assert got["token_embd.weight"] == Q.Q4_K
    assert got["output.weight"] == Q.Q6_K
    assert got["enc.blk.0.ffn_up.bias"] == Q.F32

    # round trip: loader must still decode every produced qtype
    from comfyui_gguf_tpu.quant import codecs
    for t in r.tensors:
        dec = codecs.dequantize(t.data, t.qtype, t.shape)
        assert dec.shape == tuple(t.shape)


def test_quantize_rejects_unknown_arch(tmp_path):
    import pytest

    from comfyui_gguf_tpu.gguf.writer import GGUFWriter

    w = GGUFWriter("mamba")
    w.add_tensor("blk.0.ssm_in.weight",
                 np.zeros((256, 256), np.float16).tobytes(),
                 raw_dtype=Q.F16, raw_shape=(256, 256))
    path = tmp_path / "mamba-F16.gguf"
    w.write_to_file(str(path))
    with pytest.raises(ValueError, match="unknown architecture"):
        quantize.quantize_file(str(path), None, "Q8_0")


# ---------------------------------------------------------------------------
# qwen_image ArchSpec: converter coverage the reference itself lacks
# (reference tools/convert.py:26-149 has no qwen_image template)
# ---------------------------------------------------------------------------

def _qwen_image_like_sd(rng):
    def t(*s):
        return rng.standard_normal(s).astype(np.float32)

    pfx = "transformer_blocks.0."
    return {
        pfx + "img_mod.1.weight": t(1536, 256),
        pfx + "txt_mod.1.weight": t(1536, 256),
        pfx + "attn.to_q.weight": t(256, 256),
        pfx + "attn.norm_q.weight": t(64),
        pfx + "attn.add_q_proj.weight": t(256, 256),
        pfx + "attn.norm_added_k.weight": t(64),
        pfx + "img_mlp.net.0.proj.weight": t(1024, 256),
        pfx + "img_mlp.net.2.weight": t(256, 1024),
        "img_in.weight": t(256, 64),
        "txt_in.weight": t(256, 512),
        "txt_norm.weight": t(512),
        "time_text_embed.timestep_embedder.linear_1.weight": t(256, 256),
        "norm_out.linear.weight": t(512, 256),
        "proj_out.weight": t(64, 256),
    }


def test_qwen_image_detect_and_convert(tmp_path):
    """qwen_image fingerprints, converts, quantizes with its noquant
    policy, and loads back under the qwen_image arch."""
    from comfyui_gguf_tpu import archs

    rng = np.random.default_rng(7)
    sd = _qwen_image_like_sd(rng)
    assert archs.detect_arch(sd.keys()).arch == "qwen_image"

    import safetensors.torch
    import torch

    src = tmp_path / "model.safetensors"
    safetensors.torch.save_file(
        {k: torch.from_numpy(v) for k, v in sd.items()}, str(src))
    f16 = convert.convert_file(str(src), str(tmp_path / "m-F16.gguf"))
    r = GGUFReader(f16)
    assert r.get_str("general.architecture") == "qwen_image"

    q = quantize.quantize_file(f16, str(tmp_path / "m-Q4_K_S.gguf"),
                               "Q4_K_S")
    by_name = {t.name: t for t in GGUFReader(q).tensors}
    # embedders / modulation / head stay unquantized
    for k in ("img_in.weight", "txt_in.weight", "norm_out.linear.weight",
              "proj_out.weight",
              "time_text_embed.timestep_embedder.linear_1.weight"):
        assert by_name[k].qtype in (Q.F16, Q.F32), (k, by_name[k].qtype)
    # stream weights quantize
    assert by_name["transformer_blocks.0.attn.to_q.weight"].qtype \
        not in (Q.F16, Q.F32)

    loaded, arch = gguf_sd_loader(q, return_arch=True)
    assert arch == "qwen_image"
    assert "transformer_blocks.0.attn.to_q.weight" in loaded


def test_qwen_image_order_keeps_diffusers_bans():
    """The qwen_image spec (which shares norm_added_k / add_q_proj keys
    with the banned diffusers flux/sd3 variants) must not shadow those
    bans."""
    from comfyui_gguf_tpu import archs

    # diffusers-format flux: norm_added_k but NO qwen img_mod keys
    with np.testing.assert_raises(archs.BannedArchitectureError):
        archs.detect_arch({
            "transformer_blocks.0.attn.norm_added_k.weight",
            "double_blocks.0.img_attn.proj.weight"})
    # diffusers-format sd3: add_q_proj but NO qwen img_mod keys
    with np.testing.assert_raises(archs.BannedArchitectureError):
        archs.detect_arch({
            "transformer_blocks.0.attn.add_q_proj.weight",
            "joint_blocks.0.x_block.attn.qkv.weight"})


# --------------------------------------------------------------------------
# checkpoint pre-flight validator (tools/validate_checkpoint.py)
# --------------------------------------------------------------------------

def _write_flux_gguf(tmp_path, name, sd, extra=None, drop=(),
                     misshape=None):
    from comfyui_gguf_tpu.gguf.writer import GGUFWriter

    w = GGUFWriter("flux")
    for k, v in sd.items():
        if k in drop:
            continue
        if misshape and k == misshape:
            v = np.zeros((v.shape[0], v.shape[1] + 16)
                         if v.ndim == 2 else (v.shape[0] + 8,), np.float32)
        w.add_tensor("model.diffusion_model." + k,
                     np.asarray(v, np.float32))
    if extra:
        for k, v in extra.items():
            w.add_tensor("model.diffusion_model." + k,
                         np.asarray(v, np.float32))
    p = tmp_path / name
    w.write_to_file(str(p))
    return str(p)


def test_shape_specs_match_state_dict_builders():
    """The validator's expected-key source must agree with the state
    dicts the rest of the suite trains against."""
    from comfyui_gguf_tpu.models import testing

    dims = testing.TinyFluxDims()
    sd = testing.flux_state_dict(dims)
    nonblock, groups = testing.flux_shape_spec(dims)
    flat = dict(nonblock)
    for ok, (depth, suf) in groups.items():
        for i in range(depth):
            flat.update({f"{ok}.{i}.{s}": sh for s, sh in suf.items()})
    assert set(flat) == set(sd)
    for k in sd:
        assert tuple(flat[k]) == tuple(sd[k].shape), k

    sdims = testing.TinySD3Dims()
    ssd = testing.sd3_flat_state_dict(sdims)
    want = testing.sd3_shape_spec(sdims)
    assert set(want) == set(ssd)
    for k in ssd:
        assert tuple(want[k]) == tuple(ssd[k].shape), k


def test_validate_checkpoint_clean_and_injected_errors(tmp_path):
    from comfyui_gguf_tpu.models import testing
    from comfyui_gguf_tpu.tools import validate_checkpoint as V

    dims = testing.TinyFluxDims()
    sd = testing.flux_state_dict(dims, seed=0)

    rep = V.validate(_write_flux_gguf(tmp_path, "clean.gguf", sd))
    assert rep.ok and rep.arch == "flux" and rep.spec == "full"
    assert not (rep.missing or rep.unexpected or rep.misshaped
                or rep.blocked)

    bad = V.validate(_write_flux_gguf(
        tmp_path, "bad.gguf", sd,
        drop=("double_blocks.0.img_attn.proj.weight",
              "single_blocks.1.linear2.bias"),
        extra={"double_blocks.0.bogus.weight": np.zeros((4, 4))},
        misshape="double_blocks.1.txt_mlp.0.weight"))
    assert not bad.ok
    assert bad.missing == ["double_blocks.0.img_attn.proj.weight"]
    assert bad.missing_bias == ["single_blocks.1.linear2.bias"]
    assert bad.unexpected == ["double_blocks.0.bogus.weight"]
    assert [m[0] for m in bad.misshaped] == [
        "double_blocks.1.txt_mlp.0.weight"]

    # CLI exit codes: clean=0, broken=1
    assert V.main([_write_flux_gguf(tmp_path, "c2.gguf", sd)]) == 0
    assert V.main([_write_flux_gguf(
        tmp_path, "b2.gguf", sd,
        drop=("double_blocks.0.img_attn.proj.weight",)), "--json"]) == 1


def test_validate_checkpoint_blocked_iq(tmp_path):
    """IQ-blocked tensors are REPORTED (not raised) before any load."""
    from comfyui_gguf_tpu.gguf.constants import GGML_QUANT_SIZES
    from comfyui_gguf_tpu.models import testing
    from comfyui_gguf_tpu.gguf.writer import GGUFWriter
    from comfyui_gguf_tpu.tools import validate_checkpoint as V

    dims = testing.TinyFluxDims()
    sd = testing.flux_state_dict(dims, seed=1)
    key = "double_blocks.0.img_attn.qkv.weight"
    block, type_size = GGML_QUANT_SIZES[Q.IQ2_XS]

    w = GGUFWriter("flux")
    for k, v in sd.items():
        if k == key:
            R = v.shape[0]
            w.add_tensor("model.diffusion_model." + k,
                         np.zeros((R * v.shape[1] // block, type_size),
                                  np.uint8),
                         raw_dtype=Q.IQ2_XS, raw_shape=v.shape)
        else:
            w.add_tensor("model.diffusion_model." + k,
                         np.asarray(v, np.float32))
    p = tmp_path / "iqflux.gguf"
    w.write_to_file(str(p))

    rep = V.validate(str(p))
    assert rep.blocked == [(key, "IQ2_XS")]
    assert not rep.ok and not rep.missing and not rep.misshaped


def test_validate_checkpoint_qwen_spec(tmp_path):
    """A spec-covered non-flux arch validates through its own shape
    spec (qwen_image; config introspected from the file's shapes)."""
    from comfyui_gguf_tpu.gguf.writer import GGUFWriter
    from comfyui_gguf_tpu.models import testing
    from comfyui_gguf_tpu.tools import validate_checkpoint as V

    d = testing.QwenImageDims()
    nonblock, groups = testing.qwen_image_shape_spec(d)
    sd = testing.random_flat_sd_from_spec(nonblock, groups, seed=2)
    w = GGUFWriter("qwen_image")
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k,
                     np.asarray(v, np.float32))
    p = tmp_path / "qwen.gguf"
    w.write_to_file(str(p))

    rep = V.validate(str(p))
    assert rep.ok and rep.arch == "qwen_image" and rep.spec == "full"


def test_tp_plan_cli():
    """TP mesh-sizing CLI: the analytic per-shard bytes must reproduce
    the MEASURED qwen_image-20B single-chip planar footprint (15.29 GB,
    BASELINE round 4) and flip to 'fits' at tp=2."""
    import json as _json

    from comfyui_gguf_tpu.tools import tp_plan

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = tp_plan.main(["--arch", "qwen_image", "--json"])
    assert rc == 0
    rows = {r["tp"]: r for r in _json.loads(buf.getvalue())}
    assert abs(rows[1]["planar_gb_per_shard"] - 15.29) < 0.05
    assert not rows[1]["fits_i8"] and rows[2]["fits_i8"]
    assert tp_plan.main(["--arch", "bogus"]) == 2


def test_validate_checkpoint_hidream_spec(tmp_path):
    """hidream validates through its own full shape spec (r5: was
    structural-only). Expert/ff_t FFN widths and the caption-projection
    count are introspected from the FILE, so a checkpoint whose routed
    experts differ in width from the shared expert (or that carries an
    extra llama tap) still validates clean — while a genuinely
    misshaped attention weight fails."""
    from comfyui_gguf_tpu.gguf.writer import GGUFWriter
    from comfyui_gguf_tpu.models import testing
    from comfyui_gguf_tpu.tools import validate_checkpoint as V

    d = testing.TinyHiDreamDims()
    nonblock, groups = testing.hidream_shape_spec(d)
    sd = testing.random_flat_sd_from_spec(nonblock, groups, seed=3)
    # routed experts narrower than the shared expert + a third caption
    # projection: both legal per-file variations
    for k in list(sd):
        if ".ff_i.experts." in k:
            if k.endswith((".w1.weight", ".w3.weight")):
                sd[k] = sd[k][: d.ffn // 2]
            elif k.endswith(".w2.weight"):
                sd[k] = sd[k][:, : d.ffn // 2]
    sd["caption_projection.2.linear.weight"] = np.zeros(
        (d.hidden, d.llama_dim), np.float32)

    def write(name, misshape=None):
        w = GGUFWriter("hidream")
        for k, v in sd.items():
            if misshape and k == misshape:
                v = np.zeros((v.shape[0], v.shape[1] + 16), np.float32)
            w.add_tensor("model.diffusion_model." + k,
                         np.asarray(v, np.float32))
        p = tmp_path / name
        w.write_to_file(str(p))
        return str(p)

    rep = V.validate(write("hid.gguf"))
    assert rep.ok and rep.arch == "hidream" and rep.spec == "full"
    assert not (rep.missing or rep.unexpected or rep.misshaped)

    bad = V.validate(write(
        "hidbad.gguf",
        misshape="single_stream_blocks.0.block.attn1.to_q.weight"))
    assert not bad.ok
    assert [m[0] for m in bad.misshaped] == [
        "single_stream_blocks.0.block.attn1.to_q.weight"]
