"""GGUF reader/writer round-trip tests (SURVEY.md §7 step 1)."""

import numpy as np
import pytest

from comfyui_gguf_tpu.gguf.constants import (
    GGML_QUANT_SIZES,
    GGMLQuantizationType as Q,
    GGUFValueType,
    LlamaFileType,
)
from comfyui_gguf_tpu.gguf.reader import BadGGUFError, GGUFReader
from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.quant import codecs


def test_metadata_roundtrip(tmp_path):
    w = GGUFWriter(arch="flux")
    w.add_quantization_version(2)
    w.add_file_type(LlamaFileType.MOSTLY_F16)
    w.add_string("s", "héllo wörld")
    w.add_uint32("u32", 7)
    w.add_int32("i32", -12)
    w.add_uint64("u64", 2**40)
    w.add_float32("f", 1.5)
    w.add_bool("b1", True)
    w.add_bool("b0", False)
    w.add_array("arr_i", [1, 2, 3], GGUFValueType.INT32)
    w.add_array("arr_f", [0.5, -0.25], GGUFValueType.FLOAT32)
    w.add_array("arr_s", ["a", "bb", "ccc"])
    path = str(tmp_path / "meta.gguf")
    w.write_to_file(path)

    r = GGUFReader(path)
    assert r.get_str("general.architecture") == "flux"
    assert r.get_int("general.quantization_version") == 2
    assert r.get_int("general.file_type") == int(LlamaFileType.MOSTLY_F16)
    assert r.get_str("s") == "héllo wörld"
    assert r.get_int("u32") == 7
    assert r.get_int("i32") == -12
    assert r.get_int("u64") == 2**40
    assert r.get_float("f") == 1.5
    assert r.get_bool("b1") is True
    assert r.get_bool("b0") is False
    assert r.get_list("arr_i") == [1, 2, 3]
    assert r.get_list("arr_f") == [0.5, -0.25]
    assert r.get_list("arr_s") == ["a", "bb", "ccc"]
    assert r.get_str("missing") is None


def test_tensor_roundtrip_all_qtypes(tmp_path):
    rng = np.random.default_rng(0)
    qtypes = [Q.F32, Q.F16, Q.BF16, Q.Q8_0, Q.Q4_0, Q.Q4_K, Q.Q6_K, Q.IQ4_XS]
    shapes = {
        Q.F32: (3, 5), Q.F16: (4, 8), Q.BF16: (2, 16),
        Q.Q8_0: (4, 64), Q.Q4_0: (2, 256), Q.Q4_K: (3, 256),
        Q.Q6_K: (2, 512), Q.IQ4_XS: (1, 256),
    }
    w = GGUFWriter(arch="flux")
    originals = {}
    for qt in qtypes:
        shape = shapes[qt]
        x = rng.standard_normal(shape).astype(np.float32)
        packed = codecs.quantize(x, qt)
        originals[qt.name] = (x, shape, codecs.dequantize(packed, qt, shape))
        if qt in (Q.F32, Q.F16):
            w.add_tensor(f"t.{qt.name}", x.astype(
                np.float32 if qt == Q.F32 else np.float16))
        else:
            w.add_tensor(f"t.{qt.name}", packed, raw_dtype=qt, raw_shape=shape)
    path = str(tmp_path / "tensors.gguf")
    w.write_to_file(path)

    r = GGUFReader(path)
    assert len(r.tensors) == len(qtypes)
    for t in r.tensors:
        name = t.name.split(".", 1)[1]
        x, shape, decoded = originals[name]
        assert t.shape == shape
        assert t.dims == tuple(reversed(shape))
        got = codecs.dequantize(np.asarray(t.data), t.qtype, t.shape)
        np.testing.assert_array_equal(got, decoded)


def test_alignment_and_offsets(tmp_path):
    w = GGUFWriter(arch="sd3")
    w.add_tensor("a", np.ones((1, 3), dtype=np.float32))  # 12 bytes -> pad
    w.add_tensor("b", np.full((2, 2), 2.0, dtype=np.float32))
    path = str(tmp_path / "align.gguf")
    w.write_to_file(path)
    r = GGUFReader(path)
    assert r.tensors[0].offset == 0
    assert r.tensors[1].offset == 32  # aligned up from 12
    np.testing.assert_array_equal(np.asarray(r.tensors[1].data),
                                  np.full((2, 2), 2.0, dtype=np.float32))


def test_orig_shape_metadata(tmp_path):
    w = GGUFWriter(arch="sdxl")
    w.add_array("comfy.gguf.orig_shape.w", [320, 4, 3, 3], GGUFValueType.INT32)
    w.add_tensor("w", np.zeros((45, 256), dtype=np.float32))
    path = str(tmp_path / "orig.gguf")
    w.write_to_file(path)
    r = GGUFReader(path)
    assert r.get_orig_shape("w") == (320, 4, 3, 3)
    assert r.get_orig_shape("other") is None


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(BadGGUFError):
        GGUFReader(str(p))


def test_mmap_is_lazy(tmp_path):
    w = GGUFWriter(arch="flux")
    w.add_tensor("big", np.zeros((256, 1024), dtype=np.float32))
    path = str(tmp_path / "big.gguf")
    w.write_to_file(path)
    r = GGUFReader(path)
    # data views must be backed by the file mmap, not copies
    assert isinstance(r.tensors[0].data.base, np.memmap) or isinstance(
        r.tensors[0].data, np.memmap
    )


def test_name_too_long_rejected():
    w = GGUFWriter(arch="flux")
    with pytest.raises(ValueError):
        w.add_tensor("x" * 128, np.zeros((2, 2), dtype=np.float32))


def test_reader_accepts_v2_files(tmp_path):
    """v2 differs from v3 only in fields our reader already treats
    uniformly; patch the version word and confirm identical decode."""
    import struct

    from comfyui_gguf_tpu.quant import codecs

    rng = np.random.default_rng(4)
    w = GGUFWriter("flux")
    x = rng.standard_normal((8, 64)).astype(np.float32)
    w.add_tensor("t.weight", codecs.quantize(x, Q.Q8_0), raw_dtype=Q.Q8_0,
                 raw_shape=x.shape)
    p = tmp_path / "v2.gguf"
    w.write_to_file(str(p))
    raw = bytearray(p.read_bytes())
    raw[4:8] = struct.pack("<I", 2)
    p.write_bytes(bytes(raw))

    r = GGUFReader(str(p))
    assert r.version == 2
    t = r.tensors[0]
    np.testing.assert_allclose(
        codecs.dequantize(t.data, t.qtype, t.shape), x, rtol=0.02, atol=0.05)


def test_reader_rejects_unknown_version(tmp_path):
    import struct

    w = GGUFWriter("flux")
    w.add_tensor("t.weight", np.zeros((2, 2), np.float32))
    p = tmp_path / "v9.gguf"
    w.write_to_file(str(p))
    raw = bytearray(p.read_bytes())
    raw[4:8] = struct.pack("<I", 9)
    p.write_bytes(bytes(raw))
    with pytest.raises(Exception, match="version"):
        GGUFReader(str(p))
