"""C++ codec library: byte-identity vs the numpy encoders/decoders.

The native path must be a pure speedup — any byte difference is a bug.
Skipped when the toolchain can't build the library.
"""

import numpy as np
import pytest

from comfyui_gguf_tpu import native
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.quant import codecs

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native codec library not built")

ENC_QTYPES = [Q.Q4_0, Q.Q8_0, Q.Q4_K, Q.Q5_K, Q.Q6_K]


@pytest.mark.parametrize("qtype", ENC_QTYPES)
def test_encode_byte_identical(qtype):
    rng = np.random.default_rng(int(qtype))
    x = (rng.standard_normal(256 * 64) * rng.uniform(0.01, 10)).astype(
        np.float32)
    got = native.quantize(x, qtype)
    want = codecs.quantize(x, qtype, use_native=False)
    assert got is not None
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("qtype", ENC_QTYPES)
def test_encode_edge_cases(qtype):
    n = 512
    for x in (np.zeros(n, np.float32),
              np.full(n, 7.25, np.float32),
              np.full(n, -1e-8, np.float32),
              np.linspace(-1e4, 1e4, n).astype(np.float32)):
        got = native.quantize(x, qtype)
        want = codecs.quantize(x, qtype, use_native=False)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("qtype", [Q.Q4_0, Q.Q8_0, Q.Q4_K, Q.Q6_K])
def test_decode_byte_identical(qtype):
    rng = np.random.default_rng(int(qtype) + 100)
    x = rng.standard_normal(256 * 16).astype(np.float32)
    blocks = codecs.quantize(x, qtype, use_native=False)
    got = native.dequantize(blocks, qtype, x.size)
    want = codecs.dequantize(blocks, qtype, (x.size,), use_native=False)
    np.testing.assert_array_equal(got, want.ravel())


def test_codecs_route_through_native():
    # the default path uses the library and still matches numpy exactly
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256 * 8).astype(np.float32)
    np.testing.assert_array_equal(
        codecs.quantize(x, Q.Q4_K),
        codecs.quantize(x, Q.Q4_K, use_native=False),
    )


# C++ component extraction (the planar load path): must match the numpy
# extractors bit-exactly — q codes, scales, and offsets all byte-equal.
_EXTRACT = [
    (Q.Q4_K, "extract_q4k", codecs.components_Q4_K, True),
    (Q.Q5_K, "extract_q5k", codecs.components_Q5_K, True),
    (Q.Q2_K, "extract_q2k", codecs.components_Q2_K, True),
    (Q.Q6_K, "extract_q6k", codecs.components_Q6_K, False),
    (Q.Q3_K, "extract_q3k", codecs.components_Q3_K, False),
]


@pytest.mark.parametrize("qtype,sym,comp,has_offsets", _EXTRACT,
                         ids=lambda v: v.name if hasattr(v, "name") else "")
def test_extract_components_bit_identical(qtype, sym, comp, has_offsets,
                                          monkeypatch):
    rng = np.random.default_rng(int(qtype) + 7)
    x = (rng.standard_normal(256 * 32) * rng.uniform(0.01, 8)).astype(
        np.float32)
    blocks = codecs.quantize(x, qtype, use_native=False)
    got = getattr(native, sym)(blocks)
    assert got is not None, f"native {sym} unavailable"
    # numpy reference: force the components_* fallback path
    monkeypatch.setattr(native, sym, lambda b: None)
    want = comp(blocks)
    np.testing.assert_array_equal(got[0], want.q)
    assert got[0].dtype == want.q.dtype
    np.testing.assert_array_equal(got[1], want.scales)
    if has_offsets:
        np.testing.assert_array_equal(got[2], want.offsets)
    else:
        assert want.offsets is None and len(got) == 2


@pytest.mark.parametrize("qtype,sym,comp,has_offsets", _EXTRACT,
                         ids=lambda v: v.name if hasattr(v, "name") else "")
def test_extract_perturbed_payloads(qtype, sym, comp, has_offsets,
                                    monkeypatch):
    """Cover bit patterns the encoder never emits: flip random payload
    bytes (not just encoder outputs) and require identical decode."""
    rng = np.random.default_rng(int(qtype) + 99)
    x = rng.standard_normal(256 * 8).astype(np.float32)
    blocks = np.ascontiguousarray(
        codecs.quantize(x, qtype, use_native=False))
    flat = blocks.reshape(-1).copy()
    idx = rng.integers(0, flat.size, flat.size // 4)
    flat[idx] ^= rng.integers(1, 256, idx.size).astype(np.uint8)
    blocks = flat.reshape(blocks.shape)
    got = getattr(native, sym)(blocks)
    monkeypatch.setattr(native, sym, lambda b: None)
    want = comp(blocks)
    np.testing.assert_array_equal(got[0], want.q)
    np.testing.assert_array_equal(got[1], want.scales)
    if has_offsets:
        np.testing.assert_array_equal(got[2], want.offsets)
