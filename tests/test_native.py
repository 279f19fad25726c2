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
