"""Planar re-tiling must be a lossless re-encoding: dequantize(planarize(x))
== codecs.dequantize(x) bit-exactly (float32)."""

import numpy as np
import pytest

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.quant import codecs, planar

QUANT_TYPES = [
    Q.Q8_0, Q.Q4_0, Q.Q4_1, Q.Q5_0, Q.Q5_1, Q.IQ4_NL,
    Q.Q4_K, Q.Q5_K, Q.Q6_K, Q.Q3_K, Q.Q2_K, Q.IQ4_XS,
]


@pytest.mark.parametrize("qtype", QUANT_TYPES, ids=lambda q: q.name)
def test_planar_dequant_bit_exact(qtype):
    rng = np.random.default_rng(int(qtype))
    R, K = 48, 512  # R deliberately not a multiple of 128 (tests padding)
    x = rng.standard_normal((R, K)).astype(np.float32) * 2.0
    packed = codecs.quantize(x, qtype)
    want = codecs.dequantize(packed, qtype, (R, K))

    p = planar.planarize(packed, qtype, (R, K))
    assert p.padded_out == 128
    got = np.asarray(planar.dequantize(p))
    assert got.shape == (R, K)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("qtype", [Q.Q4_0, Q.Q4_K, Q.Q2_K], ids=lambda q: q.name)
def test_nib4_layout(qtype):
    rng = np.random.default_rng(0)
    R, K = 128, 512  # 512-multiple: no K padding, shapes exact
    x = rng.standard_normal((R, K)).astype(np.float32)
    p = planar.planarize(codecs.quantize(x, qtype), qtype, (R, K))
    assert p.layout == "nib4"
    assert p.qs.shape == (K // 2, R)
    assert p.qs.dtype == np.uint8


@pytest.mark.parametrize(
    "qtype", [Q.Q8_0, Q.Q5_0, Q.Q5_K, Q.Q6_K, Q.Q3_K, Q.IQ4_NL, Q.IQ4_XS],
    ids=lambda q: q.name,
)
def test_int8_layout_zero_point_folded(qtype):
    rng = np.random.default_rng(1)
    R, K = 128, 512
    x = rng.standard_normal((R, K)).astype(np.float32)
    p = planar.planarize(codecs.quantize(x, qtype), qtype, (R, K))
    assert p.layout == "int8"
    assert p.zero_point == 0
    assert p.qs.dtype == np.int8


def test_compression_ratio():
    # packed planar Q4_K must stay well under bf16 size
    R, K = 256, 1024
    x = np.random.default_rng(2).standard_normal((R, K)).astype(np.float32)
    p = planar.planarize(codecs.quantize(x, Q.Q4_K), Q.Q4_K, (R, K))
    bf16_bytes = R * K * 2
    assert p.nbytes_packed < 0.45 * bf16_bytes  # 4 bits + f32 scale/offset /32


def test_planar_is_pytree():
    import jax

    R, K = 128, 256
    x = np.random.default_rng(3).standard_normal((R, K)).astype(np.float32)
    p = planar.planarize(codecs.quantize(x, Q.Q4_K), Q.Q4_K, (R, K))
    leaves, treedef = jax.tree_util.tree_flatten(p)
    assert len(leaves) == 3  # qs, scales, offsets
    p2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert p2.shape == p.shape and p2.layout == p.layout

    # usable as a jit argument
    @jax.jit
    def f(pq):
        return planar.dequantize_kmajor(pq).sum()

    assert np.isfinite(float(f(p)))


def test_bf16_scale_storage():
    """Opt-in bf16 scales: ~17% smaller, error bounded by scale rounding."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    R, K = 128, 512
    w = rng.standard_normal((R, K)).astype(np.float32)
    blocks = codecs.quantize(w, Q.Q4_K)
    p32 = planar.planarize(blocks, Q.Q4_K, (R, K))
    p16 = planar.planarize(blocks, Q.Q4_K, (R, K), scale_dtype=jnp.bfloat16)
    assert p16.scales.dtype == jnp.bfloat16
    assert p16.nbytes_packed < p32.nbytes_packed
    a = np.asarray(planar.dequantize(p32, jnp.float32))
    b = np.asarray(planar.dequantize(p16, jnp.float32))
    # bf16 scale rounding ≤ 2^-8 relative — far below 4-bit quant noise
    rel_l2 = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel_l2 < 1e-2, rel_l2  # scales+offsets each round at ~2^-9


def test_bf16_scales_within_quant_noise():
    """scale_dtype=bfloat16 halves scale bytes; dequant error must stay
    well below the Q4_K quantization noise itself."""
    import jax.numpy as jnp

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.quant import codecs
    from comfyui_gguf_tpu.quant.planar import dequantize, planarize

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 512)).astype(np.float32)
    blocks = codecs.quantize(w, Q.Q4_K)
    ref = codecs.dequantize(blocks, Q.Q4_K, (64, 512))
    quant_noise = np.abs(ref - w).mean()

    p16 = planarize(blocks, Q.Q4_K, (64, 512), scale_dtype=jnp.bfloat16)
    assert p16.scales.dtype == jnp.bfloat16
    got = np.asarray(dequantize(p16, jnp.float32))
    bf16_err = np.abs(got - ref).mean()
    # measured: ~6-7% of the Q4_K quantization noise (bf16 scale
    # rounding is ~2^-8 relative; noise dominates by >10x)
    assert bf16_err < 0.15 * quant_noise, (bf16_err, quant_noise)

    # kernel path consumes bf16 scale planes directly (interpret)
    from comfyui_gguf_tpu.ops.qmatmul import pallas_qmm, xla_qmm

    x = jnp.asarray(rng.standard_normal((16, 512)) * 0.3, jnp.float32)
    got_k = np.asarray(pallas_qmm(x, p16, dequant_dtype=jnp.float32,
                                  interpret=True))
    want_k = np.asarray(xla_qmm(x, p16, dequant_dtype=jnp.float32))
    np.testing.assert_allclose(got_k, want_k, rtol=2e-4, atol=2e-4)


def test_bf16_scales_env_knob(tmp_path, monkeypatch):
    """GGUF_TPU_BF16_SCALES=1 routes the loader's planarization."""
    import jax.numpy as jnp

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.gguf.writer import GGUFWriter
    from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
    from comfyui_gguf_tpu.quant import codecs

    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 1024)).astype(np.float32)
    wr = GGUFWriter("flux")
    wr.add_tensor("double_blocks.0.img_attn.qkv.weight",
                  codecs.quantize(w, Q.Q4_K), raw_dtype=Q.Q4_K,
                  raw_shape=(64, 1024))
    path = tmp_path / "m.gguf"
    wr.write_to_file(str(path))

    monkeypatch.setenv("GGUF_TPU_BF16_SCALES", "1")
    params = to_jax_params(gguf_sd_loader(str(path)))
    pq = params["double_blocks.0.img_attn.qkv.weight"]
    assert pq.scales.dtype == jnp.bfloat16
