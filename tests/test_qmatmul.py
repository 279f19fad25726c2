"""Fused dequant+matmul kernel vs dequant-then-dot oracle (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.ops.qmatmul import pallas_qmm, quantized_matmul, xla_qmm
from comfyui_gguf_tpu.quant import codecs, planar

QTYPES = [Q.Q4_0, Q.Q4_1, Q.Q5_0, Q.Q5_1, Q.Q8_0, Q.Q2_K, Q.Q3_K, Q.Q4_K,
          Q.Q5_K, Q.Q6_K, Q.IQ4_NL, Q.IQ4_XS]


def _mk_planar(qtype, R, K, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((R, K), dtype=np.float32)
    blocks = codecs.quantize(w, qtype)
    ref = codecs.dequantize(blocks, qtype, (R, K))
    pq = planar.planarize(blocks, qtype, (R, K))
    return pq, ref


@pytest.mark.parametrize("qtype", QTYPES)
def test_xla_qmm_matches_host_dequant(qtype):
    R, K = 192, 512
    pq, ref = _mk_planar(qtype, R, K)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, K), dtype=np.float32)
    got = np.asarray(xla_qmm(jnp.asarray(x), pq, dequant_dtype=jnp.float32))
    want = x @ ref.T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("qtype", QTYPES)
def test_pallas_qmm_matches_xla(qtype):
    R, K = 256, 512
    pq, _ = _mk_planar(qtype, R, K)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((48, K), dtype=np.float32))
    got = np.asarray(
        pallas_qmm(x, pq, dequant_dtype=jnp.float32, interpret=True)
    )
    want = np.asarray(xla_qmm(x, pq, dequant_dtype=jnp.float32))
    # fp32 accumulation order differs between the tiled kernel and one dot
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pallas_qmm_unpadded_out_features():
    # R=200 pads to 256 lanes; result must slice back to logical R
    pq, ref = _mk_planar(Q.Q4_K, 200, 512, seed=3)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((10, 512), dtype=np.float32)
    got = np.asarray(
        pallas_qmm(jnp.asarray(x), pq, dequant_dtype=jnp.float32,
                   interpret=True)
    )
    assert got.shape == (10, 200)
    np.testing.assert_allclose(got, x @ ref.T, rtol=2e-4, atol=2e-4)


def test_quantized_matmul_batched_leading_dims():
    pq, ref = _mk_planar(Q.Q8_0, 128, 256, seed=5)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 256), dtype=np.float32)
    got = np.asarray(
        quantized_matmul(jnp.asarray(x), pq, dequant_dtype=jnp.float32,
                         prefer_pallas=False)
    )
    assert got.shape == (2, 3, 128)
    np.testing.assert_allclose(got, x @ ref.T, rtol=2e-4, atol=2e-4)


def test_pallas_qmm_with_bf16_scales():
    R, K = 256, 512
    rng = np.random.default_rng(8)
    w = rng.standard_normal((R, K), dtype=np.float32)
    blocks = codecs.quantize(w, Q.Q4_K)
    p16 = planar.planarize(blocks, Q.Q4_K, (R, K),
                           scale_dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((16, K), dtype=np.float32))
    got = np.asarray(
        pallas_qmm(x, p16, dequant_dtype=jnp.float32, interpret=True))
    want = np.asarray(xla_qmm(x, p16, dequant_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("qtype", [Q.Q4_K, Q.Q8_0, Q.Q4_0])
def test_k_not_multiple_of_512_pads(qtype):
    """SD3.5-large regression: hidden=2432 (19*128) used to pick kt=64,
    an illegal Mosaic block. planarize now pads K to a 512 multiple with
    zero-contribution groups; kernel and oracle must agree and slice back
    to the logical width."""
    R, K = 192, 2432
    pq, ref = _mk_planar(qtype, R, K, seed=7)
    assert pq.in_features == K
    k_rows = pq.qs.shape[0]
    kp = k_rows * (2 if pq.layout == "nib4" else 1)
    assert kp % 512 == 0
    rng = np.random.default_rng(8)
    x = rng.standard_normal((16, K), dtype=np.float32)
    want = x @ ref.T
    got_xla = np.asarray(xla_qmm(jnp.asarray(x), pq, dequant_dtype=jnp.float32))
    np.testing.assert_allclose(got_xla, want, rtol=2e-4, atol=2e-4)
    got_pl = np.asarray(
        pallas_qmm(jnp.asarray(x), pq, dequant_dtype=jnp.float32,
                   interpret=True))
    assert got_pl.shape == (16, R)
    np.testing.assert_allclose(got_pl, want, rtol=1e-3, atol=2e-4)


def test_kt_candidates_are_mosaic_legal():
    from comfyui_gguf_tpu.ops.qmatmul import _pick_kt
    for k_rows in (1216, 1280, 2432, 2560, 1536, 768, 384):
        for gs in (16, 32):
            kt = _pick_kt(k_rows, gs)
            if kt is not None:
                assert kt % 128 == 0 and (kt // gs) % 8 == 0
                assert k_rows % kt == 0


def test_indexed_kernel_matches_sliced(monkeypatch):
    """pallas_qmm_indexed (scalar-prefetch depth gather) == pallas_qmm on
    the hand-sliced block, both interpret mode, all layouts."""
    import jax

    from comfyui_gguf_tpu.models.testing import random_planar
    from comfyui_gguf_tpu.ops import qmatmul

    rng = np.random.default_rng(0)
    for qtype in (Q.Q4_K, Q.Q8_0):
        st = random_planar(qtype, (256, 512), rng, stack=3)
        x = jnp.asarray(rng.standard_normal((16, 512)), jnp.float32)
        for i in range(3):
            got = qmatmul.pallas_qmm_indexed(
                x, st, jnp.int32(i), dequant_dtype=jnp.float32,
                interpret=True)
            sl = jax.tree_util.tree_map(lambda a: a[i], st)
            want = qmatmul.pallas_qmm(x, sl, dequant_dtype=jnp.float32,
                                      interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)


def test_indexed_under_scan_matches_loop():
    """indexed_matmul inside lax.scan == python loop over slices (the
    forward_stacked execution pattern)."""
    import jax

    from comfyui_gguf_tpu.models.testing import random_planar
    from comfyui_gguf_tpu.ops import qmatmul

    rng = np.random.default_rng(1)
    st = random_planar(Q.Q8_0, (512, 512), rng, stack=4)
    x0 = jnp.asarray(rng.standard_normal((8, 512)) * 0.1, jnp.float32)

    @jax.jit
    def scanned(x0, st):
        def body(x, i):
            o = qmatmul.indexed_matmul(x, st, i,
                                       dequant_dtype=jnp.float32,
                                       prefer_pallas=True)
            return jnp.tanh(o[:, :512]), None

        out, _ = jax.lax.scan(body, x0, jnp.arange(4))
        return out

    got = scanned(x0, st)

    x = x0
    for i in range(4):
        sl = jax.tree_util.tree_map(lambda a: a[i], st)
        o = qmatmul.xla_qmm(x, sl, dequant_dtype=jnp.float32)
        x = jnp.tanh(o[:, :512])
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=2e-4, atol=2e-4)


def test_fused_epilogue_matches_host():
    """In-kernel bias + (tail-)GELU epilogue == unfused composition,
    interpret mode, plain and indexed kernels."""
    import jax

    from comfyui_gguf_tpu.models.testing import random_planar
    from comfyui_gguf_tpu.ops import qmatmul

    rng = np.random.default_rng(3)
    R, K = 1024, 512  # r-tile 512 → tail must be a 512 multiple
    x = jnp.asarray(rng.standard_normal((16, K)) * 0.3, jnp.float32)
    for qtype in (Q.Q4_K, Q.Q8_0):
        pq = random_planar(qtype, (R, K), rng)
        bias = jnp.asarray(rng.standard_normal((R,)) * 0.2, jnp.float32)
        for tail in (0, 512):
            got = qmatmul.pallas_qmm(x, pq, dequant_dtype=jnp.float32,
                                     interpret=True, bias=bias,
                                     act_from_col=tail)
            base = qmatmul.pallas_qmm(x, pq, dequant_dtype=jnp.float32,
                                      interpret=True)
            want = qmatmul._host_epilogue(base, bias, tail)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)

        st = random_planar(qtype, (R, K), rng, stack=2)
        sbias = jnp.asarray(rng.standard_normal((2, R)) * 0.2, jnp.float32)
        for i in range(2):
            got = qmatmul.pallas_qmm_indexed(
                x, st, jnp.int32(i), dequant_dtype=jnp.float32,
                interpret=True, bias=sbias, act_from_col=512)
            sl = jax.tree_util.tree_map(lambda a: a[i], st)
            base = qmatmul.pallas_qmm(x, sl, dequant_dtype=jnp.float32,
                                      interpret=True)
            want = qmatmul._host_epilogue(base, sbias[i], 512)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)


def test_linear_gelu_layer_paths():
    """linear_gelu: fused (packed, interpret) == unfused (dense) on the
    same logical weight; patched weights fall back correctly."""
    from comfyui_gguf_tpu import lora
    from comfyui_gguf_tpu.nn.layers import QuantConfig, linear_gelu
    from comfyui_gguf_tpu.quant import codecs, planar

    rng = np.random.default_rng(4)
    R, K = 512, 512
    w = rng.standard_normal((R, K)).astype(np.float32) * 0.1
    blocks = codecs.quantize(w, Q.Q8_0)
    pq = planar.planarize(blocks, Q.Q8_0, (R, K))
    wd = codecs.dequantize(blocks, Q.Q8_0, (R, K))
    b = jnp.asarray(rng.standard_normal((R,)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((17, K)) * 0.3, jnp.float32)

    cfg_fused = QuantConfig(dequant_dtype=jnp.float32,
                            compute_dtype=jnp.float32, prefer_pallas=True)
    cfg_plain = QuantConfig(dequant_dtype=jnp.float32,
                            compute_dtype=jnp.float32, prefer_pallas=False)
    # tail 256 is NOT r-tile aligned at R=512 → dispatcher must fall back
    # to the unfused composition and still be correct
    got = linear_gelu(x, pq, b, tail_from=256, cfg=cfg_fused)
    want = linear_gelu(x, jnp.asarray(wd), b, tail_from=256, cfg=cfg_plain)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    patch = lora.LoRAPatch(up=jnp.zeros((R, 2), jnp.float32),
                           down=jnp.zeros((2, K), jnp.float32),
                           mid=None, diff=None, scale=1.0)
    pw = lora.PatchedWeight(pq, (patch,))
    got2 = linear_gelu(x, pw, b, tail_from=256, cfg=cfg_fused)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
