"""int8 flash attention: kernel (interpret) vs same-math XLA vs f32 ref.

Discipline mirrors tests/test_i8mm.py: the Pallas kernel and the XLA
fallback consume IDENTICAL integer operands (shared
quantize_attn_inputs), so kernel-vs-fallback compares integer math; the
accuracy of the quantization itself is bounded against a float32
softmax reference separately.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.ops import i8attn


def _ref(q, k, v, scale):
    logits = np.einsum("bhqd,bhkd->bhqk",
                       q.astype(np.float32), k.astype(np.float32)) * scale
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", probs, v.astype(np.float32))


def _rand_qkv(rng, B, H, L, D, dtype=np.float32, Lk=None):
    Lk = Lk or L
    q = rng.standard_normal((B, H, L, D)).astype(dtype)
    k = rng.standard_normal((B, H, Lk, D)).astype(dtype)
    v = rng.standard_normal((B, H, Lk, D)).astype(dtype)
    return q, k, v


def test_kernel_matches_xla_same_math():
    """Same integer operands -> near-identical results. Two compiled
    programs may flip 0.5-tie p codes by <=1 ls; bound by the worst
    per-element contribution of a 1-code flip."""
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, 1, 2, 512, 128)
    scale = 128 ** -0.5
    got = np.asarray(i8attn.pallas_i8_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        interpret=True))
    want = np.asarray(i8attn.xla_i8_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale))
    # flash accumulation order + per-block p rescale differ from the
    # one-shot XLA softmax; both stay within int8-attention noise of the
    # f32 reference, and of each other
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_accuracy_vs_f32_reference():
    """Random N(0,1) q/k is the WORST case for the static-127 p scale:
    attention is near-uniform (max normalized prob ~1/40), so most p
    codes are small integers. Measured decomposition at this shape:
    p-quant 2.1%, q/k 0.9%, v 0.7%. Real (peaked) attention rows have
    fewer, larger p terms and quantize far better; the binding accuracy
    number is the model-level latent delta (tools_i8_model_ab)."""
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, 1, 2, 512, 128)
    scale = 128 ** -0.5
    want = _ref(q, k, v, scale)
    got = np.asarray(i8attn.pallas_i8_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        interpret=True))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.03, rel


def test_accuracy_qk_only_mode():
    """pv_int8=False keeps the PV dot in bf16: the dominant (p-quant)
    error term disappears and the bound tightens to q/k noise."""
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, 1, 2, 512, 128)
    scale = 128 ** -0.5
    want = _ref(q, k, v, scale)
    got = np.asarray(i8attn.pallas_i8_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        interpret=True, pv_int8=False))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.012, rel
    got_x = np.asarray(i8attn.xla_i8_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        pv_int8=False))
    np.testing.assert_allclose(got, got_x, atol=0.02, rtol=0.02)


def test_k_mean_smoothing_invariance():
    """A large common-mode K offset must not degrade accuracy — the
    smoothing subtracts it and the softmax is exactly invariant."""
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, 1, 1, 512, 128)
    k_shift = k + 25.0  # would saturate int8 range unsmoothed
    scale = 128 ** -0.5
    want = _ref(q, k_shift, v, scale)
    got = np.asarray(i8attn.pallas_i8_attention(
        jnp.asarray(q), jnp.asarray(k_shift), jnp.asarray(v), scale=scale,
        interpret=True))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.035, rel  # uniform-attention worst case (see above)


def test_lane_odd_keys_masked():
    """Lk not a lane multiple (sd3-style): pad keys masked in-kernel."""
    rng = np.random.default_rng(3)
    # Lq must stay block-tileable; keys pad 4250 -> 4352 in one block
    q, k, v = _rand_qkv(rng, 1, 1, 512, 128, Lk=250)
    scale = 128 ** -0.5
    want = _ref(q, k, v, scale)
    got = np.asarray(i8attn.pallas_i8_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        interpret=True))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.035, rel  # uniform-attention worst case (see above)


def test_multi_kv_block_online_softmax():
    """L large enough for several kv blocks: exercises the m/l rescale
    chain (the flash part), not just one-shot softmax."""
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, 1, 1, 1024, 128)
    # spread logits so the running max moves between blocks
    q[:, :, :, 0] += np.linspace(-3, 3, 1024)[None, None, :]
    scale = 128 ** -0.5
    want = _ref(q, k, v, scale)
    got = np.asarray(i8attn.pallas_i8_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        interpret=True))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.035, rel  # uniform-attention worst case (see above)


def test_bf16_inputs():
    rng = np.random.default_rng(5)
    q, k, v = _rand_qkv(rng, 1, 2, 512, 128)
    scale = 128 ** -0.5
    want = _ref(q, k, v, scale)
    got = np.asarray(i8attn.pallas_i8_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), scale=scale,
        interpret=True).astype(jnp.float32))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.03, rel  # adds bf16 input rounding


def test_gate():
    rng = np.random.default_rng(6)
    q, k, v = _rand_qkv(rng, 1, 1, 512, 128)
    assert i8attn.i8_attention_ok(jnp.asarray(q), jnp.asarray(k))
    qc, kc, _ = _rand_qkv(rng, 1, 1, 512, 128, Lk=768)
    assert not i8attn.i8_attention_ok(jnp.asarray(qc), jnp.asarray(kc))
    qs, ks, _ = _rand_qkv(rng, 1, 1, 256, 64)
    assert not i8attn.i8_attention_ok(jnp.asarray(qs), jnp.asarray(ks))


def test_untileable_raises():
    rng = np.random.default_rng(7)
    q, k, v = _rand_qkv(rng, 1, 1, 512, 64)
    with pytest.raises(ValueError):
        i8attn.pallas_i8_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            scale=1.0, interpret=True)


def test_i8_dot_product_attention_forced_interpret():
    """GGUF_TPU_PALLAS_INTERPRET=1 must route i8_dot_product_attention
    through the Pallas kernel body even off-TPU (round-4 advisor: without
    this the fast CPU gate only ever validates the XLA same-math path —
    a silent kernel-coverage regression)."""
    import os

    rng = np.random.default_rng(11)
    q, k, v = _rand_qkv(rng, 1, 2, 512, 128)
    want = _ref(q, k, v, 128 ** -0.5)
    os.environ["GGUF_TPU_PALLAS_INTERPRET"] = "1"
    try:
        got = np.asarray(i8attn.i8_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            scale=128 ** -0.5))
    finally:
        del os.environ["GGUF_TPU_PALLAS_INTERPRET"]
    # kernel and XLA path consume identical integer operands — forced
    # kernel output must match the XLA same-math path bit-for-bit
    xla = np.asarray(i8attn.xla_i8_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=128 ** -0.5))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert 1e-6 < rel < 0.035, rel  # int8 noise present -> int path taken
    np.testing.assert_allclose(got, xla, rtol=2e-3, atol=2e-3)


def test_dispatcher_context():
    """attention_i8 scope routes eligible shapes through the int8 path
    (interpret-mode kernel on CPU) and leaves ineligible shapes on the
    bf16 fallback."""
    import os

    from comfyui_gguf_tpu.nn import attention

    rng = np.random.default_rng(8)
    q, k, v = _rand_qkv(rng, 1, 2, 512, 128)
    want = _ref(q, k, v, 128 ** -0.5)
    os.environ["GGUF_TPU_PALLAS_INTERPRET"] = "1"
    try:
        with attention.attention_i8("pv"):
            got = np.asarray(attention.dot_product_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    finally:
        del os.environ["GGUF_TPU_PALLAS_INTERPRET"]
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert 1e-6 < rel < 0.035, rel  # int8 noise PRESENT -> i8 path taken
    # outside the scope: exact bf16/XLA fallback path
    got2 = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-5)
