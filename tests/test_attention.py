"""Attention dispatcher tests (CPU fallback path + gates)."""

import numpy as np

import jax.numpy as jnp

from comfyui_gguf_tpu.nn import attention


def _ref(q, k, v, scale):
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", probs, v)


def test_matches_reference_softmax():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 3, 5, 8)).astype(np.float32)
    k = rng.standard_normal((2, 3, 7, 8)).astype(np.float32)
    v = rng.standard_normal((2, 3, 7, 8)).astype(np.float32)
    got = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = _ref(q, k, v, 8 ** -0.5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_custom_scale():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 1, 4, 8)).astype(np.float32)
    got = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), scale=1.0))
    want = _ref(q, q, q, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_splash_lane_odd_sublane_hd_interpret():
    """Widened splash path matches the softmax reference exactly.

    Lane-odd L with D < 128 takes SINK-DIMENSION masking (round 5: one
    extra feature dim biases pad-key logits to -1e9 — no mask-info
    operand, the fix for the NumpyMask VMEM OOM); D = 128 keeps the
    static NumpyMask. Covers sd3.5-large's 4250-token hd=64 joint
    attention, lumina2 hd=96, and the hd=128 NumpyMask fallback."""
    rng = np.random.default_rng(2)
    for L, D in ((650, 64), (640, 96), (650, 128)):
        q = rng.standard_normal((1, 2, L, D)).astype(np.float32)
        k = rng.standard_normal((1, 2, L, D)).astype(np.float32)
        v = rng.standard_normal((1, 2, L, D)).astype(np.float32)
        got = np.asarray(attention._splash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            D ** -0.5, interpret=True))
        want = _ref(q, k, v, D ** -0.5)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_gate_shapes():
    z = jnp.zeros
    # aligned long sequence qualifies
    assert attention._flash_ok(z((1, 2, 512, 128)), z((1, 2, 512, 128)))
    # short or misaligned sequences fall back
    assert not attention._flash_ok(z((1, 2, 384, 128)), z((1, 2, 384, 128)))
    # sub-lane head dims are kernel-legal (sd3.5-large hd=64)
    assert attention._flash_ok(z((1, 2, 512, 64)), z((1, 2, 512, 64)))
    # >lane head dims must still be lane multiples
    assert not attention._flash_ok(z((1, 2, 512, 192)), z((1, 2, 512, 192)))
    # lane-odd lengths are now accepted (masked padding in dispatcher)
    assert attention._flash_ok(z((1, 2, 520, 128)), z((1, 2, 520, 128)))


def test_pad_target_minimizes_padded_cost():
    """Flash pad length: minimize (Lp/L)² × per-block-cost. hyvid's
    34,936 joint tokens land on 35,328 = 512·69 (the bare 128-multiple
    34,944 forced 128-blocks: measured 4.8× slowdown); sd3's 4250 pads
    all the way to 4608 = 512·9 (kernel A/B: 4.91 ms vs 8.30 on
    256-blocks despite +8.4% rows); lane/512-multiples stay unchanged;
    tiny lengths avoid absurd padding."""
    from comfyui_gguf_tpu.nn import attention as A

    assert A._pad_target(34936) == 35328 and 35328 % 512 == 0
    assert A._pad_target(4250) == 4608 and 4608 % 512 == 0
    assert A._pad_target(32760) == 32768  # wan: already 512·64
    assert A._pad_target(4608) == 4608    # flux: unchanged
    assert A._pad_target(512) == 512
    assert A._pad_target(130) == 256  # 512-pad would quadruple the work
