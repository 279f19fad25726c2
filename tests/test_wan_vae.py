"""Wan causal 3-D VAE: shape law (1+4k frames), causality, introspection."""

import jax.numpy as jnp
import numpy as np
import pytest

from comfyui_gguf_tpu.models import wan_vae
from comfyui_gguf_tpu.nn.layers import QuantConfig

F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                  prefer_pallas=False)


def _conv3(rng, o, i, kt=3, kh=3, kw=3, s=0.15):
    return (rng.standard_normal((o, i, kt, kh, kw)) * s).astype(np.float32)


def _conv2(rng, o, i, k=3, s=0.15):
    return (rng.standard_normal((o, i, k, k)) * s).astype(np.float32)


def _res_block(rng, p, cin, cout):
    sd = {
        f"{p}.residual.0.gamma": np.ones(cin, np.float32),
        f"{p}.residual.2.weight": _conv3(rng, cout, cin),
        f"{p}.residual.2.bias": np.zeros(cout, np.float32),
        f"{p}.residual.3.gamma": np.ones(cout, np.float32),
        f"{p}.residual.6.weight": _conv3(rng, cout, cout),
        f"{p}.residual.6.bias": np.zeros(cout, np.float32),
    }
    if cin != cout:
        sd[f"{p}.shortcut.weight"] = _conv3(rng, cout, cin, 1, 1, 1)
        sd[f"{p}.shortcut.bias"] = np.zeros(cout, np.float32)
    return sd


def _attn_block(rng, p, c):
    return {
        f"{p}.norm.gamma": np.ones(c, np.float32),
        f"{p}.to_qkv.weight": _conv2(rng, 3 * c, c, 1),
        f"{p}.to_qkv.bias": np.zeros(3 * c, np.float32),
        f"{p}.proj.weight": _conv2(rng, c, c, 1),
        f"{p}.proj.bias": np.zeros(c, np.float32),
    }


def _upsample(rng, p, c, temporal):
    sd = {
        f"{p}.resample.1.weight": _conv2(rng, c // 2, c),
        f"{p}.resample.1.bias": np.zeros(c // 2, np.float32),
    }
    if temporal:
        sd[f"{p}.time_conv.weight"] = _conv3(rng, 2 * c, c, 3, 1, 1)
        sd[f"{p}.time_conv.bias"] = np.zeros(2 * c, np.float32)
    return sd


def _downsample(rng, p, c, temporal):
    sd = {
        f"{p}.resample.1.weight": _conv2(rng, c, c),
        f"{p}.resample.1.bias": np.zeros(c, np.float32),
    }
    if temporal:
        sd[f"{p}.time_conv.weight"] = _conv3(rng, c, c, 3, 1, 1)
        sd[f"{p}.time_conv.bias"] = np.zeros(c, np.float32)
    return sd


@pytest.fixture(scope="module")
def tiny_vae():
    """2 scales, one temporal up/down, base 8, z=4 — structure of the real
    Wan VAE at toy width (real: 3 scales, 2 temporal, base 96, z=16)."""
    rng = np.random.default_rng(0)
    Z, C1, C0 = 4, 16, 8  # decoder runs C1 → C1//2=C0
    sd = {}
    # decoder: conv1, middle (res attn res), upsamples, head
    sd["conv2.weight"] = _conv3(rng, Z, Z, 1, 1, 1)
    sd["conv2.bias"] = np.zeros(Z, np.float32)
    sd["decoder.conv1.weight"] = _conv3(rng, C1, Z)
    sd["decoder.conv1.bias"] = np.zeros(C1, np.float32)
    sd.update(_res_block(rng, "decoder.middle.0", C1, C1))
    sd.update(_attn_block(rng, "decoder.middle.1", C1))
    sd.update(_res_block(rng, "decoder.middle.2", C1, C1))
    sd.update(_res_block(rng, "decoder.upsamples.0", C1, C1))
    sd.update(_upsample(rng, "decoder.upsamples.1", C1, temporal=True))
    sd.update(_res_block(rng, "decoder.upsamples.2", C0, C0))
    sd.update(_upsample(rng, "decoder.upsamples.3", C0, temporal=False))
    sd.update(_res_block(rng, "decoder.upsamples.4", C0 // 2, C0 // 2))
    sd["decoder.head.0.gamma"] = np.ones(C0 // 2, np.float32)
    sd["decoder.head.2.weight"] = _conv3(rng, 3, C0 // 2)
    sd["decoder.head.2.bias"] = np.zeros(3, np.float32)
    # encoder: conv1, downsamples, middle, head, quant conv
    sd["encoder.conv1.weight"] = _conv3(rng, C0, 3)
    sd["encoder.conv1.bias"] = np.zeros(C0, np.float32)
    sd.update(_res_block(rng, "encoder.downsamples.0", C0, C0))
    sd.update(_downsample(rng, "encoder.downsamples.1", C0, temporal=False))
    sd.update(_res_block(rng, "encoder.downsamples.2", C0, C1))
    sd.update(_downsample(rng, "encoder.downsamples.3", C1, temporal=True))
    sd.update(_res_block(rng, "encoder.middle.0", C1, C1))
    sd.update(_attn_block(rng, "encoder.middle.1", C1))
    sd.update(_res_block(rng, "encoder.middle.2", C1, C1))
    sd["encoder.head.0.gamma"] = np.ones(C1, np.float32)
    sd["encoder.head.2.weight"] = _conv3(rng, 2 * Z, C1)
    sd["encoder.head.2.bias"] = np.zeros(2 * Z, np.float32)
    sd["conv1.weight"] = _conv3(rng, 2 * Z, 2 * Z, 1, 1, 1)
    sd["conv1.bias"] = np.zeros(2 * Z, np.float32)
    params = {k: jnp.asarray(v) for k, v in sd.items()}
    cfg = wan_vae.WanVAEConfig.from_state_dict(params)
    return params, cfg


def test_decode_shape_law(tiny_vae):
    """T latent frames → 1 + 2(T−1) pixel frames (one temporal doubling
    in the tiny config; the real model doubles twice → 1+4(T−1))."""
    params, cfg = tiny_vae
    assert cfg.z_channels == 4
    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 4, 4, 4)), jnp.float32)
    out = wan_vae.decode(params, cfg, z, qcfg=F32)
    assert out.shape == (1, 5, 16, 16, 3)  # 2*3-1 frames, 4x spatial
    assert np.isfinite(np.asarray(out)).all()


def test_decode_single_frame_image(tiny_vae):
    params, cfg = tiny_vae
    z = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 1, 4, 4, 4)), jnp.float32)
    out = wan_vae.decode(params, cfg, z, qcfg=F32)
    assert out.shape == (1, 1, 16, 16, 3)


def test_encode_decode_roundtrip_shapes(tiny_vae):
    params, cfg = tiny_vae
    vid = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 5, 16, 16, 3)) * 0.1, jnp.float32)
    z = wan_vae.encode(params, cfg, vid, qcfg=F32)
    assert z.shape == (1, 3, 4, 4, 4)  # 1+ (5-1)/2 frames, /4 spatial
    out = wan_vae.decode(params, cfg, z, qcfg=F32)
    assert out.shape == vid.shape


def test_temporal_causality(tiny_vae):
    """Frame t of the decode must not change when later latent frames
    change (the property the causal padding exists for)."""
    params, cfg = tiny_vae
    rng = np.random.default_rng(4)
    z1 = rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32)
    z2 = z1.copy()
    z2[:, -1] += 10.0  # perturb ONLY the last latent frame
    o1 = np.asarray(wan_vae.decode(params, cfg, jnp.asarray(z1), qcfg=F32))
    o2 = np.asarray(wan_vae.decode(params, cfg, jnp.asarray(z2), qcfg=F32))
    # frames before the last latent's receptive field are identical
    np.testing.assert_array_equal(o1[:, :3], o2[:, :3])
    assert np.abs(o1[:, -1] - o2[:, -1]).max() > 0


def test_decode_tiled_matches_direct(tiny_vae):
    """Spatially-tiled decode: same shape/temporal law as direct decode,
    agreement to first order (per-tile GroupNorm approximation), exact
    single-tile short circuit."""
    params, cfg = tiny_vae
    z = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 3, 12, 10, 4)) * 0.5, jnp.float32)
    want = np.asarray(wan_vae.decode(params, cfg, z, qcfg=F32))
    got = np.asarray(wan_vae.decode_tiled(params, cfg, z, tile=6,
                                          overlap=2, qcfg=F32))
    # shape + temporal law preserved; numeric agreement is NOT asserted:
    # the mid-block attention and GroupNorms are global ops, and at
    # RANDOM weights per-tile stats diverge arbitrarily (trained VAEs
    # are what make the standard tiled approximation mild). The blend
    # machinery itself is proven exact in test_tiled_video_machinery.
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    small = np.asarray(wan_vae.decode_tiled(params, cfg, z[:, :, :4, :4],
                                            tile=8, qcfg=F32))
    np.testing.assert_allclose(
        small, np.asarray(wan_vae.decode(params, cfg, z[:, :, :4, :4],
                                         qcfg=F32)), rtol=1e-5, atol=1e-5)


def test_tiled_video_machinery():
    """tiled_apply_video with an identity fn reproduces the input
    exactly (convex feather partition); a local pixel-shuffle upsampler
    (the LTXV/wan upsampling primitive, T doubling included) commutes
    with spatial tiling exactly."""
    from comfyui_gguf_tpu.models.vae import tiled_apply_video

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 3, 13, 11, 4)), jnp.float32)
    out = tiled_apply_video(lambda t: t, x, tile=6, overlap=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)

    def up(t):
        B, T, H, W, C = t.shape
        t2 = jnp.repeat(jnp.repeat(t, 2, axis=2), 2, axis=3)
        return jnp.repeat(t2, 2, axis=1)[:, :2 * T - 1]

    want = up(x)
    got = tiled_apply_video(up, x, tile=5, overlap=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_attention_block_mixes_spatially():
    """The mid attention must MIX spatial positions — heads-major layout
    regression: (N, H*W, 1, C) silently made it identity. Reference: a
    hand-rolled single-head softmax over the H*W positions."""
    rng = np.random.default_rng(9)
    C = 8
    p = "blk"
    params = {
        f"{p}.norm.gamma": jnp.ones(C, jnp.float32),
        f"{p}.to_qkv.weight": jnp.asarray(
            rng.standard_normal((3 * C, C, 1, 1)) * 0.3, jnp.float32),
        f"{p}.proj.weight": jnp.asarray(
            np.eye(C, dtype=np.float32)[:, :, None, None]),
    }
    x = jnp.asarray(rng.standard_normal((1, 1, 3, 3, C)), jnp.float32)
    got = np.asarray(wan_vae._attention_block(params, p, x, F32))

    # hand-rolled reference over the same normed input
    h = np.asarray(wan_vae._rms(x, params[f"{p}.norm.gamma"]))[0, 0]
    w3 = np.asarray(params[f"{p}.to_qkv.weight"])[:, :, 0, 0]
    qkv = h.reshape(9, C) @ w3.T
    q, k, v = np.split(qkv, 3, axis=-1)
    logits = (q @ k.T) * (C ** -0.5)
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    want = np.asarray(x)[0, 0].reshape(9, C) + probs @ v
    np.testing.assert_allclose(got[0, 0].reshape(9, C), want, rtol=2e-3,
                               atol=2e-3)
