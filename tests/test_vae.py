"""VAE structure tests: tiny sgm-format autoencoder, decode/encode shapes,
scale/shift handling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.models import vae
from comfyui_gguf_tpu.nn.layers import QuantConfig

CH, ZC = 32, 4
MULT = (1, 2)
NRES = 1

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _conv(rng, o, i, k=3):
    return (rng.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)


def _resnet_params(rng, p, cin, cout):
    sd = {
        f"{p}.norm1.weight": np.ones(cin, np.float32),
        f"{p}.norm1.bias": np.zeros(cin, np.float32),
        f"{p}.conv1.weight": _conv(rng, cout, cin),
        f"{p}.conv1.bias": np.zeros(cout, np.float32),
        f"{p}.norm2.weight": np.ones(cout, np.float32),
        f"{p}.norm2.bias": np.zeros(cout, np.float32),
        f"{p}.conv2.weight": _conv(rng, cout, cout),
        f"{p}.conv2.bias": np.zeros(cout, np.float32),
    }
    if cin != cout:
        sd[f"{p}.nin_shortcut.weight"] = _conv(rng, cout, cin, 1)
        sd[f"{p}.nin_shortcut.bias"] = np.zeros(cout, np.float32)
    return sd


def _attn_params(rng, p, c):
    sd = {f"{p}.norm.weight": np.ones(c, np.float32),
          f"{p}.norm.bias": np.zeros(c, np.float32)}
    for n in ("q", "k", "v", "proj_out"):
        sd[f"{p}.{n}.weight"] = _conv(rng, c, c, 1)
        sd[f"{p}.{n}.bias"] = np.zeros(c, np.float32)
    return sd


@pytest.fixture(scope="module")
def tiny_vae():
    rng = np.random.default_rng(0)
    top = CH * MULT[-1]
    sd = {
        "decoder.conv_in.weight": _conv(rng, top, ZC),
        "decoder.conv_in.bias": np.zeros(top, np.float32),
        "decoder.norm_out.weight": np.ones(CH, np.float32),
        "decoder.norm_out.bias": np.zeros(CH, np.float32),
        "decoder.conv_out.weight": _conv(rng, 3, CH),
        "decoder.conv_out.bias": np.zeros(3, np.float32),
        "encoder.conv_in.weight": _conv(rng, CH, 3),
        "encoder.conv_in.bias": np.zeros(CH, np.float32),
        "encoder.norm_out.weight": np.ones(top, np.float32),
        "encoder.norm_out.bias": np.zeros(top, np.float32),
        "encoder.conv_out.weight": _conv(rng, 2 * ZC, top),
        "encoder.conv_out.bias": np.zeros(2 * ZC, np.float32),
    }
    sd.update(_resnet_params(rng, "decoder.mid.block_1", top, top))
    sd.update(_attn_params(rng, "decoder.mid.attn_1", top))
    sd.update(_resnet_params(rng, "decoder.mid.block_2", top, top))
    sd.update(_resnet_params(rng, "encoder.mid.block_1", top, top))
    sd.update(_attn_params(rng, "encoder.mid.attn_1", top))
    sd.update(_resnet_params(rng, "encoder.mid.block_2", top, top))
    # decoder up levels (reversed traversal: level 1 @64 then level 0 @32)
    chans = {0: CH * MULT[0], 1: CH * MULT[1]}
    cur = top
    for i in (1, 0):
        for j in range(NRES + 1):
            sd.update(_resnet_params(rng, f"decoder.up.{i}.block.{j}", cur,
                                     chans[i]))
            cur = chans[i]
        if i > 0:
            sd[f"decoder.up.{i}.upsample.conv.weight"] = _conv(rng, cur, cur)
            sd[f"decoder.up.{i}.upsample.conv.bias"] = np.zeros(
                cur, np.float32)
    # encoder down levels
    cur = CH
    for i in (0, 1):
        for j in range(NRES):
            sd.update(_resnet_params(rng, f"encoder.down.{i}.block.{j}", cur,
                                     chans[i]))
            cur = chans[i]
        if i < 1:
            sd[f"encoder.down.{i}.downsample.conv.weight"] = _conv(
                rng, cur, cur)
            sd[f"encoder.down.{i}.downsample.conv.bias"] = np.zeros(
                cur, np.float32)
    return {k: jnp.asarray(v) for k, v in sd.items()}


@pytest.fixture(scope="module")
def cfg():
    return vae.VAEConfig(z_channels=ZC, base_ch=CH, ch_mult=MULT,
                         num_res_blocks=NRES, scale_factor=0.18215,
                         shift_factor=0.0, has_quant_conv=False)


def test_decode_shape(tiny_vae, cfg):
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((2, 6, 6, ZC)), jnp.float32)
    img = vae.decode(tiny_vae, cfg, z, qcfg=F32CFG)
    assert img.shape == (2, 12, 12, 3)  # one upsample level
    assert np.isfinite(np.asarray(img)).all()


def test_encode_shape_and_determinism(tiny_vae, cfg):
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((1, 12, 12, 3)) * 0.5, jnp.float32)
    z1 = vae.encode(tiny_vae, cfg, img, qcfg=F32CFG)
    z2 = vae.encode(tiny_vae, cfg, img, qcfg=F32CFG)
    assert z1.shape == (1, 6, 6, ZC)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    z3 = vae.encode(tiny_vae, cfg, img, qcfg=F32CFG,
                    sample_key=jax.random.key(0))
    assert not np.allclose(np.asarray(z1), np.asarray(z3))


def test_config_detection(tiny_vae):
    c = vae.VAEConfig.from_state_dict(tiny_vae)
    assert c.z_channels == 4 and c.scale_factor == 0.18215
    assert not c.has_quant_conv


def test_sd_style_quant_conv_branch(tiny_vae, cfg):
    """SD1/SDXL VAEs wrap latents in (post_)quant_conv 1×1 convs."""
    import dataclasses

    rng = np.random.default_rng(3)
    params = dict(tiny_vae)
    params["post_quant_conv.weight"] = jnp.asarray(
        (rng.standard_normal((ZC, ZC, 1, 1)) * 0.1 +
         np.eye(ZC)[:, :, None, None]).astype(np.float32))
    params["post_quant_conv.bias"] = jnp.zeros(ZC, jnp.float32)
    params["quant_conv.weight"] = jnp.asarray(
        (rng.standard_normal((2 * ZC, 2 * ZC, 1, 1)) * 0.1 +
         np.eye(2 * ZC)[:, :, None, None]).astype(np.float32))
    params["quant_conv.bias"] = jnp.zeros(2 * ZC, jnp.float32)
    qcfg = dataclasses.replace(cfg, has_quant_conv=True)

    z = jnp.asarray(rng.standard_normal((1, 6, 6, ZC)), jnp.float32)
    img = vae.decode(params, qcfg, z, qcfg=F32CFG)
    assert img.shape == (1, 12, 12, 3)
    # quant_conv changes the result vs the conv-less config
    img0 = vae.decode(tiny_vae, cfg, z, qcfg=F32CFG)
    assert not np.allclose(np.asarray(img), np.asarray(img0))

    im = jnp.asarray(rng.standard_normal((1, 12, 12, 3)) * 0.3, jnp.float32)
    lat = vae.encode(params, qcfg, im, qcfg=F32CFG)
    assert lat.shape == (1, 6, 6, ZC)
    assert np.isfinite(np.asarray(lat)).all()


def test_tiled_apply_identity_exact():
    """fn = identity, factor 1: the feathered blend must reproduce the
    input EXACTLY (weights are a convex partition wherever tiles overlap)
    — including the shifted last tile on a non-divisible size."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 21, 13, 3)), jnp.float32)
    out = vae.tiled_apply(lambda t: t, x, tile=8, overlap=4, factor=1,
                          out_channels=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_tiled_apply_local_fn_exact():
    """A translation-invariant LOCAL fn (2× nearest upsample) commutes
    with tiling exactly — validates position/factor bookkeeping."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 12, 18, 2)), jnp.float32)

    def up2(t):
        B, H, W, C = t.shape
        return jax.image.resize(t, (B, 2 * H, 2 * W, C), method="nearest")

    want = up2(x)
    got = vae.tiled_apply(up2, x, tile=6, overlap=2, factor=2,
                          out_channels=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_decode_tiled(tiny_vae, cfg):
    """decode_tiled: correct shape, finite, and close to the global
    decode away from the per-tile GroupNorm approximation (the standard
    tiled-VAE tradeoff); small inputs fall through to direct decode."""
    rng = np.random.default_rng(9)
    z = jnp.asarray(rng.standard_normal((1, 24, 20, ZC)) * 0.5,
                    jnp.float32)
    f = vae.spatial_factor(cfg)
    want = vae.decode(tiny_vae, cfg, z)
    got = vae.decode_tiled(tiny_vae, cfg, z, tile=16, overlap=8)
    assert got.shape == (1, 24 * f, 20 * f, 3)
    assert np.isfinite(np.asarray(got)).all()
    # per-tile GroupNorm stats differ from global; tolerance is loose by
    # design but the images must agree to first order
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() < 0.25 * scale + 0.05, (err.max(), scale)
    # small input: exact (single tile short-circuits to direct decode)
    small = vae.decode_tiled(tiny_vae, cfg, z[:, :8, :8], tile=16)
    np.testing.assert_allclose(np.asarray(small),
                               np.asarray(vae.decode(tiny_vae, cfg,
                                                     z[:, :8, :8])),
                               rtol=1e-5, atol=1e-5)


def test_encode_tiled(tiny_vae, cfg):
    rng = np.random.default_rng(10)
    f = vae.spatial_factor(cfg)
    img = jnp.asarray(np.tanh(rng.standard_normal((1, 40 * f, 24 * f, 3))),
                      jnp.float32)
    want = vae.encode(tiny_vae, cfg, img)
    got = vae.encode_tiled(tiny_vae, cfg, img, tile=16 * f, overlap=8 * f)
    assert got.shape == want.shape
    assert np.isfinite(np.asarray(got)).all()
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() < 0.25 * scale + 0.05, (err.max(), scale)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiples"):
        vae.encode_tiled(tiny_vae, cfg, img, tile=15, overlap=3)


def test_auto_tiling_env(tiny_vae, cfg, monkeypatch):
    """decode_auto/encode_auto: direct when unset, tiled when the latent
    exceeds GGUF_TPU_VAE_TILE."""
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.standard_normal((1, 20, 20, ZC)) * 0.5, jnp.float32)
    monkeypatch.delenv("GGUF_TPU_VAE_TILE", raising=False)
    direct = vae.decode_auto(tiny_vae, cfg, z)
    np.testing.assert_array_equal(np.asarray(direct),
                                  np.asarray(vae.decode(tiny_vae, cfg, z)))
    monkeypatch.setenv("GGUF_TPU_VAE_TILE", "16")
    tiled = vae.decode_auto(tiny_vae, cfg, z)
    want = vae.decode_tiled(tiny_vae, cfg, z, tile=16, overlap=4)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(want))
    f = vae.spatial_factor(cfg)
    img = jnp.asarray(np.tanh(rng.standard_normal((1, 20 * f, 20 * f, 3))),
                      jnp.float32)
    te = vae.encode_auto(tiny_vae, cfg, img)
    we = vae.encode_tiled(tiny_vae, cfg, img, tile=16 * f, overlap=4 * f)
    np.testing.assert_array_equal(np.asarray(te), np.asarray(we))


def test_tiled_apply_strip_feather_clamp():
    """Degenerate strip tiles (one side smaller than the overlap) must
    stay legal: the feather clamps per axis and identity still holds."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 4, 40, 3)), jnp.float32)
    out = vae.tiled_apply(lambda t: t, x, tile=8, overlap=4, factor=1,
                          out_channels=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)
