"""HyVid causal VAE: frame law (1+4k), causality, structure introspection."""

import jax.numpy as jnp
import numpy as np
import pytest

from comfyui_gguf_tpu.models import hyvid_vae
from comfyui_gguf_tpu.nn.layers import QuantConfig

F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                  prefer_pallas=False)
G = 4  # tiny group count via channel width 8 → use groups=32? widths must divide


def _conv3(rng, o, i, kt=3, kh=3, kw=3, s=0.1):
    return (rng.standard_normal((o, i, kt, kh, kw)) * s).astype(np.float32)


def _resnet(rng, p, cin, cout):
    sd = {
        f"{p}.norm1.weight": np.ones(cin, np.float32),
        f"{p}.norm1.bias": np.zeros(cin, np.float32),
        f"{p}.conv1.conv.weight": _conv3(rng, cout, cin),
        f"{p}.conv1.conv.bias": np.zeros(cout, np.float32),
        f"{p}.norm2.weight": np.ones(cout, np.float32),
        f"{p}.norm2.bias": np.zeros(cout, np.float32),
        f"{p}.conv2.conv.weight": _conv3(rng, cout, cout),
        f"{p}.conv2.conv.bias": np.zeros(cout, np.float32),
    }
    if cin != cout:
        sd[f"{p}.conv_shortcut.conv.weight"] = _conv3(rng, cout, cin, 1, 1, 1)
        sd[f"{p}.conv_shortcut.conv.bias"] = np.zeros(cout, np.float32)
    return sd


def _attn(rng, p, c):
    lin = lambda o, i: (rng.standard_normal((o, i)) * 0.1).astype(np.float32)
    return {
        f"{p}.group_norm.weight": np.ones(c, np.float32),
        f"{p}.group_norm.bias": np.zeros(c, np.float32),
        f"{p}.to_q.weight": lin(c, c), f"{p}.to_k.weight": lin(c, c),
        f"{p}.to_v.weight": lin(c, c), f"{p}.to_out.0.weight": lin(c, c),
        f"{p}.to_out.0.bias": np.zeros(c, np.float32),
    }


@pytest.fixture(scope="module")
def tiny():
    """3 up/down stages (2 with resamplers), temporal_ups=1, base 32
    channels (groups of 32 need C % 32 == 0)."""
    rng = np.random.default_rng(0)
    Z, C = 4, 32
    sd = {}
    sd["decoder.conv_in.conv.weight"] = _conv3(rng, C, Z)
    sd["decoder.conv_in.conv.bias"] = np.zeros(C, np.float32)
    sd.update(_resnet(rng, "decoder.mid_block.resnets.0", C, C))
    sd.update(_attn(rng, "decoder.mid_block.attentions.0", C))
    sd.update(_resnet(rng, "decoder.mid_block.resnets.1", C, C))
    # up block 0: temporal+spatial; up block 1: spatial only; block 2: none
    for b in (0, 1):
        sd.update(_resnet(rng, f"decoder.up_blocks.{b}.resnets.0", C, C))
        sd[f"decoder.up_blocks.{b}.upsamplers.0.conv.conv.weight"] = \
            _conv3(rng, C, C)
        sd[f"decoder.up_blocks.{b}.upsamplers.0.conv.conv.bias"] = \
            np.zeros(C, np.float32)
    sd.update(_resnet(rng, "decoder.up_blocks.2.resnets.0", C, C))
    sd["decoder.conv_norm_out.weight"] = np.ones(C, np.float32)
    sd["decoder.conv_norm_out.bias"] = np.zeros(C, np.float32)
    sd["decoder.conv_out.conv.weight"] = _conv3(rng, 3, C)
    sd["decoder.conv_out.conv.bias"] = np.zeros(3, np.float32)
    # encoder mirror
    sd["encoder.conv_in.conv.weight"] = _conv3(rng, C, 3)
    sd["encoder.conv_in.conv.bias"] = np.zeros(C, np.float32)
    for b in (0, 1):
        sd.update(_resnet(rng, f"encoder.down_blocks.{b}.resnets.0", C, C))
        sd[f"encoder.down_blocks.{b}.downsamplers.0.conv.conv.weight"] = \
            _conv3(rng, C, C)
        sd[f"encoder.down_blocks.{b}.downsamplers.0.conv.conv.bias"] = \
            np.zeros(C, np.float32)
    sd.update(_resnet(rng, "encoder.down_blocks.2.resnets.0", C, C))
    sd.update(_resnet(rng, "encoder.mid_block.resnets.0", C, C))
    sd.update(_attn(rng, "encoder.mid_block.attentions.0", C))
    sd.update(_resnet(rng, "encoder.mid_block.resnets.1", C, C))
    sd["encoder.conv_norm_out.weight"] = np.ones(C, np.float32)
    sd["encoder.conv_norm_out.bias"] = np.zeros(C, np.float32)
    sd["encoder.conv_out.conv.weight"] = _conv3(rng, 2 * Z, C)
    sd["encoder.conv_out.conv.bias"] = np.zeros(2 * Z, np.float32)
    params = {k: jnp.asarray(v) for k, v in sd.items()}
    import dataclasses

    cfg = dataclasses.replace(
        hyvid_vae.HyVidVAEConfig.from_state_dict(params), temporal_ups=1)
    return params, cfg


def test_decode_frame_and_spatial_law(tiny):
    params, cfg = tiny
    assert cfg.z_channels == 4
    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 4, 4, 4)), jnp.float32)
    out = hyvid_vae.decode(params, cfg, z, qcfg=F32)
    # one temporal doubling (2T-1=5), two spatial doublings (4 -> 16)
    assert out.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_decode_roundtrip(tiny):
    params, cfg = tiny
    vid = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 5, 16, 16, 3)) * 0.1, jnp.float32)
    z = hyvid_vae.encode(params, cfg, vid, qcfg=F32)
    assert z.shape == (1, 3, 4, 4, 4)
    out = hyvid_vae.decode(params, cfg, z, qcfg=F32)
    assert out.shape == vid.shape


def test_decode_causality(tiny):
    """Earlier output frames must not depend on later latent frames.

    GroupNorm couples all frames through its global statistics, so exact
    causality holds for the conv/upsample path; verify with norm weights
    neutralized is overkill — instead check the *conv* receptive property
    via the attention-free, norm-free subgraph: perturbing the last latent
    frame must leave frame 0 unchanged up to the norm-coupling tolerance
    and change the last frame much more."""
    params, cfg = tiny
    rng = np.random.default_rng(3)
    z1 = rng.standard_normal((1, 3, 4, 4, 4)).astype(np.float32)
    z2 = z1.copy()
    z2[:, -1] += 5.0
    o1 = np.asarray(hyvid_vae.decode(params, cfg, jnp.asarray(z1), qcfg=F32))
    o2 = np.asarray(hyvid_vae.decode(params, cfg, jnp.asarray(z2), qcfg=F32))
    d_first = np.abs(o1[:, 0] - o2[:, 0]).max()
    d_last = np.abs(o1[:, -1] - o2[:, -1]).max()
    assert d_last > 10 * max(d_first, 1e-6)


def test_mid_attn_mixes_spatially():
    """Heads-major layout regression (identity-attention bug): the mid
    attention must match a hand-rolled single-head softmax over H·W."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    C = 32
    p = "mid"
    sd = {k: jnp.asarray(v) for k, v in _attn(rng, p, C).items()}
    x = jnp.asarray(rng.standard_normal((1, 1, 3, 3, C)), jnp.float32)
    got = np.asarray(hyvid_vae._mid_attn(sd, p, x, F32))

    h = np.asarray(hyvid_vae._gn3d(x, sd[f"{p}.group_norm.weight"],
                                   sd[f"{p}.group_norm.bias"]))[0, 0]
    h2 = h.reshape(9, C)
    q = h2 @ np.asarray(sd[f"{p}.to_q.weight"]).T
    k = h2 @ np.asarray(sd[f"{p}.to_k.weight"]).T
    v = h2 @ np.asarray(sd[f"{p}.to_v.weight"]).T
    logits = (q @ k.T) * (C ** -0.5)
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    o = (probs @ v) @ np.asarray(sd[f"{p}.to_out.0.weight"]).T
    want = np.asarray(x)[0, 0].reshape(9, C) + o
    np.testing.assert_allclose(got[0, 0].reshape(9, C), want, rtol=2e-3,
                               atol=2e-3)
