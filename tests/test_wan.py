"""Wan 2.1 video DiT tests: tiny config through GGUF incl. the 5-D
patch-embed sidecar flow."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGUFValueType
from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import wan
from comfyui_gguf_tpu.nn.layers import QuantConfig

DIM, FFN, LAYERS, TDIM, C = 128, 256, 2, 64, 16

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _tiny_wan(rng):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "patch_embedding.weight": t(DIM, C, 1, 2, 2),
        "patch_embedding.bias": t(DIM),
        "text_embedding.0.weight": t(DIM, TDIM),
        "text_embedding.0.bias": t(DIM),
        "text_embedding.2.weight": t(DIM, DIM),
        "text_embedding.2.bias": t(DIM),
        "time_embedding.0.weight": t(DIM, 256),
        "time_embedding.0.bias": t(DIM),
        "time_embedding.2.weight": t(DIM, DIM),
        "time_embedding.2.bias": t(DIM),
        "time_projection.1.weight": t(6 * DIM, DIM),
        "time_projection.1.bias": t(6 * DIM),
        "head.modulation": t(1, 2, DIM),
        "head.head.weight": t(C * 4, DIM),
        "head.head.bias": t(C * 4),
    }
    for i in range(LAYERS):
        p = f"blocks.{i}."
        sd[p + "modulation"] = t(1, 6, DIM)
        for a in ("self_attn", "cross_attn"):
            for n in ("q", "k", "v", "o"):
                sd[p + f"{a}.{n}.weight"] = t(DIM, DIM)
                sd[p + f"{a}.{n}.bias"] = t(DIM)
            sd[p + f"{a}.norm_q.weight"] = t(DIM) + 1
            sd[p + f"{a}.norm_k.weight"] = t(DIM) + 1
        sd[p + "norm3.weight"] = t(DIM) + 1
        sd[p + "norm3.bias"] = t(DIM)
        sd[p + "ffn.0.weight"] = t(FFN, DIM)
        sd[p + "ffn.0.bias"] = t(FFN)
        sd[p + "ffn.2.weight"] = t(DIM, FFN)
        sd[p + "ffn.2.bias"] = t(DIM)
    return sd


def _write_gguf(sd, path):
    """5-D patch embed stored 4-D with orig_shape metadata, like the
    fix_5d_tensors flow produces."""
    w = GGUFWriter("wan")
    pfx = "model.diffusion_model."
    for k, v in sd.items():
        if v.ndim > 4:
            stored = v.reshape(-1, *v.shape[-3:])
            w.add_tensor(pfx + k, stored)
            w.add_field(f"comfy.gguf.orig_shape.{pfx}{k}",
                        GGUFValueType.ARRAY, [int(d) for d in v.shape],
                        GGUFValueType.INT32)
        else:
            w.add_tensor(pfx + k, v)
    w.write_to_file(str(path))


@pytest.fixture(scope="module")
def wan_params(tmp_path_factory):
    sd = _tiny_wan(np.random.default_rng(0))
    p = tmp_path_factory.mktemp("wan") / "wan.gguf"
    _write_gguf(sd, p)
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "wan"
    return to_jax_params(raw, F32CFG)


def test_wan_config(wan_params):
    cfg = wan.WanConfig.from_state_dict(wan_params)
    assert cfg.dim == DIM and cfg.n_layers == LAYERS
    assert cfg.n_heads == 1 and cfg.head_dim == 128
    assert cfg.patch == (1, 2, 2)
    assert cfg.out_channels == C
    assert sum(cfg.axes_dim) == 128
    assert all(d % 2 == 0 for d in cfg.axes_dim)
    # 5-D conv kernel restored through orig_shape metadata
    assert wan_params["patch_embedding.weight"].shape == (DIM, C, 1, 2, 2)


def test_wan_forward(wan_params):
    cfg = wan.WanConfig.from_state_dict(wan_params)
    rng = np.random.default_rng(1)
    B, F, H, W = 1, 3, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, F, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 9, TDIM)), jnp.float32)
    t = jnp.asarray([0.7], jnp.float32)
    out = wan.forward(wan_params, cfg, lat, ctx, t, qcfg=F32CFG)
    assert out.shape == (B, F, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_rope_table():
    pe = np.asarray(wan.rope_3d(2, 3, 4, (44, 42, 42)))
    assert pe.shape == (24, 64, 2)
    # rotation magnitudes are 1
    np.testing.assert_allclose((pe ** 2).sum(-1), 1.0, atol=1e-5)


def test_wan_stacked_forward_matches_unrolled(wan_params):
    cfg = wan.WanConfig.from_state_dict(wan_params)
    rng = np.random.default_rng(2)
    B, F, H, W = 1, 3, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, F, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 9, TDIM)), jnp.float32)
    t = jnp.asarray([0.4], jnp.float32)

    want = wan.forward(wan_params, cfg, lat, ctx, t, qcfg=F32CFG)
    sparams = wan.stack_wan_params(wan_params, cfg)
    got = wan.forward_stacked(sparams, cfg, lat, ctx, t, qcfg=F32CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_wan_engine_cfg_serving(wan_params):
    """Video serving: pooled requests with DIFFERENT cfg scales must each
    match their direct CFG euler integration; stacked params serve the
    same results."""
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule

    cfg = wan.WanConfig.from_state_dict(wan_params)
    rng = np.random.default_rng(3)
    F, H, W = 3, 8, 8
    sigmas = linear_schedule(3)

    def mk_req(seed, scale):
        r = np.random.default_rng(seed)
        return (r.standard_normal((F, H, W, C)).astype(np.float32),
                {"ctx": r.standard_normal((9, TDIM)).astype(np.float32),
                 "nctx": r.standard_normal((9, TDIM)).astype(np.float32),
                 "cfg_scale": np.float32(scale)})

    x1, c1 = mk_req(10, 5.0)
    x2, c2 = mk_req(11, 1.0)

    results = []
    for m in (pipeline.DiffusionModel(arch="wan", params=wan_params,
                                      config=cfg, qcfg=F32CFG),):
        for stacked in (False, True):
            mdl = m.stack() if stacked else m
            eng = pipeline.wan_engine(mdl, max_batch=2)
            r1 = eng.submit(x1.copy(), c1, sigmas)
            r2 = eng.submit(x2.copy(), c2, sigmas)
            eng.run_until_drained()
            assert r1.finished and r2.finished
            results.append((r1.result.astype(np.float32),
                            r2.result.astype(np.float32)))

    # direct CFG euler per request
    def direct(x0, cond):
        ctx = jnp.asarray(cond["ctx"])[None].astype(jnp.bfloat16)
        nctx = jnp.asarray(cond["nctx"])[None].astype(jnp.bfloat16)
        s = float(cond["cfg_scale"])

        def velocity(x, sig):
            tt = jnp.full((1,), sig, jnp.float32)
            v_c = wan.forward(wan_params, cfg, x, ctx, tt, qcfg=F32CFG)
            v_u = wan.forward(wan_params, cfg, x, nctx, tt, qcfg=F32CFG)
            return v_u + s * (v_c - v_u)

        return np.asarray(euler_sample(
            velocity, jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas
        )[0], np.float32)

    w1, w2 = direct(x1, c1), direct(x2, c2)
    for got1, got2 in results:
        np.testing.assert_allclose(got1, w1, rtol=0.05, atol=0.05)
        np.testing.assert_allclose(got2, w2, rtol=0.05, atol=0.05)
