"""LTX-Video DiT tests (tiny config through GGUF)."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import ltxv
from comfyui_gguf_tpu.nn.layers import QuantConfig

DIM, LAYERS, INCH, CAP = 128, 2, 32, 64

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _tiny_ltxv(rng):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "patchify_proj.weight": t(DIM, INCH),
        "patchify_proj.bias": t(DIM),
        "adaln_single.emb.timestep_embedder.linear_1.weight": t(DIM, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": t(DIM),
        "adaln_single.emb.timestep_embedder.linear_2.weight": t(DIM, DIM),
        "adaln_single.emb.timestep_embedder.linear_2.bias": t(DIM),
        "adaln_single.linear.weight": t(6 * DIM, DIM),
        "adaln_single.linear.bias": t(6 * DIM),
        "caption_projection.linear_1.weight": t(DIM, CAP),
        "caption_projection.linear_1.bias": t(DIM),
        "caption_projection.linear_2.weight": t(DIM, DIM),
        "caption_projection.linear_2.bias": t(DIM),
        "scale_shift_table": t(2, DIM),
        "proj_out.weight": t(INCH, DIM),
        "proj_out.bias": t(INCH),
    }
    for i in range(LAYERS):
        p = f"transformer_blocks.{i}"
        sd[f"{p}.scale_shift_table"] = t(6, DIM)
        for a in ("attn1", "attn2"):
            for n in ("to_q", "to_k", "to_v"):
                kdim = DIM
                sd[f"{p}.{a}.{n}.weight"] = t(DIM, kdim)
                sd[f"{p}.{a}.{n}.bias"] = t(DIM)
            sd[f"{p}.{a}.to_out.0.weight"] = t(DIM, DIM)
            sd[f"{p}.{a}.to_out.0.bias"] = t(DIM)
            sd[f"{p}.{a}.q_norm.weight"] = t(DIM // 2) + 1  # per-head 64
            sd[f"{p}.{a}.k_norm.weight"] = t(DIM // 2) + 1
        sd[f"{p}.ff.net.0.proj.weight"] = t(4 * DIM, DIM)
        sd[f"{p}.ff.net.0.proj.bias"] = t(4 * DIM)
        sd[f"{p}.ff.net.2.weight"] = t(DIM, 4 * DIM)
        sd[f"{p}.ff.net.2.bias"] = t(DIM)
    return sd


@pytest.fixture(scope="module")
def ltxv_params(tmp_path_factory):
    sd = _tiny_ltxv(np.random.default_rng(0))
    p = tmp_path_factory.mktemp("ltxv") / "ltxv.gguf"
    w = GGUFWriter("ltxv")
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k, v)
    w.write_to_file(str(p))
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "ltxv"
    return to_jax_params(raw, F32CFG)


def test_ltxv_config(ltxv_params):
    cfg = ltxv.LTXVConfig.from_state_dict(ltxv_params)
    assert cfg.dim == DIM and cfg.n_layers == LAYERS
    assert cfg.in_channels == INCH and cfg.caption_dim == CAP
    assert cfg.n_heads == 2
    assert sum(cfg.axes_dim) == 64


def test_ltxv_forward(ltxv_params):
    cfg = ltxv.LTXVConfig.from_state_dict(ltxv_params)
    rng = np.random.default_rng(1)
    B, L, Lc = 2, 24, 9
    tokens = jnp.asarray(rng.standard_normal((B, L, INCH)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 8, (B, L, 3)), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((B, Lc, CAP)), jnp.float32)
    t = jnp.asarray([0.9, 0.3], jnp.float32)
    out = ltxv.forward(ltxv_params, cfg, tokens, ids, ctx, t, qcfg=F32CFG)
    assert out.shape == (B, L, INCH)
    assert np.isfinite(np.asarray(out)).all()


def test_ltxv_stacked_forward_matches_unrolled(ltxv_params):
    cfg = ltxv.LTXVConfig.from_state_dict(ltxv_params)
    rng = np.random.default_rng(2)
    B, L, Lc = 2, 24, 9
    tokens = jnp.asarray(rng.standard_normal((B, L, INCH)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 8, (B, L, 3)), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((B, Lc, CAP)), jnp.float32)
    t = jnp.asarray([0.9, 0.3], jnp.float32)

    want = ltxv.forward(ltxv_params, cfg, tokens, ids, ctx, t, qcfg=F32CFG)
    sparams = ltxv.stack_ltxv_params(ltxv_params, cfg)
    got = ltxv.forward_stacked(sparams, cfg, tokens, ids, ctx, t,
                               qcfg=F32CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ltxv_engine_cfg_serving(ltxv_params):
    """Token-video serving: pooled requests with DIFFERENT cfg scales and
    DIFFERENT voxel-position ids each match their direct CFG euler
    integration; stacked params serve the same results."""
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule

    cfg = ltxv.LTXVConfig.from_state_dict(ltxv_params)
    L, Lc = 24, 9
    sigmas = linear_schedule(3)

    def mk_req(seed, scale):
        r = np.random.default_rng(seed)
        return (r.standard_normal((L, INCH)).astype(np.float32),
                {"ids": r.integers(0, 8, (L, 3)).astype(np.int32),
                 "ctx": r.standard_normal((Lc, CAP)).astype(np.float32),
                 "nctx": r.standard_normal((Lc, CAP)).astype(np.float32),
                 "cfg_scale": np.float32(scale)})

    x1, c1 = mk_req(10, 3.0)
    x2, c2 = mk_req(11, 1.0)

    base = pipeline.DiffusionModel(arch="ltxv", params=ltxv_params,
                                   config=cfg, qcfg=F32CFG)
    results = []
    for stacked in (False, True):
        mdl = base.stack() if stacked else base
        eng = pipeline.ltxv_engine(mdl, max_batch=2)
        r1 = eng.submit(x1.copy(), c1, sigmas)
        r2 = eng.submit(x2.copy(), c2, sigmas)
        eng.run_until_drained()
        assert r1.finished and r2.finished
        results.append((r1.result.astype(np.float32),
                        r2.result.astype(np.float32)))

    def direct(x0, cond):
        ids = jnp.asarray(cond["ids"])[None]
        ctx = jnp.asarray(cond["ctx"])[None].astype(jnp.bfloat16)
        nctx = jnp.asarray(cond["nctx"])[None].astype(jnp.bfloat16)
        s = float(cond["cfg_scale"])

        def velocity(x, sig):
            tt = jnp.full((1,), sig, jnp.float32)
            v_c = ltxv.forward(ltxv_params, cfg, x, ids, ctx, tt,
                               qcfg=F32CFG)
            v_u = ltxv.forward(ltxv_params, cfg, x, ids, nctx, tt,
                               qcfg=F32CFG)
            return v_u + s * (v_c - v_u)

        return np.asarray(euler_sample(
            velocity, jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas
        )[0], np.float32)

    w1, w2 = direct(x1, c1), direct(x2, c2)
    for got1, got2 in results:
        np.testing.assert_allclose(got1, w1, rtol=0.05, atol=0.05)
        np.testing.assert_allclose(got2, w2, rtol=0.05, atol=0.05)
