"""AuraFlow DiT tests (tiny config through GGUF)."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import aura
from comfyui_gguf_tpu.nn.layers import QuantConfig

HID, COND, C, DD, DS, REG = 256, 64, 4, 2, 2, 3
MLP = 2 * HID

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _tiny_aura(rng):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "init_x_linear.weight": t(HID, C * 4),
        "init_x_linear.bias": t(HID),
        "positional_encoding": t(1, 64, HID),
        "register_tokens": t(1, REG, HID),
        "cond_seq_linear.weight": t(HID, COND),
        "t_embedder.mlp.0.weight": t(HID, 256),
        "t_embedder.mlp.0.bias": t(HID),
        "t_embedder.mlp.2.weight": t(HID, HID),
        "t_embedder.mlp.2.bias": t(HID),
        "modF.1.weight": t(2 * HID, HID),
        "modF.1.bias": t(2 * HID),
        "final_linear.weight": t(C * 4, HID),
    }

    def mlp(prefix):
        return {
            f"{prefix}.c_fc1.weight": t(MLP, HID),
            f"{prefix}.c_fc2.weight": t(MLP, HID),
            f"{prefix}.c_proj.weight": t(HID, MLP),
        }

    for i in range(DD):
        p = f"double_layers.{i}"
        sd[f"{p}.modC.1.weight"] = t(6 * HID, HID)
        sd[f"{p}.modX.1.weight"] = t(6 * HID, HID)
        for w in ("w1q", "w1k", "w1v", "w1o", "w2q", "w2k", "w2v", "w2o"):
            sd[f"{p}.attn.{w}.weight"] = t(HID, HID)
        sd.update(mlp(f"{p}.mlpC"))
        sd.update(mlp(f"{p}.mlpX"))
    for i in range(DS):
        p = f"single_layers.{i}"
        sd[f"{p}.modCX.1.weight"] = t(6 * HID, HID)
        for w in ("w1q", "w1k", "w1v", "w1o"):
            sd[f"{p}.attn.{w}.weight"] = t(HID, HID)
        sd.update(mlp(f"{p}.mlp"))
    return sd


@pytest.fixture(scope="module")
def aura_params(tmp_path_factory):
    sd = _tiny_aura(np.random.default_rng(0))
    p = tmp_path_factory.mktemp("aura") / "a.gguf"
    w = GGUFWriter("aura")
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k, v)
    w.write_to_file(str(p))
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "aura"
    return to_jax_params(raw, F32CFG)


def test_aura_config(aura_params):
    cfg = aura.AuraConfig.from_state_dict(aura_params)
    assert cfg.hidden == HID
    assert cfg.depth_double == DD and cfg.depth_single == DS
    assert cfg.in_channels == C
    assert cfg.n_register_tokens == REG
    assert cfg.n_heads == 1  # 256-dim heads


def test_aura_forward(aura_params):
    cfg = aura.AuraConfig.from_state_dict(aura_params)
    rng = np.random.default_rng(1)
    B, H, W = 2, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, 7, COND)), jnp.float32)
    t = jnp.asarray([1.0, 0.2], jnp.float32)
    out = aura.forward(aura_params, cfg, lat, cond, t, qcfg=F32CFG)
    assert out.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


def test_aura_stacked_forward_matches_unrolled(aura_params):
    cfg = aura.AuraConfig.from_state_dict(aura_params)
    rng = np.random.default_rng(2)
    B, H, W = 1, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, 7, COND)), jnp.float32)
    t = jnp.asarray([0.4], jnp.float32)

    want = aura.forward(aura_params, cfg, lat, cond, t, qcfg=F32CFG)
    sparams = aura.stack_aura_params(aura_params, cfg)
    got = aura.forward_stacked(sparams, cfg, lat, cond, t, qcfg=F32CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_aura_engine_cfg_serving(aura_params):
    """Pooled requests with DIFFERENT cfg scales each match their direct
    CFG euler integration; stacked params serve the same results."""
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule

    cfg = aura.AuraConfig.from_state_dict(aura_params)
    H, W = 8, 8
    sigmas = linear_schedule(3)

    def mk_req(seed, scale):
        r = np.random.default_rng(seed)
        return (r.standard_normal((H, W, C)).astype(np.float32),
                {"ctx": r.standard_normal((7, COND)).astype(np.float32),
                 "nctx": r.standard_normal((7, COND)).astype(np.float32),
                 "cfg_scale": np.float32(scale)})

    x1, c1 = mk_req(10, 3.5)
    x2, c2 = mk_req(11, 1.0)

    base = pipeline.DiffusionModel(arch="aura", params=aura_params,
                                   config=cfg, qcfg=F32CFG)
    results = []
    for stacked in (False, True):
        mdl = base.stack() if stacked else base
        eng = pipeline.aura_engine(mdl, max_batch=2)
        r1 = eng.submit(x1.copy(), c1, sigmas)
        r2 = eng.submit(x2.copy(), c2, sigmas)
        eng.run_until_drained()
        assert r1.finished and r2.finished
        results.append((r1.result.astype(np.float32),
                        r2.result.astype(np.float32)))

    def direct(x0, cond):
        ctx = jnp.asarray(cond["ctx"])[None].astype(jnp.bfloat16)
        nctx = jnp.asarray(cond["nctx"])[None].astype(jnp.bfloat16)
        s = float(cond["cfg_scale"])

        def velocity(x, sig):
            tt = jnp.full((1,), sig, jnp.float32)
            v_c = aura.forward(aura_params, cfg, x, ctx, tt, qcfg=F32CFG)
            v_u = aura.forward(aura_params, cfg, x, nctx, tt, qcfg=F32CFG)
            return v_u + s * (v_c - v_u)

        return np.asarray(euler_sample(
            velocity, jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas
        )[0], np.float32)

    w1, w2 = direct(x1, c1), direct(x2, c2)
    for got1, got2 in results:
        np.testing.assert_allclose(got1, w1, rtol=0.05, atol=0.05)
        np.testing.assert_allclose(got2, w2, rtol=0.05, atol=0.05)


def test_aura_engine_dpmpp_2m_cfg(aura_params):
    """sampler="dpmpp_2m" on a CFG-mixing engine: pooled requests match
    per-request jitted 2M over the CFG-mixed velocity."""
    import jax

    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.sampling import flow_match as fm
    from comfyui_gguf_tpu.sampling import kdiffusion as kd
    from comfyui_gguf_tpu.sampling import linear_schedule

    cfg = aura.AuraConfig.from_state_dict(aura_params)
    H, W = 8, 8
    sigmas = linear_schedule(3)

    def mk_req(seed, scale):
        r = np.random.default_rng(seed)
        return (r.standard_normal((H, W, C)).astype(np.float32),
                {"ctx": r.standard_normal((7, COND)).astype(np.float32),
                 "nctx": r.standard_normal((7, COND)).astype(np.float32),
                 "cfg_scale": np.float32(scale)})

    x1, c1 = mk_req(60, 2.5)
    x2, c2 = mk_req(61, 1.0)
    base = pipeline.DiffusionModel(arch="aura", params=aura_params,
                                   config=cfg, qcfg=F32CFG)
    eng = pipeline.aura_engine(base, max_batch=2, sampler="dpmpp_2m")
    r1 = eng.submit(x1.copy(), c1, sigmas)
    r2 = eng.submit(x2.copy(), c2, sigmas)
    eng.run_until_drained()
    assert r1.finished and r2.finished and r1.error is None

    def direct(x0, cond):
        ctx = jnp.asarray(cond["ctx"])[None].astype(jnp.bfloat16)
        nctx = jnp.asarray(cond["nctx"])[None].astype(jnp.bfloat16)
        s = float(cond["cfg_scale"])

        @jax.jit
        def run(params, x):
            def vel(xc, sig):
                tt = jnp.full((1,), sig, jnp.float32)
                v_c = aura.forward(params, cfg, xc, ctx, tt, qcfg=F32CFG)
                v_u = aura.forward(params, cfg, xc, nctx, tt, qcfg=F32CFG)
                return v_u + s * (v_c - v_u)

            den = fm.make_flow_denoiser(vel)
            return kd.dpmpp_2m_sample_sigma(den, x, jnp.asarray(sigmas))

        return np.asarray(run(
            aura_params, jnp.asarray(x0)[None].astype(jnp.bfloat16))[0],
            np.float32)

    np.testing.assert_allclose(r1.result.astype(np.float32),
                               direct(x1, c1), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(r2.result.astype(np.float32),
                               direct(x2, c2), rtol=0.05, atol=0.05)
