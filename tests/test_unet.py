"""SD1/SDXL UNet graph tests (tiny sgm-format model) + k-diffusion sampler
math."""

import numpy as np
import pytest

import jax

import jax.numpy as jnp

from comfyui_gguf_tpu.models import unet
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.sampling import kdiffusion as kd

MC, CTX, ADM, LAT = 32, 64, 48, 4

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _res(rng, p, cin, cout, emb):
    def conv(o, i, k=3):
        return (rng.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)

    sd = {
        f"{p}.in_layers.0.weight": np.ones(cin, np.float32),
        f"{p}.in_layers.0.bias": np.zeros(cin, np.float32),
        f"{p}.in_layers.2.weight": conv(cout, cin),
        f"{p}.in_layers.2.bias": np.zeros(cout, np.float32),
        f"{p}.emb_layers.1.weight":
            (rng.standard_normal((cout, emb)) * 0.05).astype(np.float32),
        f"{p}.emb_layers.1.bias": np.zeros(cout, np.float32),
        f"{p}.out_layers.0.weight": np.ones(cout, np.float32),
        f"{p}.out_layers.0.bias": np.zeros(cout, np.float32),
        f"{p}.out_layers.3.weight": conv(cout, cout),
        f"{p}.out_layers.3.bias": np.zeros(cout, np.float32),
    }
    if cin != cout:
        sd[f"{p}.skip_connection.weight"] = conv(cout, cin, 1)
        sd[f"{p}.skip_connection.bias"] = np.zeros(cout, np.float32)
    return sd


def _xformer(rng, p, c, linear_proj, ctx=None):
    def lin(o, i):
        return (rng.standard_normal((o, i)) * 0.05).astype(np.float32)

    sd = {
        f"{p}.norm.weight": np.ones(c, np.float32),
        f"{p}.norm.bias": np.zeros(c, np.float32),
    }
    if linear_proj:
        sd[f"{p}.proj_in.weight"] = lin(c, c)
        sd[f"{p}.proj_out.weight"] = lin(c, c)
    else:
        sd[f"{p}.proj_in.weight"] = (
            rng.standard_normal((c, c, 1, 1)) * 0.05).astype(np.float32)
        sd[f"{p}.proj_out.weight"] = (
            rng.standard_normal((c, c, 1, 1)) * 0.05).astype(np.float32)
    sd[f"{p}.proj_in.bias"] = np.zeros(c, np.float32)
    sd[f"{p}.proj_out.bias"] = np.zeros(c, np.float32)
    b = f"{p}.transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        sd[f"{b}.{n}.weight"] = np.ones(c, np.float32)
        sd[f"{b}.{n}.bias"] = np.zeros(c, np.float32)
    for a, kdim in (("attn1", c), ("attn2", ctx or CTX)):
        sd[f"{b}.{a}.to_q.weight"] = lin(c, c)
        sd[f"{b}.{a}.to_k.weight"] = lin(c, kdim)
        sd[f"{b}.{a}.to_v.weight"] = lin(c, kdim)
        sd[f"{b}.{a}.to_out.0.weight"] = lin(c, c)
        sd[f"{b}.{a}.to_out.0.bias"] = np.zeros(c, np.float32)
    sd[f"{b}.ff.net.0.proj.weight"] = lin(8 * c, c)
    sd[f"{b}.ff.net.0.proj.bias"] = np.zeros(8 * c, np.float32)
    sd[f"{b}.ff.net.2.weight"] = lin(c, 4 * c)
    sd[f"{b}.ff.net.2.bias"] = np.zeros(c, np.float32)
    return sd


@pytest.fixture(scope="module")
def tiny_unet():
    rng = np.random.default_rng(0)
    emb = 4 * MC
    c0, c1 = MC, 2 * MC

    def conv(o, i, k=3):
        return (rng.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)

    def lin(o, i):
        return (rng.standard_normal((o, i)) * 0.05).astype(np.float32)

    sd = {
        "input_blocks.0.0.weight": conv(c0, LAT),
        "input_blocks.0.0.bias": np.zeros(c0, np.float32),
        "time_embed.0.weight": lin(emb, MC),
        "time_embed.0.bias": np.zeros(emb, np.float32),
        "time_embed.2.weight": lin(emb, emb),
        "time_embed.2.bias": np.zeros(emb, np.float32),
        "label_emb.0.0.weight": lin(emb, ADM),
        "label_emb.0.0.bias": np.zeros(emb, np.float32),
        "label_emb.0.2.weight": lin(emb, emb),
        "label_emb.0.2.bias": np.zeros(emb, np.float32),
        "out.0.weight": np.ones(c0, np.float32),
        "out.0.bias": np.zeros(c0, np.float32),
        "out.2.weight": conv(LAT, c0),
        "out.2.bias": np.zeros(LAT, np.float32),
    }
    sd.update(_res(rng, "input_blocks.1.0", c0, c0, emb))
    sd["input_blocks.2.0.op.weight"] = conv(c0, c0)
    sd["input_blocks.2.0.op.bias"] = np.zeros(c0, np.float32)
    sd.update(_res(rng, "input_blocks.3.0", c0, c1, emb))
    sd.update(_xformer(rng, "input_blocks.3.1", c1, linear_proj=True))
    sd.update(_res(rng, "middle_block.0", c1, c1, emb))
    sd.update(_xformer(rng, "middle_block.1", c1, linear_proj=True))
    sd.update(_res(rng, "middle_block.2", c1, c1, emb))
    # output: mirrored skips [c1(in3), c0(in2/op), c0(in1), c0(in0)]
    sd.update(_res(rng, "output_blocks.0.0", c1 + c1, c1, emb))
    sd.update(_xformer(rng, "output_blocks.0.1", c1, linear_proj=True))
    sd.update(_res(rng, "output_blocks.1.0", c1 + c0, c1, emb))
    sd.update(_xformer(rng, "output_blocks.1.1", c1, linear_proj=True))
    sd["output_blocks.1.2.conv.weight"] = conv(c1, c1)
    sd["output_blocks.1.2.conv.bias"] = np.zeros(c1, np.float32)
    sd.update(_res(rng, "output_blocks.2.0", c1 + c0, c0, emb))
    sd.update(_res(rng, "output_blocks.3.0", c0 + c0, c0, emb))
    return {k: jnp.asarray(v) for k, v in sd.items()}


def test_unet_config_detection(tiny_unet):
    cfg = unet.UNetConfig.from_state_dict(tiny_unet)
    assert cfg.model_channels == MC
    assert cfg.context_dim == CTX
    assert cfg.adm_in_channels == ADM
    assert cfg.head_dim == 64  # sdxl convention


def test_unet_forward_shapes(tiny_unet):
    import dataclasses

    cfg = dataclasses.replace(unet.UNetConfig.from_state_dict(tiny_unet),
                              head_dim=16)
    rng = np.random.default_rng(1)
    B, H, W = 2, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, LAT)), jnp.float32)
    t = jnp.asarray([999.0, 500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 7, CTX)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, ADM)), jnp.float32)
    out = unet.forward(tiny_unet, cfg, x, t, ctx, y, qcfg=F32CFG)
    assert out.shape == (B, H, W, LAT)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_requires_y_for_sdxl(tiny_unet):
    cfg = unet.UNetConfig.from_state_dict(tiny_unet)
    with pytest.raises(ValueError, match="pooled"):
        unet.forward(tiny_unet, cfg, jnp.zeros((1, 8, 8, LAT)),
                     jnp.zeros((1,)), jnp.zeros((1, 7, CTX)), None,
                     qcfg=F32CFG)


# -- k-diffusion math --------------------------------------------------------

def test_ddpm_sigma_table_monotonic():
    s = kd.ddpm_sigmas()
    assert len(s) == 1000
    assert np.all(np.diff(s) > 0)
    assert s[0] < 0.05 and 14 < s[-1] < 15  # SD convention: σ_max ≈ 14.6


def test_karras_schedule_shape():
    s = kd.karras_schedule(10, 0.03, 14.6)
    assert len(s) == 11 and s[-1] == 0.0
    assert np.all(np.diff(s) < 0)


def test_sigma_to_t_roundtrip():
    table = kd.ddpm_sigmas()
    for idx in (0, 100, 500, 998):
        t = float(kd.sigma_to_t(jnp.float32(table[idx]), table))
        assert abs(t - idx) < 1e-2, (idx, t)


def test_eps_denoiser_perfect_model_recovers_x0():
    """If eps_fn returns the exact noise, denoised == x0 for any σ."""
    table = kd.ddpm_sigmas()
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    sigma = jnp.float32(table[700])
    x_noisy = x0 + sigma * noise

    def eps_fn(x_scaled, t):
        return noise

    den = kd.make_eps_denoiser(eps_fn, table)
    out = den(x_noisy, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_euler_sigma_exact_linear():
    """With denoised ≡ 0, dx/dσ = x/σ → x scales linearly with σ."""
    table = kd.ddpm_sigmas()
    sigmas = kd.normal_schedule(8, table)
    x = jnp.full((1, 2, 2, 1), float(sigmas[0]), jnp.float32)
    out = kd.euler_sample_sigma(lambda x, s: jnp.zeros_like(x), x, sigmas)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)


def test_unet_engine_cfg_serving(tiny_unet):
    """unet_engine pooled requests, each with its own sigma position and
    cfg scale, match the direct per-request k-diffusion CFG Euler
    integration (eps parameterization, per-lane sigma exactness)."""
    import dataclasses

    from comfyui_gguf_tpu import pipeline

    cfg = dataclasses.replace(unet.UNetConfig.from_state_dict(tiny_unet),
                              head_dim=16)
    table = kd.ddpm_sigmas()
    sigmas = kd.normal_schedule(3, table)
    H, W = 8, 8

    def mk_req(seed, scale):
        r = np.random.default_rng(seed)
        x0 = (r.standard_normal((H, W, LAT)) * float(sigmas[0])
              ).astype(np.float32)
        return (x0, {"ctx": r.standard_normal((7, CTX)).astype(np.float32),
                     "nctx": r.standard_normal((7, CTX)).astype(np.float32),
                     "adm": r.standard_normal((ADM,)).astype(np.float32),
                     "cfg_scale": np.float32(scale)})

    x1, c1 = mk_req(20, 7.0)
    x2, c2 = mk_req(21, 1.5)

    from comfyui_gguf_tpu.nn.layers import QuantConfig
    mdl = pipeline.DiffusionModel(arch="unet", params=tiny_unet, config=cfg,
                                  qcfg=F32CFG)
    eng = pipeline.unet_engine(mdl, max_batch=2)
    r1 = eng.submit(x1.copy(), c1, sigmas)
    r2 = eng.submit(x2.copy(), c2, sigmas)
    eng.run_until_drained()
    assert r1.finished and r2.finished

    table_j = jnp.asarray(table)

    @jax.jit
    def _direct_step(x, s_cur, s_next, ctx, nctx, scale, adm):
        """Per-request Euler in the engine's exact eps parameterization,
        JITTED like the engine step: at cfg 7 and σ_max≈14.6 the CFG·Δσ
        factor (~90×) amplifies even eager-vs-jit bf16 fusion-boundary
        rounding (~2% per forward) beyond any usable tolerance, so the
        reference must run under the same compilation semantics."""
        s = s_cur[:, None, None, None].astype(jnp.float32)
        c_in = 1.0 / jnp.sqrt(1.0 + s ** 2)
        t = kd.sigma_to_t(s_cur, table_j)
        xs = (x.astype(jnp.float32) * c_in).astype(x.dtype)
        e_c = unet.forward(tiny_unet, cfg, xs, t, ctx, adm,
                           qcfg=F32CFG).astype(jnp.float32)
        e_u = unet.forward(tiny_unet, cfg, xs, t, nctx, adm,
                           qcfg=F32CFG).astype(jnp.float32)
        eps = e_u + scale[:, None, None, None] * (e_c - e_u)
        step = (s_next - s_cur)[:, None, None, None] * eps
        return (x.astype(jnp.float32) + step).astype(x.dtype)

    def direct(x0, cond):
        ctx = jnp.asarray(cond["ctx"])[None].astype(jnp.bfloat16)
        nctx = jnp.asarray(cond["nctx"])[None].astype(jnp.bfloat16)
        adm = jnp.asarray(cond["adm"])[None].astype(jnp.bfloat16)
        scale = jnp.asarray([cond["cfg_scale"]], jnp.float32)
        x = jnp.asarray(x0)[None].astype(jnp.bfloat16)
        for i in range(len(sigmas) - 1):
            x = _direct_step(x, jnp.asarray([sigmas[i]], jnp.float32),
                             jnp.asarray([sigmas[i + 1]], jnp.float32),
                             ctx, nctx, scale, adm)
        return np.asarray(x[0], np.float32)

    np.testing.assert_allclose(r1.result.astype(np.float32), direct(x1, c1),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(r2.result.astype(np.float32), direct(x2, c2),
                               rtol=0.05, atol=0.05)


def test_unet_engine_dpmpp_2m(tiny_unet):
    """unet_engine(sampler="dpmpp_2m"): a POOLED mixed-cfg batch equals
    the same requests run one-at-a-time through a max_batch=1 engine
    (per-lane multistep aux state is exact under pooling/padding). The
    lane update's 2M math itself is validated against
    kd.dpmpp_2m_sample_sigma in the flux/sd3/aura engine tests — at eps
    scales (cfg·σ≈45×) two differently-jitted programs cannot agree
    tighter than bf16 fusion noise, so the reference here is the same
    engine program at batch 1."""
    import dataclasses

    from comfyui_gguf_tpu import pipeline

    cfg = dataclasses.replace(unet.UNetConfig.from_state_dict(tiny_unet),
                              head_dim=16)
    table = kd.ddpm_sigmas()
    sigmas = kd.normal_schedule(4, table)
    H, W = 8, 8

    def mk_req(seed, scale):
        r = np.random.default_rng(seed)
        x0 = (r.standard_normal((H, W, LAT)) * float(sigmas[0])
              ).astype(np.float32)
        return (x0, {"ctx": r.standard_normal((7, CTX)).astype(np.float32),
                     "nctx": r.standard_normal((7, CTX)).astype(np.float32),
                     "adm": r.standard_normal((ADM,)).astype(np.float32),
                     "cfg_scale": np.float32(scale)})

    x1, c1 = mk_req(70, 3.0)
    x2, c2 = mk_req(71, 1.5)
    mdl = pipeline.DiffusionModel(arch="unet", params=tiny_unet, config=cfg,
                                  qcfg=F32CFG)
    eng = pipeline.unet_engine(mdl, max_batch=2, sampler="dpmpp_2m")
    r1 = eng.submit(x1.copy(), c1, sigmas)
    r2 = eng.submit(x2.copy(), c2, sigmas)
    eng.run_until_drained()
    assert r1.finished and r2.finished and r1.error is None

    # same requests, strictly one lane at a time (bucket size 1)
    solo = pipeline.unet_engine(mdl, max_batch=1, sampler="dpmpp_2m")
    s1 = solo.submit(x1.copy(), c1, sigmas)
    solo.run_until_drained()
    s2 = solo.submit(x2.copy(), c2, sigmas)
    solo.run_until_drained()

    np.testing.assert_allclose(r1.result.astype(np.float32),
                               s1.result.astype(np.float32),
                               rtol=0.02, atol=0.02)
    np.testing.assert_allclose(r2.result.astype(np.float32),
                               s2.result.astype(np.float32),
                               rtol=0.02, atol=0.02)
    # 2M actually differs from euler serving (the history is used)
    eng_e = pipeline.unet_engine(mdl, max_batch=2)
    e1 = eng_e.submit(x1.copy(), c1, sigmas)
    eng_e.run_until_drained()
    assert not np.allclose(r1.result, e1.result)


def test_sdxl_random_params_generator_forward():
    """The bench generator (testing.sdxl_random_params) must produce a
    tree models/unet.py accepts: config introspection, forward shape,
    finite output — guards the tools_arch_bench sdxl entry against
    schema drift."""
    import jax

    from comfyui_gguf_tpu.models import testing

    d = testing.SDXLDims()
    sd = testing.sdxl_random_params(d, seed=3)
    cfg = unet.UNetConfig.from_state_dict(sd)
    assert cfg.model_channels == d.model_channels
    assert cfg.context_dim == d.ctx and cfg.adm_in_channels == d.adm
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, d.in_ch)),
                    jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((1, 7, d.ctx)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((1, d.adm)), jnp.bfloat16)
    fwd = jax.jit(lambda p, x: unet.forward(p, cfg, x, jnp.asarray([500.0]),
                                            ctx, y, qcfg=F32CFG))
    out = fwd(sd, x)
    assert out.shape == (1, 16, 16, d.in_ch)
    assert np.isfinite(np.asarray(out, np.float32)).all()
