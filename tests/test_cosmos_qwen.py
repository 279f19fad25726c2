"""Cosmos Predict2 + Qwen-Image DiT tests (tiny configs through GGUF)."""

import numpy as np

import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import cosmos, flux, qwen_image
from comfyui_gguf_tpu.nn.layers import QuantConfig

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


# --------------------------------------------------------------------------
# cosmos
# --------------------------------------------------------------------------

CDIM, CCTX, CC, CLAYERS, CHD = 128, 64, 16, 2, 64


def _tiny_cosmos(rng):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "x_embedder.proj.1.weight": t(CDIM, CC * 4),
        "x_embedder.proj.1.bias": t(CDIM),
        "t_embedder.1.linear_1.weight": t(CDIM, 256),
        "t_embedder.1.linear_1.bias": t(CDIM),
        "t_embedder.1.linear_2.weight": t(CDIM, CDIM),
        "t_embedder.1.linear_2.bias": t(CDIM),
        "t_embedding_norm.weight": t(CDIM) + 1,
        "final_layer.linear.weight": t(CC * 4, CDIM),
        "final_layer.linear.bias": t(CC * 4),
        "final_layer.adaln_modulation.1.weight": t(2 * CDIM, CDIM),
        "final_layer.adaln_modulation.1.bias": t(2 * CDIM),
    }
    for i in range(CLAYERS):
        p = f"blocks.{i}"
        for m in ("self_attn", "cross_attn", "mlp"):
            sd[f"{p}.adaln_modulation_{m}.1.weight"] = t(3 * CDIM, CDIM)
            sd[f"{p}.adaln_modulation_{m}.1.bias"] = t(3 * CDIM)
        for a, kdim in (("self_attn", CDIM), ("cross_attn", CCTX)):
            sd[f"{p}.{a}.q_proj.weight"] = t(CDIM, CDIM)
            sd[f"{p}.{a}.k_proj.weight"] = t(CDIM, kdim)
            sd[f"{p}.{a}.v_proj.weight"] = t(CDIM, kdim)
            sd[f"{p}.{a}.output_proj.weight"] = t(CDIM, CDIM)
            sd[f"{p}.{a}.q_norm.weight"] = t(CHD) + 1
            sd[f"{p}.{a}.k_norm.weight"] = t(CHD) + 1
        sd[f"{p}.mlp.layer1.weight"] = t(4 * CDIM, CDIM)
        sd[f"{p}.mlp.layer2.weight"] = t(CDIM, 4 * CDIM)
    return sd


def test_cosmos(tmp_path):
    sd = _tiny_cosmos(np.random.default_rng(0))
    p = tmp_path / "c.gguf"
    w = GGUFWriter("cosmos")
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k, v)
    w.write_to_file(str(p))
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "cosmos"
    params = to_jax_params(raw, F32CFG)

    cfg = cosmos.CosmosConfig.from_state_dict(params)
    assert cfg.dim == CDIM and cfg.n_layers == CLAYERS
    assert cfg.n_heads == 2 and cfg.text_dim == CCTX

    rng = np.random.default_rng(1)
    B, F, H, W = 1, 2, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, F, H, W, CC)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 7, CCTX)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    out = cosmos.forward(params, cfg, lat, ctx, t, qcfg=F32CFG)
    assert out.shape == (B, F, H, W, CC)
    assert np.isfinite(np.asarray(out)).all()


def test_cosmos_stacked_and_engine(tmp_path):
    """Stacked scanned forward matches the unrolled graph; cosmos_engine
    pooled requests with different cfg scales match direct CFG euler."""
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule

    sd = _tiny_cosmos(np.random.default_rng(0))
    p = tmp_path / "c.gguf"
    w = GGUFWriter("cosmos")
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k, v)
    w.write_to_file(str(p))
    params = to_jax_params(gguf_sd_loader(str(p)), F32CFG)
    cfg = cosmos.CosmosConfig.from_state_dict(params)

    rng = np.random.default_rng(2)
    B, F, H, W = 1, 2, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, F, H, W, CC)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 7, CCTX)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    want = cosmos.forward(params, cfg, lat, ctx, t, qcfg=F32CFG)
    sparams = cosmos.stack_cosmos_params(params, cfg)
    got = cosmos.forward_stacked(sparams, cfg, lat, ctx, t, qcfg=F32CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    sigmas = linear_schedule(3)

    def mk_req(seed, scale):
        r = np.random.default_rng(seed)
        return (r.standard_normal((F, H, W, CC)).astype(np.float32),
                {"ctx": r.standard_normal((7, CCTX)).astype(np.float32),
                 "nctx": r.standard_normal((7, CCTX)).astype(np.float32),
                 "cfg_scale": np.float32(scale)})

    x1, c1 = mk_req(10, 4.0)
    x2, c2 = mk_req(11, 1.0)

    base = pipeline.DiffusionModel(arch="cosmos", params=params,
                                   config=cfg, qcfg=F32CFG)
    results = []
    for stacked in (False, True):
        mdl = base.stack() if stacked else base
        eng = pipeline.cosmos_engine(mdl, max_batch=2)
        r1 = eng.submit(x1.copy(), c1, sigmas)
        r2 = eng.submit(x2.copy(), c2, sigmas)
        eng.run_until_drained()
        assert r1.finished and r2.finished
        results.append((r1.result.astype(np.float32),
                        r2.result.astype(np.float32)))

    def direct(x0, cond):
        cc = jnp.asarray(cond["ctx"])[None].astype(jnp.bfloat16)
        nc = jnp.asarray(cond["nctx"])[None].astype(jnp.bfloat16)
        s = float(cond["cfg_scale"])

        def velocity(x, sig):
            tt = jnp.full((1,), sig, jnp.float32)
            v_c = cosmos.forward(params, cfg, x, cc, tt, qcfg=F32CFG)
            v_u = cosmos.forward(params, cfg, x, nc, tt, qcfg=F32CFG)
            return v_u + s * (v_c - v_u)

        return np.asarray(euler_sample(
            velocity, jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas
        )[0], np.float32)

    w1, w2 = direct(x1, c1), direct(x2, c2)
    for got1, got2 in results:
        np.testing.assert_allclose(got1, w1, rtol=0.05, atol=0.05)
        np.testing.assert_allclose(got2, w2, rtol=0.05, atol=0.05)


# --------------------------------------------------------------------------
# qwen_image
# --------------------------------------------------------------------------

QHID, QCTX, QIN, QLAYERS, QHD = 128, 96, 32, 2, 64


def _tiny_qwen(rng):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "img_in.weight": t(QHID, QIN), "img_in.bias": t(QHID),
        "txt_in.weight": t(QHID, QCTX), "txt_in.bias": t(QHID),
        "txt_norm.weight": t(QCTX) + 1,
        "time_text_embed.timestep_embedder.linear_1.weight": t(QHID, 256),
        "time_text_embed.timestep_embedder.linear_1.bias": t(QHID),
        "time_text_embed.timestep_embedder.linear_2.weight": t(QHID, QHID),
        "time_text_embed.timestep_embedder.linear_2.bias": t(QHID),
        "norm_out.linear.weight": t(2 * QHID, QHID),
        "norm_out.linear.bias": t(2 * QHID),
        "proj_out.weight": t(QIN, QHID), "proj_out.bias": t(QIN),
    }
    for i in range(QLAYERS):
        p = f"transformer_blocks.{i}."
        sd[p + "img_mod.1.weight"] = t(6 * QHID, QHID)
        sd[p + "img_mod.1.bias"] = t(6 * QHID)
        sd[p + "txt_mod.1.weight"] = t(6 * QHID, QHID)
        sd[p + "txt_mod.1.bias"] = t(6 * QHID)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"):
            sd[p + f"attn.{n}.weight"] = t(QHID, QHID)
            sd[p + f"attn.{n}.bias"] = t(QHID)
        sd[p + "attn.to_out.0.weight"] = t(QHID, QHID)
        sd[p + "attn.to_out.0.bias"] = t(QHID)
        sd[p + "attn.to_add_out.weight"] = t(QHID, QHID)
        sd[p + "attn.to_add_out.bias"] = t(QHID)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[p + f"attn.{n}.weight"] = t(QHD) + 1
        for s in ("img", "txt"):
            sd[p + f"{s}_mlp.net.0.proj.weight"] = t(4 * QHID, QHID)
            sd[p + f"{s}_mlp.net.0.proj.bias"] = t(4 * QHID)
            sd[p + f"{s}_mlp.net.2.weight"] = t(QHID, 4 * QHID)
            sd[p + f"{s}_mlp.net.2.bias"] = t(QHID)
    return sd


def test_qwen_image(tmp_path):
    sd = _tiny_qwen(np.random.default_rng(0))
    p = tmp_path / "q.gguf"
    w = GGUFWriter("qwen_image")
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k, v)
    w.write_to_file(str(p))
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "qwen_image"
    params = to_jax_params(raw, F32CFG)

    cfg = qwen_image.QwenImageConfig.from_state_dict(params)
    assert cfg.hidden == QHID and cfg.n_layers == QLAYERS
    assert cfg.n_heads == 2 and cfg.context_dim == QCTX
    assert sum(cfg.axes_dim) == QHD

    rng = np.random.default_rng(1)
    B, Ltxt = 1, 7
    h_tok = w_tok = 4
    img = jnp.asarray(
        rng.standard_normal((B, h_tok * w_tok, QIN)), jnp.float32)
    img_ids = jnp.asarray(flux.make_img_ids(h_tok, w_tok, B))
    txt = jnp.asarray(rng.standard_normal((B, Ltxt, QCTX)), jnp.float32)
    txt_ids = jnp.zeros((B, Ltxt, 3), jnp.int32)
    t = jnp.asarray([0.5], jnp.float32)
    out = qwen_image.forward(params, cfg, img, img_ids, txt, txt_ids, t,
                             qcfg=F32CFG)
    assert out.shape == (B, h_tok * w_tok, QIN)
    assert np.isfinite(np.asarray(out)).all()
