"""Lumina2 NextDiT tests (tiny config through GGUF)."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import lumina2
from comfyui_gguf_tpu.nn.layers import QuantConfig

DIM, CAP, C, LAYERS, NREF, HD = 120, 64, 4, 2, 1, 60
FFN = 2 * DIM

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _block_params(rng, p, adaln):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        f"{p}.attention.qkv.weight": t(3 * DIM, DIM),
        f"{p}.attention.out.weight": t(DIM, DIM),
        f"{p}.attention.q_norm.weight": t(HD) + 1,
        f"{p}.attention.k_norm.weight": t(HD) + 1,
        f"{p}.attention_norm1.weight": t(DIM) + 1,
        f"{p}.attention_norm2.weight": t(DIM) + 1,
        f"{p}.ffn_norm1.weight": t(DIM) + 1,
        f"{p}.ffn_norm2.weight": t(DIM) + 1,
        f"{p}.feed_forward.w1.weight": t(FFN, DIM),
        f"{p}.feed_forward.w2.weight": t(DIM, FFN),
        f"{p}.feed_forward.w3.weight": t(FFN, DIM),
    }
    if adaln:
        sd[f"{p}.adaLN_modulation.1.weight"] = t(4 * DIM, DIM)
        sd[f"{p}.adaLN_modulation.1.bias"] = t(4 * DIM)
    return sd


def _tiny_lumina2(rng):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "x_embedder.weight": t(DIM, C * 4),
        "x_embedder.bias": t(DIM),
        "cap_embedder.0.weight": t(CAP) + 1,
        "cap_embedder.1.weight": t(DIM, CAP),
        "cap_embedder.1.bias": t(DIM),
        "t_embedder.mlp.0.weight": t(DIM, 256),
        "t_embedder.mlp.0.bias": t(DIM),
        "t_embedder.mlp.2.weight": t(DIM, DIM),
        "t_embedder.mlp.2.bias": t(DIM),
        "norm_final.weight": t(DIM) + 1,
        "final_layer.linear.weight": t(C * 4, DIM),
        "final_layer.linear.bias": t(C * 4),
        "final_layer.adaLN_modulation.1.weight": t(2 * DIM, DIM),
        "final_layer.adaLN_modulation.1.bias": t(2 * DIM),
    }
    for i in range(LAYERS):
        sd.update(_block_params(rng, f"layers.{i}", adaln=True))
    for i in range(NREF):
        sd.update(_block_params(rng, f"noise_refiner.{i}", adaln=True))
    sd.update(_block_params(rng, "context_refiner.0", adaln=False))
    return sd


@pytest.fixture(scope="module")
def lum_params(tmp_path_factory):
    sd = _tiny_lumina2(np.random.default_rng(0))

    p = tmp_path_factory.mktemp("lum") / "l.gguf"
    w = GGUFWriter("lumina2")
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k, v)
    w.write_to_file(str(p))
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "lumina2"
    return to_jax_params(raw, F32CFG)


def test_lumina2_config(lum_params):
    cfg = lumina2.Lumina2Config.from_state_dict(lum_params)
    assert cfg.dim == DIM and cfg.n_layers == LAYERS
    assert cfg.n_refiner == NREF
    assert cfg.head_dim == HD and cfg.n_heads == 2
    assert sum(cfg.axes_dim) == HD
    assert cfg.in_channels == C


def test_lumina2_forward(lum_params):
    cfg = lumina2.Lumina2Config.from_state_dict(lum_params)
    rng = np.random.default_rng(1)
    B, H, W = 2, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    cap = jnp.asarray(rng.standard_normal((B, 6, CAP)), jnp.float32)
    t = jnp.asarray([1.0, 0.5], jnp.float32)
    out = lumina2.forward(lum_params, cfg, lat, cap, t, qcfg=F32CFG)
    assert out.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


def test_lumina2_stacked_forward_matches_unrolled(lum_params):
    cfg = lumina2.Lumina2Config.from_state_dict(lum_params)
    rng = np.random.default_rng(2)
    B, H, W = 1, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    cap = jnp.asarray(rng.standard_normal((B, 7, CAP)), jnp.float32)
    t = jnp.asarray([0.4], jnp.float32)

    want = lumina2.forward(lum_params, cfg, lat, cap, t, qcfg=F32CFG)
    sparams = lumina2.stack_lumina2_params(lum_params, cfg)
    got = lumina2.forward_stacked(sparams, cfg, lat, cap, t, qcfg=F32CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_lumina2_engine_cfg_serving(lum_params):
    """Pooled requests with DIFFERENT cfg scales each match their direct
    CFG euler integration; stacked params serve the same results."""
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule

    cfg = lumina2.Lumina2Config.from_state_dict(lum_params)
    H, W = 8, 8
    sigmas = linear_schedule(3)

    def mk_req(seed, scale):
        r = np.random.default_rng(seed)
        return (r.standard_normal((H, W, C)).astype(np.float32),
                {"cap": r.standard_normal((7, CAP)).astype(np.float32),
                 "ncap": r.standard_normal((7, CAP)).astype(np.float32),
                 "cfg_scale": np.float32(scale)})

    x1, c1 = mk_req(10, 4.0)
    x2, c2 = mk_req(11, 1.0)

    base = pipeline.DiffusionModel(arch="lumina2", params=lum_params,
                                   config=cfg, qcfg=F32CFG)
    results = []
    for stacked in (False, True):
        mdl = base.stack() if stacked else base
        eng = pipeline.lumina2_engine(mdl, max_batch=2)
        r1 = eng.submit(x1.copy(), c1, sigmas)
        r2 = eng.submit(x2.copy(), c2, sigmas)
        eng.run_until_drained()
        assert r1.finished and r2.finished
        results.append((r1.result.astype(np.float32),
                        r2.result.astype(np.float32)))

    def direct(x0, cond):
        cap = jnp.asarray(cond["cap"])[None].astype(jnp.bfloat16)
        ncap = jnp.asarray(cond["ncap"])[None].astype(jnp.bfloat16)
        s = float(cond["cfg_scale"])

        def velocity(x, sig):
            tt = jnp.full((1,), sig, jnp.float32)
            v_c = lumina2.forward(lum_params, cfg, x, cap, tt, qcfg=F32CFG)
            v_u = lumina2.forward(lum_params, cfg, x, ncap, tt, qcfg=F32CFG)
            return v_u + s * (v_c - v_u)

        return np.asarray(euler_sample(
            velocity, jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas
        )[0], np.float32)

    w1, w2 = direct(x1, c1), direct(x2, c2)
    for got1, got2 in results:
        np.testing.assert_allclose(got1, w1, rtol=0.05, atol=0.05)
        np.testing.assert_allclose(got2, w2, rtol=0.05, atol=0.05)
