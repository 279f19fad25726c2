"""HunyuanVideo DiT tests (tiny config through GGUF, incl. token refiner)."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGUFValueType
from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import hyvid
from comfyui_gguf_tpu.nn.layers import QuantConfig

HID, HEADS, TDIM, C, DD, DS = 128, 2, 64, 16, 2, 2
MLP = 4 * HID
HD = HID // HEADS

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _tiny_hyvid(rng):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "img_in.proj.weight": t(HID, C, 1, 2, 2),
        "img_in.proj.bias": t(HID),
        "time_in.in_layer.weight": t(HID, 256),
        "time_in.in_layer.bias": t(HID),
        "time_in.out_layer.weight": t(HID, HID),
        "time_in.out_layer.bias": t(HID),
        "guidance_in.in_layer.weight": t(HID, 256),
        "guidance_in.in_layer.bias": t(HID),
        "guidance_in.out_layer.weight": t(HID, HID),
        "guidance_in.out_layer.bias": t(HID),
        "txt_in.input_embedder.weight": t(HID, TDIM),
        "txt_in.input_embedder.bias": t(HID),
        "txt_in.t_embedder.mlp.0.weight": t(HID, 256),
        "txt_in.t_embedder.mlp.0.bias": t(HID),
        "txt_in.t_embedder.mlp.2.weight": t(HID, HID),
        "txt_in.t_embedder.mlp.2.bias": t(HID),
        "txt_in.c_embedder.linear_1.weight": t(HID, HID),
        "txt_in.c_embedder.linear_1.bias": t(HID),
        "txt_in.c_embedder.linear_2.weight": t(HID, HID),
        "txt_in.c_embedder.linear_2.bias": t(HID),
        "final_layer.linear.weight": t(C * 4, HID),
        "final_layer.linear.bias": t(C * 4),
        "final_layer.adaLN_modulation.1.weight": t(2 * HID, HID),
        "final_layer.adaLN_modulation.1.bias": t(2 * HID),
    }
    rb = "txt_in.individual_token_refiner.blocks.0"
    sd.update({
        f"{rb}.self_attn_qkv.weight": t(3 * HID, HID),
        f"{rb}.self_attn_qkv.bias": t(3 * HID),
        f"{rb}.self_attn_proj.weight": t(HID, HID),
        f"{rb}.self_attn_proj.bias": t(HID),
        f"{rb}.norm1.weight": t(HID) + 1,
        f"{rb}.norm1.bias": t(HID),
        f"{rb}.norm2.weight": t(HID) + 1,
        f"{rb}.norm2.bias": t(HID),
        f"{rb}.mlp.fc1.weight": t(MLP, HID),
        f"{rb}.mlp.fc1.bias": t(MLP),
        f"{rb}.mlp.fc2.weight": t(HID, MLP),
        f"{rb}.mlp.fc2.bias": t(HID),
        f"{rb}.adaLN_modulation.1.weight": t(2 * HID, HID),
        f"{rb}.adaLN_modulation.1.bias": t(2 * HID),
    })
    for i in range(DD):
        p = f"double_blocks.{i}."
        for s in ("img", "txt"):
            sd[p + f"{s}_mod.linear.weight"] = t(6 * HID, HID)
            sd[p + f"{s}_mod.linear.bias"] = t(6 * HID)
            sd[p + f"{s}_attn_qkv.weight"] = t(3 * HID, HID)
            sd[p + f"{s}_attn_qkv.bias"] = t(3 * HID)
            sd[p + f"{s}_attn_q_norm.weight"] = t(HD) + 1
            sd[p + f"{s}_attn_k_norm.weight"] = t(HD) + 1
            sd[p + f"{s}_attn_proj.weight"] = t(HID, HID)
            sd[p + f"{s}_attn_proj.bias"] = t(HID)
            sd[p + f"{s}_mlp.fc1.weight"] = t(MLP, HID)
            sd[p + f"{s}_mlp.fc1.bias"] = t(MLP)
            sd[p + f"{s}_mlp.fc2.weight"] = t(HID, MLP)
            sd[p + f"{s}_mlp.fc2.bias"] = t(HID)
    for i in range(DS):
        p = f"single_blocks.{i}."
        sd[p + "linear1.weight"] = t(3 * HID + MLP, HID)
        sd[p + "linear1.bias"] = t(3 * HID + MLP)
        sd[p + "linear2.weight"] = t(HID, HID + MLP)
        sd[p + "linear2.bias"] = t(HID)
        sd[p + "modulation.linear.weight"] = t(3 * HID, HID)
        sd[p + "modulation.linear.bias"] = t(3 * HID)
        sd[p + "q_norm.weight"] = t(HD) + 1
        sd[p + "k_norm.weight"] = t(HD) + 1
    return sd


@pytest.fixture(scope="module")
def hyvid_params(tmp_path_factory):
    sd = _tiny_hyvid(np.random.default_rng(0))
    p = tmp_path_factory.mktemp("hyvid") / "h.gguf"
    w = GGUFWriter("hyvid")
    pfx = "model.diffusion_model."
    for k, v in sd.items():
        if v.ndim > 4:
            w.add_tensor(pfx + k, v.reshape(-1, *v.shape[-3:]))
            w.add_field(f"comfy.gguf.orig_shape.{pfx}{k}",
                        GGUFValueType.ARRAY, [int(d) for d in v.shape],
                        GGUFValueType.INT32)
        else:
            w.add_tensor(pfx + k, v)
    w.write_to_file(str(p))
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "hyvid"
    return to_jax_params(raw, F32CFG)


def test_hyvid_config(hyvid_params):
    cfg = hyvid.HyVidConfig.from_state_dict(hyvid_params)
    assert cfg.hidden == HID and cfg.n_heads == HEADS
    assert cfg.depth_double == DD and cfg.depth_single == DS
    assert cfg.guidance_embed
    assert sum(cfg.axes_dim) == HD
    assert all(d % 2 == 0 for d in cfg.axes_dim)


def test_hyvid_forward(hyvid_params):
    cfg = hyvid.HyVidConfig.from_state_dict(hyvid_params)
    rng = np.random.default_rng(1)
    B, F, H, W = 1, 3, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, F, H, W, C)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, 11, TDIM)), jnp.float32)
    t = jnp.asarray([0.6], jnp.float32)
    g = jnp.asarray([6.0], jnp.float32)
    out = hyvid.forward(hyvid_params, cfg, lat, txt, t, g, qcfg=F32CFG)
    assert out.shape == (B, F, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


def test_hyvid_stacked_forward_matches_unrolled(hyvid_params):
    cfg = hyvid.HyVidConfig.from_state_dict(hyvid_params)
    rng = np.random.default_rng(2)
    B, F, H, W = 1, 3, 8, 8
    lat = jnp.asarray(rng.standard_normal((B, F, H, W, C)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, 11, TDIM)), jnp.float32)
    t = jnp.asarray([0.4], jnp.float32)
    g = jnp.asarray([5.0], jnp.float32)

    want = hyvid.forward(hyvid_params, cfg, lat, txt, t, g, qcfg=F32CFG)
    sparams = hyvid.stack_hyvid_params(hyvid_params, cfg)
    got = hyvid.forward_stacked(sparams, cfg, lat, txt, t, g, qcfg=F32CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_hyvid_engine_serving(hyvid_params):
    """Guidance-distilled video serving: pooled requests with DIFFERENT
    embedded-guidance scales each match their direct euler integration;
    stacked params serve the same results."""
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule

    cfg = hyvid.HyVidConfig.from_state_dict(hyvid_params)
    F, H, W = 3, 8, 8
    sigmas = linear_schedule(3)

    def mk_req(seed, g):
        r = np.random.default_rng(seed)
        return (r.standard_normal((F, H, W, C)).astype(np.float32),
                {"txt": r.standard_normal((11, TDIM)).astype(np.float32),
                 "guidance": np.float32(g)})

    x1, c1 = mk_req(10, 6.0)
    x2, c2 = mk_req(11, 1.0)

    base = pipeline.DiffusionModel(arch="hyvid", params=hyvid_params,
                                   config=cfg, qcfg=F32CFG)
    results = []
    for stacked in (False, True):
        mdl = base.stack() if stacked else base
        eng = pipeline.hyvid_engine(mdl, max_batch=2)
        r1 = eng.submit(x1.copy(), c1, sigmas)
        r2 = eng.submit(x2.copy(), c2, sigmas)
        eng.run_until_drained()
        assert r1.finished and r2.finished
        results.append((r1.result.astype(np.float32),
                        r2.result.astype(np.float32)))

    def direct(x0, cond):
        txt = jnp.asarray(cond["txt"])[None].astype(jnp.bfloat16)
        g = jnp.asarray([float(cond["guidance"]) * 1000.0], jnp.float32)

        def velocity(x, sig):
            tt = jnp.full((1,), sig, jnp.float32)
            return hyvid.forward(hyvid_params, cfg, x, txt, tt, g,
                                 qcfg=F32CFG)

        return np.asarray(euler_sample(
            velocity, jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas
        )[0], np.float32)

    w1, w2 = direct(x1, c1), direct(x2, c2)
    for got1, got2 in results:
        np.testing.assert_allclose(got1, w1, rtol=0.05, atol=0.05)
        np.testing.assert_allclose(got2, w2, rtol=0.05, atol=0.05)
