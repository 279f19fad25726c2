"""Full-depth bench shape specs must match the real loader-produced
stacked trees (key set + leaf logical shapes) — guards
testing.*_shape_spec against drift from the model key schemas that the
GGUF loader + stack_*_params actually produce."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.models import testing


def _leaf_shape(v):
    # PlanarQuant carries the logical (R, K) in .shape; dense leaves are
    # arrays. Stacked planar leaves get the depth prepended by the
    # caller-side comparison instead (random_planar stores logical 2-D).
    return tuple(v.shape)


def assert_spec_matches(stacked_real: dict, nonblock: dict, groups: dict):
    real_top = {k for k in stacked_real if k not in groups}
    assert real_top == set(nonblock), (
        f"nonblock keys differ: only-real={sorted(real_top - set(nonblock))} "
        f"only-spec={sorted(set(nonblock) - real_top)}")
    for k, s in nonblock.items():
        assert tuple(stacked_real[k].shape) == tuple(s), (
            k, stacked_real[k].shape, s)
    for out_key, (depth, suffixes) in groups.items():
        sub = stacked_real[out_key]
        assert set(sub) == set(suffixes), (
            f"{out_key} suffixes differ: "
            f"only-real={sorted(set(sub) - set(suffixes))} "
            f"only-spec={sorted(set(suffixes) - set(sub))}")
        for suf, s in suffixes.items():
            want = (depth, *s)
            assert tuple(sub[suf].shape) == want, (suf, sub[suf].shape, want)


def test_wan_spec_matches_loader_tree(tmp_path):
    import test_wan as tw
    from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
    from comfyui_gguf_tpu.models import wan

    sd = tw._tiny_wan(np.random.default_rng(0))
    p = tmp_path / "wan.gguf"
    tw._write_gguf(sd, p)
    raw = gguf_sd_loader(str(p))
    params = to_jax_params(raw, tw.F32CFG)
    cfg = wan.WanConfig.from_state_dict(params)
    stacked = wan.stack_wan_params(params, cfg)

    dims = testing.WanDims(dim=tw.DIM, ffn_dim=tw.FFN, n_layers=tw.LAYERS,
                           text_dim=tw.TDIM, in_ch=tw.C)
    nonblock, groups = testing.wan_shape_spec(dims)
    assert_spec_matches(stacked, nonblock, groups)


def test_wan_spec_generator_forward():
    from comfyui_gguf_tpu.models import wan

    d = testing.WanDims()
    sp = testing.wan_random_stacked_params(d)
    cfg = d.config()
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 2, 8, 8, d.in_ch)),
                      jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((1, 6, d.text_dim)), jnp.bfloat16)
    t = jnp.ones((1,), jnp.float32)
    out = wan.forward_stacked(sp, cfg, lat, ctx, t)
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_hyvid_spec_matches_loader_tree(tmp_path):
    import test_hyvid as th
    from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
    from comfyui_gguf_tpu.models import hyvid
    from comfyui_gguf_tpu.gguf.writer import GGUFWriter
    from comfyui_gguf_tpu.gguf.constants import GGUFValueType
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    sd = th._tiny_hyvid(np.random.default_rng(0))
    p = tmp_path / "h.gguf"
    w = GGUFWriter("hyvid")
    pfx = "model.diffusion_model."
    for k, v in sd.items():
        if v.ndim > 4:
            w.add_tensor(pfx + k, v.reshape(-1, *v.shape[-3:]))
            w.add_field(f"comfy.gguf.orig_shape.{pfx}{k}",
                        GGUFValueType.ARRAY, [int(x) for x in v.shape],
                        GGUFValueType.INT32)
        else:
            w.add_tensor(pfx + k, v)
    w.write_to_file(str(p))
    raw = gguf_sd_loader(str(p))
    params = to_jax_params(raw, QuantConfig(
        dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
        prefer_pallas=False))
    cfg = hyvid.HyVidConfig.from_state_dict(params)
    stacked = hyvid.stack_hyvid_params(params, cfg)

    dims = testing.HyVidDims(hidden=th.HID, n_heads=th.HEADS,
                             depth_double=th.DD, depth_single=th.DS,
                             refiner_depth=1, in_ch=th.C,
                             text_dim=th.TDIM)
    nonblock, groups = testing.hyvid_shape_spec(dims)
    assert_spec_matches(stacked, nonblock, groups)


def test_hyvid_spec_generator_forward():
    from comfyui_gguf_tpu.models import hyvid

    d = testing.HyVidDims(refiner_depth=2)
    sp = testing.hyvid_random_stacked_params(d)
    cfg = d.config()
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 2, 8, 8, d.in_ch)),
                      jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, 11, d.text_dim)),
                      jnp.bfloat16)
    t = jnp.ones((1,), jnp.float32)
    g = jnp.full((1,), 6.0, jnp.float32)
    out = hyvid.forward_stacked(sp, cfg, lat, txt, t, g)
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def _gguf_roundtrip(tmp_path, sd, arch):
    from comfyui_gguf_tpu.gguf.writer import GGUFWriter
    from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    p = tmp_path / f"{arch}.gguf"
    w = GGUFWriter(arch)
    for k, v in sd.items():
        w.add_tensor("model.diffusion_model." + k, v)
    w.write_to_file(str(p))
    return to_jax_params(gguf_sd_loader(str(p)), QuantConfig(
        dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
        prefer_pallas=False))


def test_qwen_image_spec_matches_loader_tree(tmp_path):
    import test_cosmos_qwen as tq
    from comfyui_gguf_tpu.models import qwen_image

    params = _gguf_roundtrip(
        tmp_path, tq._tiny_qwen(np.random.default_rng(0)), "qwen_image")
    cfg = qwen_image.QwenImageConfig.from_state_dict(params)
    stacked = qwen_image.stack_qwen_params(params, cfg)

    dims = testing.QwenImageDims(hidden=tq.QHID, n_heads=tq.QHID // tq.QHD,
                                 n_layers=tq.QLAYERS, in_ch=tq.QIN,
                                 context_dim=tq.QCTX)
    nonblock, groups = testing.qwen_image_shape_spec(dims)
    assert_spec_matches(stacked, nonblock, groups)


def test_qwen_image_spec_generator_forward():
    from comfyui_gguf_tpu.models import flux, qwen_image

    d = testing.QwenImageDims()
    sp = testing.qwen_image_random_stacked_params(d)
    cfg = d.config()
    rng = np.random.default_rng(1)
    h_tok = w_tok = 4
    img = jnp.asarray(rng.standard_normal((1, h_tok * w_tok, d.in_ch)),
                      jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_img_ids(h_tok, w_tok, 1))
    txt = jnp.asarray(rng.standard_normal((1, 7, d.context_dim)),
                      jnp.bfloat16)
    txt_ids = jnp.zeros((1, 7, 3), jnp.int32)
    t = jnp.ones((1,), jnp.float32)
    out = qwen_image.forward_stacked(sp, cfg, img, img_ids, txt, txt_ids, t)
    assert out.shape == img.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_lumina2_spec_matches_loader_tree(tmp_path):
    import test_lumina2 as tl
    from comfyui_gguf_tpu.models import lumina2

    params = _gguf_roundtrip(
        tmp_path, tl._tiny_lumina2(np.random.default_rng(0)), "lumina2")
    cfg = lumina2.Lumina2Config.from_state_dict(params)
    stacked = lumina2.stack_lumina2_params(params, cfg)

    dims = testing.Lumina2Dims(dim=tl.DIM, n_heads=tl.DIM // tl.HD,
                               n_layers=tl.LAYERS, n_refiner=tl.NREF,
                               n_context_refiner=1, ffn=tl.FFN,
                               in_ch=tl.C, cap_dim=tl.CAP)
    nonblock, groups = testing.lumina2_shape_spec(dims)
    assert_spec_matches(stacked, nonblock, groups)


def test_lumina2_spec_generator_forward():
    from comfyui_gguf_tpu.models import lumina2

    d = testing.Lumina2Dims()
    sp = testing.lumina2_random_stacked_params(d)
    cfg = d.config()
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 8, 8, d.in_ch)), jnp.bfloat16)
    cap = jnp.asarray(rng.standard_normal((1, 6, d.cap_dim)), jnp.bfloat16)
    t = jnp.ones((1,), jnp.float32)
    out = lumina2.forward_stacked(sp, cfg, lat, cap, t)
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_aura_spec_matches_loader_tree(tmp_path):
    import test_aura as ta
    from comfyui_gguf_tpu.models import aura

    params = _gguf_roundtrip(
        tmp_path, ta._tiny_aura(np.random.default_rng(0)), "aura")
    cfg = aura.AuraConfig.from_state_dict(params)
    stacked = aura.stack_aura_params(params, cfg)

    dims = testing.AuraDims(hidden=ta.HID, depth_double=ta.DD,
                            depth_single=ta.DS, mlp=ta.MLP, in_ch=ta.C,
                            cond_dim=ta.COND, n_register_tokens=ta.REG,
                            max_tokens=64)
    nonblock, groups = testing.aura_shape_spec(dims)
    assert_spec_matches(stacked, nonblock, groups)


def test_aura_spec_generator_forward():
    from comfyui_gguf_tpu.models import aura

    d = testing.AuraDims()
    sp = testing.aura_random_stacked_params(d)
    cfg = d.config()
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 8, 8, d.in_ch)), jnp.bfloat16)
    cond = jnp.asarray(rng.standard_normal((1, 7, d.cond_dim)), jnp.bfloat16)
    t = jnp.ones((1,), jnp.float32)
    out = aura.forward_stacked(sp, cfg, lat, cond, t)
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_ltxv_spec_matches_loader_tree(tmp_path):
    import test_ltxv as tx
    from comfyui_gguf_tpu.models import ltxv

    params = _gguf_roundtrip(
        tmp_path, tx._tiny_ltxv(np.random.default_rng(0)), "ltxv")
    cfg = ltxv.LTXVConfig.from_state_dict(params)
    stacked = ltxv.stack_ltxv_params(params, cfg)

    dims = testing.LTXVDims(dim=tx.DIM, n_layers=tx.LAYERS, in_ch=tx.INCH,
                            caption_dim=tx.CAP)
    nonblock, groups = testing.ltxv_shape_spec(dims)
    assert_spec_matches(stacked, nonblock, groups)


def test_ltxv_spec_generator_forward():
    from comfyui_gguf_tpu.models import ltxv

    d = testing.LTXVDims()
    sp = testing.ltxv_random_stacked_params(d)
    cfg = d.config()
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.standard_normal((1, 24, d.in_ch)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, 8, (1, 24, 3)), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 9, d.caption_dim)),
                      jnp.bfloat16)
    t = jnp.ones((1,), jnp.float32)
    out = ltxv.forward_stacked(sp, cfg, tokens, ids, ctx, t)
    assert out.shape == tokens.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_cosmos_spec_matches_loader_tree(tmp_path):
    import test_cosmos_qwen as tq
    from comfyui_gguf_tpu.models import cosmos

    params = _gguf_roundtrip(
        tmp_path, tq._tiny_cosmos(np.random.default_rng(0)), "cosmos")
    cfg = cosmos.CosmosConfig.from_state_dict(params)
    stacked = cosmos.stack_cosmos_params(params, cfg)

    dims = testing.CosmosDims(dim=tq.CDIM, n_heads=tq.CDIM // tq.CHD,
                              n_layers=tq.CLAYERS, in_ch=tq.CC,
                              text_dim=tq.CCTX)
    nonblock, groups = testing.cosmos_shape_spec(dims)
    assert_spec_matches(stacked, nonblock, groups)


def test_cosmos_spec_generator_forward():
    from comfyui_gguf_tpu.models import cosmos

    d = testing.CosmosDims()
    sp = testing.cosmos_random_stacked_params(d)
    cfg = d.config()
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 2, 8, 8, d.in_ch)),
                      jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((1, 7, d.text_dim)), jnp.bfloat16)
    t = jnp.ones((1,), jnp.float32)
    out = cosmos.forward_stacked(sp, cfg, lat, ctx, t)
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
