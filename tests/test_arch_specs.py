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
