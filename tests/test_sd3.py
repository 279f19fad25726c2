"""SD3/SD3.5 MMDiT graph tests (tiny config through the GGUF pipeline)."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.gguf.writer import GGUFWriter
from comfyui_gguf_tpu.loader import gguf_sd_loader, to_jax_params
from comfyui_gguf_tpu.models import sd3
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.quant import codecs

HID, HEADS, CTX, POOL, INCH, DEPTH = 128, 2, 64, 32, 16, 3
POSMAX = 8

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


def _tiny_sd3(rng, qk_norm=True, dual=(1,)):
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        "pos_embed": t(1, POSMAX * POSMAX, HID),
        "x_embedder.proj.weight": t(HID, INCH, 2, 2),
        "x_embedder.proj.bias": t(HID),
        "t_embedder.mlp.0.weight": t(HID, 256),
        "t_embedder.mlp.0.bias": t(HID),
        "t_embedder.mlp.2.weight": t(HID, HID),
        "t_embedder.mlp.2.bias": t(HID),
        "y_embedder.mlp.0.weight": t(HID, POOL),
        "y_embedder.mlp.0.bias": t(HID),
        "y_embedder.mlp.2.weight": t(HID, HID),
        "y_embedder.mlp.2.bias": t(HID),
        "context_embedder.weight": t(HID, CTX),
        "context_embedder.bias": t(HID),
        "final_layer.linear.weight": t(INCH * 4, HID),
        "final_layer.linear.bias": t(INCH * 4),
        "final_layer.adaLN_modulation.1.weight": t(2 * HID, HID),
        "final_layer.adaLN_modulation.1.bias": t(2 * HID),
    }
    hd = HID // HEADS
    for i in range(DEPTH):
        last = i == DEPTH - 1
        for blk in ("context_block", "x_block"):
            p = f"joint_blocks.{i}.{blk}"
            n_mod = 2 if (blk == "context_block" and last) else (
                9 if (blk == "x_block" and i in dual) else 6)
            sd[f"{p}.adaLN_modulation.1.weight"] = t(n_mod * HID, HID)
            sd[f"{p}.adaLN_modulation.1.bias"] = t(n_mod * HID)
            sd[f"{p}.attn.qkv.weight"] = t(3 * HID, HID)
            sd[f"{p}.attn.qkv.bias"] = t(3 * HID)
            if qk_norm:
                sd[f"{p}.attn.ln_q.weight"] = t(hd) + 1
                sd[f"{p}.attn.ln_k.weight"] = t(hd) + 1
            if not (blk == "context_block" and last):
                sd[f"{p}.attn.proj.weight"] = t(HID, HID)
                sd[f"{p}.attn.proj.bias"] = t(HID)
                sd[f"{p}.mlp.fc1.weight"] = t(4 * HID, HID)
                sd[f"{p}.mlp.fc1.bias"] = t(4 * HID)
                sd[f"{p}.mlp.fc2.weight"] = t(HID, 4 * HID)
                sd[f"{p}.mlp.fc2.bias"] = t(HID)
            if blk == "x_block" and i in dual:
                sd[f"{p}.attn2.qkv.weight"] = t(3 * HID, HID)
                sd[f"{p}.attn2.qkv.bias"] = t(3 * HID)
                if qk_norm:
                    sd[f"{p}.attn2.ln_q.weight"] = t(hd) + 1
                    sd[f"{p}.attn2.ln_k.weight"] = t(hd) + 1
                sd[f"{p}.attn2.proj.weight"] = t(HID, HID)
                sd[f"{p}.attn2.proj.bias"] = t(HID)
    return sd


def _write(sd, path, qtype):
    w = GGUFWriter("sd3")
    pfx = "model.diffusion_model."
    for k, v in sd.items():
        if (qtype is not None and v.ndim == 2 and v.shape[1] % 64 == 0
                and "joint_blocks" in k and "ln_" not in k):
            w.add_tensor(pfx + k, codecs.quantize(v, qtype), raw_dtype=qtype,
                         raw_shape=v.shape)
        else:
            w.add_tensor(pfx + k, v)
    w.write_to_file(str(path))


def _forward(params, cfg):
    rng = np.random.default_rng(5)
    B, H, W = 2, 8, 8
    latent = jnp.asarray(rng.standard_normal((B, H, W, INCH)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, 11, CTX)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((B, POOL)), jnp.float32)
    t = jnp.asarray([1.0, 0.4], jnp.float32)
    return np.asarray(sd3.forward(params, cfg, latent, ctx, pooled, t,
                                  qcfg=F32CFG))


@pytest.fixture(scope="module")
def tiny():
    return _tiny_sd3(np.random.default_rng(0))


def test_sd3_config_detection(tmp_path, tiny):
    p = tmp_path / "sd3.gguf"
    _write(tiny, p, None)
    raw, arch = gguf_sd_loader(str(p), return_arch=True)
    assert arch == "sd3"
    params = to_jax_params(raw, F32CFG)
    cfg = sd3.SD3Config.from_state_dict(params)
    assert cfg.hidden == HID and cfg.depth == DEPTH
    assert cfg.qk_norm and cfg.dual_attn_layers == (1,)
    assert cfg.pos_embed_max == POSMAX


def test_sd3_forward_shape_and_finite(tmp_path, tiny):
    p = tmp_path / "sd3.gguf"
    _write(tiny, p, None)
    params = to_jax_params(gguf_sd_loader(str(p)), F32CFG)
    cfg = sd3.SD3Config.from_state_dict(params)
    out = _forward(params, cfg)
    assert out.shape == (2, 8, 8, INCH)
    assert np.isfinite(out).all()


def test_sd3_quantized_close_to_dense(tmp_path, tiny):
    pa = tmp_path / "a.gguf"
    pb = tmp_path / "b.gguf"
    _write(tiny, pa, None)
    _write(tiny, pb, Q.Q8_0)
    cfg = None
    outs = []
    for p in (pa, pb):
        params = to_jax_params(gguf_sd_loader(str(p)), F32CFG)
        cfg = cfg or sd3.SD3Config.from_state_dict(params)
        outs.append(_forward(params, cfg).ravel())
    a, b = outs
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.995, cos


def test_pos_embed_crop_center():
    rng = np.random.default_rng(1)
    pe = rng.standard_normal((1, POSMAX * POSMAX, 4)).astype(np.float32)
    params = {"pos_embed": jnp.asarray(pe)}
    cfg = sd3.SD3Config(hidden=4, depth=1, n_heads=1, pos_embed_max=POSMAX)
    crop = np.asarray(sd3.cropped_pos_embed(params, cfg, 4, 4))
    grid = pe.reshape(POSMAX, POSMAX, 4)
    want = grid[2:6, 2:6].reshape(1, 16, 4)
    np.testing.assert_array_equal(crop, want)


def test_sd3_forward_stacked_matches_unrolled():
    """stack_sd3_params + forward_stacked (scan over the homogeneous
    prefix, unrolled pre-only tail) == unrolled forward, exactly."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import sd3, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    dims = testing.TinySD3Dims(depth=4)
    cfg = dims.config()
    params = testing.sd3_random_quant_params(dims, seed=3)
    inputs = testing.sd3_example_inputs(dims, h_lat=8, w_lat=8, ctx_len=8)
    qcfg = QuantConfig()

    ref = jax.jit(lambda p, *a: sd3.forward(p, cfg, *a, qcfg=qcfg))(
        params, *inputs)
    sp = sd3.stack_sd3_params(params, cfg)
    got = jax.jit(lambda p, *a: sd3.forward_stacked(p, cfg, *a,
                                                    qcfg=qcfg))(sp, *inputs)
    assert got.shape == ref.shape
    # scan compiles/fuses differently than the unrolled loop — bf16-level
    # tolerance, same policy as test_flux.py::test_forward_stacked_*
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert float(abs(got - ref).max()) < 0.05


def test_sd3_stacked_generator_runs():
    """Direct-stacked generator feeds forward_stacked (shape + finite)."""
    import jax
    import jax.numpy as jnp

    from comfyui_gguf_tpu.models import sd3, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    dims = testing.TinySD3Dims(depth=3)
    cfg = dims.config()
    sp = testing.sd3_random_stacked_params(dims, seed=5)
    inputs = testing.sd3_example_inputs(dims, h_lat=8, w_lat=8, ctx_len=8)
    out = jax.jit(lambda p, *a: sd3.forward_stacked(
        p, cfg, *a, qcfg=QuantConfig()))(sp, *inputs)
    assert out.shape == inputs[0].shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_medium_dual_prefix_stacks_and_matches_unrolled():
    """sd3.5-medium's dual-attention blocks are a CONTIGUOUS PREFIX in
    real checkpoints — they now stack as their own scan group; the
    stacked forward must equal the unrolled one (round-5: the 'medium
    stays unstacked' limitation removed)."""
    import jax.numpy as jnp

    from comfyui_gguf_tpu.nn.layers import QuantConfig

    F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                      prefer_pallas=False)
    rng = np.random.default_rng(61)
    params = {k: jnp.asarray(v)
              for k, v in _tiny_sd3(rng, dual=(0, 1)).items()}
    cfg = sd3.SD3Config.from_state_dict(params)
    assert cfg.dual_attn_layers == (0, 1)

    latent = jnp.asarray(rng.standard_normal((1, 8, 8, cfg.in_channels)),
                         jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, cfg.context_dim)),
                      jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                         jnp.float32)
    t = jnp.full((1,), 0.6, jnp.float32)

    want = sd3.forward(params, cfg, latent, ctx, pooled, t, qcfg=F32)

    sp = sd3.stack_sd3_params(params, cfg)
    assert "joint_blocks_dual" in sp
    got = sd3.forward_stacked(sp, cfg, latent, ctx, pooled, t, qcfg=F32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # a non-contiguous dual layout still refuses loudly
    import pytest

    bad = {k: jnp.asarray(v)
           for k, v in _tiny_sd3(rng, dual=(1,)).items()}
    bad_cfg = sd3.SD3Config.from_state_dict(bad)
    with pytest.raises(ValueError, match="contiguous"):
        sd3.stack_sd3_params(bad, bad_cfg)
