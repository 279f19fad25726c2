"""LoRA pipeline tests: epilogue math == dense patched weight, key mapping,
attach/detach lifecycle (SURVEY.md §2.8/2.11/2.12, §7.7)."""

import jax.numpy as jnp
import numpy as np

from comfyui_gguf_tpu import lora
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.nn.layers import QuantConfig, linear, materialize
from comfyui_gguf_tpu.quant import codecs, planar

F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     patch_dtype=jnp.float32, prefer_pallas=False)


def _planar_weight(rng, R, K, qtype=Q.Q8_0):
    w = rng.standard_normal((R, K), dtype=np.float32)
    blocks = codecs.quantize(w, qtype)
    pq = planar.planarize(blocks, qtype, (R, K))
    return pq, codecs.dequantize(blocks, qtype, (R, K))


def test_epilogue_equals_dense_patched_weight():
    rng = np.random.default_rng(0)
    R, K, r = 128, 256, 4
    pq, w_deq = _planar_weight(rng, R, K)
    up = rng.standard_normal((R, r), dtype=np.float32)
    down = rng.standard_normal((r, K), dtype=np.float32)
    alpha, strength = 8.0, 0.7
    patch = lora.LoRAPatch(up=jnp.asarray(up), down=jnp.asarray(down),
                           mid=None, diff=None,
                           scale=strength * alpha / r)
    pw = lora.PatchedWeight(pq, (patch,))

    x = rng.standard_normal((5, K), dtype=np.float32)
    got = np.asarray(linear(jnp.asarray(x), pw, cfg=F32CFG))
    want = x @ (w_deq + (strength * alpha / r) * (up @ down)).T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_diff_patch():
    rng = np.random.default_rng(1)
    R, K = 64, 128
    pq, w_deq = _planar_weight(rng, R, K)
    diff = rng.standard_normal((R, K), dtype=np.float32)
    pw = lora.PatchedWeight(pq, (lora.LoRAPatch(
        up=None, down=None, mid=None, diff=jnp.asarray(diff), scale=0.5),))
    x = rng.standard_normal((3, K), dtype=np.float32)
    got = np.asarray(linear(jnp.asarray(x), pw, cfg=F32CFG))
    np.testing.assert_allclose(got, x @ (w_deq + 0.5 * diff).T,
                               rtol=2e-4, atol=2e-4)


def test_materialize_folds_patches():
    rng = np.random.default_rng(2)
    pq, w_deq = _planar_weight(rng, 64, 128)
    up = rng.standard_normal((64, 2), dtype=np.float32)
    down = rng.standard_normal((2, 128), dtype=np.float32)
    pw = lora.PatchedWeight(pq, (lora.LoRAPatch(
        up=jnp.asarray(up), down=jnp.asarray(down), mid=None, diff=None,
        scale=2.0),))
    got = np.asarray(materialize(pw, jnp.float32))
    np.testing.assert_allclose(got, w_deq + 2.0 * (up @ down),
                               rtol=1e-5, atol=1e-5)


def test_kohya_key_mapping():
    model_keys = [
        "double_blocks.0.img_attn.qkv.weight",
        "single_blocks.3.linear1.weight",
        "final_layer.linear.weight",
    ]
    rng = np.random.default_rng(3)
    sd = {}
    for mk in model_keys[:2]:
        mangled = "lora_unet_" + mk[: -len(".weight")].replace(".", "_")
        sd[mangled + ".lora_up.weight"] = rng.standard_normal((8, 4)).astype(
            np.float32)
        sd[mangled + ".lora_down.weight"] = rng.standard_normal(
            (4, 16)).astype(np.float32)
        sd[mangled + ".alpha"] = np.float32(4.0)
    groups = lora.group_lora_keys(sd)
    assert len(groups) == 2
    mapped = lora.map_lora_to_model_keys(groups, model_keys)
    assert set(mapped) == set(model_keys[:2])
    patches = lora.build_patches(mapped, strength=0.5)
    p = patches["double_blocks.0.img_attn.qkv.weight"][0]
    assert p.scale == 0.5 * 4.0 / 4  # strength * alpha / rank


def test_attach_detach_roundtrip():
    rng = np.random.default_rng(4)
    pq, _ = _planar_weight(rng, 64, 128)
    params = {"w.weight": pq, "other.weight": jnp.zeros((4, 4))}
    patches = {"w.weight": (lora.LoRAPatch(
        up=jnp.zeros((64, 2)), down=jnp.zeros((2, 128)), mid=None,
        diff=None, scale=1.0),)}
    patched = lora.attach_patches(params, patches)
    assert isinstance(patched["w.weight"], lora.PatchedWeight)
    assert patched["other.weight"] is params["other.weight"]
    # stacking a second patch set extends, not replaces
    patched2 = lora.attach_patches(patched, patches)
    assert len(patched2["w.weight"].patches) == 2
    restored = lora.detach_patches(patched2)
    assert restored["w.weight"] is pq


def test_lora_zero_patch_is_identity():
    rng = np.random.default_rng(5)
    pq, _ = _planar_weight(rng, 64, 128)
    x = jnp.asarray(rng.standard_normal((2, 128), dtype=np.float32))
    base = np.asarray(linear(x, pq, cfg=F32CFG))
    pw = lora.PatchedWeight(pq, (lora.LoRAPatch(
        up=jnp.zeros((64, 2)), down=jnp.zeros((2, 128)), mid=None,
        diff=None, scale=1.0),))
    got = np.asarray(linear(x, pw, cfg=F32CFG))
    np.testing.assert_allclose(got, base, atol=1e-6)


def test_loha_patch_matches_hadamard():
    rng = np.random.default_rng(6)
    R, K, r = 32, 48, 4
    parts = {
        "hada_w1_a": rng.standard_normal((R, r)).astype(np.float32),
        "hada_w1_b": rng.standard_normal((r, K)).astype(np.float32),
        "hada_w2_a": rng.standard_normal((R, r)).astype(np.float32),
        "hada_w2_b": rng.standard_normal((r, K)).astype(np.float32),
        "alpha": np.float32(2.0),
    }
    patches = lora.build_patches({"w.weight": parts}, strength=0.5,
                                 dtype=jnp.float32)
    p = patches["w.weight"][0]
    want = ((parts["hada_w1_a"] @ parts["hada_w1_b"])
            * (parts["hada_w2_a"] @ parts["hada_w2_b"]))
    np.testing.assert_allclose(np.asarray(p.diff), want, rtol=1e-5)
    assert abs(p.scale - 0.5 * 2.0 / 4) < 1e-9


def test_lokr_patch_matches_kron():
    rng = np.random.default_rng(7)
    parts = {
        "lokr_w1": rng.standard_normal((4, 6)).astype(np.float32),
        "lokr_w2": rng.standard_normal((8, 8)).astype(np.float32),
    }
    patches = lora.build_patches({"w.weight": parts}, strength=1.0,
                                 dtype=jnp.float32)
    p = patches["w.weight"][0]
    assert p.diff.shape == (32, 48)
    np.testing.assert_allclose(
        np.asarray(p.diff), np.kron(parts["lokr_w1"], parts["lokr_w2"]),
        rtol=1e-5)


def test_lokr_factored_components():
    rng = np.random.default_rng(8)
    parts = {
        "lokr_w1": rng.standard_normal((2, 3)).astype(np.float32),
        "lokr_w2_a": rng.standard_normal((8, 4)).astype(np.float32),
        "lokr_w2_b": rng.standard_normal((4, 6)).astype(np.float32),
        "alpha": np.float32(4.0),
    }
    patches = lora.build_patches({"w.weight": parts}, strength=1.0,
                                 dtype=jnp.float32)
    p = patches["w.weight"][0]
    want = np.kron(parts["lokr_w1"],
                   parts["lokr_w2_a"] @ parts["lokr_w2_b"])
    np.testing.assert_allclose(np.asarray(p.diff), want, rtol=1e-5)
    assert abs(p.scale - 4.0 / 4) < 1e-9


def test_group_keys_loha():
    sd = {"lora_unet_x.hada_w1_a": np.zeros((2, 2), np.float32),
          "lora_unet_x.hada_w1_b": np.zeros((2, 2), np.float32),
          "lora_unet_x.alpha": np.float32(1.0)}
    g = lora.group_lora_keys(sd)
    assert set(g["lora_unet_x"]) == {"hada_w1_a", "hada_w1_b", "alpha"}


def test_glora_patch_matches_dense_rewrite():
    """GLoRA: y = x @ (W + s(b2@b1 + W@a2@a1))^T, applied packed via
    input prologue + output epilogue — must match the dense rewrite."""
    rng = np.random.default_rng(9)
    R, K, r = 128, 256, 4
    w = rng.standard_normal((R, K)).astype(np.float32)
    sd = {
        "lora_unet_w.a1.weight": (rng.standard_normal((r, K)) * 0.1
                                  ).astype(np.float32),
        "lora_unet_w.a2.weight": (rng.standard_normal((K, r)) * 0.1
                                  ).astype(np.float32),
        "lora_unet_w.b1.weight": (rng.standard_normal((r, K)) * 0.1
                                  ).astype(np.float32),
        "lora_unet_w.b2.weight": (rng.standard_normal((R, r)) * 0.1
                                  ).astype(np.float32),
        "lora_unet_w.alpha": np.float32(2.0),
    }
    groups = lora.group_lora_keys(sd)
    mapped = lora.map_lora_to_model_keys(groups, ["w.weight"])
    patches = lora.build_patches(mapped, strength=0.7, dtype=jnp.float32)
    assert "w.weight" in patches
    s = 0.7 * 2.0 / r
    a1, a2 = sd["lora_unet_w.a1.weight"], sd["lora_unet_w.a2.weight"]
    b1, b2 = sd["lora_unet_w.b1.weight"], sd["lora_unet_w.b2.weight"]
    w_dense = w + s * (b2 @ b1 + w @ a2 @ a1)

    x = rng.standard_normal((6, K)).astype(np.float32)
    pw = lora.PatchedWeight(base=jnp.asarray(w), patches=patches["w.weight"])
    cfg = QuantConfig(compute_dtype=jnp.float32, patch_dtype=jnp.float32)
    got = np.asarray(linear(jnp.asarray(x), pw, cfg=cfg))
    np.testing.assert_allclose(got, x @ w_dense.T, rtol=2e-4, atol=2e-4)

    # materialize() folds the same delta
    np.testing.assert_allclose(np.asarray(materialize(pw, jnp.float32)),
                               w_dense, rtol=2e-4, atol=2e-4)


def test_conv_locon_patch_materializes_and_runs():
    """Kohya LoCon conv patches carry 2-D (O, I·kh·kw) rank factors against
    4-D conv weights; materialize must reshape the delta (ADVICE r1; the
    reference reshapes inside comfy.lora.calculate_weight)."""
    from comfyui_gguf_tpu.nn.layers import conv2d

    rng = np.random.default_rng(5)
    O, I, kh, kw, r = 8, 4, 3, 3, 2
    w = rng.standard_normal((O, I, kh, kw)).astype(np.float32)
    up = rng.standard_normal((O, r)).astype(np.float32)
    down = rng.standard_normal((r, I * kh * kw)).astype(np.float32)
    patch = lora.LoRAPatch(up=jnp.asarray(up), down=jnp.asarray(down),
                           mid=None, diff=None, scale=0.5)
    pw = lora.PatchedWeight(jnp.asarray(w), (patch,))

    got = np.asarray(materialize(pw, jnp.float32))
    want = w + 0.5 * (up @ down).reshape(w.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    x = jnp.asarray(rng.standard_normal((1, 8, 8, I)).astype(np.float32))
    y = conv2d(x, pw, padding=1, cfg=F32CFG)
    assert y.shape == (1, 8, 8, O)
    y_ref = conv2d(x, jnp.asarray(want), padding=1, cfg=F32CFG)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_conv_diff_patch_reshapes():
    rng = np.random.default_rng(6)
    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32)
    diff = rng.standard_normal((4, 2 * 3 * 3)).astype(np.float32)  # flat
    pw = lora.PatchedWeight(jnp.asarray(w), (lora.LoRAPatch(
        up=None, down=None, mid=None, diff=jnp.asarray(diff), scale=1.0),))
    got = np.asarray(materialize(pw, jnp.float32))
    np.testing.assert_allclose(got, w + diff.reshape(w.shape),
                               rtol=1e-5, atol=1e-5)


def test_multi_patch_batched_epilogue_matches_sum():
    """N plain rank patches batch into one concat matmul pair — output
    must equal the per-patch sum."""
    rng = np.random.default_rng(11)
    R, K = 128, 256
    pq, w_deq = _planar_weight(rng, R, K)
    ps = []
    want_delta = np.zeros((R, K), np.float32)
    for s, r in ((0.5, 2), (1.25, 4), (0.1, 8)):
        up = rng.standard_normal((R, r), dtype=np.float32)
        down = rng.standard_normal((r, K), dtype=np.float32)
        ps.append(lora.LoRAPatch(up=jnp.asarray(up), down=jnp.asarray(down),
                                 mid=None, diff=None, scale=s))
        want_delta += s * (up @ down)
    pw = lora.PatchedWeight(pq, tuple(ps))
    x = rng.standard_normal((5, K), dtype=np.float32)
    got = np.asarray(linear(jnp.asarray(x), pw, cfg=F32CFG))
    np.testing.assert_allclose(got, x @ (w_deq + want_delta).T,
                               rtol=3e-4, atol=3e-4)


def test_lora_survives_stacked_scan():
    """LoRA patches ride the zero-copy block scan: forward_stacked over
    patched+stacked params == unrolled forward over patched params."""
    import jax

    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    dims = testing.TinyFluxDims(depth_double=2, depth_single=2)
    sd = testing.flux_state_dict(dims, seed=21)
    params = testing.quantize_flux_params(sd)
    cfg = dims.config()
    rng = np.random.default_rng(22)
    patches = {}
    for i in range(2):
        for key, R, K in (
            (f"double_blocks.{i}.img_attn.qkv.weight", 3 * dims.hidden,
             dims.hidden),
            (f"single_blocks.{i}.linear1.weight",
             3 * dims.hidden + dims.mlp, dims.hidden),
        ):
            up = jnp.asarray(rng.standard_normal((R, 2)) * 0.1, jnp.float32)
            down = jnp.asarray(rng.standard_normal((2, K)) * 0.1,
                               jnp.float32)
            patches[key] = (lora.LoRAPatch(up=up, down=down, mid=None,
                                           diff=None, scale=0.5),)
    patched = lora.attach_patches(params, patches)
    qcfg = QuantConfig(prefer_pallas=False)
    inputs = testing.flux_example_inputs(dims, batch=1)

    ref = jax.jit(lambda p, *a: flux.forward(p, cfg, *a, qcfg=qcfg))(
        patched, *inputs)
    sp = flux.stack_flux_params(patched, cfg)
    got = jax.jit(lambda p, *a: flux.forward_stacked(p, cfg, *a,
                                                     qcfg=qcfg))(sp, *inputs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# fused kernel epilogue (rank delta added on the f32 accumulator in-kernel;
# round-2 perf item: the unfused epilogue cost +77.5 ms/step at flux depth)
# ---------------------------------------------------------------------------

PALLAS_F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                         patch_dtype=jnp.float32, prefer_pallas=True)


def _rank_patch(rng, R, K, r=4, scale=0.5, mid=False):
    return lora.LoRAPatch(
        up=jnp.asarray(rng.standard_normal((R, r)), jnp.float32),
        down=jnp.asarray(rng.standard_normal((r, K)), jnp.float32),
        mid=(jnp.asarray(rng.standard_normal((r, r)), jnp.float32)
             if mid else None),
        diff=None, scale=scale)


def test_fused_kernel_epilogue_matches_unfused():
    """linear() on the Pallas path (interpret) with rank patches ==
    the unfused epilogue composition."""
    rng = np.random.default_rng(30)
    R, K = 512, 512
    pq, w_deq = _planar_weight(rng, R, K)
    patches = (_rank_patch(rng, R, K, r=4),
               _rank_patch(rng, R, K, r=8, scale=-0.3))
    pw = lora.PatchedWeight(pq, patches)
    x = jnp.asarray(rng.standard_normal((32, K)), jnp.float32)

    got = np.asarray(linear(x, pw, cfg=PALLAS_F32))
    want = np.asarray(linear(x, pw, cfg=F32CFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_kernel_epilogue_with_mid_patch():
    rng = np.random.default_rng(31)
    R, K = 512, 512
    pq, _ = _planar_weight(rng, R, K)
    pw = lora.PatchedWeight(pq, (_rank_patch(rng, R, K, r=4, mid=True),))
    x = jnp.asarray(rng.standard_normal((16, K)), jnp.float32)
    got = np.asarray(linear(x, pw, cfg=PALLAS_F32))
    want = np.asarray(linear(x, pw, cfg=F32CFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_linear_gelu_with_lora_matches_unfused():
    """linear_gelu keeps the fused kernel path under rank LoRA: delta is
    applied pre-activation (== patching W), bias and GELU after."""
    from comfyui_gguf_tpu.nn.layers import linear_gelu

    rng = np.random.default_rng(32)
    R, K = 512, 512
    pq, w_deq = _planar_weight(rng, R, K)
    patch = _rank_patch(rng, R, K, r=4)
    pw = lora.PatchedWeight(pq, (patch,))
    x = jnp.asarray(rng.standard_normal((32, K)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((R,)), jnp.float32)

    got = np.asarray(linear_gelu(x, pw, bias, cfg=PALLAS_F32))
    import jax
    w_patched = w_deq + patch.scale * np.asarray(
        patch.up, np.float32) @ np.asarray(patch.down, np.float32)
    pre = np.asarray(x) @ w_patched.T + np.asarray(bias)
    want = np.asarray(jax.nn.gelu(pre, approximate=True))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_fused_epilogue_indexed_scan_path():
    """forward_stacked with the Pallas indexed kernel (interpret) under
    LoRA == the prefer_pallas=False reference — exercises the fused
    epilogue through scan/IndexedQuant."""
    import jax

    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    dims = testing.TinyFluxDims(depth_double=1, depth_single=1)
    sd = testing.flux_state_dict(dims, seed=33)
    params = testing.quantize_flux_params(sd)
    cfg = dims.config()
    rng = np.random.default_rng(34)
    R, K = 3 * dims.hidden, dims.hidden
    patches = {"double_blocks.0.img_attn.qkv.weight":
               (_rank_patch(rng, R, K, r=2, scale=0.1),)}
    patched = lora.attach_patches(params, patches)
    inputs = testing.flux_example_inputs(dims, batch=1)
    sp = flux.stack_flux_params(patched, cfg)

    ref = jax.jit(lambda p, *a: flux.forward_stacked(
        p, cfg, *a, qcfg=QuantConfig(prefer_pallas=False)))(sp, *inputs)
    got = jax.jit(lambda p, *a: flux.forward_stacked(
        p, cfg, *a, qcfg=QuantConfig(prefer_pallas=True)))(sp, *inputs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_glora_fused_matches_unfused():
    """glora: a-branch prologue + fused b-branch epilogue == unfused."""
    rng = np.random.default_rng(35)
    R, K, r = 512, 512, 4
    pq, _ = _planar_weight(rng, R, K)
    patch = lora.LoRAPatch(
        up=jnp.asarray(rng.standard_normal((R, r)) * 0.1, jnp.float32),
        down=jnp.asarray(rng.standard_normal((r, K)) * 0.1, jnp.float32),
        mid=None, diff=None, scale=0.5,
        a1=jnp.asarray(rng.standard_normal((r, K)) * 0.1, jnp.float32),
        a2=jnp.asarray(rng.standard_normal((K, r)) * 0.1, jnp.float32))
    pw = lora.PatchedWeight(pq, (patch,))
    x = jnp.asarray(rng.standard_normal((16, K)), jnp.float32)
    got = np.asarray(linear(x, pw, cfg=PALLAS_F32))
    want = np.asarray(linear(x, pw, cfg=F32CFG))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_diff_patch_still_unfused_on_pallas_path():
    """diff patches can't rank-factorize — the Pallas path must still
    produce the right answer via the unfused epilogue."""
    rng = np.random.default_rng(36)
    R, K = 512, 512
    pq, w_deq = _planar_weight(rng, R, K)
    diff = rng.standard_normal((R, K)).astype(np.float32)
    pw = lora.PatchedWeight(pq, (lora.LoRAPatch(
        up=None, down=None, mid=None, diff=jnp.asarray(diff), scale=0.5),))
    x = jnp.asarray(rng.standard_normal((16, K)), jnp.float32)
    got = np.asarray(linear(x, pw, cfg=PALLAS_F32))
    want = np.asarray(x) @ (w_deq + 0.5 * diff).T
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_text_encoder_lora_slice(tmp_path):
    """lora_te1_-prefixed keys patch a CLIP encoder's params (kohya
    underscore-mangled HF names), change its output, detach restores;
    lora_unet_ keys in the same file are ignored by the te path."""
    import safetensors.numpy as st

    from comfyui_gguf_tpu import lora as lora_mod
    from comfyui_gguf_tpu.nn.layers import linear, QuantConfig

    rng = np.random.default_rng(0)
    D, R = 16, 4
    key = "text_model.encoder.layers.0.self_attn.q_proj.weight"
    params = {key: jnp.asarray(rng.standard_normal((D, D)) * 0.1,
                               jnp.float32)}
    base = f"lora_te1_{key[:-len('.weight')].replace('.', '_')}"
    sd = {
        f"{base}.lora_up.weight": (rng.standard_normal((D, R)) * 0.3
                                   ).astype(np.float32),
        f"{base}.lora_down.weight": (rng.standard_normal((R, D)) * 0.3
                                     ).astype(np.float32),
        f"{base}.alpha": np.asarray(R, np.float32),
        # diffusion slice must NOT leak into the encoder
        "lora_unet_double_blocks_0_img_mod_lin.lora_up.weight":
            np.zeros((D, R), np.float32),
        "lora_unet_double_blocks_0_img_mod_lin.lora_down.weight":
            np.zeros((R, D), np.float32),
    }
    p = tmp_path / "te.safetensors"
    st.save_file(sd, str(p))

    x = jnp.asarray(rng.standard_normal((2, D)), jnp.float32)
    cfg = QuantConfig(dequant_dtype=jnp.float32,
                      compute_dtype=jnp.float32, prefer_pallas=False)
    before = linear(x, params[key], None, cfg=cfg)

    patched = lora_mod.load_and_attach_te(params, str(p), strength=1.0,
                                          prefixes=("te1", "te"))
    after = linear(x, patched[key], None, cfg=cfg)
    want = before + x @ (sd[f"{base}.lora_down.weight"].T
                         @ sd[f"{base}.lora_up.weight"].T)
    np.testing.assert_allclose(np.asarray(after), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    restored = lora_mod.detach_patches(patched)
    np.testing.assert_allclose(
        np.asarray(linear(x, restored[key], None, cfg=cfg)),
        np.asarray(before), rtol=1e-6, atol=1e-6)

    # clip_g slice absent -> unchanged tree
    same = lora_mod.load_and_attach_te(params, str(p), prefixes=("te2",))
    assert same is params


def test_glora_new_layout_matches_old():
    """New-layout GLoRA (transposed factors, ΔW = b1@b2 + W@a1@a2) must
    produce the same delta as the equivalent old-layout file."""
    from comfyui_gguf_tpu import lora as lora_mod
    from comfyui_gguf_tpu.nn.layers import linear, QuantConfig

    rng = np.random.default_rng(4)
    R, K, r = 24, 16, 4
    w = jnp.asarray(rng.standard_normal((R, K)) * 0.1, jnp.float32)
    a1o = rng.standard_normal((r, K)).astype(np.float32) * 0.3  # old (r,K)
    a2o = rng.standard_normal((K, r)).astype(np.float32) * 0.3  # old (K,r)
    b1o = rng.standard_normal((r, K)).astype(np.float32) * 0.3  # old (r,K)
    b2o = rng.standard_normal((R, r)).astype(np.float32) * 0.3  # old (R,r)
    alpha = np.asarray(r, np.float32)

    old_parts = {"glora_a1": a1o, "glora_a2": a2o, "glora_b1": b1o,
                 "glora_b2": b2o, "alpha": alpha}
    # new layout: every factor transposed, roles swapped
    new_parts = {"glora_a1": a2o, "glora_a2": a1o,
                 "glora_b1": b2o, "glora_b2": b1o, "alpha": alpha}
    cfg = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                      prefer_pallas=False)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((3, K)),
                    jnp.float32)
    po = lora_mod.attach_patches(
        {"w": w}, lora_mod.build_patches({"w": old_parts}, 1.0,
                                         jnp.float32))["w"]
    pn = lora_mod.attach_patches(
        {"w": w}, lora_mod.build_patches({"w": new_parts}, 1.0,
                                         jnp.float32))["w"]
    np.testing.assert_allclose(np.asarray(linear(x, pn, None, cfg=cfg)),
                               np.asarray(linear(x, po, None, cfg=cfg)),
                               rtol=1e-4, atol=1e-4)


def test_multi_glora_matches_folded():
    """Two GLoRA patches on one weight: the runtime prologue must equal
    the folded materialize() (independent deltas, no s1*s2 cross-term)."""
    from comfyui_gguf_tpu import lora as lora_mod
    from comfyui_gguf_tpu.nn.layers import linear, materialize, QuantConfig

    rng = np.random.default_rng(5)
    R, K, r = 16, 16, 4
    w = jnp.asarray(rng.standard_normal((R, K)) * 0.1, jnp.float32)

    def mk():
        return {"glora_a1": rng.standard_normal((r, K)).astype(np.float32),
                "glora_a2": rng.standard_normal((K, r)).astype(np.float32),
                "glora_b1": rng.standard_normal((r, K)).astype(np.float32),
                "glora_b2": rng.standard_normal((R, r)).astype(np.float32),
                "alpha": np.asarray(r, np.float32)}

    p1 = lora_mod.build_patches({"w": mk()}, 0.7, jnp.float32)["w"]
    p2 = lora_mod.build_patches({"w": mk()}, 0.4, jnp.float32)["w"]
    pw = lora_mod.attach_patches({"w": w}, {"w": p1 + p2})["w"]

    cfg = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                      prefer_pallas=False)
    x = jnp.asarray(rng.standard_normal((3, K)), jnp.float32)
    runtime = np.asarray(linear(x, pw, None, cfg=cfg))
    folded = np.asarray(x @ materialize(pw, jnp.float32).T)
    np.testing.assert_allclose(runtime, folded, rtol=2e-3, atol=2e-3)
