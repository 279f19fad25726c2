"""Golden numerics for the flagship DiT graphs (VERDICT r1 item 3).

Each test hand-derives an INDEPENDENT torch implementation of one block
from the published architecture description — Flux double/single stream
(BFL: 3D-axis RoPE on adjacent pairs, QK-RMSNorm eps 1e-6, adaLN
[shift,scale,gate]×2 chunking, GELU-tanh MLP), SD3 MMDiT joint block
(context-first joint attention, 6-chunk adaLN per stream), SDXL
BasicTransformerBlock (self+cross attention, exact-GELU GEGLU) — and
asserts the JAX graph matches on random weights in f32. Same discipline
as tests/test_t5_parity.py, extended to the graphs the reference trusts
ComfyUI for (reference nodes.py:169).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.models import flux, sd3, unet
from comfyui_gguf_tpu.nn.layers import QuantConfig

F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                  prefer_pallas=False)

torch.manual_seed(0)


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _ln(x, eps=1e-6):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=eps)


def _rms(x, w, eps=1e-6):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(v + eps) * w


def _torch_rope_table(ids: np.ndarray, axes_dim, theta=10_000.0):
    """(B, L, n_axes) ids → (B, L, D/2) cos & sin, axis-concatenated."""
    cos, sin = [], []
    for i, d in enumerate(axes_dim):
        pos = torch.from_numpy(ids[..., i].astype(np.float32))
        omega = 1.0 / theta ** (torch.arange(0, d, 2).float() / d)
        ang = pos[..., None] * omega
        cos.append(torch.cos(ang))
        sin.append(torch.sin(ang))
    return torch.cat(cos, dim=-1), torch.cat(sin, dim=-1)


def _torch_apply_rope(x, cos, sin):
    """x (B, H, L, D): rotate adjacent (even, odd) pairs."""
    xe, xo = x[..., 0::2], x[..., 1::2]
    c = cos[:, None]
    s = sin[:, None]
    out = torch.stack([xe * c - xo * s, xe * s + xo * c], dim=-1)
    return out.reshape(x.shape)


def _heads(x, H):
    B, L, D = x.shape
    return x.view(B, L, H, D // H).transpose(1, 2)


def _unheads(a):
    B, H, L, D = a.shape
    return a.transpose(1, 2).reshape(B, L, H * D)


def _sdpa(q, k, v):
    return torch.nn.functional.scaled_dot_product_attention(q, k, v)


# ---------------------------------------------------------------------------
# Flux
# ---------------------------------------------------------------------------

HID, H, MLP = 64, 2, 256
AXES = (8, 12, 12)  # head_dim 32
CTX_LEN, IMG_LEN = 6, 16


def _rand(rng, *s):
    return (rng.standard_normal(s) * 0.1).astype(np.float32)


def _flux_double_weights(rng):
    w = {}
    for s in ("img", "txt"):
        w[f"{s}_mod.lin.weight"] = _rand(rng, 6 * HID, HID)
        w[f"{s}_mod.lin.bias"] = _rand(rng, 6 * HID)
        w[f"{s}_attn.qkv.weight"] = _rand(rng, 3 * HID, HID)
        w[f"{s}_attn.qkv.bias"] = _rand(rng, 3 * HID)
        w[f"{s}_attn.norm.query_norm.scale"] = _rand(rng, HID // H) + 1
        w[f"{s}_attn.norm.key_norm.scale"] = _rand(rng, HID // H) + 1
        w[f"{s}_attn.proj.weight"] = _rand(rng, HID, HID)
        w[f"{s}_attn.proj.bias"] = _rand(rng, HID)
        w[f"{s}_mlp.0.weight"] = _rand(rng, MLP, HID)
        w[f"{s}_mlp.0.bias"] = _rand(rng, MLP)
        w[f"{s}_mlp.2.weight"] = _rand(rng, HID, MLP)
        w[f"{s}_mlp.2.bias"] = _rand(rng, HID)
    return w


def _torch_mod(w, pfx, vec):
    out = torch.nn.functional.silu(vec) @ _t(w[f"{pfx}.lin.weight"]).T \
        + _t(w[f"{pfx}.lin.bias"])
    return [c[:, None, :] for c in out.chunk(6, dim=-1)]


def _torch_flux_stream_qkv(w, pfx, x_mod):
    qkv = x_mod @ _t(w[f"{pfx}.qkv.weight"]).T + _t(w[f"{pfx}.qkv.bias"])
    q, k, v = (_heads(c, H) for c in qkv.chunk(3, dim=-1))
    q = _rms(q, _t(w[f"{pfx}.norm.query_norm.scale"]))
    k = _rms(k, _t(w[f"{pfx}.norm.key_norm.scale"]))
    return q, k, v


def _torch_flux_double(w, img, txt, vec, cos, sin):
    i_m = _torch_mod(w, "img_mod", vec)
    t_m = _torch_mod(w, "txt_mod", vec)

    img_mod = _ln(img) * (1 + i_m[1]) + i_m[0]
    txt_mod = _ln(txt) * (1 + t_m[1]) + t_m[0]

    iq, ik, iv = _torch_flux_stream_qkv(w, "img_attn", img_mod)
    tq, tk, tv = _torch_flux_stream_qkv(w, "txt_attn", txt_mod)

    q = torch.cat([tq, iq], dim=2)
    k = torch.cat([tk, ik], dim=2)
    v = torch.cat([tv, iv], dim=2)
    q = _torch_apply_rope(q, cos, sin)
    k = _torch_apply_rope(k, cos, sin)
    a = _unheads(_sdpa(q, k, v))
    ta, ia = a[:, :txt.shape[1]], a[:, txt.shape[1]:]

    def stream(x, a, m, s):
        x = x + m[2] * (a @ _t(w[f"{s}_attn.proj.weight"]).T
                        + _t(w[f"{s}_attn.proj.bias"]))
        h = _ln(x) * (1 + m[4]) + m[3]
        h = h @ _t(w[f"{s}_mlp.0.weight"]).T + _t(w[f"{s}_mlp.0.bias"])
        h = torch.nn.functional.gelu(h, approximate="tanh")
        return x + m[5] * (h @ _t(w[f"{s}_mlp.2.weight"]).T
                           + _t(w[f"{s}_mlp.2.bias"]))

    return stream(img, ia, i_m, "img"), stream(txt, ta, t_m, "txt")


def _flux_inputs(rng):
    img = _rand(rng, 1, IMG_LEN, HID)
    txt = _rand(rng, 1, CTX_LEN, HID)
    vec = _rand(rng, 1, HID)
    img_ids = flux.make_img_ids(4, 4, 1)
    txt_ids = np.zeros((1, CTX_LEN, 3), np.int32)
    ids = np.concatenate([txt_ids, img_ids], axis=1)
    return img, txt, vec, ids


def test_flux_double_block_golden():
    rng = np.random.default_rng(42)
    w = _flux_double_weights(rng)
    img, txt, vec, ids = _flux_inputs(rng)

    cos, sin = _torch_rope_table(ids, AXES)
    t_img, t_txt = _torch_flux_double(w, _t(img), _t(txt), _t(vec), cos,
                                      sin)

    cfg = flux.FluxConfig(hidden=HID, n_heads=H, axes_dim=AXES)
    p = {k: jnp.asarray(v) for k, v in w.items()}
    pe = flux.rope_freqs(jnp.asarray(ids), AXES, 10_000)
    j_img, j_txt = flux._double_block(p, jnp.asarray(img), jnp.asarray(txt),
                                      jnp.asarray(vec)[:, :],
                                      pe, cfg, F32)
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_flux_single_block_golden():
    rng = np.random.default_rng(43)
    w = {
        "linear1.weight": _rand(rng, 3 * HID + MLP, HID),
        "linear1.bias": _rand(rng, 3 * HID + MLP),
        "linear2.weight": _rand(rng, HID, HID + MLP),
        "linear2.bias": _rand(rng, HID),
        "modulation.lin.weight": _rand(rng, 3 * HID, HID),
        "modulation.lin.bias": _rand(rng, 3 * HID),
        "norm.query_norm.scale": _rand(rng, HID // H) + 1,
        "norm.key_norm.scale": _rand(rng, HID // H) + 1,
    }
    img, txt, vec, ids = _flux_inputs(rng)
    x = np.concatenate([txt, img], axis=1)

    # torch: pre-norm → modulate → linear1 → [qkv | mlp] → rope attention
    # over ALL tokens ‖ gelu-tanh(mlp) → linear2 → gated residual
    xt, vt = _t(x), _t(vec)
    mod = torch.nn.functional.silu(vt) @ _t(w["modulation.lin.weight"]).T \
        + _t(w["modulation.lin.bias"])
    shift, scale, gate = (c[:, None, :] for c in mod.chunk(3, dim=-1))
    xm = _ln(xt) * (1 + scale) + shift
    h = xm @ _t(w["linear1.weight"]).T + _t(w["linear1.bias"])
    qkv, mlp_h = h[..., : 3 * HID], h[..., 3 * HID:]
    q, k, v = (_heads(c, H) for c in qkv.chunk(3, dim=-1))
    q = _rms(q, _t(w["norm.query_norm.scale"]))
    k = _rms(k, _t(w["norm.key_norm.scale"]))
    cos, sin = _torch_rope_table(ids, AXES)
    q = _torch_apply_rope(q, cos, sin)
    k = _torch_apply_rope(k, cos, sin)
    a = _unheads(_sdpa(q, k, v))
    act = torch.nn.functional.gelu(mlp_h, approximate="tanh")
    out = torch.cat([a, act], dim=-1) @ _t(w["linear2.weight"]).T \
        + _t(w["linear2.bias"])
    want = xt + gate * out

    cfg = flux.FluxConfig(hidden=HID, n_heads=H, axes_dim=AXES)
    p = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    pe = flux.rope_freqs(jnp.asarray(ids), AXES, 10_000)
    got = flux._single_block(p, jnp.asarray(x), jnp.asarray(vec), pe, cfg,
                             F32)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SD3 MMDiT joint block
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("qk_norm", [False, True])
def test_sd3_joint_block_golden(qk_norm):
    rng = np.random.default_rng(44)
    D, Hn, M = 64, 2, 256

    def blockw(pfx, w):
        w[f"{pfx}.adaLN_modulation.1.weight"] = _rand(rng, 6 * D, D)
        w[f"{pfx}.adaLN_modulation.1.bias"] = _rand(rng, 6 * D)
        w[f"{pfx}.attn.qkv.weight"] = _rand(rng, 3 * D, D)
        w[f"{pfx}.attn.qkv.bias"] = _rand(rng, 3 * D)
        w[f"{pfx}.attn.proj.weight"] = _rand(rng, D, D)
        w[f"{pfx}.attn.proj.bias"] = _rand(rng, D)
        w[f"{pfx}.mlp.fc1.weight"] = _rand(rng, M, D)
        w[f"{pfx}.mlp.fc1.bias"] = _rand(rng, M)
        w[f"{pfx}.mlp.fc2.weight"] = _rand(rng, D, M)
        w[f"{pfx}.mlp.fc2.bias"] = _rand(rng, D)
        if qk_norm:
            w[f"{pfx}.attn.ln_q.weight"] = _rand(rng, D // Hn) + 1
            w[f"{pfx}.attn.ln_k.weight"] = _rand(rng, D // Hn) + 1

    w = {}
    blockw("joint_blocks.0.context_block", w)
    blockw("joint_blocks.0.x_block", w)

    ctx = _rand(rng, 1, 5, D)
    x = _rand(rng, 1, 12, D)
    vec = _rand(rng, 1, D)

    # torch independent implementation (SD3 paper / sd3-ref mmdit):
    # per-stream 6-chunk adaLN (shift, scale, gate) × (attn, mlp), fused
    # qkv (+ optional per-head RMS ln_q/ln_k), joint attention with the
    # CONTEXT tokens first, gelu-tanh MLP
    def tmod(pfx, v):
        o = torch.nn.functional.silu(v) \
            @ _t(w[f"{pfx}.adaLN_modulation.1.weight"]).T \
            + _t(w[f"{pfx}.adaLN_modulation.1.bias"])
        return [c[:, None, :] for c in o.chunk(6, dim=-1)]

    def tqkv(pfx, xm):
        qkv = xm @ _t(w[f"{pfx}.attn.qkv.weight"]).T \
            + _t(w[f"{pfx}.attn.qkv.bias"])
        q, k, v = (_heads(c, Hn) for c in qkv.chunk(3, dim=-1))
        if qk_norm:
            q = _rms(q, _t(w[f"{pfx}.attn.ln_q.weight"]))
            k = _rms(k, _t(w[f"{pfx}.attn.ln_k.weight"]))
        return q, k, v

    cb, xb = "joint_blocks.0.context_block", "joint_blocks.0.x_block"
    ct, xt, vt = _t(ctx), _t(x), _t(vec)
    cm, xm_ = tmod(cb, vt), tmod(xb, vt)
    c_mod = _ln(ct) * (1 + cm[1]) + cm[0]
    x_mod = _ln(xt) * (1 + xm_[1]) + xm_[0]
    cq, ck, cv = tqkv(cb, c_mod)
    xq, xk, xv = tqkv(xb, x_mod)
    q = torch.cat([cq, xq], dim=2)
    k = torch.cat([ck, xk], dim=2)
    v = torch.cat([cv, xv], dim=2)
    a = _unheads(_sdpa(q, k, v))
    ca, xa = a[:, :ctx.shape[1]], a[:, ctx.shape[1]:]

    def stream(pfx, s, a_, m):
        s = s + m[2] * (a_ @ _t(w[f"{pfx}.attn.proj.weight"]).T
                        + _t(w[f"{pfx}.attn.proj.bias"]))
        h = _ln(s) * (1 + m[4]) + m[3]
        h = h @ _t(w[f"{pfx}.mlp.fc1.weight"]).T + _t(w[f"{pfx}.mlp.fc1.bias"])
        h = torch.nn.functional.gelu(h, approximate="tanh")
        return s + m[5] * (h @ _t(w[f"{pfx}.mlp.fc2.weight"]).T
                           + _t(w[f"{pfx}.mlp.fc2.bias"]))

    want_ctx = stream(cb, ct, ca, cm)
    want_x = stream(xb, xt, xa, xm_)

    cfg = sd3.SD3Config(hidden=D, depth=1, n_heads=Hn, qk_norm=qk_norm)
    p = {k2.removeprefix("joint_blocks.0."): jnp.asarray(v2)
         for k2, v2 in w.items()}
    got_ctx, got_x = sd3._joint_block(p, jnp.asarray(ctx),
                                      jnp.asarray(x), jnp.asarray(vec),
                                      cfg, F32)
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_ctx), want_ctx.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SDXL BasicTransformerBlock
# ---------------------------------------------------------------------------

def test_sdxl_basic_transformer_block_golden():
    rng = np.random.default_rng(45)
    D, Hn, CD = 64, 2, 48

    w = {}
    p = "blk"
    for n in (1, 2, 3):
        w[f"{p}.norm{n}.weight"] = _rand(rng, D) + 1
        w[f"{p}.norm{n}.bias"] = _rand(rng, D)
    for a, kd in (("attn1", D), ("attn2", CD)):
        w[f"{p}.{a}.to_q.weight"] = _rand(rng, D, D)
        w[f"{p}.{a}.to_k.weight"] = _rand(rng, D, kd)
        w[f"{p}.{a}.to_v.weight"] = _rand(rng, D, kd)
        w[f"{p}.{a}.to_out.0.weight"] = _rand(rng, D, D)
        w[f"{p}.{a}.to_out.0.bias"] = _rand(rng, D)
    w[f"{p}.ff.net.0.proj.weight"] = _rand(rng, 8 * D, D)
    w[f"{p}.ff.net.0.proj.bias"] = _rand(rng, 8 * D)
    w[f"{p}.ff.net.2.weight"] = _rand(rng, D, 4 * D)
    w[f"{p}.ff.net.2.bias"] = _rand(rng, D)

    x = _rand(rng, 1, 12, D)
    ctx = _rand(rng, 1, 7, CD)

    # torch independent implementation (SGM/diffusers BasicTransformerBlock):
    # affine LN (eps 1e-5) → self-attn (no qkv bias) → affine LN →
    # cross-attn over context → affine LN → GEGLU (exact gelu) → proj
    def ln(xx, n):
        return torch.nn.functional.layer_norm(
            xx, (D,), _t(w[f"{p}.norm{n}.weight"]),
            _t(w[f"{p}.norm{n}.bias"]), eps=1e-5)

    def attn(a, q_in, kv_in):
        q = q_in @ _t(w[f"{p}.{a}.to_q.weight"]).T
        k = kv_in @ _t(w[f"{p}.{a}.to_k.weight"]).T
        v = kv_in @ _t(w[f"{p}.{a}.to_v.weight"]).T
        o = _unheads(_sdpa(_heads(q, Hn), _heads(k, Hn), _heads(v, Hn)))
        return o @ _t(w[f"{p}.{a}.to_out.0.weight"]).T \
            + _t(w[f"{p}.{a}.to_out.0.bias"])

    xt, ct = _t(x), _t(ctx)
    xt = xt + attn("attn1", ln(xt, 1), ln(xt, 1))
    xt = xt + attn("attn2", ln(xt, 2), ct)
    h = ln(xt, 3) @ _t(w[f"{p}.ff.net.0.proj.weight"]).T \
        + _t(w[f"{p}.ff.net.0.proj.bias"])
    a_, gate = h.chunk(2, dim=-1)
    h = a_ * torch.nn.functional.gelu(gate)
    want = xt + h @ _t(w[f"{p}.ff.net.2.weight"]).T \
        + _t(w[f"{p}.ff.net.2.bias"])

    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    got = unet._basic_block(jp, p, jnp.asarray(x), jnp.asarray(ctx), Hn,
                            F32)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Qwen-Image MMDiT block (flux lineage, diffusers key naming)
# ---------------------------------------------------------------------------

def test_qwen_image_block_golden():
    from comfyui_gguf_tpu.models import qwen_image

    rng = np.random.default_rng(46)
    D, Hn, M = 64, 2, 256
    AX = (8, 12, 12)

    w = {}
    p = "transformer_blocks.0."
    for m_ in ("img_mod", "txt_mod"):
        w[f"{p}{m_}.1.weight"] = _rand(rng, 6 * D, D)
        w[f"{p}{m_}.1.bias"] = _rand(rng, 6 * D)
    for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
              "add_v_proj"):
        w[f"{p}attn.{n}.weight"] = _rand(rng, D, D)
        w[f"{p}attn.{n}.bias"] = _rand(rng, D)
    for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
        w[f"{p}attn.{n}.weight"] = _rand(rng, D // Hn) + 1
    for n in ("to_out.0", "to_add_out"):
        w[f"{p}attn.{n}.weight"] = _rand(rng, D, D)
        w[f"{p}attn.{n}.bias"] = _rand(rng, D)
    for s in ("img_mlp", "txt_mlp"):
        w[f"{p}{s}.net.0.proj.weight"] = _rand(rng, M, D)
        w[f"{p}{s}.net.0.proj.bias"] = _rand(rng, M)
        w[f"{p}{s}.net.2.weight"] = _rand(rng, D, M)
        w[f"{p}{s}.net.2.bias"] = _rand(rng, D)

    img = _rand(rng, 1, 16, D)
    txt = _rand(rng, 1, 5, D)
    vec = _rand(rng, 1, D)
    img_ids = flux.make_img_ids(4, 4, 1)
    txt_ids = np.zeros((1, 5, 3), np.int32)
    ids = np.concatenate([txt_ids, img_ids], axis=1)

    # torch independent implementation: per-stream 6-chunk modulation,
    # separate q/k/v projections with per-head RMS q/k norms (image AND
    # "added" text projections), joint rope attention text-first,
    # gelu-tanh MLPs
    def lin(name, x):
        return x @ _t(w[f"{p}{name}.weight"]).T + _t(w[f"{p}{name}.bias"])

    def mod(name, v):
        o = torch.nn.functional.silu(v) @ _t(w[f"{p}{name}.1.weight"]).T \
            + _t(w[f"{p}{name}.1.bias"])
        return [c[:, None, :] for c in o.chunk(6, dim=-1)]

    it, tt_, vt = _t(img), _t(txt), _t(vec)
    im = mod("img_mod", vt)
    tm = mod("txt_mod", vt)
    img_m = _ln(it) * (1 + im[1]) + im[0]
    txt_m = _ln(tt_) * (1 + tm[1]) + tm[0]

    iq = _rms(_heads(lin("attn.to_q", img_m), Hn),
              _t(w[f"{p}attn.norm_q.weight"]))
    ik = _rms(_heads(lin("attn.to_k", img_m), Hn),
              _t(w[f"{p}attn.norm_k.weight"]))
    iv = _heads(lin("attn.to_v", img_m), Hn)
    tq = _rms(_heads(lin("attn.add_q_proj", txt_m), Hn),
              _t(w[f"{p}attn.norm_added_q.weight"]))
    tk = _rms(_heads(lin("attn.add_k_proj", txt_m), Hn),
              _t(w[f"{p}attn.norm_added_k.weight"]))
    tv = _heads(lin("attn.add_v_proj", txt_m), Hn)
    cos, sin = _torch_rope_table(ids, AX)
    q = _torch_apply_rope(torch.cat([tq, iq], dim=2), cos, sin)
    k = _torch_apply_rope(torch.cat([tk, ik], dim=2), cos, sin)
    v = torch.cat([tv, iv], dim=2)
    a = _unheads(_sdpa(q, k, v))
    ta, ia = a[:, :5], a[:, 5:]

    it = it + im[2] * lin("attn.to_out.0", ia)
    tt_ = tt_ + tm[2] * lin("attn.to_add_out", ta)
    h = _ln(it) * (1 + im[4]) + im[3]
    h = torch.nn.functional.gelu(lin("img_mlp.net.0.proj", h),
                                 approximate="tanh")
    it = it + im[5] * lin("img_mlp.net.2", h)
    h = _ln(tt_) * (1 + tm[4]) + tm[3]
    h = torch.nn.functional.gelu(lin("txt_mlp.net.0.proj", h),
                                 approximate="tanh")
    tt_ = tt_ + tm[5] * lin("txt_mlp.net.2", h)

    cfg = qwen_image.QwenImageConfig(hidden=D, n_layers=1, n_heads=Hn,
                                     axes_dim=AX)
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    pe = flux.rope_freqs(jnp.asarray(ids), AX, 10_000)
    j_img, j_txt = qwen_image._block(
        flux.block_subtree(jp, "transformer_blocks.0."), jnp.asarray(img),
        jnp.asarray(txt), jnp.asarray(vec), pe, cfg, F32)
    np.testing.assert_allclose(np.asarray(j_img), it.numpy(), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_txt), tt_.numpy(), rtol=2e-4,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# HiDream double-stream block (12-chunk adaLN, image-first joint attention,
# swiglu FF + MoE on the image stream)
# ---------------------------------------------------------------------------

def test_hidream_double_block_golden():
    from comfyui_gguf_tpu.models import hidream

    rng = np.random.default_rng(47)
    D, Hn, F, NE = 64, 2, 128, 4
    p = "double_stream_blocks.0.block"

    w = {}
    w[f"{p}.adaLN_modulation.1.weight"] = _rand(rng, 12 * D, D)
    w[f"{p}.adaLN_modulation.1.bias"] = _rand(rng, 12 * D)
    for suf in ("", "_t"):
        for n in ("to_q", "to_k", "to_v", "to_out"):
            w[f"{p}.attn1.{n}{suf}.weight"] = _rand(rng, D, D)
        w[f"{p}.attn1.q_rms_norm{suf}.weight"] = _rand(rng, D // Hn) + 1
        w[f"{p}.attn1.k_rms_norm{suf}.weight"] = _rand(rng, D // Hn) + 1
    def swiglu_w(pfx):
        w[f"{pfx}.w1.weight"] = _rand(rng, F, D)
        w[f"{pfx}.w3.weight"] = _rand(rng, F, D)
        w[f"{pfx}.w2.weight"] = _rand(rng, D, F)
    swiglu_w(f"{p}.ff_i.shared_experts")
    for e in range(NE):
        swiglu_w(f"{p}.ff_i.experts.{e}")
    w[f"{p}.ff_i.gate.weight"] = _rand(rng, NE, D)
    swiglu_w(f"{p}.ff_t")

    img = _rand(rng, 1, 12, D)
    txt = _rand(rng, 1, 5, D)
    vec = _rand(rng, 1, D)

    def lin(name, x, pfx=f"{p}.attn1"):
        return x @ _t(w[f"{pfx}.{name}.weight"]).T

    def swiglu(pfx, x):
        a = lin("w1", x, pfx)
        b = lin("w3", x, pfx)
        return lin("w2", torch.nn.functional.silu(a) * b, pfx)

    it, tt_, vt = _t(img), _t(txt), _t(vec)
    modv = torch.nn.functional.silu(vt) \
        @ _t(w[f"{p}.adaLN_modulation.1.weight"]).T \
        + _t(w[f"{p}.adaLN_modulation.1.bias"])
    m = [c[:, None, :] for c in modv.chunk(12, dim=-1)]

    img_m = _ln(it) * (1 + m[1]) + m[0]
    txt_m = _ln(tt_) * (1 + m[7]) + m[6]
    iq = _rms(_heads(lin("to_q", img_m), Hn),
              _t(w[f"{p}.attn1.q_rms_norm.weight"]))
    ik = _rms(_heads(lin("to_k", img_m), Hn),
              _t(w[f"{p}.attn1.k_rms_norm.weight"]))
    iv = _heads(lin("to_v", img_m), Hn)
    tq = _rms(_heads(lin("to_q_t", txt_m), Hn),
              _t(w[f"{p}.attn1.q_rms_norm_t.weight"]))
    tk = _rms(_heads(lin("to_k_t", txt_m), Hn),
              _t(w[f"{p}.attn1.k_rms_norm_t.weight"]))
    tv = _heads(lin("to_v_t", txt_m), Hn)
    # IMAGE stream first in the joint sequence (HiDream ordering);
    # flux-style rope over (0, row, col) image ids + all-zero txt ids,
    # axes (hd/2, hd/4, hd/4) — HiDream-I1's (64, 32, 32) at hd=128
    hd = D // Hn
    ids = np.zeros((1, 12 + 5, 3), np.int32)
    ids[0, :12, 1] = np.repeat(np.arange(3), 4)
    ids[0, :12, 2] = np.tile(np.arange(4), 3)
    cos_h, sin_h = _torch_rope_table(ids, (hd // 2, hd // 4, hd // 4))
    q = _torch_apply_rope(torch.cat([iq, tq], 2), cos_h, sin_h)
    k = _torch_apply_rope(torch.cat([ik, tk], 2), cos_h, sin_h)
    a = _unheads(_sdpa(q, k, torch.cat([iv, tv], 2)))
    ia, ta = a[:, :12], a[:, 12:]
    it = it + m[2] * lin("to_out", ia)
    tt_ = tt_ + m[8] * lin("to_out_t", ta)

    h = _ln(it) * (1 + m[4]) + m[3]
    # MoE: shared expert + GLOBAL-softmax top-k gate, weights kept
    # UN-renormalized (HiDream MoEGate norm_topk_prob=False): with 4
    # experts top-2 the selected weights sum to < 1 — this fixture is
    # load-bearing for the convention (2-of-2 would hide it)
    logits = h @ _t(w[f"{p}.ff_i.gate.weight"]).T
    top = torch.topk(logits, 2, dim=-1).values[..., -1:]
    probs = torch.softmax(logits, dim=-1)
    probs = torch.where(logits >= top, probs, torch.zeros(()))
    moe = swiglu(f"{p}.ff_i.shared_experts", h)
    for e in range(NE):
        moe = moe + probs[..., e:e + 1] * swiglu(f"{p}.ff_i.experts.{e}", h)
    it = it + m[5] * moe
    h = _ln(tt_) * (1 + m[10]) + m[9]
    tt_ = tt_ + m[11] * swiglu(f"{p}.ff_t", h)

    cfg = hidream.HiDreamConfig(hidden=D, n_heads=Hn, depth_double=1,
                                depth_single=0, n_experts=NE, top_k=2,
                                axes_dim=(hd // 2, hd // 4, hd // 4))
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    from comfyui_gguf_tpu.models.flux import rope_freqs

    pe = rope_freqs(jnp.asarray(ids), cfg.axes_dim, cfg.theta)
    j_img, j_txt = hidream._double_block(
        jp, "double_stream_blocks.0.block", jnp.asarray(img),
        jnp.asarray(txt), jnp.asarray(vec), cfg, F32, pe=pe)
    np.testing.assert_allclose(np.asarray(j_img), it.numpy(), rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(j_txt), tt_.numpy(), rtol=3e-4,
                               atol=3e-4)


# ---------------------------------------------------------------------------
# AuraFlow double + single layers (fal's MMDiT: separate cond/x parameter
# sets, cond-first joint attention, weightless per-head qk layer-norm,
# silu-gated c_fc1/c_fc2/c_proj MLP, 6-chunk [shift,scale,gate]x2 adaLN
# with bias-free modulation linears)
# ---------------------------------------------------------------------------

def _aura_weights(rng, D, F):
    w = {}
    p = "double_layers.0."
    for mod in ("modC", "modX"):
        w[f"{p}{mod}.1.weight"] = _rand(rng, 6 * D, D)
    for s in ("1", "2"):
        for n in ("q", "k", "v", "o"):
            w[f"{p}attn.w{s}{n}.weight"] = _rand(rng, D, D)
    for mlp in ("mlpC", "mlpX"):
        w[f"{p}{mlp}.c_fc1.weight"] = _rand(rng, F, D)
        w[f"{p}{mlp}.c_fc2.weight"] = _rand(rng, F, D)
        w[f"{p}{mlp}.c_proj.weight"] = _rand(rng, D, F)
    s = "single_layers.0."
    w[f"{s}modCX.1.weight"] = _rand(rng, 6 * D, D)
    for n in ("q", "k", "v", "o"):
        w[f"{s}attn.w1{n}.weight"] = _rand(rng, D, D)
    w[f"{s}mlp.c_fc1.weight"] = _rand(rng, F, D)
    w[f"{s}mlp.c_fc2.weight"] = _rand(rng, F, D)
    w[f"{s}mlp.c_proj.weight"] = _rand(rng, D, F)
    return w


def _aura_torch_mod(w, key, vec, n):
    out = torch.nn.functional.silu(vec) @ _t(w[f"{key}.1.weight"]).T
    return [c[:, None, :] for c in out.chunk(n, dim=-1)]


def _aura_qknorm(x):
    # per-head LayerNorm over head_dim, NO affine (torch default eps)
    return torch.nn.functional.layer_norm(x, (x.shape[-1],))


def _aura_torch_mlp(w, pfx, x):
    a = x @ _t(w[f"{pfx}.c_fc1.weight"]).T
    b = x @ _t(w[f"{pfx}.c_fc2.weight"]).T
    return (torch.nn.functional.silu(a) * b) @ _t(w[f"{pfx}.c_proj.weight"]).T


def test_aura_double_layer_golden():
    from comfyui_gguf_tpu.models import aura

    rng = np.random.default_rng(48)
    D, Hn, F = 64, 2, 96
    w = _aura_weights(rng, D, F)
    c0 = _rand(rng, 1, 5, D)
    x0 = _rand(rng, 1, 12, D)
    vec = _rand(rng, 1, D)
    p = "double_layers.0."

    ct, xt, vt = _t(c0), _t(x0), _t(vec)
    cm = _aura_torch_mod(w, p + "modC", vt, 6)
    xm = _aura_torch_mod(w, p + "modX", vt, 6)
    c_mod = _ln(ct, eps=1e-5) * (1 + cm[1]) + cm[0]
    x_mod = _ln(xt, eps=1e-5) * (1 + xm[1]) + xm[0]

    def wlin(s, n, h):
        return h @ _t(w[f"{p}attn.w{s}{n}.weight"]).T

    cq = _aura_qknorm(_heads(wlin("1", "q", c_mod), Hn))
    ck = _aura_qknorm(_heads(wlin("1", "k", c_mod), Hn))
    cv = _heads(wlin("1", "v", c_mod), Hn)
    xq = _aura_qknorm(_heads(wlin("2", "q", x_mod), Hn))
    xk = _aura_qknorm(_heads(wlin("2", "k", x_mod), Hn))
    xv = _heads(wlin("2", "v", x_mod), Hn)
    # cond stream FIRST in the joint sequence
    a = _unheads(_sdpa(torch.cat([cq, xq], 2), torch.cat([ck, xk], 2),
                       torch.cat([cv, xv], 2)))
    ca, xa = a[:, :5], a[:, 5:]
    ct = ct + cm[2] * (ca @ _t(w[f"{p}attn.w1o.weight"]).T)
    ct = ct + cm[5] * _aura_torch_mlp(
        w, p + "mlpC", _ln(ct, eps=1e-5) * (1 + cm[4]) + cm[3])
    xt = xt + xm[2] * (xa @ _t(w[f"{p}attn.w2o.weight"]).T)
    xt = xt + xm[5] * _aura_torch_mlp(
        w, p + "mlpX", _ln(xt, eps=1e-5) * (1 + xm[4]) + xm[3])

    cfg = aura.AuraConfig(hidden=D, n_heads=Hn, depth_double=1,
                          depth_single=1)
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    j_c, j_x = aura._double_layer(flux.block_subtree(jp, "double_layers.0."),
                                  jnp.asarray(c0), jnp.asarray(x0),
                                  jnp.asarray(vec), cfg, F32)
    np.testing.assert_allclose(np.asarray(j_c), ct.numpy(), rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(j_x), xt.numpy(), rtol=3e-4,
                               atol=3e-4)


def test_aura_single_layer_golden():
    from comfyui_gguf_tpu.models import aura

    rng = np.random.default_rng(49)
    D, Hn, F = 64, 2, 96
    w = _aura_weights(rng, D, F)
    cx0 = _rand(rng, 1, 17, D)
    vec = _rand(rng, 1, D)
    s = "single_layers.0."

    xt, vt = _t(cx0), _t(vec)
    m = _aura_torch_mod(w, s + "modCX", vt, 6)
    h = _ln(xt, eps=1e-5) * (1 + m[1]) + m[0]
    q = _aura_qknorm(_heads(h @ _t(w[f"{s}attn.w1q.weight"]).T, Hn))
    k = _aura_qknorm(_heads(h @ _t(w[f"{s}attn.w1k.weight"]).T, Hn))
    v = _heads(h @ _t(w[f"{s}attn.w1v.weight"]).T, Hn)
    a = _unheads(_sdpa(q, k, v))
    xt = xt + m[2] * (a @ _t(w[f"{s}attn.w1o.weight"]).T)
    xt = xt + m[5] * _aura_torch_mlp(
        w, s + "mlp", _ln(xt, eps=1e-5) * (1 + m[4]) + m[3])

    cfg = aura.AuraConfig(hidden=D, n_heads=Hn, depth_double=1,
                          depth_single=1)
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    j = aura._single_layer(flux.block_subtree(jp, "single_layers.0."),
                           jnp.asarray(cx0), jnp.asarray(vec), cfg,
                           F32)
    np.testing.assert_allclose(np.asarray(j), xt.numpy(), rtol=3e-4,
                               atol=3e-4)


# ---------------------------------------------------------------------------
# Lumina2 NextDiT layer (sandwich RMSNorms, scale-only 4-chunk adaLN with
# tanh-squashed gates, fused qkv + per-head affine RMS qk-norm, complex-
# pair multi-axis RoPE, llama-style SwiGLU w1/w3/w2)
# ---------------------------------------------------------------------------

def test_lumina2_layer_golden():
    from comfyui_gguf_tpu.models import lumina2

    rng = np.random.default_rng(50)
    D, Hn = 96, 2
    hd = D // Hn  # 48
    AX = (16, 16, 16)
    FF = 128
    L = 14
    p = "layers.0"

    w = {
        f"{p}.adaLN_modulation.1.weight": _rand(rng, 4 * D, D),
        f"{p}.adaLN_modulation.1.bias": _rand(rng, 4 * D),
        f"{p}.attention.qkv.weight": _rand(rng, 3 * D, D),
        f"{p}.attention.q_norm.weight": _rand(rng, hd) + 1,
        f"{p}.attention.k_norm.weight": _rand(rng, hd) + 1,
        f"{p}.attention.out.weight": _rand(rng, D, D),
        f"{p}.attention_norm1.weight": _rand(rng, D) + 1,
        f"{p}.attention_norm2.weight": _rand(rng, D) + 1,
        f"{p}.ffn_norm1.weight": _rand(rng, D) + 1,
        f"{p}.ffn_norm2.weight": _rand(rng, D) + 1,
        f"{p}.feed_forward.w1.weight": _rand(rng, FF, D),
        f"{p}.feed_forward.w3.weight": _rand(rng, FF, D),
        f"{p}.feed_forward.w2.weight": _rand(rng, D, FF),
    }
    x0 = _rand(rng, 1, L, D)
    vec = _rand(rng, 1, D)
    ids = np.zeros((1, L, 3), np.int32)
    ids[0, :, 0] = np.arange(L)
    ids[0, :, 1] = np.arange(L) % 3
    ids[0, :, 2] = np.arange(L) % 5

    # torch side: complex-pair rotation with axis-concatenated tables;
    # pair j of head_dim rotates by the j-th concatenated frequency
    def rope_pairs(x):
        cos, sin = _torch_rope_table(ids, AX)  # (B, L, hd/2) each
        xe = x[..., 0::2]
        xo = x[..., 1::2]
        c, s = cos[:, None], sin[:, None]
        out = torch.stack([xe * c - xo * s, xe * s + xo * c], dim=-1)
        return out.reshape(x.shape)

    xt, vt = _t(x0), _t(vec)
    mod = torch.nn.functional.silu(vt) \
        @ _t(w[f"{p}.adaLN_modulation.1.weight"]).T \
        + _t(w[f"{p}.adaLN_modulation.1.bias"])
    sc_msa, g_msa, sc_mlp, g_mlp = [c[:, None, :] for c in
                                    mod.chunk(4, dim=-1)]
    g_msa, g_mlp = torch.tanh(g_msa), torch.tanh(g_mlp)

    h = _rms(xt, _t(w[f"{p}.attention_norm1.weight"])) * (1 + sc_msa)
    qkv = h @ _t(w[f"{p}.attention.qkv.weight"]).T
    q, k, v = (_heads(c, Hn) for c in qkv.chunk(3, dim=-1))
    q = rope_pairs(_rms(q, _t(w[f"{p}.attention.q_norm.weight"])))
    k = rope_pairs(_rms(k, _t(w[f"{p}.attention.k_norm.weight"])))
    a = _unheads(_sdpa(q, k, v)) @ _t(w[f"{p}.attention.out.weight"]).T
    xt = xt + g_msa * _rms(a, _t(w[f"{p}.attention_norm2.weight"]))

    h = _rms(xt, _t(w[f"{p}.ffn_norm1.weight"])) * (1 + sc_mlp)
    ff = torch.nn.functional.silu(
        h @ _t(w[f"{p}.feed_forward.w1.weight"]).T) \
        * (h @ _t(w[f"{p}.feed_forward.w3.weight"]).T)
    ff = ff @ _t(w[f"{p}.feed_forward.w2.weight"]).T
    xt = xt + g_mlp * _rms(ff, _t(w[f"{p}.ffn_norm2.weight"]))

    cfg = lumina2.Lumina2Config(dim=D, n_layers=1, n_refiner=0,
                                n_heads=Hn, axes_dim=AX)
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    pe = lumina2._rope(jnp.asarray(ids), AX)
    j = lumina2._block(flux.block_subtree(jp, p + "."), jnp.asarray(x0),
                       jnp.asarray(vec), pe, cfg, F32)
    np.testing.assert_allclose(np.asarray(j), xt.numpy(), rtol=3e-4,
                               atol=3e-4)


# ---------------------------------------------------------------------------
# LTX-Video full forward, 1 block (PixArt-lineage adaLN-single: per-block
# scale_shift_table + shared 6-chunk timestep projection, across-heads
# RMS qk-norm, un-normed un-modulated cross-attention, gelu-approx FF,
# 2-chunk [shift, scale] projection head)
# ---------------------------------------------------------------------------

def test_ltxv_forward_golden():
    from comfyui_gguf_tpu.models import ltxv

    rng = np.random.default_rng(51)
    D, Hn = 96, 2
    hd = D // Hn
    AX = (16, 16, 16)  # axes_dim for head_dim 48: (48-2*16, 16, 16)
    FF = 256
    L, Lc, CAP, IN = 10, 4, 64, 32
    p = "transformer_blocks.0"

    w = {
        f"{p}.scale_shift_table": _rand(rng, 6, D),
        "scale_shift_table": _rand(rng, 2, D),
        "patchify_proj.weight": _rand(rng, D, IN),
        "patchify_proj.bias": _rand(rng, D),
        "proj_out.weight": _rand(rng, IN, D),
        "proj_out.bias": _rand(rng, IN),
        "adaln_single.emb.timestep_embedder.linear_1.weight":
            _rand(rng, D, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": _rand(rng, D),
        "adaln_single.emb.timestep_embedder.linear_2.weight":
            _rand(rng, D, D),
        "adaln_single.emb.timestep_embedder.linear_2.bias": _rand(rng, D),
        "adaln_single.linear.weight": _rand(rng, 6 * D, D),
        "adaln_single.linear.bias": _rand(rng, 6 * D),
        "caption_projection.linear_1.weight": _rand(rng, D, CAP),
        "caption_projection.linear_1.bias": _rand(rng, D),
        "caption_projection.linear_2.weight": _rand(rng, D, D),
        "caption_projection.linear_2.bias": _rand(rng, D),
    }
    for attn in ("attn1", "attn2"):
        for n in ("to_q", "to_k", "to_v"):
            w[f"{p}.{attn}.{n}.weight"] = _rand(rng, D, D)
            w[f"{p}.{attn}.{n}.bias"] = _rand(rng, D)
        w[f"{p}.{attn}.to_out.0.weight"] = _rand(rng, D, D)
        w[f"{p}.{attn}.to_out.0.bias"] = _rand(rng, D)
        # ACROSS-heads qk-norm: weight over the full inner dim
        w[f"{p}.{attn}.q_norm.weight"] = _rand(rng, D) + 1
        w[f"{p}.{attn}.k_norm.weight"] = _rand(rng, D) + 1
    w[f"{p}.ff.net.0.proj.weight"] = _rand(rng, FF, D)
    w[f"{p}.ff.net.0.proj.bias"] = _rand(rng, FF)
    w[f"{p}.ff.net.2.weight"] = _rand(rng, D, FF)
    w[f"{p}.ff.net.2.bias"] = _rand(rng, D)

    tok0 = _rand(rng, 1, L, IN)
    cap0 = _rand(rng, 1, Lc, CAP)
    tstep = np.array([0.4], np.float32)
    ids = np.zeros((1, L, 3), np.int32)
    ids[0, :, 0] = np.arange(L)
    ids[0, :, 1] = np.arange(L) % 2
    ids[0, :, 2] = np.arange(L) % 4

    def rope_pairs(x):
        cos, sin = _torch_rope_table(ids, AX)
        xe, xo = x[..., 0::2], x[..., 1::2]
        c, s = cos[:, None], sin[:, None]
        return torch.stack([xe * c - xo * s, xe * s + xo * c],
                           dim=-1).reshape(x.shape)

    def t_rms(x, weight=None, eps=1e-6):
        v = x.float().pow(2).mean(-1, keepdim=True)
        y = x * torch.rsqrt(v + eps)
        return y if weight is None else y * weight

    def lin(name, x):
        return x @ _t(w[f"{name}.weight"]).T + _t(w[f"{name}.bias"])

    def t_attn(attn, xq, xkv, rope):
        pf = f"{p}.{attn}"
        q = t_rms(lin(f"{pf}.to_q", xq), _t(w[f"{pf}.q_norm.weight"]))
        k = t_rms(lin(f"{pf}.to_k", xkv), _t(w[f"{pf}.k_norm.weight"]))
        v = lin(f"{pf}.to_v", xkv)
        q, k, v = _heads(q, Hn), _heads(k, Hn), _heads(v, Hn)
        if rope:
            q, k = rope_pairs(q), rope_pairs(k)
        return _unheads(_sdpa(q, k, v)) @ _t(
            w[f"{pf}.to_out.0.weight"]).T + _t(w[f"{pf}.to_out.0.bias"])

    # torch forward, independently derived
    xt = _t(tok0) @ _t(w["patchify_proj.weight"]).T \
        + _t(w["patchify_proj.bias"])
    half = 128
    tt = torch.tensor(tstep) * 1000.0
    freqs = torch.exp(-np.log(10_000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    sincos = torch.cat([torch.cos(tt[:, None] * freqs[None]),
                        torch.sin(tt[:, None] * freqs[None])], dim=-1)
    e = lin("adaln_single.emb.timestep_embedder.linear_1", sincos)
    e = lin("adaln_single.emb.timestep_embedder.linear_2",
            torch.nn.functional.silu(e))
    e6 = lin("adaln_single.linear", torch.nn.functional.silu(e))

    ct = lin("caption_projection.linear_1", _t(cap0))
    ct = lin("caption_projection.linear_2",
             torch.nn.functional.gelu(ct, approximate="tanh"))

    ss = _t(w[f"{p}.scale_shift_table"])[None] + e6.reshape(1, 6, D)
    sh1, sc1, g1, sh2, sc2, g2 = [ss[:, j][:, None] for j in range(6)]
    h = t_rms(xt) * (1 + sc1) + sh1
    xt = xt + g1 * t_attn("attn1", h, h, True)
    xt = xt + t_attn("attn2", xt, ct, False)
    h = t_rms(xt) * (1 + sc2) + sh2
    h = torch.nn.functional.gelu(
        h @ _t(w[f"{p}.ff.net.0.proj.weight"]).T
        + _t(w[f"{p}.ff.net.0.proj.bias"]), approximate="tanh")
    xt = xt + g2 * (h @ _t(w[f"{p}.ff.net.2.weight"]).T
                    + _t(w[f"{p}.ff.net.2.bias"]))
    fin = _t(w["scale_shift_table"])[None] + e.reshape(1, 1, D)
    xt = t_rms(xt) * (1 + fin[:, 1][:, None]) + fin[:, 0][:, None]
    xt = xt @ _t(w["proj_out.weight"]).T + _t(w["proj_out.bias"])

    # the real jax forward
    cfg = ltxv.LTXVConfig(dim=D, n_layers=1, n_heads=Hn, in_channels=IN,
                          caption_dim=CAP, head_dim=hd)
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    j = ltxv.forward(jp, cfg, jnp.asarray(tok0), jnp.asarray(ids),
                     jnp.asarray(cap0), jnp.asarray(tstep), qcfg=F32)
    np.testing.assert_allclose(np.asarray(j), xt.numpy(), rtol=3e-4,
                               atol=3e-4)


# ---------------------------------------------------------------------------
# Wan 2.1 (video DiT)
# ---------------------------------------------------------------------------

def _wan_rope_complex(f, h, w, hd):
    """Wan's rope table derived via the published complex-polar form:
    per-axis rope_params tables (t: hd-4*(hd//6), h/w: 2*(hd//6) dims),
    grid-expanded and concatenated along the half-dim axis → (L, 1, hd/2)
    complex. Independent of the JAX cos/sin formulation."""
    def params(n, d):
        ang = torch.outer(
            torch.arange(n, dtype=torch.float64),
            1.0 / torch.pow(torch.tensor(10_000.0, dtype=torch.float64),
                            torch.arange(0, d, 2, dtype=torch.float64) / d))
        return torch.polar(torch.ones_like(ang), ang)  # (n, d/2)

    d_hw = 2 * (hd // 6)
    d_t = hd - 2 * d_hw
    ft, fh, fw = params(f, d_t), params(h, d_hw), params(w, d_hw)
    grid = torch.cat([
        ft.view(f, 1, 1, -1).expand(f, h, w, -1),
        fh.view(1, h, 1, -1).expand(f, h, w, -1),
        fw.view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1)
    return grid.reshape(f * h * w, 1, -1)


def _wan_apply_rope_t(x, freqs):
    """x (B, Hn, L, D) → complex multiply on interleaved pairs (the
    published view_as_complex path), float64 like the original."""
    B, Hn, L, D = x.shape
    xc = torch.view_as_complex(
        x.permute(0, 2, 1, 3).double().reshape(B, L, Hn, D // 2, 2))
    out = torch.view_as_real(xc * freqs.unsqueeze(0))
    return out.reshape(B, L, Hn, D).permute(0, 2, 1, 3).float()


def test_wan_block_golden():
    """Wan 2.1 attention block vs an independent torch derivation of the
    published architecture (Wan-Video/Wan2.1 wan/modules/model.py):
    learned (1,6,dim) modulation table + time projection, full-dim RMS
    qk-norm BEFORE the head split, complex-pair 3-D rope with
    (hd-4*(hd//6), 2*(hd//6), 2*(hd//6)) axis dims, ungated cross
    attention through an affine norm3, GELU-tanh FFN."""
    from comfyui_gguf_tpu.models import wan

    rng = np.random.default_rng(60)
    D, Hn = 64, 2
    hd = D // Hn
    FF = 128
    f, hh, ww = 2, 2, 2
    L = f * hh * ww
    Lc = 6
    p = "blocks.0."

    w = {p + "modulation": _rand(rng, 1, 6, D),
         p + "norm3.weight": _rand(rng, D) + 1,
         p + "norm3.bias": _rand(rng, D)}
    for a in ("self_attn", "cross_attn"):
        for n in ("q", "k", "v", "o"):
            w[f"{p}{a}.{n}.weight"] = _rand(rng, D, D)
            w[f"{p}{a}.{n}.bias"] = _rand(rng, D)
        w[f"{p}{a}.norm_q.weight"] = _rand(rng, D) + 1
        w[f"{p}{a}.norm_k.weight"] = _rand(rng, D) + 1
    w[p + "ffn.0.weight"] = _rand(rng, FF, D)
    w[p + "ffn.0.bias"] = _rand(rng, FF)
    w[p + "ffn.2.weight"] = _rand(rng, D, FF)
    w[p + "ffn.2.bias"] = _rand(rng, D)

    x0 = _rand(rng, 1, L, D)
    ctx0 = _rand(rng, 1, Lc, D)
    e0 = _rand(rng, 1, 6 * D)

    def lin(name, x):
        return x @ _t(w[f"{p}{name}.weight"]).T + _t(w[f"{p}{name}.bias"])

    def t_rms(x, weight, eps=1e-6):
        v = x.float().pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(v + eps) * weight

    freqs = _wan_rope_complex(f, hh, ww, hd)

    xt = _t(x0)
    ct = _t(ctx0)
    mod = _t(w[p + "modulation"]) + _t(e0).reshape(1, 6, D)
    e = [mod[:, j][:, None] for j in range(6)]

    h = _ln(xt) * (1 + e[1]) + e[0]
    q = _heads(t_rms(lin("self_attn.q", h),
                     _t(w[p + "self_attn.norm_q.weight"])), Hn)
    k = _heads(t_rms(lin("self_attn.k", h),
                     _t(w[p + "self_attn.norm_k.weight"])), Hn)
    v = _heads(lin("self_attn.v", h), Hn)
    q = _wan_apply_rope_t(q, freqs)
    k = _wan_apply_rope_t(k, freqs)
    xt = xt + e[2] * lin("self_attn.o", _unheads(_sdpa(q, k, v)))

    h = torch.nn.functional.layer_norm(
        xt, (D,), _t(w[p + "norm3.weight"]), _t(w[p + "norm3.bias"]),
        eps=1e-6)
    q = _heads(t_rms(lin("cross_attn.q", h),
                     _t(w[p + "cross_attn.norm_q.weight"])), Hn)
    k = _heads(t_rms(lin("cross_attn.k", ct),
                     _t(w[p + "cross_attn.norm_k.weight"])), Hn)
    v = _heads(lin("cross_attn.v", ct), Hn)
    xt = xt + lin("cross_attn.o", _unheads(_sdpa(q, k, v)))

    h = _ln(xt) * (1 + e[4]) + e[3]
    h = torch.nn.functional.gelu(lin("ffn.0", h), approximate="tanh")
    xt = xt + e[5] * lin("ffn.2", h)

    cfg = wan.WanConfig(dim=D, ffn_dim=FF, n_heads=Hn, n_layers=1)
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    pe = wan.rope_3d(f, hh, ww, (hd - 4 * (hd // 6),
                                 2 * (hd // 6), 2 * (hd // 6)))
    j = wan._block(flux.block_subtree(jp, "blocks.0."), jnp.asarray(x0),
                   jnp.asarray(e0), jnp.asarray(ctx0), pe, cfg, F32)
    np.testing.assert_allclose(np.asarray(j), xt.numpy(), rtol=3e-4,
                               atol=3e-4)


# ---------------------------------------------------------------------------
# HunyuanVideo (flux-lineage video DiT, HYV naming)
# ---------------------------------------------------------------------------

def _hyvid_mod_t(w, key, vec, n):
    out = torch.nn.functional.silu(vec) @ _t(w[f"{key}.linear.weight"]).T \
        + _t(w[f"{key}.linear.bias"])
    return [c[:, None] for c in out.chunk(n, dim=-1)]


def test_hyvid_double_block_golden():
    """HYV MMDoubleStreamBlock vs an independent torch derivation of the
    published architecture (Tencent HunyuanVideo models.py): 6-chunk
    img/txt modulation, flat qkv naming, PER-HEAD RMS qk-norm, rope on
    image tokens only, image-first joint attention, GELU-tanh MLPs."""
    from comfyui_gguf_tpu.models import hyvid

    rng = np.random.default_rng(61)
    D, Hn = 64, 2
    hd = D // Hn
    MLPD = 4 * D
    f, hh, ww = 2, 2, 2
    L = f * hh * ww
    Lt = 6
    AX = (hd - 2 * (2 * ((hd - hd // 8) // 4)),
          2 * ((hd - hd // 8) // 4), 2 * ((hd - hd // 8) // 4))
    p = "double_blocks.0."

    w = {}
    for s in ("img", "txt"):
        w[f"{p}{s}_mod.linear.weight"] = _rand(rng, 6 * D, D)
        w[f"{p}{s}_mod.linear.bias"] = _rand(rng, 6 * D)
        w[f"{p}{s}_attn_qkv.weight"] = _rand(rng, 3 * D, D)
        w[f"{p}{s}_attn_qkv.bias"] = _rand(rng, 3 * D)
        w[f"{p}{s}_attn_q_norm.weight"] = _rand(rng, hd) + 1
        w[f"{p}{s}_attn_k_norm.weight"] = _rand(rng, hd) + 1
        w[f"{p}{s}_attn_proj.weight"] = _rand(rng, D, D)
        w[f"{p}{s}_attn_proj.bias"] = _rand(rng, D)
        w[f"{p}{s}_mlp.fc1.weight"] = _rand(rng, MLPD, D)
        w[f"{p}{s}_mlp.fc1.bias"] = _rand(rng, MLPD)
        w[f"{p}{s}_mlp.fc2.weight"] = _rand(rng, D, MLPD)
        w[f"{p}{s}_mlp.fc2.bias"] = _rand(rng, D)

    img0 = _rand(rng, 1, L, D)
    txt0 = _rand(rng, 1, Lt, D)
    vec0 = _rand(rng, 1, D)

    # rope ids over the (f, h, w) voxel grid, adjacent-pair rotation
    ids = np.stack(np.meshgrid(np.arange(f), np.arange(hh), np.arange(ww),
                               indexing="ij"), axis=-1).reshape(1, L, 3)
    cos, sin = _torch_rope_table(ids, AX)

    def t_rms(x, weight, eps=1e-6):
        v = x.float().pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(v + eps) * weight

    im = _hyvid_mod_t(w, p + "img_mod", _t(vec0), 6)
    tm = _hyvid_mod_t(w, p + "txt_mod", _t(vec0), 6)

    img_m = _ln(_t(img0)) * (1 + im[1]) + im[0]
    txt_m = _ln(_t(txt0)) * (1 + tm[1]) + tm[0]
    iq, ik, iv = (_heads(a, Hn) for a in (
        img_m @ _t(w[p + "img_attn_qkv.weight"]).T
        + _t(w[p + "img_attn_qkv.bias"])).chunk(3, dim=-1))
    tq, tk, tv = (_heads(a, Hn) for a in (
        txt_m @ _t(w[p + "txt_attn_qkv.weight"]).T
        + _t(w[p + "txt_attn_qkv.bias"])).chunk(3, dim=-1))
    iq = t_rms(iq, _t(w[p + "img_attn_q_norm.weight"]))
    ik = t_rms(ik, _t(w[p + "img_attn_k_norm.weight"]))
    tq = t_rms(tq, _t(w[p + "txt_attn_q_norm.weight"]))
    tk = t_rms(tk, _t(w[p + "txt_attn_k_norm.weight"]))
    iq = _torch_apply_rope(iq, cos, sin)
    ik = _torch_apply_rope(ik, cos, sin)
    a = _unheads(_sdpa(torch.cat([iq, tq], dim=2),
                       torch.cat([ik, tk], dim=2),
                       torch.cat([iv, tv], dim=2)))
    ia, ta = a[:, :L], a[:, L:]

    it = _t(img0) + im[2] * (ia @ _t(w[p + "img_attn_proj.weight"]).T
                             + _t(w[p + "img_attn_proj.bias"]))
    h = _ln(it) * (1 + im[4]) + im[3]
    h = torch.nn.functional.gelu(
        h @ _t(w[p + "img_mlp.fc1.weight"]).T
        + _t(w[p + "img_mlp.fc1.bias"]), approximate="tanh")
    it = it + im[5] * (h @ _t(w[p + "img_mlp.fc2.weight"]).T
                       + _t(w[p + "img_mlp.fc2.bias"]))

    tt_ = _t(txt0) + tm[2] * (ta @ _t(w[p + "txt_attn_proj.weight"]).T
                              + _t(w[p + "txt_attn_proj.bias"]))
    h = _ln(tt_) * (1 + tm[4]) + tm[3]
    h = torch.nn.functional.gelu(
        h @ _t(w[p + "txt_mlp.fc1.weight"]).T
        + _t(w[p + "txt_mlp.fc1.bias"]), approximate="tanh")
    tt_ = tt_ + tm[5] * (h @ _t(w[p + "txt_mlp.fc2.weight"]).T
                         + _t(w[p + "txt_mlp.fc2.bias"]))

    cfg = hyvid.HyVidConfig(hidden=D, n_heads=Hn, depth_double=1,
                            depth_single=0)
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    pe = hyvid.rope_3d(f, hh, ww, AX)
    j_img, j_txt = hyvid._double_block(
        flux.block_subtree(jp, "double_blocks.0."), jnp.asarray(img0),
        jnp.asarray(txt0), jnp.asarray(vec0), pe, cfg, F32)
    np.testing.assert_allclose(np.asarray(j_img), it.numpy(), rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(j_txt), tt_.numpy(), rtol=3e-4,
                               atol=3e-4)


def test_hyvid_single_block_golden():
    """HYV MMSingleStreamBlock vs an independent torch derivation:
    3-chunk modulation, fused linear1 → (qkv | mlp) split, per-head RMS
    qk-norm, rope on the image prefix only, linear2 over
    concat(attn, gelu-tanh(mlp))."""
    from comfyui_gguf_tpu.models import hyvid

    rng = np.random.default_rng(62)
    D, Hn = 64, 2
    hd = D // Hn
    MLPD = 4 * D
    f, hh, ww = 2, 2, 2
    L = f * hh * ww
    Lt = 6
    AX = (hd - 2 * (2 * ((hd - hd // 8) // 4)),
          2 * ((hd - hd // 8) // 4), 2 * ((hd - hd // 8) // 4))
    p = "single_blocks.0."

    w = {
        p + "modulation.linear.weight": _rand(rng, 3 * D, D),
        p + "modulation.linear.bias": _rand(rng, 3 * D),
        p + "linear1.weight": _rand(rng, 3 * D + MLPD, D),
        p + "linear1.bias": _rand(rng, 3 * D + MLPD),
        p + "linear2.weight": _rand(rng, D, D + MLPD),
        p + "linear2.bias": _rand(rng, D),
        p + "q_norm.weight": _rand(rng, hd) + 1,
        p + "k_norm.weight": _rand(rng, hd) + 1,
    }

    x0 = _rand(rng, 1, L + Lt, D)
    vec0 = _rand(rng, 1, D)
    ids = np.stack(np.meshgrid(np.arange(f), np.arange(hh), np.arange(ww),
                               indexing="ij"), axis=-1).reshape(1, L, 3)
    cos, sin = _torch_rope_table(ids, AX)

    def t_rms(x, weight, eps=1e-6):
        v = x.float().pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(v + eps) * weight

    sh, sc, g = _hyvid_mod_t(w, p + "modulation", _t(vec0), 3)
    xm = _ln(_t(x0)) * (1 + sc) + sh
    hcat = xm @ _t(w[p + "linear1.weight"]).T + _t(w[p + "linear1.bias"])
    qkv, mlp_h = hcat[..., :3 * D], hcat[..., 3 * D:]
    q, k, v = (_heads(a, Hn) for a in qkv.chunk(3, dim=-1))
    q = t_rms(q, _t(w[p + "q_norm.weight"]))
    k = t_rms(k, _t(w[p + "k_norm.weight"]))
    q = torch.cat([_torch_apply_rope(q[:, :, :L], cos, sin), q[:, :, L:]],
                  dim=2)
    k = torch.cat([_torch_apply_rope(k[:, :, :L], cos, sin), k[:, :, L:]],
                  dim=2)
    a = _unheads(_sdpa(q, k, v))
    act = torch.nn.functional.gelu(mlp_h, approximate="tanh")
    out = torch.cat([a, act], dim=-1) @ _t(w[p + "linear2.weight"]).T \
        + _t(w[p + "linear2.bias"])
    want = _t(x0) + g * out

    cfg = hyvid.HyVidConfig(hidden=D, n_heads=Hn, depth_double=0,
                            depth_single=1)
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    pe = hyvid.rope_3d(f, hh, ww, AX)
    j = hyvid._single_block(flux.block_subtree(jp, "single_blocks.0."),
                            jnp.asarray(x0), jnp.asarray(vec0), pe,
                            L, cfg, F32)
    np.testing.assert_allclose(np.asarray(j), want.numpy(), rtol=3e-4,
                               atol=3e-4)


# ---------------------------------------------------------------------------
# SD UNet ResBlock + image VAE blocks (NCHW torch vs NHWC JAX)
# ---------------------------------------------------------------------------

def _conv_t(x, w, b, pad=0):
    return torch.nn.functional.conv2d(x, _t(w), _t(b), padding=pad)


def _gn_t(x, w, b, eps):
    return torch.nn.functional.group_norm(x, 32, _t(w), _t(b), eps=eps)


def test_unet_resblock_golden():
    """SD UNet ResBlock vs an independent torch derivation of the
    published ldm/sgm openaimodel block: GN32(eps 1e-5)+SiLU+3×3 conv,
    timestep embedding injected per-channel after a SiLU+Linear,
    GN+SiLU+(dropout)+3×3 conv, 1×1 skip when channels change."""
    from comfyui_gguf_tpu.models import unet

    rng = np.random.default_rng(63)
    CI, CO, E, S = 32, 64, 24, 6
    p = "input_blocks.1.0"
    w = {
        f"{p}.in_layers.0.weight": _rand(rng, CI) + 1,
        f"{p}.in_layers.0.bias": _rand(rng, CI),
        f"{p}.in_layers.2.weight": _rand(rng, CO, CI, 3, 3),
        f"{p}.in_layers.2.bias": _rand(rng, CO),
        f"{p}.emb_layers.1.weight": _rand(rng, CO, E),
        f"{p}.emb_layers.1.bias": _rand(rng, CO),
        f"{p}.out_layers.0.weight": _rand(rng, CO) + 1,
        f"{p}.out_layers.0.bias": _rand(rng, CO),
        f"{p}.out_layers.3.weight": _rand(rng, CO, CO, 3, 3),
        f"{p}.out_layers.3.bias": _rand(rng, CO),
        f"{p}.skip_connection.weight": _rand(rng, CO, CI, 1, 1),
        f"{p}.skip_connection.bias": _rand(rng, CO),
    }
    x0 = _rand(rng, 1, CI, S, S)     # NCHW for torch
    emb0 = _rand(rng, 1, E)

    xt = _t(x0)
    h = _gn_t(xt, w[f"{p}.in_layers.0.weight"], w[f"{p}.in_layers.0.bias"],
              1e-5)
    h = _conv_t(torch.nn.functional.silu(h), w[f"{p}.in_layers.2.weight"],
                w[f"{p}.in_layers.2.bias"], pad=1)
    eo = torch.nn.functional.silu(_t(emb0)) \
        @ _t(w[f"{p}.emb_layers.1.weight"]).T + _t(w[f"{p}.emb_layers.1.bias"])
    h = h + eo[:, :, None, None]
    h = _gn_t(h, w[f"{p}.out_layers.0.weight"], w[f"{p}.out_layers.0.bias"],
              1e-5)
    h = _conv_t(torch.nn.functional.silu(h), w[f"{p}.out_layers.3.weight"],
                w[f"{p}.out_layers.3.bias"], pad=1)
    want = _conv_t(xt, w[f"{p}.skip_connection.weight"],
                   w[f"{p}.skip_connection.bias"]) + h

    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    j = unet._resblock(jp, p, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                       jnp.asarray(emb0), F32)
    np.testing.assert_allclose(np.asarray(j).transpose(0, 3, 1, 2),
                               want.numpy(), rtol=2e-4, atol=2e-4)


def test_vae_resnet_and_attn_golden():
    """AutoencoderKL ResnetBlock + AttnBlock vs independent torch
    derivations of the published ldm/sgm model.py: GN32 eps 1e-6,
    1×1-conv qkv attention with C^-0.5 scaling over flattened spatial
    positions, 1×1 nin_shortcut."""
    from comfyui_gguf_tpu.models import vae

    rng = np.random.default_rng(64)
    CI, CO, S = 32, 64, 4
    rp, ap = "decoder.mid.block_1", "decoder.mid.attn_1"
    w = {
        f"{rp}.norm1.weight": _rand(rng, CI) + 1,
        f"{rp}.norm1.bias": _rand(rng, CI),
        f"{rp}.conv1.weight": _rand(rng, CO, CI, 3, 3),
        f"{rp}.conv1.bias": _rand(rng, CO),
        f"{rp}.norm2.weight": _rand(rng, CO) + 1,
        f"{rp}.norm2.bias": _rand(rng, CO),
        f"{rp}.conv2.weight": _rand(rng, CO, CO, 3, 3),
        f"{rp}.conv2.bias": _rand(rng, CO),
        f"{rp}.nin_shortcut.weight": _rand(rng, CO, CI, 1, 1),
        f"{rp}.nin_shortcut.bias": _rand(rng, CO),
        f"{ap}.norm.weight": _rand(rng, CO) + 1,
        f"{ap}.norm.bias": _rand(rng, CO),
        f"{ap}.q.weight": _rand(rng, CO, CO, 1, 1),
        f"{ap}.q.bias": _rand(rng, CO),
        f"{ap}.k.weight": _rand(rng, CO, CO, 1, 1),
        f"{ap}.k.bias": _rand(rng, CO),
        f"{ap}.v.weight": _rand(rng, CO, CO, 1, 1),
        f"{ap}.v.bias": _rand(rng, CO),
        f"{ap}.proj_out.weight": _rand(rng, CO, CO, 1, 1),
        f"{ap}.proj_out.bias": _rand(rng, CO),
    }
    x0 = _rand(rng, 1, CI, S, S)

    xt = _t(x0)
    h = _gn_t(xt, w[f"{rp}.norm1.weight"], w[f"{rp}.norm1.bias"], 1e-6)
    h = _conv_t(torch.nn.functional.silu(h), w[f"{rp}.conv1.weight"],
                w[f"{rp}.conv1.bias"], pad=1)
    h = _gn_t(h, w[f"{rp}.norm2.weight"], w[f"{rp}.norm2.bias"], 1e-6)
    h = _conv_t(torch.nn.functional.silu(h), w[f"{rp}.conv2.weight"],
                w[f"{rp}.conv2.bias"], pad=1)
    res = _conv_t(xt, w[f"{rp}.nin_shortcut.weight"],
                  w[f"{rp}.nin_shortcut.bias"]) + h

    hn = _gn_t(res, w[f"{ap}.norm.weight"], w[f"{ap}.norm.bias"], 1e-6)
    q = _conv_t(hn, w[f"{ap}.q.weight"], w[f"{ap}.q.bias"])
    k = _conv_t(hn, w[f"{ap}.k.weight"], w[f"{ap}.k.bias"])
    v = _conv_t(hn, w[f"{ap}.v.weight"], w[f"{ap}.v.bias"])
    B, C, Hh, Ww = q.shape
    q2 = q.reshape(B, C, Hh * Ww).permute(0, 2, 1)
    k2 = k.reshape(B, C, Hh * Ww)
    att = torch.softmax(torch.bmm(q2, k2) * C ** -0.5, dim=-1)
    v2 = v.reshape(B, C, Hh * Ww)
    o = torch.bmm(v2, att.permute(0, 2, 1)).reshape(B, C, Hh, Ww)
    want = res + _conv_t(o, w[f"{ap}.proj_out.weight"],
                         w[f"{ap}.proj_out.bias"])

    jp = {k2_: jnp.asarray(v2_) for k2_, v2_ in w.items()}
    jr = vae._resnet(jp, rp, jnp.asarray(x0.transpose(0, 2, 3, 1)), F32)
    np.testing.assert_allclose(np.asarray(jr).transpose(0, 3, 1, 2),
                               res.numpy(), rtol=2e-4, atol=2e-4)
    ja = vae._mid_attn(jp, ap, jr, F32)
    np.testing.assert_allclose(np.asarray(ja).transpose(0, 3, 1, 2),
                               want.numpy(), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Cosmos Predict2 (adaLN-DiT with per-branch modulations, NVIDIA naming)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("adaln_lora", [False, True])
def test_cosmos_block_golden(adaln_lora):
    """Cosmos Predict2 block vs an independent torch derivation of the
    published architecture (nvidia-cosmos/cosmos-predict2 minimal DiT):
    three per-branch adaLN modulations (self_attn / cross_attn / mlp),
    each SiLU -> Linear [-> Linear when adaLN-LoRA] -> (shift, scale,
    gate) chunks over a LayerNorm(eps 1e-6, no affine) pre-norm; per-head
    RMS(eps 1e-6) qk-norm applied BEFORE rope; complex-pair 3-D rope with
    (hd-4*(hd//6), 2*(hd//6), 2*(hd//6)) axis dims on self-attention
    only; cross-attention with q/k RMS-norm, no rope, own gate; GELU-tanh
    mlp (layer1/layer2). The two-linear adaLN Sequential is the layout
    the reference quantizer pins (lcpp.patch:193 names
    ``.adaln_modulation_mlp.2.weight``)."""
    from comfyui_gguf_tpu.models import cosmos, wan

    rng = np.random.default_rng(61)
    D, Hn, FF, Td, LORA = 64, 2, 160, 48, 16
    hd = D // Hn
    f, hh, ww = 2, 2, 2
    L = f * hh * ww
    Lc = 5
    p = "blocks.0"

    w = {}
    for br in ("self_attn", "cross_attn", "mlp"):
        key = f"{p}.adaln_modulation_{br}"
        if adaln_lora:
            w[key + ".1.weight"] = _rand(rng, LORA, D)
            w[key + ".2.weight"] = _rand(rng, 3 * D, LORA)
        else:
            w[key + ".1.weight"] = _rand(rng, 3 * D, D)
    for a in ("self_attn", "cross_attn"):
        kv_in = D if a == "self_attn" else Td
        w[f"{p}.{a}.q_proj.weight"] = _rand(rng, D, D)
        w[f"{p}.{a}.k_proj.weight"] = _rand(rng, D, kv_in)
        w[f"{p}.{a}.v_proj.weight"] = _rand(rng, D, kv_in)
        w[f"{p}.{a}.output_proj.weight"] = _rand(rng, D, D)
        w[f"{p}.{a}.q_norm.weight"] = _rand(rng, hd) + 1
        w[f"{p}.{a}.k_norm.weight"] = _rand(rng, hd) + 1
    w[f"{p}.mlp.layer1.weight"] = _rand(rng, FF, D)
    w[f"{p}.mlp.layer2.weight"] = _rand(rng, D, FF)

    x0 = _rand(rng, 1, L, D)
    ctx0 = _rand(rng, 1, Lc, Td)
    vec0 = _rand(rng, 1, D)

    def lin(name, x):
        return x @ _t(w[f"{p}.{name}.weight"]).T

    def mod3(br):
        o = torch.nn.functional.silu(_t(vec0))
        o = o @ _t(w[f"{p}.adaln_modulation_{br}.1.weight"]).T
        if adaln_lora:
            o = o @ _t(w[f"{p}.adaln_modulation_{br}.2.weight"]).T
        sh, sc, g = o.chunk(3, dim=-1)
        return sh[:, None], sc[:, None], g[:, None]

    freqs = _wan_rope_complex(f, hh, ww, hd)
    xt = _t(x0)
    ct = _t(ctx0)

    sh, sc, g = mod3("self_attn")
    h = _ln(xt) * (1 + sc) + sh
    q = _rms(_heads(lin("self_attn.q_proj", h), Hn),
             _t(w[f"{p}.self_attn.q_norm.weight"]))
    k = _rms(_heads(lin("self_attn.k_proj", h), Hn),
             _t(w[f"{p}.self_attn.k_norm.weight"]))
    v = _heads(lin("self_attn.v_proj", h), Hn)
    q = _wan_apply_rope_t(q, freqs)
    k = _wan_apply_rope_t(k, freqs)
    xt = xt + g * lin("self_attn.output_proj", _unheads(_sdpa(q, k, v)))

    sh, sc, g = mod3("cross_attn")
    h = _ln(xt) * (1 + sc) + sh
    q = _rms(_heads(lin("cross_attn.q_proj", h), Hn),
             _t(w[f"{p}.cross_attn.q_norm.weight"]))
    k = _rms(_heads(lin("cross_attn.k_proj", ct), Hn),
             _t(w[f"{p}.cross_attn.k_norm.weight"]))
    v = _heads(lin("cross_attn.v_proj", ct), Hn)
    xt = xt + g * lin("cross_attn.output_proj", _unheads(_sdpa(q, k, v)))

    sh, sc, g = mod3("mlp")
    h = _ln(xt) * (1 + sc) + sh
    h = torch.nn.functional.gelu(lin("mlp.layer1", h), approximate="tanh")
    xt = xt + g * lin("mlp.layer2", h)

    cfg = cosmos.CosmosConfig(dim=D, n_layers=1, n_heads=Hn, text_dim=Td)
    assert cfg.axes_dim == (hd - 4 * (hd // 6), 2 * (hd // 6), 2 * (hd // 6))
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    pe = wan.rope_3d(f, hh, ww, cfg.axes_dim)
    j = cosmos._block(flux.block_subtree(jp, "blocks.0."), jnp.asarray(x0),
                      jnp.asarray(ctx0), jnp.asarray(vec0), pe, cfg, F32)
    np.testing.assert_allclose(np.asarray(j), xt.numpy(), rtol=3e-4,
                               atol=3e-4)


def test_unet_downsample_golden():
    """UNet Downsample == torch conv2d(stride=2, padding=1) — SYMMETRIC
    padding (openaimodel Downsample), not the VAE's asymmetric (0,1)."""
    import torch

    from comfyui_gguf_tpu.models import unet

    rng = np.random.default_rng(0)
    C = 8
    x = rng.standard_normal((1, 8, 8, C)).astype(np.float32)
    w = rng.standard_normal((C, C, 3, 3)).astype(np.float32) * 0.1
    b = rng.standard_normal(C).astype(np.float32)

    want = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1
    ).permute(0, 2, 3, 1).numpy()

    params = {"blk.0.op.weight": jnp.asarray(w),
              "blk.0.op.bias": jnp.asarray(b)}
    got = unet._apply_numbered_block(params, "blk", jnp.asarray(x), None,
                                     None, None, F32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_cosmos_forward_golden():
    """Cosmos FULL forward (patchify → t-embed → 1 block → adaLN head →
    unpatchify) vs an independent torch derivation — locks the
    grid/rope/time-embed conventions at the forward level the way
    test_ltxv_forward_golden does for LTXV (that step caught a
    shape-breaking bug there; VERDICT r3 item 8). Conventions locked:
    channel-major (C, pt, ph, pw) patch flattening with (f, h, w) token
    order; BFL sinusoidal t-embed (t×1000, cos|sin, 256 dims) through
    the two-linear t_embedder + RMS t_embedding_norm; complex-pair 3-D
    rope over the (f, h, w) token grid; final adaLN (shift, scale) from
    ``final_layer.adaln_modulation`` and linear→unpatchify."""
    from comfyui_gguf_tpu.models import cosmos

    rng = np.random.default_rng(67)
    D, Hn, FF, Td = 64, 2, 160, 48
    hd = D // Hn
    pt, ph, pw = 1, 2, 2
    F_, Hh, Ww, C = 2, 4, 4, 16
    f, hh, ww = F_ // pt, Hh // ph, Ww // pw
    Lc = 5
    IN = C * pt * ph * pw
    p = "blocks.0"

    w = {
        "x_embedder.proj.1.weight": _rand(rng, D, IN),
        "x_embedder.proj.1.bias": _rand(rng, D),
        "t_embedder.1.linear_1.weight": _rand(rng, D, 256),
        "t_embedder.1.linear_1.bias": _rand(rng, D),
        "t_embedder.1.linear_2.weight": _rand(rng, D, D),
        "t_embedder.1.linear_2.bias": _rand(rng, D),
        "t_embedding_norm.weight": _rand(rng, D) + 1,
        "final_layer.adaln_modulation.1.weight": _rand(rng, 2 * D, D),
        "final_layer.linear.weight": _rand(rng, IN, D),
    }
    for br in ("self_attn", "cross_attn", "mlp"):
        w[f"{p}.adaln_modulation_{br}.1.weight"] = _rand(rng, 3 * D, D)
    for a in ("self_attn", "cross_attn"):
        kv_in = D if a == "self_attn" else Td
        w[f"{p}.{a}.q_proj.weight"] = _rand(rng, D, D)
        w[f"{p}.{a}.k_proj.weight"] = _rand(rng, D, kv_in)
        w[f"{p}.{a}.v_proj.weight"] = _rand(rng, D, kv_in)
        w[f"{p}.{a}.output_proj.weight"] = _rand(rng, D, D)
        w[f"{p}.{a}.q_norm.weight"] = _rand(rng, hd) + 1
        w[f"{p}.{a}.k_norm.weight"] = _rand(rng, hd) + 1
    w[f"{p}.mlp.layer1.weight"] = _rand(rng, FF, D)
    w[f"{p}.mlp.layer2.weight"] = _rand(rng, D, FF)

    lat0 = _rand(rng, 1, F_, Hh, Ww, C)
    ctx0 = _rand(rng, 1, Lc, Td)
    tstep = np.array([0.4], np.float32)

    def lin(name, x):
        y = x @ _t(w[f"{name}.weight"]).T
        if f"{name}.bias" in w:
            y = y + _t(w[f"{name}.bias"])
        return y

    # --- patchify: pt×ph×pw patches, channel-major flatten, (f,h,w) order
    lt = _t(lat0)  # (B, F, H, W, C)
    patches = []
    for fi in range(f):
        for hi in range(hh):
            for wi in range(ww):
                blk = lt[0, fi * pt:(fi + 1) * pt, hi * ph:(hi + 1) * ph,
                         wi * pw:(wi + 1) * pw, :]  # (pt, ph, pw, C)
                patches.append(blk.permute(3, 0, 1, 2).reshape(-1))
    xt = torch.stack(patches)[None]  # (1, L, IN)
    xt = lin("x_embedder.proj.1", xt)

    # --- BFL t-embed: t×1000, cos|sin over 128 freqs
    tt = torch.tensor(tstep) * 1000.0
    half = 128
    freqs_t = torch.exp(-np.log(10_000.0)
                        * torch.arange(half, dtype=torch.float32) / half)
    sincos = torch.cat([torch.cos(tt[:, None] * freqs_t[None]),
                        torch.sin(tt[:, None] * freqs_t[None])], dim=-1)
    vec = lin("t_embedder.1.linear_1", sincos)
    vec = lin("t_embedder.1.linear_2", torch.nn.functional.silu(vec))
    vec = _rms(vec, _t(w["t_embedding_norm.weight"]))

    def mod3(br):
        o = torch.nn.functional.silu(vec)
        o = o @ _t(w[f"{p}.adaln_modulation_{br}.1.weight"]).T
        sh, sc, g = o.chunk(3, dim=-1)
        return sh[:, None], sc[:, None], g[:, None]

    rope = _wan_rope_complex(f, hh, ww, hd)

    sh, sc, g = mod3("self_attn")
    h = _ln(xt) * (1 + sc) + sh
    q = _rms(_heads(lin(f"{p}.self_attn.q_proj", h), Hn),
             _t(w[f"{p}.self_attn.q_norm.weight"]))
    k = _rms(_heads(lin(f"{p}.self_attn.k_proj", h), Hn),
             _t(w[f"{p}.self_attn.k_norm.weight"]))
    v = _heads(lin(f"{p}.self_attn.v_proj", h), Hn)
    q = _wan_apply_rope_t(q, rope)
    k = _wan_apply_rope_t(k, rope)
    xt = xt + g * lin(f"{p}.self_attn.output_proj", _unheads(_sdpa(q, k, v)))

    ct = _t(ctx0)
    sh, sc, g = mod3("cross_attn")
    h = _ln(xt) * (1 + sc) + sh
    q = _rms(_heads(lin(f"{p}.cross_attn.q_proj", h), Hn),
             _t(w[f"{p}.cross_attn.q_norm.weight"]))
    k = _rms(_heads(lin(f"{p}.cross_attn.k_proj", ct), Hn),
             _t(w[f"{p}.cross_attn.k_norm.weight"]))
    v = _heads(lin(f"{p}.cross_attn.v_proj", ct), Hn)
    xt = xt + g * lin(f"{p}.cross_attn.output_proj",
                      _unheads(_sdpa(q, k, v)))

    sh, sc, g = mod3("mlp")
    h = _ln(xt) * (1 + sc) + sh
    h = torch.nn.functional.gelu(lin(f"{p}.mlp.layer1", h),
                                 approximate="tanh")
    xt = xt + g * lin(f"{p}.mlp.layer2", h)

    # --- head: adaLN (shift, scale) + linear + unpatchify (inverse walk)
    mod = torch.nn.functional.silu(vec) \
        @ _t(w["final_layer.adaln_modulation.1.weight"]).T
    shf, scf = mod.chunk(2, dim=-1)
    xt = _ln(xt) * (1 + scf[:, None]) + shf[:, None]
    xt = lin("final_layer.linear", xt)  # (1, L, IN)
    out = torch.zeros(1, F_, Hh, Ww, C)
    i = 0
    for fi in range(f):
        for hi in range(hh):
            for wi in range(ww):
                blk = xt[0, i].reshape(C, pt, ph, pw).permute(1, 2, 3, 0)
                out[0, fi * pt:(fi + 1) * pt, hi * ph:(hi + 1) * ph,
                    wi * pw:(wi + 1) * pw, :] = blk
                i += 1

    # --- the real jax forward (both paths: python loop and scanned)
    cfg = cosmos.CosmosConfig(dim=D, n_layers=1, n_heads=Hn, text_dim=Td,
                              in_channels=C, patch=(pt, ph, pw))
    jp = {k2: jnp.asarray(v2) for k2, v2 in w.items()}
    j = cosmos.forward(jp, cfg, jnp.asarray(lat0), jnp.asarray(ctx0),
                       jnp.asarray(tstep), qcfg=F32)
    np.testing.assert_allclose(np.asarray(j), out.numpy(), rtol=3e-4,
                               atol=3e-4)
    sp = cosmos.stack_cosmos_params(dict(jp), cfg)
    js = cosmos.forward_stacked(sp, cfg, jnp.asarray(lat0),
                                jnp.asarray(ctx0), jnp.asarray(tstep),
                                qcfg=F32)
    np.testing.assert_allclose(np.asarray(js), out.numpy(), rtol=3e-4,
                               atol=3e-4)


def test_qwen_image_forward_golden():
    """FULL qwen_image forward vs an independent torch derivation:
    prelude (img_in, RMS txt_norm → txt_in, 256-dim sinusoidal t-embed →
    two-linear embedder with mid-silu), 3-axis rope over the
    [txt | img] id concat, N blocks (the block-golden math), and the
    AdaLayerNormContinuous head with (scale, shift) chunk ORDER +
    proj_out — end-to-end convention pinning for the TP flagship."""
    from comfyui_gguf_tpu.models import qwen_image, testing

    rng = np.random.default_rng(52)
    d = testing.QwenImageDims(hidden=64, n_heads=2, n_layers=2, in_ch=8,
                              context_dim=24)
    nonblock, groups = testing.qwen_image_shape_spec(d)
    sd = testing.random_flat_sd_from_spec(nonblock, groups, seed=53)
    cfg = d.config()
    params = {k: jnp.asarray(v) for k, v in sd.items()}

    B, h_tok, w_tok, Lt = 1, 4, 4, 5
    img = rng.standard_normal((B, h_tok * w_tok, d.in_ch)).astype(
        np.float32)
    txt = rng.standard_normal((B, Lt, d.context_dim)).astype(np.float32)
    img_ids = flux.make_img_ids(h_tok, w_tok, B)
    txt_ids = np.zeros((B, Lt, 3), np.int32)
    tval = np.asarray([0.35], np.float32)

    got = np.asarray(qwen_image.forward(
        params, cfg, jnp.asarray(img), jnp.asarray(img_ids),
        jnp.asarray(txt), jnp.asarray(txt_ids), jnp.asarray(tval),
        qcfg=F32), np.float32)

    # ---- independent torch derivation ------------------------------
    W = {k: _t(v) for k, v in sd.items()}

    def lin(name, x):
        y = x @ W[f"{name}.weight"].T
        if f"{name}.bias" in W:
            y = y + W[f"{name}.bias"]
        return y

    it = _t(img)
    tt = _t(txt)

    x = lin("img_in", it)
    c = _rms(tt, W["txt_norm.weight"])
    c = lin("txt_in", c)

    # BFL sinusoidal: t·1000, half log-spaced freqs, cos|sin concat
    tf = torch.tensor(tval) * 1000.0
    half = 128
    freqs = torch.exp(-np.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    targ = tf[:, None] * freqs[None]
    temb = torch.cat([torch.cos(targ), torch.sin(targ)], dim=-1)
    pre = "time_text_embed.timestep_embedder."
    vec = lin(pre + "linear_1", temb)
    vec = lin(pre + "linear_2", torch.nn.functional.silu(vec))

    # rope table over [txt | img] ids, per-axis even-stride freqs
    ids = np.concatenate([txt_ids, img_ids], axis=1)
    cos_parts, sin_parts = [], []
    for ax, dim_ax in enumerate(cfg.axes_dim):
        pos = torch.tensor(ids[..., ax], dtype=torch.float32)
        omega = 1.0 / (10000.0 ** (
            torch.arange(0, dim_ax, 2, dtype=torch.float32) / dim_ax))
        ang = pos[..., None] * omega
        cos_parts.append(torch.cos(ang))
        sin_parts.append(torch.sin(ang))
    pcos = torch.cat(cos_parts, dim=-1)  # (B, L, D/2)
    psin = torch.cat(sin_parts, dim=-1)

    def rope(q):  # (B, H, L, D) pair rotation
        Bq, Hq, Lq, Dq = q.shape
        qp = q.reshape(Bq, Hq, Lq, Dq // 2, 2)
        r = qp[..., 0] * pcos[:, None] - qp[..., 1] * psin[:, None]
        i = qp[..., 0] * psin[:, None] + qp[..., 1] * pcos[:, None]
        return torch.stack([r, i], dim=-1).reshape(Bq, Hq, Lq, Dq)

    Hn = cfg.n_heads
    hd = d.hidden // Hn

    def heads(a):
        Bq, Lq, Dq = a.shape
        return a.reshape(Bq, Lq, Hn, hd).permute(0, 2, 1, 3)

    for i in range(cfg.n_layers):
        p = f"transformer_blocks.{i}."

        def mod(name):
            o = lin(f"{p}{name}.1",
                    torch.nn.functional.silu(vec))
            return [cc[:, None, :] for cc in o.chunk(6, dim=-1)]

        im = mod("img_mod")
        tm = mod("txt_mod")
        xm = _ln(x) * (1 + im[1]) + im[0]
        cm = _ln(c) * (1 + tm[1]) + tm[0]

        iq = _rms(heads(lin(f"{p}attn.to_q", xm)),
                  W[f"{p}attn.norm_q.weight"])
        ik = _rms(heads(lin(f"{p}attn.to_k", xm)),
                  W[f"{p}attn.norm_k.weight"])
        iv = heads(lin(f"{p}attn.to_v", xm))
        tq = _rms(heads(lin(f"{p}attn.add_q_proj", cm)),
                  W[f"{p}attn.norm_added_q.weight"])
        tk = _rms(heads(lin(f"{p}attn.add_k_proj", cm)),
                  W[f"{p}attn.norm_added_k.weight"])
        tv = heads(lin(f"{p}attn.add_v_proj", cm))

        q = rope(torch.cat([tq, iq], dim=2))
        k = rope(torch.cat([tk, ik], dim=2))
        v = torch.cat([tv, iv], dim=2)
        a = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        a = a.permute(0, 2, 1, 3).reshape(B, -1, d.hidden)
        ta, ia = a[:, :Lt], a[:, Lt:]

        x = x + im[2] * lin(f"{p}attn.to_out.0", ia)
        c = c + tm[2] * lin(f"{p}attn.to_add_out", ta)

        h = _ln(x) * (1 + im[4]) + im[3]
        h = torch.nn.functional.gelu(
            lin(f"{p}img_mlp.net.0.proj", h), approximate="tanh")
        x = x + im[5] * lin(f"{p}img_mlp.net.2", h)
        h = _ln(c) * (1 + tm[4]) + tm[3]
        h = torch.nn.functional.gelu(
            lin(f"{p}txt_mlp.net.0.proj", h), approximate="tanh")
        c = c + tm[5] * lin(f"{p}txt_mlp.net.2", h)

    # head: AdaLayerNormContinuous chunk order is (scale, shift)
    mo = lin("norm_out.linear", torch.nn.functional.silu(vec))
    sc, sh = mo.chunk(2, dim=-1)
    x = _ln(x) * (1 + sc[:, None]) + sh[:, None]
    want = lin("proj_out", x).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
