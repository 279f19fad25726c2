"""HunyuanVideo DiT (arch "hyvid" in the reference allowlist).

Flux-lineage double/single-stream video transformer with HYV's own key
naming (``img_attn_qkv`` flat names, ``img_mod.linear``, ``mlp.fc1/fc2``),
conv3d patch embed — the >4-D tensor the reference's 5-D sidecar flow
exists for (reference tools/convert.py:84-91, fingerprint
``double_blocks.0.img_attn_proj.weight`` at tools/convert.py:77-84) — an
LLM-token refiner for the text stream, 3-axis RoPE, and RMS qk-norms.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import (
    QuantConfig,
    DEFAULT_CONFIG,
    conv3d,
    layer_norm,
    linear,
    linear_gelu,
    rms_norm,
)
from .flux import timestep_embedding
from .wan import rope_3d, _apply_rope, _heads, _attn


@dataclasses.dataclass(frozen=True)
class HyVidConfig:
    hidden: int
    n_heads: int
    depth_double: int
    depth_single: int
    mlp_ratio: float = 4.0
    in_channels: int = 16
    text_dim: int = 4096
    patch: tuple[int, int, int] = (1, 2, 2)
    guidance_embed: bool = True
    # TP divides n_heads per shard; the true head_dim (and the rope axes
    # derived from it) must survive (parallel/tp_spec.tp_hyvid_forward)
    head_dim_override: int | None = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden // self.n_heads

    @property
    def axes_dim(self) -> tuple[int, int, int]:
        hd = self.head_dim  # HYV: 128 → (16, 56, 56)
        hw = 2 * ((hd - hd // 8) // 4)
        return (hd - 2 * hw, hw, hw)

    @staticmethod
    def from_state_dict(sd) -> "HyVidConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        pe = shape("img_in.proj.weight")  # (hid, C, pt, ph, pw)
        hidden = pe[0]
        nd = 0
        while f"double_blocks.{nd}.img_attn_qkv.weight" in sd:
            nd += 1
        ns = 0
        while f"single_blocks.{ns}.linear1.weight" in sd:
            ns += 1
        qn = shape("double_blocks.0.img_attn_q_norm.weight")[0]
        return HyVidConfig(
            hidden=int(hidden), n_heads=int(hidden) // int(qn),
            depth_double=nd, depth_single=ns, in_channels=int(pe[1]),
            text_dim=shape("txt_in.input_embedder.weight")[1],
            patch=(int(pe[2]), int(pe[3]), int(pe[4])),
            guidance_embed="guidance_in.in_layer.weight" in sd,
        )


def _mlp_embed(params, prefix, x, qcfg):
    h = linear(x, params[f"{prefix}.in_layer.weight"],
               params.get(f"{prefix}.in_layer.bias"), cfg=qcfg)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    return linear(h, params[f"{prefix}.out_layer.weight"],
                  params.get(f"{prefix}.out_layer.bias"), cfg=qcfg)


def _mod(params, key, vec, n, qcfg):
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    out = linear(v, params[f"{key}.linear.weight"],
                 params.get(f"{key}.linear.bias"), cfg=qcfg)
    return jnp.split(out[:, None, :], n, axis=-1)


def _token_refiner(params, txt, t_emb, qcfg):
    """txt_in: input embed + timestep/context vec + N refiner blocks."""
    x = linear(txt, params["txt_in.input_embedder.weight"],
               params.get("txt_in.input_embedder.bias"), cfg=qcfg)
    vec = _mlp_embed(params, "txt_in.t_embedder.mlp", t_emb, qcfg) \
        if "txt_in.t_embedder.mlp.in_layer.weight" in params else None
    if vec is None:
        # mlp stored as Sequential 0/2
        v = linear(t_emb, params["txt_in.t_embedder.mlp.0.weight"],
                   params.get("txt_in.t_embedder.mlp.0.bias"), cfg=qcfg)
        v = jax.nn.silu(v.astype(jnp.float32)).astype(v.dtype)
        vec = linear(v, params["txt_in.t_embedder.mlp.2.weight"],
                     params.get("txt_in.t_embedder.mlp.2.bias"), cfg=qcfg)
    if "txt_in.c_embedder.linear_1.weight" in params:
        c = jnp.mean(x, axis=1)
        c = linear(c, params["txt_in.c_embedder.linear_1.weight"],
                   params.get("txt_in.c_embedder.linear_1.bias"), cfg=qcfg)
        c = jax.nn.silu(c.astype(jnp.float32)).astype(c.dtype)
        c = linear(c, params["txt_in.c_embedder.linear_2.weight"],
                   params.get("txt_in.c_embedder.linear_2.bias"), cfg=qcfg)
        vec = vec + c

    i = 0
    base = "txt_in.individual_token_refiner.blocks"
    hid = x.shape[-1]
    while f"{base}.{i}.self_attn_qkv.weight" in params:
        p = f"{base}.{i}"
        gates = linear(jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype),
                       params[f"{p}.adaLN_modulation.1.weight"],
                       params.get(f"{p}.adaLN_modulation.1.bias"), cfg=qcfg)
        g1, g2 = jnp.split(gates[:, None, :], 2, axis=-1)
        h = layer_norm(x, params.get(f"{p}.norm1.weight"),
                       params.get(f"{p}.norm1.bias"), eps=1e-6)
        qkv = linear(h, params[f"{p}.self_attn_qkv.weight"],
                     params.get(f"{p}.self_attn_qkv.bias"), cfg=qcfg)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        nh = max(1, hid // 128)
        a = _attn(_heads(q, nh), _heads(k, nh), _heads(v, nh))
        x = x + g1 * linear(a, params[f"{p}.self_attn_proj.weight"],
                            params.get(f"{p}.self_attn_proj.bias"), cfg=qcfg)
        h = layer_norm(x, params.get(f"{p}.norm2.weight"),
                       params.get(f"{p}.norm2.bias"), eps=1e-6)
        h = linear(h, params[f"{p}.mlp.fc1.weight"],
                   params.get(f"{p}.mlp.fc1.bias"), cfg=qcfg)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
        x = x + g2 * linear(h, params[f"{p}.mlp.fc2.weight"],
                            params.get(f"{p}.mlp.fc2.bias"), cfg=qcfg)
        i += 1
    return x


def _double_block(p, img, txt, vec, pe, cfg: HyVidConfig, qcfg):
    """One double block over its UNPREFIXED param subtree ``p``
    (scan-compatible: runs under lax.scan with stacked params in
    forward_stacked and in the python loop in forward)."""
    H = cfg.n_heads
    i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = _mod(p, "img_mod",
                                                  vec, 6, qcfg)
    t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = _mod(p, "txt_mod",
                                                  vec, 6, qcfg)

    img_mod = layer_norm(img, eps=1e-6) * (1 + i_sc1) + i_sh1
    txt_mod = layer_norm(txt, eps=1e-6) * (1 + t_sc1) + t_sh1

    iq, ik, iv = (  # flat HYV naming: img_attn_qkv
        _heads(a, H) for a in jnp.split(
            linear(img_mod, p["img_attn_qkv.weight"],
                   p.get("img_attn_qkv.bias"), cfg=qcfg), 3, -1))
    tq, tk, tv = (
        _heads(a, H) for a in jnp.split(
            linear(txt_mod, p["txt_attn_qkv.weight"],
                   p.get("txt_attn_qkv.bias"), cfg=qcfg), 3, -1))
    iq = rms_norm(iq, p["img_attn_q_norm.weight"], eps=1e-6)
    ik = rms_norm(ik, p["img_attn_k_norm.weight"], eps=1e-6)
    tq = rms_norm(tq, p["txt_attn_q_norm.weight"], eps=1e-6)
    tk = rms_norm(tk, p["txt_attn_k_norm.weight"], eps=1e-6)
    iq = _apply_rope(iq, pe)
    ik = _apply_rope(ik, pe)

    # image tokens first, then text (HYV ordering)
    q = jnp.concatenate([iq, tq], axis=2)
    k = jnp.concatenate([ik, tk], axis=2)
    v = jnp.concatenate([iv, tv], axis=2)
    a = _attn(q, k, v)
    L_img = img.shape[1]
    img_a, txt_a = a[:, :L_img], a[:, L_img:]

    img = img + i_g1 * linear(img_a, p["img_attn_proj.weight"],
                              p.get("img_attn_proj.bias"), cfg=qcfg)
    h = layer_norm(img, eps=1e-6) * (1 + i_sc2) + i_sh2
    # bias+GELU fused into the kernel epilogue (custom calls are XLA
    # fusion barriers; the unfused form pays the widest-activation HBM
    # round trip per block — same fix flux/tp_flux carry)
    h = linear_gelu(h, p["img_mlp.fc1.weight"],
                    p.get("img_mlp.fc1.bias"), cfg=qcfg)
    img = img + i_g2 * linear(h, p["img_mlp.fc2.weight"],
                              p.get("img_mlp.fc2.bias"), cfg=qcfg)

    txt = txt + t_g1 * linear(txt_a, p["txt_attn_proj.weight"],
                              p.get("txt_attn_proj.bias"), cfg=qcfg)
    h = layer_norm(txt, eps=1e-6) * (1 + t_sc2) + t_sh2
    h = linear_gelu(h, p["txt_mlp.fc1.weight"],
                    p.get("txt_mlp.fc1.bias"), cfg=qcfg)
    txt = txt + t_g2 * linear(h, p["txt_mlp.fc2.weight"],
                              p.get("txt_mlp.fc2.bias"), cfg=qcfg)
    return img, txt


def _single_block(p, x, vec, pe, L_img, cfg: HyVidConfig, qcfg):
    """One single block over its UNPREFIXED param subtree ``p`` (scan-compatible)."""
    H = cfg.n_heads
    # linear1 fuses [q|k|v|mlp]; derive the boundary EXACTLY from the
    # weights: linear1 out = 3h+m, linear2 in = h+m (full or per-shard
    # alike) → 3h = 3·(W1−K2)/2 — no mlp_ratio assumption, correct for
    # pruned mlp widths and per shard under head-uniform TP column
    # splits (parallel/tp_spec)
    from ..nn.layers import in_features, out_features

    hid3 = 3 * (out_features(p["linear1.weight"])
                - in_features(p["linear2.weight"])) // 2
    shift, scale, gate = _mod(p, "modulation", vec, 3, qcfg)
    x_mod = layer_norm(x, eps=1e-6) * (1 + scale) + shift
    # fused linear1: GELU applied in the kernel epilogue from the mlp
    # tail columns (>= 3*hid)
    h = linear_gelu(x_mod, p["linear1.weight"],
                    p.get("linear1.bias"), tail_from=hid3, cfg=qcfg)
    qkv, act = h[..., :hid3], h[..., hid3:]
    q, k, v = (_heads(a, H) for a in jnp.split(qkv, 3, -1))
    q = rms_norm(q, p["q_norm.weight"], eps=1e-6)
    k = rms_norm(k, p["k_norm.weight"], eps=1e-6)
    # rope applies to image tokens only (text tokens carry no 3-D position)
    q = jnp.concatenate([_apply_rope(q[:, :, :L_img], pe),
                         q[:, :, L_img:]], axis=2)
    k = jnp.concatenate([_apply_rope(k[:, :, :L_img], pe),
                         k[:, :, L_img:]], axis=2)
    a = _attn(q, k, v)
    out = linear(jnp.concatenate([a, act], axis=-1),
                 p["linear2.weight"],
                 p.get("linear2.bias"), cfg=qcfg)
    return x + gate * out


def _prelude(params, cfg: HyVidConfig, latent, txt, timesteps, guidance,
             qcfg):
    B, F, Hh, Ww, C = latent.shape
    pt, ph, pw = cfg.patch
    img = conv3d(latent, params["img_in.proj.weight"],
                 params.get("img_in.proj.bias"), stride=cfg.patch,
                 padding=0, cfg=qcfg)
    f, h_, w_ = F // pt, Hh // ph, Ww // pw
    img = img.reshape(B, f * h_ * w_, cfg.hidden)

    temb = timestep_embedding(timesteps, 256).astype(img.dtype)
    vec = _mlp_embed(params, "time_in", temb, qcfg)
    if cfg.guidance_embed and guidance is not None:
        vec = vec + _mlp_embed(
            params, "guidance_in",
            timestep_embedding(guidance, 256).astype(img.dtype), qcfg)

    # txt rides the scan-body closure in forward_stacked; keep it (and
    # vec) in the activation dtype so the scan carry dtype is fixed
    txt = _token_refiner(params, txt, temb, qcfg).astype(img.dtype)
    vec = vec.astype(img.dtype)
    pe = rope_3d(f, h_, w_, cfg.axes_dim)
    return img, txt, vec, pe, (B, F, Hh, Ww, C, f, h_, w_)


def _final(params, cfg: HyVidConfig, img, vec, dims, qcfg):
    B, F, Hh, Ww, C, f, h_, w_ = dims
    pt, ph, pw = cfg.patch
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    mod = linear(v, params["final_layer.adaLN_modulation.1.weight"],
                 params.get("final_layer.adaLN_modulation.1.bias"), cfg=qcfg)
    shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
    img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
    img = linear(img, params["final_layer.linear.weight"],
                 params.get("final_layer.linear.bias"), cfg=qcfg)
    img = img.reshape(B, f, h_, w_, pt, ph, pw, C)
    img = img.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return img.reshape(B, F, Hh, Ww, C)


def forward(params, cfg: HyVidConfig, latent: jax.Array, txt: jax.Array,
            timesteps: jax.Array, guidance: jax.Array | None = None,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """latent (B, F, H, W, C) NDHWC; txt (B, L, text_dim) LLM states."""
    from .flux import block_subtree

    img, txt, vec, pe, dims = _prelude(params, cfg, latent, txt, timesteps,
                                       guidance, qcfg)
    for i in range(cfg.depth_double):
        img, txt = _double_block(block_subtree(params, f"double_blocks.{i}."),
                                 img, txt, vec, pe, cfg, qcfg)
    x = jnp.concatenate([img, txt], axis=1)
    L_img = img.shape[1]
    for i in range(cfg.depth_single):
        x = _single_block(block_subtree(params, f"single_blocks.{i}."),
                          x, vec, pe, L_img, cfg, qcfg)
    return _final(params, cfg, x[:, :L_img], vec, dims, qcfg)


def stack_hyvid_params(params: dict, cfg: HyVidConfig) -> dict:
    """Flat GGUF-keyed params → {non-block keys, "double_blocks": stacked
    subtree, "single_blocks": stacked subtree} for the scanned forward
    (same layout as flux.stack_flux_params — HYV blocks are homogeneous
    within each kind)."""
    from .flux import stack_block_groups

    return stack_block_groups(params,
                              [("double_blocks", cfg.depth_double),
                               ("single_blocks", cfg.depth_single)],
                              arch="hyvid")


def forward_stacked(sparams: dict, cfg: HyVidConfig, latent: jax.Array,
                    txt: jax.Array, timesteps: jax.Array,
                    guidance: jax.Array | None = None,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_hyvid_params() output — identical math, one
    lax.scan per block kind (zero-copy packed weights via IndexedQuant
    scalar prefetch, flux.scan_blocks)."""
    from .flux import scan_blocks

    img, txt, vec, pe, dims = _prelude(sparams, cfg, latent, txt,
                                       timesteps, guidance, qcfg)

    def dbody(carry, bp):
        i, t = carry
        return _double_block(bp, i, t, vec, pe, cfg, qcfg)

    img, txt = scan_blocks(sparams["double_blocks"], dbody, (img, txt),
                           cfg.depth_double)
    x = jnp.concatenate([img, txt], axis=1)
    L_img = img.shape[1]

    def sbody(x, bp):
        return _single_block(bp, x, vec, pe, L_img, cfg, qcfg)

    x = scan_blocks(sparams["single_blocks"], sbody, x, cfg.depth_single)
    return _final(sparams, cfg, x[:, :L_img], vec, dims, qcfg)
