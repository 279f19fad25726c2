"""AuraFlow DiT (arch "aura" in the reference allowlist).

MMDiT variant with AuraFlow's original key naming (the set the reference's
quantizer excludes from quantization at tools/lcpp.patch:357-368:
``init_x_linear``/``cond_seq_linear``/``positional_encoding``/
``register_tokens``/``modF``/``final_linear`` — mirrored in archs.py):

* learned positional encoding + register tokens prepended to the text
  stream;
* double layers: separate cond (``w1*``/``mlpC``/``modC``) and image
  (``w2*``/``mlpX``/``modX``) parameter sets with joint attention;
* single layers: one stream over the concatenation (``w1*``/``mlp``/
  ``modCX``);
* SwiGLU-style MLP ``c_proj(silu(c_fc1(x)) · c_fc2(x))``; modulations are
  6-chunk (shift/scale/gate ×2), final ``modF`` is 2-chunk;
* per-head qk layer-norm WITHOUT affine weights (AuraFlow's published
  training-stability feature) — weightless, so it never shows up in the
  checkpoint key set and must be applied unconditionally.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, layer_norm, linear
from .flux import timestep_embedding


@dataclasses.dataclass(frozen=True)
class AuraConfig:
    hidden: int
    n_heads: int
    depth_double: int
    depth_single: int
    patch_size: int = 2
    in_channels: int = 4
    cond_dim: int = 2048
    n_register_tokens: int = 8

    @staticmethod
    def from_state_dict(sd) -> "AuraConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        hidden, in_feat = shape("init_x_linear.weight")
        nd = 0
        while f"double_layers.{nd}.attn.w2q.weight" in sd:
            nd += 1
        ns = 0
        while f"single_layers.{ns}.attn.w1q.weight" in sd:
            ns += 1
        regs = shape("register_tokens")[-2]
        return AuraConfig(
            hidden=int(hidden), n_heads=int(hidden) // 256,
            depth_double=nd, depth_single=ns,
            in_channels=int(in_feat) // 4,
            cond_dim=int(shape("cond_seq_linear.weight")[1]),
            n_register_tokens=int(regs),
        )


def _mlp(params, p, x, qcfg):
    """c_proj(silu(c_fc1 x) · c_fc2 x)."""
    a = linear(x, params[f"{p}.c_fc1.weight"], params.get(f"{p}.c_fc1.bias"),
               cfg=qcfg)
    b = linear(x, params[f"{p}.c_fc2.weight"], params.get(f"{p}.c_fc2.bias"),
               cfg=qcfg)
    h = jax.nn.silu(a.astype(jnp.float32)).astype(a.dtype) * b
    return linear(h, params[f"{p}.c_proj.weight"],
                  params.get(f"{p}.c_proj.bias"), cfg=qcfg)


def _mod(params, key, vec, n, qcfg):
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    out = linear(v, params[f"{key}.1.weight"], params.get(f"{key}.1.bias"),
                 cfg=qcfg)
    return jnp.split(out[:, None, :], n, axis=-1)


def _heads(x, n):
    B, L, D = x.shape
    return x.reshape(B, L, n, D // n).transpose(0, 2, 1, 3)


def _qk_norm(x):
    """Per-head LayerNorm over head_dim, no affine (AuraFlow qk-norm).

    eps matches torch's nn.LayerNorm default (1e-5) — the published
    implementation constructs it with default eps."""
    return layer_norm(x, eps=1e-5)


def _attn_joint(q, k, v):
    from ..nn.attention import dot_product_attention

    out = dot_product_attention(q, k, v)
    B, H, L, D = out.shape
    return out.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def _double_layer(p, c, x, vec, cfg: AuraConfig, qcfg):
    """One double layer over its UNPREFIXED param subtree ``p``
    (scan-compatible: runs under lax.scan with stacked params in
    forward_stacked and in the python loop in forward)."""
    H = cfg.n_heads
    c_sh1, c_sc1, c_g1, c_sh2, c_sc2, c_g2 = _mod(p, "modC", vec, 6,
                                                  qcfg)
    x_sh1, x_sc1, x_g1, x_sh2, x_sc2, x_g2 = _mod(p, "modX", vec, 6,
                                                  qcfg)
    c_mod = layer_norm(c) * (1 + c_sc1) + c_sh1
    x_mod = layer_norm(x) * (1 + x_sc1) + x_sh1

    cq = _qk_norm(_heads(linear(c_mod, p["attn.w1q.weight"],
                                cfg=qcfg), H))
    ck = _qk_norm(_heads(linear(c_mod, p["attn.w1k.weight"],
                                cfg=qcfg), H))
    cv = _heads(linear(c_mod, p["attn.w1v.weight"], cfg=qcfg), H)
    xq = _qk_norm(_heads(linear(x_mod, p["attn.w2q.weight"],
                                cfg=qcfg), H))
    xk = _qk_norm(_heads(linear(x_mod, p["attn.w2k.weight"],
                                cfg=qcfg), H))
    xv = _heads(linear(x_mod, p["attn.w2v.weight"], cfg=qcfg), H)

    q = jnp.concatenate([cq, xq], axis=2)
    k = jnp.concatenate([ck, xk], axis=2)
    v = jnp.concatenate([cv, xv], axis=2)
    a = _attn_joint(q, k, v)
    Lc = c.shape[1]
    c_a, x_a = a[:, :Lc], a[:, Lc:]

    c = c + c_g1 * linear(c_a, p["attn.w1o.weight"], cfg=qcfg)
    c = c + c_g2 * _mlp(p, "mlpC",
                        layer_norm(c) * (1 + c_sc2) + c_sh2, qcfg)
    x = x + x_g1 * linear(x_a, p["attn.w2o.weight"], cfg=qcfg)
    x = x + x_g2 * _mlp(p, "mlpX",
                        layer_norm(x) * (1 + x_sc2) + x_sh2, qcfg)
    return c, x


def _single_layer(p, cx, vec, cfg: AuraConfig, qcfg):
    """One single layer over its UNPREFIXED param subtree ``p`` (scan-compatible)."""
    H = cfg.n_heads
    sh1, sc1, g1, sh2, sc2, g2 = _mod(p, "modCX", vec, 6, qcfg)
    m = layer_norm(cx) * (1 + sc1) + sh1
    q = _qk_norm(_heads(linear(m, p["attn.w1q.weight"], cfg=qcfg),
                        H))
    k = _qk_norm(_heads(linear(m, p["attn.w1k.weight"], cfg=qcfg),
                        H))
    v = _heads(linear(m, p["attn.w1v.weight"], cfg=qcfg), H)
    a = _attn_joint(q, k, v)
    cx = cx + g1 * linear(a, p["attn.w1o.weight"], cfg=qcfg)
    cx = cx + g2 * _mlp(p, "mlp",
                        layer_norm(cx) * (1 + sc2) + sh2, qcfg)
    return cx


def _prelude(params, cfg: AuraConfig, latent, cond, timesteps, qcfg):
    B, Hh, Ww, C = latent.shape
    p = cfg.patch_size
    h_tok, w_tok = Hh // p, Ww // p

    # patchify → init_x_linear + learned positional encoding (cropped)
    xp = latent.reshape(B, h_tok, p, w_tok, p, C).transpose(0, 1, 3, 5, 2, 4)
    xp = xp.reshape(B, h_tok * w_tok, C * p * p)
    x = linear(xp, params["init_x_linear.weight"],
               params.get("init_x_linear.bias"), cfg=qcfg)
    pos = jnp.asarray(params["positional_encoding"])
    if pos.ndim == 2:
        pos = pos[None]
    x = x + pos[:, : x.shape[1]].astype(x.dtype)

    t = timestep_embedding(timesteps, 256, time_factor=1.0).astype(x.dtype)
    vec = linear(t, params["t_embedder.mlp.0.weight"],
                 params.get("t_embedder.mlp.0.bias"), cfg=qcfg)
    vec = jax.nn.silu(vec.astype(jnp.float32)).astype(x.dtype)
    vec = linear(vec, params["t_embedder.mlp.2.weight"],
                 params.get("t_embedder.mlp.2.bias"), cfg=qcfg)

    c = linear(cond, params["cond_seq_linear.weight"], cfg=qcfg)
    regs = jnp.asarray(params["register_tokens"])
    if regs.ndim == 2:
        regs = regs[None]
    c = jnp.concatenate(
        [jnp.broadcast_to(regs.astype(c.dtype),
                          (B, regs.shape[-2], c.shape[-1])), c], axis=1)

    # c/vec ride the scan-body closures in forward_stacked; fix dtypes
    return c.astype(x.dtype), x, vec.astype(x.dtype), (B, Hh, Ww, C,
                                                       h_tok, w_tok)


def _head(params, cfg: AuraConfig, x, vec, dims, qcfg):
    B, Hh, Ww, C, h_tok, w_tok = dims
    p = cfg.patch_size
    shift, scale = _mod(params, "modF", vec, 2, qcfg)
    x = layer_norm(x) * (1 + scale) + shift
    x = linear(x, params["final_linear.weight"], cfg=qcfg)

    x = x.reshape(B, h_tok, w_tok, C, p, p)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(B, Hh, Ww, C)


def forward(params, cfg: AuraConfig, latent: jax.Array, cond: jax.Array,
            timesteps: jax.Array,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """latent (B, H, W, C) NHWC; cond (B, L, cond_dim) T5 states."""
    from .flux import block_subtree

    c, x, vec, dims = _prelude(params, cfg, latent, cond, timesteps, qcfg)
    for i in range(cfg.depth_double):
        c, x = _double_layer(block_subtree(params, f"double_layers.{i}."),
                             c, x, vec, cfg, qcfg)
    cx = jnp.concatenate([c, x], axis=1)
    for i in range(cfg.depth_single):
        cx = _single_layer(block_subtree(params, f"single_layers.{i}."),
                           cx, vec, cfg, qcfg)
    return _head(params, cfg, cx[:, c.shape[1]:], vec, dims, qcfg)


def stack_aura_params(params: dict, cfg: AuraConfig) -> dict:
    """Flat GGUF-keyed params → {non-layer keys, "double_layers": stacked
    subtree, "single_layers": stacked subtree} for the scanned forward
    (AuraFlow layers are homogeneous within each kind)."""
    from .flux import stack_block_groups

    return stack_block_groups(params,
                              [("double_layers", cfg.depth_double),
                               ("single_layers", cfg.depth_single)],
                              arch="aura")


def forward_stacked(sparams: dict, cfg: AuraConfig, latent: jax.Array,
                    cond: jax.Array, timesteps: jax.Array,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_aura_params() output — identical math, one
    lax.scan per layer kind (zero-copy packed weights via IndexedQuant
    scalar prefetch, flux.scan_blocks)."""
    from .flux import scan_blocks

    c, x, vec, dims = _prelude(sparams, cfg, latent, cond, timesteps, qcfg)

    def dbody(carry, bp):
        cc, xx = carry
        return _double_layer(bp, cc, xx, vec, cfg, qcfg)

    c, x = scan_blocks(sparams["double_layers"], dbody, (c, x),
                       cfg.depth_double)
    cx = jnp.concatenate([c, x], axis=1)

    def sbody(cx, bp):
        return _single_layer(bp, cx, vec, cfg, qcfg)

    cx = scan_blocks(sparams["single_layers"], sbody, cx, cfg.depth_single)
    return _head(sparams, cfg, cx[:, c.shape[1]:], vec, dims, qcfg)
