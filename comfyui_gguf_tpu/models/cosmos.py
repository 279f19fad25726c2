"""NVIDIA Cosmos Predict2 DiT (arch "cosmos" in the reference allowlist).

Grounded key facts from the reference: fingerprint
``blocks.0.mlp.layer1.weight`` + ``blocks.0.adaln_modulation_cross_attn.1
.weight`` (reference tools/convert.py:64-72), fp32-forced ``pos_embedder``
(keys_hiprec), dropped ``_extra_state``/``accum_`` keys (keys_ignore), and
quantizer exclusions incl. ``t_embedding_norm`` (tools/lcpp.patch:408-415);
the ffn-down tier-bump list naming ``.adaln_modulation_mlp.2.weight``
(lcpp.patch:193) pins the per-branch adaLN Sequential layout.

Block: three per-branch adaLN modulations (self-attn / cross-attn / mlp),
each (shift, scale, gate); RMS-qk self-attention with RoPE, cross-attention
to text, gelu MLP (layer1/layer2).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, layer_norm, linear, rms_norm
from .flux import timestep_embedding
from .wan import rope_3d, _apply_rope, _heads, _attn


@dataclasses.dataclass(frozen=True)
class CosmosConfig:
    dim: int
    n_layers: int
    n_heads: int
    in_channels: int = 16
    text_dim: int = 1024
    patch: tuple[int, int, int] = (1, 2, 2)
    # TP divides n_heads per shard; the true head_dim (and the rope axes
    # derived from it) must survive (parallel/tp_spec.tp_cosmos_forward)
    head_dim_override: int | None = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.dim // self.n_heads

    @property
    def axes_dim(self) -> tuple[int, int, int]:
        hd = self.head_dim
        hw = 2 * (hd // 6)
        return (hd - 2 * hw, hw, hw)

    @staticmethod
    def from_state_dict(sd) -> "CosmosConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        dim = shape("blocks.0.mlp.layer1.weight")[1]
        qn = shape("blocks.0.self_attn.q_norm.weight")[0]
        n = 0
        while f"blocks.{n}.mlp.layer1.weight" in sd:
            n += 1
        ctx = shape("blocks.0.cross_attn.k_proj.weight")[1]
        return CosmosConfig(dim=int(dim), n_layers=n,
                            n_heads=int(dim) // int(qn), text_dim=int(ctx))


def _mod3(params, key, vec, qcfg):
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    out = linear(v, params[f"{key}.1.weight"], params.get(f"{key}.1.bias"),
                 cfg=qcfg)
    if f"{key}.2.weight" in params:  # extra Linear in the Sequential
        out = linear(out, params[f"{key}.2.weight"],
                     params.get(f"{key}.2.bias"), cfg=qcfg)
    return jnp.split(out[:, None, :], 3, axis=-1)


def _proj_heads(params, name, x, H, qcfg, norm=None):
    h = linear(x, params[f"{name}.weight"],
               params.get(f"{name}.bias"), cfg=qcfg)
    h = _heads(h, H)
    if norm is not None and f"{norm}.weight" in params:
        h = rms_norm(h, params[f"{norm}.weight"], eps=1e-6)
    return h


def _block(bp, x, ctx, vec, pe, cfg: CosmosConfig, qcfg):
    """One Cosmos block over its UNPREFIXED param subtree ``bp``
    (scan-compatible: runs under lax.scan with stacked params in
    forward_stacked and in the python loop in forward)."""
    H = cfg.n_heads

    sh, sc, g = _mod3(bp, "adaln_modulation_self_attn", vec, qcfg)
    h = layer_norm(x, eps=1e-6) * (1 + sc) + sh
    q = _proj_heads(bp, "self_attn.q_proj", h, H, qcfg,
                    "self_attn.q_norm")
    k = _proj_heads(bp, "self_attn.k_proj", h, H, qcfg,
                    "self_attn.k_norm")
    v = _proj_heads(bp, "self_attn.v_proj", h, H, qcfg)
    q = _apply_rope(q, pe)
    k = _apply_rope(k, pe)
    a = linear(_attn(q, k, v), bp["self_attn.output_proj.weight"],
               bp.get("self_attn.output_proj.bias"), cfg=qcfg)
    x = x + g * a

    sh, sc, g = _mod3(bp, "adaln_modulation_cross_attn", vec, qcfg)
    h = layer_norm(x, eps=1e-6) * (1 + sc) + sh
    q = _proj_heads(bp, "cross_attn.q_proj", h, H, qcfg,
                    "cross_attn.q_norm")
    k = _proj_heads(bp, "cross_attn.k_proj", ctx, H, qcfg,
                    "cross_attn.k_norm")
    v = _proj_heads(bp, "cross_attn.v_proj", ctx, H, qcfg)
    a = linear(_attn(q, k, v), bp["cross_attn.output_proj.weight"],
               bp.get("cross_attn.output_proj.bias"), cfg=qcfg)
    x = x + g * a

    sh, sc, g = _mod3(bp, "adaln_modulation_mlp", vec, qcfg)
    h = layer_norm(x, eps=1e-6) * (1 + sc) + sh
    h = linear(h, bp["mlp.layer1.weight"],
               bp.get("mlp.layer1.bias"), cfg=qcfg)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    h = linear(h, bp["mlp.layer2.weight"],
               bp.get("mlp.layer2.bias"), cfg=qcfg)
    return x + g * h


def _prelude(params, cfg: CosmosConfig, latent, context, timesteps, qcfg):
    B, F, Hh, Ww, C = latent.shape
    pt, ph, pw = cfg.patch
    f, h_, w_ = F // pt, Hh // ph, Ww // pw

    xp = latent.reshape(B, f, pt, h_, ph, w_, pw, C)
    xp = xp.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
        B, f * h_ * w_, C * pt * ph * pw)
    key = ("x_embedder.proj.1.weight"
           if "x_embedder.proj.1.weight" in params else "x_embedder.proj.weight")
    x = linear(xp, params[key],
               params.get(key.replace("weight", "bias")), cfg=qcfg)

    temb = timestep_embedding(timesteps, 256).astype(x.dtype)
    pre = ("t_embedder.1" if "t_embedder.1.linear_1.weight" in params
           else "t_embedder")
    vec = linear(temb, params[f"{pre}.linear_1.weight"],
                 params.get(f"{pre}.linear_1.bias"), cfg=qcfg)
    vec = jax.nn.silu(vec.astype(jnp.float32)).astype(x.dtype)
    vec = linear(vec, params[f"{pre}.linear_2.weight"],
                 params.get(f"{pre}.linear_2.bias"), cfg=qcfg)
    if "t_embedding_norm.weight" in params:
        vec = rms_norm(vec, params["t_embedding_norm.weight"], eps=1e-6)

    pe = rope_3d(f, h_, w_, cfg.axes_dim)
    # ctx/vec ride the scan-body closure in forward_stacked; fix dtypes
    return (x, context.astype(x.dtype), vec.astype(x.dtype), pe,
            (B, F, Hh, Ww, C, f, h_, w_))


def _head(params, cfg: CosmosConfig, x, vec, dims, qcfg):
    B, F, Hh, Ww, C, f, h_, w_ = dims
    pt, ph, pw = cfg.patch
    if "final_layer.adaln_modulation.1.weight" in params:
        v = jax.nn.silu(vec.astype(jnp.float32)).astype(x.dtype)
        mod = linear(v, params["final_layer.adaln_modulation.1.weight"],
                     params.get("final_layer.adaln_modulation.1.bias"),
                     cfg=qcfg)
        chunks = jnp.split(mod[:, None, :], mod.shape[-1] // cfg.dim, axis=-1)
        sh, sc = chunks[0], chunks[1]
    else:
        sh = sc = jnp.zeros((1, 1, 1), x.dtype)
    x = layer_norm(x, eps=1e-6) * (1 + sc) + sh
    x = linear(x, params["final_layer.linear.weight"],
               params.get("final_layer.linear.bias"), cfg=qcfg)
    x = x.reshape(B, f, h_, w_, C, pt, ph, pw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(B, F, Hh, Ww, C)


def forward(params, cfg: CosmosConfig, latent: jax.Array, context: jax.Array,
            timesteps: jax.Array,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """latent (B, F, H, W, C) NDHWC; context (B, L, text_dim)."""
    from .flux import block_subtree

    x, ctx, vec, pe, dims = _prelude(params, cfg, latent, context,
                                     timesteps, qcfg)
    for i in range(cfg.n_layers):
        x = _block(block_subtree(params, f"blocks.{i}."), x, ctx, vec, pe,
                   cfg, qcfg)
    return _head(params, cfg, x, vec, dims, qcfg)


def stack_cosmos_params(params: dict, cfg: CosmosConfig) -> dict:
    """Flat GGUF-keyed params → {non-block keys, "blocks": stacked
    subtree over the depth axis} for the scanned forward. Cosmos blocks
    are fully homogeneous."""
    from .flux import stack_block_groups

    return stack_block_groups(params, [("blocks", cfg.n_layers)],
                              arch="cosmos")


def forward_stacked(sparams: dict, cfg: CosmosConfig, latent: jax.Array,
                    context: jax.Array, timesteps: jax.Array,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_cosmos_params() output — identical math, one
    lax.scan over the stacked blocks (zero-copy packed weights via
    IndexedQuant scalar prefetch, flux.scan_blocks)."""
    from .flux import scan_blocks

    x, ctx, vec, pe, dims = _prelude(sparams, cfg, latent, context,
                                     timesteps, qcfg)

    def body(x, bp):
        return _block(bp, x, ctx, vec, pe, cfg, qcfg)

    x = scan_blocks(sparams["blocks"], body, x, cfg.n_layers)
    return _head(sparams, cfg, x, vec, dims, qcfg)
