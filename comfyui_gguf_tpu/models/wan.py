"""Wan 2.1 video DiT (t2v; arch "wan" in the reference allowlist).

Host-owned graph in the reference (ComfyUI); the reference's converter
handles its >4-D conv3d patch embed via the 5-D sidecar flow (reference
tools/convert.py:84-91 + tools/fix_5d_tensors.py) and its quantizer keeps
``.modulation``/embedding tensors unquantized (reference
tools/lcpp.patch:389-397) — both of which this framework's loader/tools
already honor. This module adds the native forward graph.

Public Wan 2.1 architecture: (1,2,2) conv3d patchify, sinusoidal time
embedding → per-block 6-chunk modulation added to a learned per-block
modulation table, self-attention with 3-D RoPE + RMS qk-norm,
cross-attention to UMT5 text states, GELU-tanh FFN, 2-chunk modulated head.
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
    rms_norm,
)
from .flux import timestep_embedding


@dataclasses.dataclass(frozen=True)
class WanConfig:
    dim: int
    ffn_dim: int
    n_heads: int
    n_layers: int
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    patch: tuple[int, int, int] = (1, 2, 2)
    rope_axes: tuple[int, ...] = ()  # filled from head_dim in __post_init__
    # tensor parallelism divides n_heads per shard; the TRUE head_dim
    # (and the rope axes derived from it) must survive, so the TP
    # wrapper pins it here (parallel/tp_spec.tp_wan_forward)
    head_dim_override: int | None = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.dim // self.n_heads

    @property
    def axes_dim(self) -> tuple[int, int, int]:
        # Wan convention: head_dim split (t, h, w) with h = w = hd//3 rounded
        # to even, t the remainder
        hd = self.head_dim
        hw = 2 * (hd // 6)
        return (hd - 2 * hw, hw, hw)

    @staticmethod
    def from_state_dict(sd) -> "WanConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        pe = shape("patch_embedding.weight")  # (dim, C, 1, 2, 2)
        dim = pe[0]
        ffn = shape("blocks.0.ffn.0.weight")[0]
        n = 0
        while f"blocks.{n}.self_attn.q.weight" in sd:
            n += 1
        text_dim = shape("text_embedding.0.weight")[1]
        out_c = shape("head.head.weight")[0] // (pe[2] * pe[3] * pe[4])
        # Wan family uses 128-dim heads (1.3B: 1536/12, 14B: 5120/40)
        return WanConfig(
            dim=int(dim), ffn_dim=int(ffn), n_heads=int(dim) // 128,
            n_layers=n, in_channels=int(pe[1]), out_channels=int(out_c),
            text_dim=int(text_dim),
            patch=(int(pe[2]), int(pe[3]), int(pe[4])),
        )


def rope_3d(f: int, h: int, w: int, axes_dim, theta: float = 10_000.0):
    """(L, hd/2, 2) cos/sin table over (t, y, x) factored positions."""
    parts = []
    grids = np.meshgrid(np.arange(f), np.arange(h), np.arange(w),
                        indexing="ij")
    for i, d in enumerate(axes_dim):
        pos = grids[i].reshape(-1).astype(np.float32)  # (L,)
        omega = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float32) / d))
        ang = pos[:, None] * omega[None]
        parts.append(np.stack([np.cos(ang), np.sin(ang)], axis=-1))
    return jnp.asarray(np.concatenate(parts, axis=1))  # (L, hd/2, 2)


def _apply_rope(x: jax.Array, pe: jax.Array) -> jax.Array:
    """x (B, H, L, D); pe (L, D/2, 2)."""
    B, H, L, D = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, L, D // 2, 2)
    cos = pe[None, None, :, :, 0]
    sin = pe[None, None, :, :, 1]
    real = xf[..., 0] * cos - xf[..., 1] * sin
    imag = xf[..., 0] * sin + xf[..., 1] * cos
    return jnp.stack([real, imag], axis=-1).reshape(B, H, L, D).astype(x.dtype)


def _heads(x, n):
    B, L, D = x.shape
    return x.reshape(B, L, n, D // n).transpose(0, 2, 1, 3)


def _unheads(x):
    B, H, L, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def _attn(q, k, v):
    from ..nn.attention import dot_product_attention

    return _unheads(dot_product_attention(q, k, v))


def _block(p, x, e0, ctx, pe, cfg: WanConfig, qcfg):
    """One Wan block over its UNPREFIXED param subtree ``p``
    (scan-compatible: runs under lax.scan with stacked params in
    forward_stacked and in the python loop in forward)."""
    H = cfg.n_heads
    # 6-chunk modulation: learned table + time projection
    mod = (p["modulation"].reshape(1, 6, cfg.dim)
           + e0.reshape(-1, 6, cfg.dim)).astype(x.dtype)
    sh1, sc1, g1, sh2, sc2, g2 = [mod[:, j][:, None] for j in range(6)]

    # Wan applies full-width RMS norms on q/k before the head split
    h = layer_norm(x, eps=1e-6) * (1 + sc1) + sh1
    q = _heads(rms_norm(linear(h, p["self_attn.q.weight"],
                               p.get("self_attn.q.bias"), cfg=qcfg),
                        p["self_attn.norm_q.weight"], eps=1e-6), H)
    k = _heads(rms_norm(linear(h, p["self_attn.k.weight"],
                               p.get("self_attn.k.bias"), cfg=qcfg),
                        p["self_attn.norm_k.weight"], eps=1e-6), H)
    v = _heads(linear(h, p["self_attn.v.weight"],
                      p.get("self_attn.v.bias"), cfg=qcfg), H)
    q = _apply_rope(q, pe)
    k = _apply_rope(k, pe)
    a = linear(_attn(q, k, v), p["self_attn.o.weight"],
               p.get("self_attn.o.bias"), cfg=qcfg)
    x = x + g1 * a

    # cross attention (norm3 affine LN on input)
    h = layer_norm(x, p.get("norm3.weight"),
                   p.get("norm3.bias"), eps=1e-6)
    q = _heads(rms_norm(linear(h, p["cross_attn.q.weight"],
                                p.get("cross_attn.q.bias"),
                                cfg=qcfg),
                        p["cross_attn.norm_q.weight"], eps=1e-6), H)
    k = _heads(rms_norm(linear(ctx, p["cross_attn.k.weight"],
                               p.get("cross_attn.k.bias"),
                               cfg=qcfg),
                        p["cross_attn.norm_k.weight"], eps=1e-6), H)
    v = _heads(linear(ctx, p["cross_attn.v.weight"],
                      p.get("cross_attn.v.bias"), cfg=qcfg), H)
    x = x + linear(_attn(q, k, v), p["cross_attn.o.weight"],
                   p.get("cross_attn.o.bias"), cfg=qcfg)

    h = layer_norm(x, eps=1e-6) * (1 + sc2) + sh2
    h = linear(h, p["ffn.0.weight"], p.get("ffn.0.bias"),
               cfg=qcfg)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    h = linear(h, p["ffn.2.weight"], p.get("ffn.2.bias"),
               cfg=qcfg)
    return x + g2 * h


def _prelude(params, cfg: WanConfig, latent, context, timesteps, qcfg):
    B, F, Hh, Ww, C = latent.shape
    pt, ph, pw = cfg.patch

    x = conv3d(latent, params["patch_embedding.weight"],
               params.get("patch_embedding.bias"),
               stride=cfg.patch, padding=0, cfg=qcfg)
    f, h, w = F // pt, Hh // ph, Ww // pw
    x = x.reshape(B, f * h * w, cfg.dim)

    ctx = linear(context, params["text_embedding.0.weight"],
                 params.get("text_embedding.0.bias"), cfg=qcfg)
    ctx = jax.nn.gelu(ctx.astype(jnp.float32), approximate=True).astype(
        x.dtype)
    ctx = linear(ctx, params["text_embedding.2.weight"],
                 params.get("text_embedding.2.bias"), cfg=qcfg)
    # ctx rides the closure of the scan body in forward_stacked; keep it
    # in the activation dtype so mixed-precision contexts don't upcast x
    ctx = ctx.astype(x.dtype)

    e = linear(timestep_embedding(timesteps, 256).astype(x.dtype),
               params["time_embedding.0.weight"],
               params.get("time_embedding.0.bias"), cfg=qcfg)
    e = linear(jax.nn.silu(e.astype(jnp.float32)).astype(x.dtype),
               params["time_embedding.2.weight"],
               params.get("time_embedding.2.bias"), cfg=qcfg)
    e0 = linear(jax.nn.silu(e.astype(jnp.float32)).astype(x.dtype),
                params["time_projection.1.weight"],
                params.get("time_projection.1.bias"), cfg=qcfg)

    pe = rope_3d(f, h, w, cfg.axes_dim)
    return x, ctx, e, e0, pe, (B, F, Hh, Ww, f, h, w)


def _head(params, cfg: WanConfig, x, e, dims, qcfg):
    B, F, Hh, Ww, f, h, w = dims
    pt, ph, pw = cfg.patch
    hm = (params["head.modulation"].reshape(1, 2, cfg.dim)
          + e.reshape(-1, 1, cfg.dim)).astype(x.dtype)
    shift, scale = hm[:, 0][:, None], hm[:, 1][:, None]
    x = layer_norm(x, eps=1e-6) * (1 + scale) + shift
    x = linear(x, params["head.head.weight"], params.get("head.head.bias"),
               cfg=qcfg)
    x = x.reshape(B, f, h, w, pt, ph, pw, cfg.out_channels)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, F, Hh, Ww, cfg.out_channels)


def forward(params, cfg: WanConfig, latent: jax.Array, context: jax.Array,
            timesteps: jax.Array,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """latent (B, F, H, W, C) NDHWC, context (B, L, text_dim),
    timesteps (B,) in [0, 1] → velocity latent, same shape."""
    from .flux import block_subtree

    x, ctx, e, e0, pe, dims = _prelude(params, cfg, latent, context,
                                       timesteps, qcfg)
    for i in range(cfg.n_layers):
        x = _block(block_subtree(params, f"blocks.{i}."), x, e0, ctx, pe,
                   cfg, qcfg)
    return _head(params, cfg, x, e, dims, qcfg)


def stack_wan_params(params: dict, cfg: WanConfig) -> dict:
    """Flat GGUF-keyed params → {non-block keys, "blocks": stacked
    subtree over the depth axis} for the scanned forward. Wan t2v blocks
    are fully homogeneous."""
    from .flux import stack_block_groups

    return stack_block_groups(params, [("blocks", cfg.n_layers)],
                              arch="wan")


def forward_stacked(sparams: dict, cfg: WanConfig, latent: jax.Array,
                    context: jax.Array, timesteps: jax.Array,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_wan_params() output — identical math, one
    lax.scan over the stacked blocks (zero-copy packed weights via
    IndexedQuant scalar prefetch, flux.scan_blocks)."""
    from .flux import scan_blocks

    x, ctx, e, e0, pe, dims = _prelude(sparams, cfg, latent, context,
                                       timesteps, qcfg)

    def body(x, bp):
        return _block(bp, x, e0, ctx, pe, cfg, qcfg)

    x = scan_blocks(sparams["blocks"], body, x, cfg.n_layers)
    return _head(sparams, cfg, x, e, dims, qcfg)
