"""LTX-Video DiT (arch "ltxv" in the reference allowlist).

PixArt-lineage video transformer: per-block learned ``scale_shift_table``
added to a single shared adaLN projection (``adaln_single``), RMS-normed
modulated self-attention with 3-axis RoPE (qk-norm applied ACROSS heads —
one RMS over the full inner dim, weight ``(dim,)`` — per the published
implementation; a per-head ``(head_dim,)`` weight is also accepted),
un-modulated cross-attention to T5 states, gelu-approx feed-forward,
2-chunk modulated projection head.
The reference's quantizer keeps ``scale_shift_table``/``adaln_single``/
``caption_projection``/``patchify_proj``/``proj_out`` unquantized
(reference tools/lcpp.patch:369-376) and its converter stores
``scale_shift_table`` in fp32 (tools/convert.py keys_hiprec) — the
archs.py policy mirrors both.

RoPE positions are supplied by the caller as (B, L, 3) voxel coordinates
(frame, row, col), so fractional/scaled coordinate conventions are the
caller's choice; head dim is split across the three axes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, linear, rms_norm
from .flux import timestep_embedding


@dataclasses.dataclass(frozen=True)
class LTXVConfig:
    dim: int
    n_layers: int
    n_heads: int
    in_channels: int
    caption_dim: int = 4096
    head_dim: int = 64

    @property
    def axes_dim(self) -> tuple[int, int, int]:
        hd = self.head_dim
        hw = 2 * (hd // 6)
        return (hd - 2 * hw, hw, hw)

    @staticmethod
    def from_state_dict(sd) -> "LTXVConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        dim, in_ch = shape("patchify_proj.weight")
        n = 0
        while f"transformer_blocks.{n}.attn1.to_q.weight" in sd:
            n += 1
        cap = shape("caption_projection.linear_1.weight")[1]
        return LTXVConfig(dim=int(dim), n_layers=n,
                          n_heads=int(dim) // 64, in_channels=int(in_ch),
                          caption_dim=int(cap))


# rope table/rotation shared with flux (verbatim-identical math)
from .flux import apply_rope as _apply_rope, rope_freqs as _rope_from_ids  # noqa: E402


def _heads(x, n):
    B, L, D = x.shape
    return x.reshape(B, L, n, D // n).transpose(0, 2, 1, 3)


def _attention(params, p, xq, xkv, n_heads, qcfg, pe=None):
    q = linear(xq, params[f"{p}.to_q.weight"],
               params.get(f"{p}.to_q.bias"), cfg=qcfg)
    k = linear(xkv, params[f"{p}.to_k.weight"],
               params.get(f"{p}.to_k.bias"), cfg=qcfg)
    v = linear(xkv, params[f"{p}.to_v.weight"],
               params.get(f"{p}.to_v.bias"), cfg=qcfg)
    # qk-norm: LTXV's published impl normalizes ACROSS heads (one RMS
    # over the full inner dim, weight (dim,)) before the head split;
    # dispatch on the stored weight's length so a per-head (head_dim,)
    # variant also works
    normed = False
    if f"{p}.q_norm.weight" in params:
        qn, kn = params[f"{p}.q_norm.weight"], params[f"{p}.k_norm.weight"]
        qn_len = int(np.prod(getattr(qn, "shape", np.shape(qn))))
        if qn_len == q.shape[-1]:  # across heads, pre-split
            q = rms_norm(q, qn, eps=1e-6)
            k = rms_norm(k, kn, eps=1e-6)
            normed = True
    q, k, v = _heads(q, n_heads), _heads(k, n_heads), _heads(v, n_heads)
    if (f"{p}.q_norm.weight" in params and not normed
            and qn_len == q.shape[-1]):  # per-head, post-split
        # `normed` keeps n_heads == 1 (dim == head_dim: both layouts
        # coincide) from applying the weight twice
        q = rms_norm(q, params[f"{p}.q_norm.weight"], eps=1e-6)
        k = rms_norm(k, params[f"{p}.k_norm.weight"], eps=1e-6)
    if pe is not None:
        q = _apply_rope(q, pe)
        k = _apply_rope(k, pe)
    from ..nn.attention import dot_product_attention

    out = dot_product_attention(q, k, v)
    B, H, L, D = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(B, L, H * D)
    return linear(out, params[f"{p}.to_out.0.weight"],
                  params.get(f"{p}.to_out.0.bias"), cfg=qcfg)


def _block(p, x, e6, ctx, pe, cfg: LTXVConfig, qcfg):
    """One LTXV block over its UNPREFIXED param subtree ``p``
    (scan-compatible: runs under lax.scan with stacked params in
    forward_stacked and in the python loop in forward)."""
    ss = (p["scale_shift_table"].reshape(1, 6, cfg.dim)
          + e6).astype(x.dtype)
    sh1, sc1, g1, sh2, sc2, g2 = [ss[:, j][:, None] for j in range(6)]

    h = rms_norm(x, eps=1e-6) * (1 + sc1) + sh1
    x = x + g1 * _attention(p, "attn1", h, h, cfg.n_heads, qcfg, pe=pe)
    # cross-attention, un-modulated (PixArt convention)
    x = x + _attention(p, "attn2", x, ctx, cfg.n_heads, qcfg)
    h = rms_norm(x, eps=1e-6) * (1 + sc2) + sh2
    h = linear(h, p["ff.net.0.proj.weight"],
               p.get("ff.net.0.proj.bias"), cfg=qcfg)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(
        x.dtype)
    return x + g2 * linear(h, p["ff.net.2.weight"],
                           p.get("ff.net.2.bias"), cfg=qcfg)


def _prelude(params, cfg: LTXVConfig, tokens, ids, context, timesteps, qcfg):
    x = linear(tokens, params["patchify_proj.weight"],
               params.get("patchify_proj.bias"), cfg=qcfg)

    # shared adaLN: sinusoid → 2-layer MLP → 6-chunk projection
    pre = "adaln_single.emb.timestep_embedder."
    e = linear(timestep_embedding(timesteps, 256).astype(x.dtype),
               params[pre + "linear_1.weight"],
               params.get(pre + "linear_1.bias"), cfg=qcfg)
    e = jax.nn.silu(e.astype(jnp.float32)).astype(x.dtype)
    e = linear(e, params[pre + "linear_2.weight"],
               params.get(pre + "linear_2.bias"), cfg=qcfg)
    e6 = linear(jax.nn.silu(e.astype(jnp.float32)).astype(x.dtype),
                params["adaln_single.linear.weight"],
                params.get("adaln_single.linear.bias"), cfg=qcfg)
    e6 = e6.reshape(-1, 6, cfg.dim)

    ctx = linear(context, params["caption_projection.linear_1.weight"],
                 params.get("caption_projection.linear_1.bias"), cfg=qcfg)
    ctx = jax.nn.gelu(ctx.astype(jnp.float32), approximate=True).astype(
        x.dtype)
    ctx = linear(ctx, params["caption_projection.linear_2.weight"],
                 params.get("caption_projection.linear_2.bias"), cfg=qcfg)

    pe = _rope_from_ids(ids, cfg.axes_dim)
    # ctx/e6 ride the scan-body closure in forward_stacked; fix dtypes
    return x, ctx.astype(x.dtype), e, e6.astype(x.dtype), pe


def _head(params, cfg: LTXVConfig, x, e, qcfg):
    fin = (params["scale_shift_table"].reshape(1, 2, cfg.dim)
           + e.reshape(-1, 1, cfg.dim)).astype(x.dtype)
    shift, scale = fin[:, 0][:, None], fin[:, 1][:, None]
    x = rms_norm(x, eps=1e-6) * (1 + scale) + shift
    return linear(x, params["proj_out.weight"],
                  params.get("proj_out.bias"), cfg=qcfg)


def forward(params, cfg: LTXVConfig, tokens: jax.Array, ids: jax.Array,
            context: jax.Array, timesteps: jax.Array,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """tokens (B, L, in_channels) latent voxels, ids (B, L, 3) positions,
    context (B, Lc, caption_dim), timesteps (B,) ∈ [0, 1]."""
    from .flux import block_subtree

    x, ctx, e, e6, pe = _prelude(params, cfg, tokens, ids, context,
                                 timesteps, qcfg)
    for i in range(cfg.n_layers):
        x = _block(block_subtree(params, f"transformer_blocks.{i}."),
                   x, e6, ctx, pe, cfg, qcfg)
    return _head(params, cfg, x, e, qcfg)


def stack_ltxv_params(params: dict, cfg: LTXVConfig) -> dict:
    """Flat GGUF-keyed params → {non-block keys, "transformer_blocks":
    stacked subtree over the depth axis} for the scanned forward. LTXV
    blocks are fully homogeneous."""
    from .flux import stack_block_groups

    return stack_block_groups(
        params, [("transformer_blocks", cfg.n_layers)], arch="ltxv")


def forward_stacked(sparams: dict, cfg: LTXVConfig, tokens: jax.Array,
                    ids: jax.Array, context: jax.Array,
                    timesteps: jax.Array,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_ltxv_params() output — identical math, one
    lax.scan over the stacked blocks (zero-copy packed weights via
    IndexedQuant scalar prefetch, flux.scan_blocks)."""
    from .flux import scan_blocks

    x, ctx, e, e6, pe = _prelude(sparams, cfg, tokens, ids, context,
                                 timesteps, qcfg)

    def body(x, bp):
        return _block(bp, x, e6, ctx, pe, cfg, qcfg)

    x = scan_blocks(sparams["transformer_blocks"], body, x, cfg.n_layers)
    return _head(sparams, cfg, x, e, qcfg)
