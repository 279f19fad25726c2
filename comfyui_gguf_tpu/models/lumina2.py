"""Lumina Image 2.0 NextDiT (arch "lumina2" in the reference allowlist).

Key set per the detection fingerprint (reference tools/convert.py:144-148:
``cap_embedder.1.weight`` + ``context_refiner.0.attention.qkv.weight``) and
quantizer exclusions (tools/lcpp.patch:416-424: t/x/cap embedders,
final_layer, context_refiner, noise_refiner — mirrored in archs.py).

NextDiT block structure (published Lumina-Next/2.0 design): sandwich
RMSNorms around attention/FFN, scale-only adaLN (4 chunks: scale/gate ×2,
gates tanh-squashed), fused qkv with per-head RMS qk-norm, SwiGLU FFN,
factored multi-axis RoPE over caller-supplied position ids. Context
refiner blocks are the same minus adaLN; noise refiner blocks modulate on
the timestep vector; main layers run on the concatenated [cap, img]
sequence.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, linear, rms_norm
from .flux import timestep_embedding


@dataclasses.dataclass(frozen=True)
class Lumina2Config:
    dim: int
    n_layers: int
    n_refiner: int
    n_heads: int
    patch_size: int = 2
    in_channels: int = 16
    cap_dim: int = 2304
    axes_dim: tuple[int, ...] = (32, 32, 32)  # (t, h, w) of head_dim 96? set
    # from head_dim at detection
    # TP divides n_heads per shard; the true head_dim must survive
    # (parallel/tp_spec.tp_lumina2_forward)
    head_dim_override: int | None = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.dim // self.n_heads

    @staticmethod
    def from_state_dict(sd) -> "Lumina2Config":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        dim, in_feat = shape("x_embedder.weight")
        qn = shape("layers.0.attention.q_norm.weight")[0]
        n = 0
        while f"layers.{n}.attention.qkv.weight" in sd:
            n += 1
        nr = 0
        while f"noise_refiner.{nr}.attention.qkv.weight" in sd:
            nr += 1
        hd = int(qn)
        third = 2 * (hd // 6)
        return Lumina2Config(
            dim=int(dim), n_layers=n, n_refiner=nr,
            n_heads=int(dim) // hd, in_channels=int(in_feat) // 4,
            cap_dim=int(shape("cap_embedder.1.weight")[1]),
            axes_dim=(hd - 2 * third, third, third),
        )


# rope table/rotation shared with flux (verbatim-identical math)
from .flux import apply_rope as _apply_rope, rope_freqs as _rope  # noqa: E402


def _block(p, x, vec, pe, cfg: Lumina2Config, qcfg):
    """One NextDiT block over its UNPREFIXED param subtree ``p``
    (scan-compatible); ``vec=None`` → un-modulated (context refiner)."""
    H = cfg.n_heads
    if vec is not None and "adaLN_modulation.1.weight" in p:
        v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
        mod = linear(v, p["adaLN_modulation.1.weight"],
                     p.get("adaLN_modulation.1.bias"), cfg=qcfg)
        sc_msa, g_msa, sc_mlp, g_mlp = jnp.split(mod[:, None, :], 4, axis=-1)
        g_msa = jnp.tanh(g_msa.astype(jnp.float32)).astype(x.dtype)
        g_mlp = jnp.tanh(g_mlp.astype(jnp.float32)).astype(x.dtype)
    else:
        sc_msa = sc_mlp = jnp.zeros((1, 1, 1), x.dtype)
        g_msa = g_mlp = jnp.ones((1, 1, 1), x.dtype)

    h = rms_norm(x, p.get("attention_norm1.weight")) * (1 + sc_msa)
    qkv = linear(h, p["attention.qkv.weight"],
                 p.get("attention.qkv.bias"), cfg=qcfg)
    B, L, _ = h.shape
    q, k, v_ = jnp.split(qkv, 3, axis=-1)
    hd = cfg.head_dim
    q = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    v_ = v_.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    q = rms_norm(q, p["attention.q_norm.weight"], eps=1e-6)
    k = rms_norm(k, p["attention.k_norm.weight"], eps=1e-6)
    if pe is not None:
        q = _apply_rope(q, pe)
        k = _apply_rope(k, pe)
    from ..nn.attention import dot_product_attention

    a = dot_product_attention(q, k, v_).transpose(0, 2, 1, 3).reshape(
        B, L, H * hd)
    a = linear(a, p["attention.out.weight"],
               p.get("attention.out.bias"), cfg=qcfg)
    x = x + g_msa * rms_norm(a, p.get("attention_norm2.weight"))

    h = rms_norm(x, p.get("ffn_norm1.weight")) * (1 + sc_mlp)
    w1 = linear(h, p["feed_forward.w1.weight"], cfg=qcfg)
    w3 = linear(h, p["feed_forward.w3.weight"], cfg=qcfg)
    ff = jax.nn.silu(w1.astype(jnp.float32)).astype(h.dtype) * w3
    ff = linear(ff, p["feed_forward.w2.weight"], cfg=qcfg)
    return x + g_mlp * rms_norm(ff, p.get("ffn_norm2.weight"))


def _prelude(params, cfg: Lumina2Config, latent, cap, timesteps, qcfg):
    B, Hh, Ww, C = latent.shape
    p = cfg.patch_size
    h_tok, w_tok = Hh // p, Ww // p

    xp = latent.reshape(B, h_tok, p, w_tok, p, C).transpose(0, 1, 3, 5, 2, 4)
    xp = xp.reshape(B, h_tok * w_tok, C * p * p)
    x = linear(xp, params["x_embedder.weight"],
               params.get("x_embedder.bias"), cfg=qcfg)

    t = timestep_embedding(timesteps, 256, time_factor=1.0).astype(x.dtype)
    vec = linear(t, params["t_embedder.mlp.0.weight"],
                 params.get("t_embedder.mlp.0.bias"), cfg=qcfg)
    vec = jax.nn.silu(vec.astype(jnp.float32)).astype(x.dtype)
    vec = linear(vec, params["t_embedder.mlp.2.weight"],
                 params.get("t_embedder.mlp.2.bias"), cfg=qcfg)

    c = rms_norm(cap, params.get("cap_embedder.0.weight"))
    c = linear(c, params["cap_embedder.1.weight"],
               params.get("cap_embedder.1.bias"), cfg=qcfg)

    # position ids: cap tokens along axis 0; image rows/cols on axes 1/2
    Lc = c.shape[1]
    cap_ids = np.zeros((1, Lc, 3), np.int32)
    cap_ids[0, :, 0] = np.arange(Lc)
    img_ids = np.zeros((1, h_tok * w_tok, 3), np.int32)
    img_ids[0, :, 0] = Lc
    img_ids[0, :, 1] = np.repeat(np.arange(h_tok), w_tok)
    img_ids[0, :, 2] = np.tile(np.arange(w_tok), h_tok)
    pe_cap = _rope(jnp.asarray(np.broadcast_to(cap_ids, (B, Lc, 3))),
                   cfg.axes_dim)
    pe_img = _rope(jnp.asarray(np.broadcast_to(img_ids,
                                               (B, h_tok * w_tok, 3))),
                   cfg.axes_dim)

    from .flux import block_subtree

    for i in range(_count(params, "context_refiner")):
        c = _block(block_subtree(params, f"context_refiner.{i}."), c, None,
                   pe_cap, cfg, qcfg)
    for i in range(cfg.n_refiner):
        x = _block(block_subtree(params, f"noise_refiner.{i}."), x, vec,
                   pe_img, cfg, qcfg)

    cx = jnp.concatenate([c, x], axis=1)
    pe = jnp.concatenate([pe_cap, pe_img], axis=1)
    # cap/vec ride the scan-body closure in forward_stacked; fix dtypes
    return (cx.astype(x.dtype), vec.astype(x.dtype), pe, Lc,
            (B, Hh, Ww, C, h_tok, w_tok))


def _head(params, cfg: Lumina2Config, x, vec, dims, qcfg):
    B, Hh, Ww, C, h_tok, w_tok = dims
    p = cfg.patch_size
    x = rms_norm(x, params.get("norm_final.weight"))
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(x.dtype)
    mod = linear(v, params["final_layer.adaLN_modulation.1.weight"],
                 params.get("final_layer.adaLN_modulation.1.bias"), cfg=qcfg)
    if mod.shape[-1] == 2 * cfg.dim:
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
    else:
        scale = mod[:, None, :]
        shift = 0.0
    x = x * (1 + scale) + shift
    x = linear(x, params["final_layer.linear.weight"],
               params.get("final_layer.linear.bias"), cfg=qcfg)
    x = x.reshape(B, h_tok, w_tok, p, p, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hh, Ww, C)


def forward(params, cfg: Lumina2Config, latent: jax.Array, cap: jax.Array,
            timesteps: jax.Array,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """latent (B, H, W, C) NHWC; cap (B, Lc, cap_dim) Gemma states."""
    from .flux import block_subtree

    cx, vec, pe, Lc, dims = _prelude(params, cfg, latent, cap, timesteps,
                                     qcfg)
    for i in range(cfg.n_layers):
        cx = _block(block_subtree(params, f"layers.{i}."), cx, vec, pe,
                    cfg, qcfg)
    return _head(params, cfg, cx[:, Lc:], vec, dims, qcfg)


def stack_lumina2_params(params: dict, cfg: Lumina2Config) -> dict:
    """Flat GGUF-keyed params → {non-layer keys, "layers": stacked
    subtree} for the scanned forward. The context/noise refiners (few
    blocks) stay flat and run unrolled in the prelude."""
    from .flux import stack_block_groups

    return stack_block_groups(params, [("layers", cfg.n_layers)],
                              arch="lumina2")


def forward_stacked(sparams: dict, cfg: Lumina2Config, latent: jax.Array,
                    cap: jax.Array, timesteps: jax.Array,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_lumina2_params() output — identical math, one
    lax.scan over the stacked main layers (zero-copy packed weights via
    IndexedQuant scalar prefetch, flux.scan_blocks)."""
    from .flux import scan_blocks

    cx, vec, pe, Lc, dims = _prelude(sparams, cfg, latent, cap, timesteps,
                                     qcfg)

    def body(cx, bp):
        return _block(bp, cx, vec, pe, cfg, qcfg)

    cx = scan_blocks(sparams["layers"], body, cx, cfg.n_layers)
    return _head(sparams, cfg, cx[:, Lc:], vec, dims, qcfg)


def _count(params, section):
    n = 0
    while f"{section}.{n}.attention.qkv.weight" in params:
        n += 1
    return n
