"""Llama-family text encoders (llama / qwen2vl / qwen3 / qwen3vl archs).

Conditioning encoders for HiDream, Lumina2, HyVid, Qwen-Image — host-owned
in the reference (arch allowlist at reference loader.py:13, key remap via
LLAMA_SD_MAP loader.py:161-178, GQA un-permute loader.py:201-211 — both
applied by our loader). This module is the forward graph over the remapped
HF-style keys: RMSNorm, rotary embeddings, GQA, SwiGLU, optional per-head
q/k norms (Qwen3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, embedding, linear, rms_norm


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    hidden: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    intermediate: int
    vocab_size: int
    head_dim: int
    rope_theta: float = 500_000.0
    eps: float = 1e-5
    qk_norm: bool = False  # qwen3
    # Qwen-VL multimodal rope: rotary half-dims split over the
    # (temporal, height, width) position streams — (16, 24, 24) for
    # head_dim 128 (Qwen2-VL / Qwen2.5-VL rope_scaling.mrope_section).
    # Only engaged when encode() receives 3-D position_ids.
    mrope_section: tuple | None = None

    @staticmethod
    def from_state_dict(sd, n_heads: int = 32,
                        rope_theta: float = 500_000.0) -> "LlamaConfig":
        """Infer dims from weights. ``n_heads`` can't be derived from shapes
        alone — default 32 matches the loader's GQA un-permute assumption
        (reference loader.py:399 uses (32, 8) for L3/Mistral)."""
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        vocab, hidden = shape("model.embed_tokens.weight")
        q_out = shape("model.layers.0.self_attn.q_proj.weight")[0]
        kv_out = shape("model.layers.0.self_attn.k_proj.weight")[0]
        inter = shape("model.layers.0.mlp.gate_proj.weight")[0]
        n = 0
        while f"model.layers.{n}.input_layernorm.weight" in sd:
            n += 1
        head_dim = q_out // n_heads
        return LlamaConfig(
            hidden=int(hidden), n_layers=n, n_heads=n_heads,
            n_kv_heads=int(kv_out) // head_dim, intermediate=int(inter),
            vocab_size=int(vocab), head_dim=head_dim, rope_theta=rope_theta,
            qk_norm="model.layers.0.self_attn.q_norm.weight" in sd,
        )


def _rope(x: jax.Array, pos: jax.Array, theta: float,
          mrope_section=None) -> jax.Array:
    """x: (B, H, L, D) — half-split rotary (HF Llama convention).

    ``pos`` (B, L) is standard 1-D rope; (3, B, L) is Qwen-VL M-RoPE:
    rotary half-dim j takes its position from stream
    ``repeat([t, h, w], mrope_section)[j]`` (HF
    apply_multimodal_rotary_pos_emb semantics)."""
    B, H, L, D = x.shape
    inv = 1.0 / (theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    if pos.ndim == 3:  # (3, B, L) multimodal position streams
        if mrope_section is None:
            # Qwen-VL ratio 2:3:3 over the D/2 rotary half-dims —
            # (16, 24, 24) at head_dim 128
            hw = (D // 2) * 3 // 8
            mrope_section = (D // 2 - 2 * hw, hw, hw)
        sec = np.asarray(mrope_section)
        assert int(sec.sum()) == D // 2, (tuple(sec), D)
        stream = jnp.asarray(np.repeat(np.arange(3), sec))  # (D/2,)
        # ang[b, l, j] = pos[stream[j], b, l] · inv[j]
        psel = jnp.take(pos.astype(jnp.float32), stream, axis=0)
        ang = psel.transpose(1, 2, 0)[:, None] * inv[None, None, None]
    else:
        ang = (pos.astype(jnp.float32)[:, None, :, None]
               * inv[None, None, None])
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : D // 2], xf[..., D // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1)
    return out.astype(x.dtype)


def _attn(params, p, x, mask, pos, cfg: LlamaConfig, qcfg):
    B, L, _ = x.shape
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    q = linear(x, params[f"{p}.q_proj.weight"],
               params.get(f"{p}.q_proj.bias"), cfg=qcfg)
    k = linear(x, params[f"{p}.k_proj.weight"],
               params.get(f"{p}.k_proj.bias"), cfg=qcfg)
    v = linear(x, params[f"{p}.v_proj.weight"],
               params.get(f"{p}.v_proj.bias"), cfg=qcfg)
    q = q.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, L, KV, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, L, KV, D).transpose(0, 2, 1, 3)
    if cfg.qk_norm:
        q = rms_norm(q, params[f"{p}.q_norm.weight"], eps=cfg.eps)
        k = rms_norm(k, params[f"{p}.k_norm.weight"], eps=cfg.eps)
    q = _rope(q, pos, cfg.rope_theta, cfg.mrope_section)
    k = _rope(k, pos, cfg.rope_theta, cfg.mrope_section)
    if KV != H:
        rep = H // KV
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, H * D)
    return linear(out, params[f"{p}.o_proj.weight"],
                  params.get(f"{p}.o_proj.bias"), cfg=qcfg)


def encode(params, cfg: LlamaConfig, ids: jax.Array,
           mask: jax.Array | None = None,
           qcfg: QuantConfig = DEFAULT_CONFIG, dtype=jnp.bfloat16,
           return_layers: tuple[int, ...] = (),
           inputs_embeds: jax.Array | None = None,
           position_ids: jax.Array | None = None):
    """ids (B, L) → dict(last_hidden, layers={i: hidden_before_layer_i}).

    ``return_layers`` selects intermediate activations (HiDream conditions
    on several). ``inputs_embeds`` (B, L, D) bypasses the token embedding
    — the Qwen-VL path splices vision-tower embeddings into the sequence
    (reference loader.py merges the mmproj for exactly this flow).
    ``position_ids``: (B, L) to override the default arange, or (3, B, L)
    Qwen-VL M-RoPE streams (temporal/height/width) — required for spliced
    vision tokens, which carry grid positions, not sequence positions.
    """
    B, L = ids.shape
    if inputs_embeds is not None:
        x = jnp.asarray(inputs_embeds).astype(dtype)
    else:
        x = embedding(ids, params["model.embed_tokens.weight"],
                      cfg=qcfg).astype(dtype)
    if position_ids is not None:
        pos = jnp.asarray(position_ids)
    else:
        pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))

    neg = jnp.finfo(jnp.float32).min
    causal = jnp.triu(jnp.full((L, L), neg), k=1)[None, None]
    if mask is not None:
        causal = causal + jnp.where(mask[:, None, None, :] > 0, 0.0, neg)

    grabbed = {}
    for i in range(cfg.n_layers):
        if i in return_layers:
            grabbed[i] = x
        p = f"model.layers.{i}"
        h = rms_norm(x, params[f"{p}.input_layernorm.weight"], eps=cfg.eps)
        x = x + _attn(params, f"{p}.self_attn", h, causal, pos, cfg, qcfg)
        h = rms_norm(x, params[f"{p}.post_attention_layernorm.weight"],
                     eps=cfg.eps)
        gate = linear(h, params[f"{p}.mlp.gate_proj.weight"], cfg=qcfg)
        up = linear(h, params[f"{p}.mlp.up_proj.weight"], cfg=qcfg)
        act = (jax.nn.silu(gate.astype(jnp.float32)).astype(dtype) * up)
        x = x + linear(act, params[f"{p}.mlp.down_proj.weight"], cfg=qcfg)

    last = rms_norm(x, params["model.norm.weight"], eps=cfg.eps)
    return {"last_hidden": last, "layers": grabbed}
