"""T5 / UMT5 text encoder (flux, sd3, ltxv, wan conditioning).

The reference carries no model graph — ComfyUI supplies the T5 encoder and
the reference only remaps GGUF keys into it (reference loader.py:377-387).
Here the encoder is native: a functional JAX implementation over the flat
remapped state dict, with every matmul routed through the quant-aware
``nn.linear`` so packed weights hit the fused Pallas kernel.

Graph semantics follow the public T5 architecture (t5-v1_1: RMSNorm,
gated-GELU FFN, relative-position-bucket attention bias, no attention
scaling). UMT5's per-layer relative bias is auto-detected from the keys.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, embedding, linear, rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    d_model: int
    d_ff: int
    n_layers: int
    n_heads: int
    d_kv: int
    vocab_size: int
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6

    @staticmethod
    def from_gguf_fields(reader) -> "T5Config":
        """Build from llama.cpp ``t5.*`` / ``t5encoder.*`` metadata keys."""
        arch = reader.get_str("general.architecture") or "t5"

        def g(suffix):
            return reader.get_int(f"{arch}.{suffix}")

        return T5Config(
            d_model=g("embedding_length"),
            d_ff=g("feed_forward_length"),
            n_layers=g("block_count"),
            n_heads=g("attention.head_count"),
            d_kv=g("attention.key_length") or
            (g("embedding_length") // g("attention.head_count")),
            vocab_size=g("vocab_size") or 32128,
            rel_buckets=g("attention.relative_buckets_count") or 32,
        )

    @staticmethod
    def from_state_dict(sd) -> "T5Config":
        """Infer dims from weight shapes (works on any loaded dict)."""
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        vocab, d_model = shape("shared.weight")
        d_ff = shape("encoder.block.0.layer.1.DenseReluDense.wi_0.weight")[0]
        n_layers = 0
        while f"encoder.block.{n_layers}.layer.0.layer_norm.weight" in sd:
            n_layers += 1
        rel = shape(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        )
        n_heads = rel[1] if len(rel) == 2 else rel[-1]
        q_out = shape("encoder.block.0.layer.0.SelfAttention.q.weight")[0]
        return T5Config(
            d_model=int(d_model), d_ff=int(d_ff), n_layers=int(n_layers),
            n_heads=int(n_heads), d_kv=int(q_out) // int(n_heads),
            vocab_size=int(vocab), rel_buckets=int(rel[0]),
        )


def relative_position_bucket(rel_pos: jax.Array, num_buckets: int = 32,
                             max_distance: int = 128) -> jax.Array:
    """T5's bidirectional log-bucketed relative position (public algorithm)."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _rel_bias(params, cfg: T5Config, seq_len: int, layer: int,
              qcfg: QuantConfig) -> jax.Array:
    """(1, H, L, L) additive attention bias from the relative-bias table."""
    key = (f"encoder.block.{layer}.layer.0.SelfAttention."
           "relative_attention_bias.weight")
    if key not in params:  # vanilla T5: layer-0 table shared by all layers
        key = ("encoder.block.0.layer.0.SelfAttention."
               "relative_attention_bias.weight")
    table = params[key]  # (rel_buckets, n_heads)
    ctx = jnp.arange(seq_len)[:, None]
    mem = jnp.arange(seq_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, cfg.rel_buckets, cfg.rel_max_distance
    )  # (L, L)
    bias = embedding(buckets, table, cfg=qcfg)  # (L, L, H)
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def _attention(params, cfg: T5Config, x: jax.Array, bias: jax.Array,
               mask: jax.Array, layer: int, qcfg: QuantConfig) -> jax.Array:
    pre = f"encoder.block.{layer}.layer.0.SelfAttention."
    B, L, _ = x.shape
    H, Dk = cfg.n_heads, cfg.d_kv

    q = linear(x, params[pre + "q.weight"], cfg=qcfg)
    k = linear(x, params[pre + "k.weight"], cfg=qcfg)
    v = linear(x, params[pre + "v.weight"], cfg=qcfg)
    q = q.reshape(B, L, H, Dk).transpose(0, 2, 1, 3)
    k = k.reshape(B, L, H, Dk).transpose(0, 2, 1, 3)
    v = v.reshape(B, L, H, Dk).transpose(0, 2, 1, 3)

    # T5 applies no 1/sqrt(d) scaling — the bias absorbs the scale
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + bias
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = logits + jnp.where(mask[:, None, None, :] > 0, 0.0, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, H * Dk)
    return linear(out, params[pre + "o.weight"], cfg=qcfg)


def _ffn(params, cfg: T5Config, x: jax.Array, layer: int,
         qcfg: QuantConfig) -> jax.Array:
    pre = f"encoder.block.{layer}.layer.1.DenseReluDense."
    gate = linear(x, params[pre + "wi_0.weight"], cfg=qcfg)
    up = linear(x, params[pre + "wi_1.weight"], cfg=qcfg)
    h = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
        up.dtype) * up
    return linear(h, params[pre + "wo.weight"], cfg=qcfg)


def encode(params, cfg: T5Config, ids: jax.Array, mask: jax.Array | None = None,
           qcfg: QuantConfig = DEFAULT_CONFIG,
           dtype=jnp.bfloat16) -> jax.Array:
    """Token ids (B, L) → final hidden states (B, L, d_model)."""
    x = embedding(ids, params["shared.weight"], cfg=qcfg).astype(dtype)
    L = ids.shape[1]
    shared_bias = None
    for i in range(cfg.n_layers):
        per_layer = (f"encoder.block.{i}.layer.0.SelfAttention."
                     "relative_attention_bias.weight") in params
        if per_layer or shared_bias is None:
            bias = _rel_bias(params, cfg, L, i, qcfg)
            if not per_layer:
                shared_bias = bias
        else:
            bias = shared_bias
        pre = f"encoder.block.{i}."
        h = rms_norm(x, params[pre + "layer.0.layer_norm.weight"], eps=cfg.eps)
        x = x + _attention(params, cfg, h, bias, mask, i, qcfg)
        h = rms_norm(x, params[pre + "layer.1.layer_norm.weight"], eps=cfg.eps)
        x = x + _ffn(params, cfg, h, i, qcfg)
    return rms_norm(x, params["encoder.final_layer_norm.weight"], eps=cfg.eps)
