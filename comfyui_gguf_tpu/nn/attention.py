"""Attention dispatch: TPU flash kernel for long sequences, XLA otherwise.

DiT joint attention at 1024² runs over ~4.6k tokens; the naive
(B, H, L, L) score tensor is the HBM hot spot after the weight stream.
On TPU this routes to the in-tree Pallas flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention — tiled online-softmax,
no L×L materialization); elsewhere (CPU tests, odd shapes) it falls back
to ``jax.nn.dot_product_attention``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


@functools.cache
def _on_tpu() -> bool:
    return any(d.platform == "tpu" for d in jax.devices())


def _flash_ok(q, k) -> bool:
    # kernel wants lane-aligned head_dim and seq lengths
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    return (D % _LANE == 0 and Lq % _LANE == 0 and Lk % _LANE == 0
            and Lq >= 512 and Lk >= 512)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          scale: float | None = None) -> jax.Array:
    """q/k/v: (B, H, L, D) heads-major → (B, H, L, D).

    Softmax scale defaults to D^-0.5 (pass ``scale`` to override, e.g. 1.0
    for T5-style unscaled logits).
    """
    B, H, Lq, D = q.shape
    if scale is None:
        scale = D ** -0.5

    if _on_tpu() and _flash_ok(q, k):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        return fa.flash_attention(
            q, k, v, causal=False, sm_scale=float(scale),
        )

    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), scale=float(scale),
    )
    return out.transpose(0, 2, 1, 3)
