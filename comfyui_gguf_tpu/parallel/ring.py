"""Ring attention: sequence-parallel exact attention over a TPU mesh axis.

Video archs (Wan, HyVid, LTXV, Cosmos) attend over 30-100k tokens; a
single chip can't hold the (L, L) score matrix or even the full K/V.
Sequence parallelism shards L across chips; each step every chip attends
its local Q block against the K/V block it currently holds, then passes
K/V to its ring neighbour over ICI (``jax.lax.ppermute``), overlapping the
collective with the matmul. After ``n`` hops every Q block has seen every
K/V block. Softmax is computed in the streaming (flash) form — running
max / denominator — so the result is *exact*, not approximate.

No reference counterpart (the reference is single-GPU; its attention is
torch sdpa on the full sequence). This is the TPU-native scale-out path
promised in SURVEY.md §7.8.

Layout: (B, L, H, D) activations, L sharded on the mesh axis. All
reductions ride ICI; no all-gather of K/V ever materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _chunk_attn(q, k, v, scale, m, l, acc):
    """One streaming-softmax update: q vs one K/V chunk.

    q: (B, Lq, H, D)   k/v: (B, Lc, H, D)
    m, l: (B, H, Lq)   acc: (B, Lq, H, D), all float32.
    """
    qf = q.astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32)) * scale
    m_new = jnp.maximum(m, s.max(axis=-1))
    corr = jnp.exp(m - m_new)  # (B, H, Lq)
    p = jnp.exp(s - m_new[..., None])  # (B, H, Lq, Lc)
    l = l * corr + p.sum(axis=-1)
    pv = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    acc = acc * corr.transpose(0, 2, 1)[..., None] + pv
    return m_new, l, acc


def ring_attention_local(q, k, v, axis_name: str, scale: float | None = None):
    """Sequence-parallel attention *inside* an existing shard_map.

    q/k/v: local shards (B, L/n, H, D); L sharded over ``axis_name``.
    Returns the local output shard (B, L/n, H, D) in q.dtype.
    """
    n = jax.lax.psum(1, axis_name)
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    B, Lq, H, D = q.shape
    m0 = jnp.full((B, H, Lq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Lq), jnp.float32)
    a0 = jnp.zeros((B, Lq, H, D), jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k_cur, v_cur, m, l, acc = carry
        m, l, acc = _chunk_attn(q, k_cur, v_cur, scale, m, l, acc)
        # rotate K/V one hop around the ring (ICI neighbour transfer);
        # XLA overlaps the ppermute with the next step's einsums
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    (k, v, m, l, acc), _ = jax.lax.scan(step, (k, v, m0, l0, a0), None,
                                        length=n)
    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "scale"))
def _ring_jit(q, k, v, mesh, axis, scale):
    fn = jax.shard_map(
        functools.partial(ring_attention_local, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   scale: float | None = None):
    """Top-level entry: shard (B, L, H, D) q/k/v over ``mesh[axis]`` and
    run ring attention. L must divide the axis size."""
    L = q.shape[1]
    n = mesh.shape[axis]
    if L % n:
        raise ValueError(f"sequence {L} not divisible by {axis}={n}")
    sh = NamedSharding(mesh, P(None, axis))
    q, k, v = (jax.device_put(t, sh) for t in (q, k, v))
    return _ring_jit(q, k, v, mesh, axis, scale)
