"""Tensor-parallel primitives over sharded packed weights (shard_map).

Megatron-style TP composed from two shard_map-wrapped quantized matmuls —
the fused Pallas kernel runs *per shard*, so TP and the packed hot path
compose (the GSPMD dry-run path in parallel/mesh.py shards the XLA fallback
instead):

* ``column_linear`` — W sharded on out-features (``planarize_shards`` axis
  "r"); x replicated in, output stays sharded (no collective). Used for
  qkv / mlp-up so attention heads and activation blocks stay local.
* ``row_linear`` — W sharded on in-features (axis "k"); x arrives sharded,
  each device contracts its K chunk, one ``psum`` over ICI produces the
  replicated output. Used for proj / mlp-down.
* ``tp_region`` — runs a user function between the two, entirely local
  (attention over local heads, activations over local features).

One psum per attention block and one per MLP — the textbook TP collective
budget, riding ICI via jax.lax.psum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..nn.layers import QuantConfig, DEFAULT_CONFIG
from ..ops.qmatmul import quantized_matmul
from ..quant.planar import PlanarQuant, shard_view


def _spec_for(pq: PlanarQuant, axis_name: str):
    leaf = P(axis_name)
    return jax.tree_util.tree_map(lambda _: leaf, pq)


def place_stacked(pq: PlanarQuant, mesh: Mesh, axis: str = "tp"):
    """Put a stacked (tp, ...) PlanarQuant on the mesh, shard axis 0."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), pq)


def column_linear(x, pq_stacked: PlanarQuant, mesh: Mesh, *,
                  axis: str = "tp", cfg: QuantConfig = DEFAULT_CONFIG,
                  bias=None):
    """x (…, K) replicated → (…, R/tp) sharded on the last dim."""
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), _spec_for(pq_stacked, axis)),
        out_specs=P(*([None] * (x.ndim - 1) + [axis])),
        check_vma=False,
    )
    def fn(x, pq):
        local = shard_view(pq)
        out = quantized_matmul(x, local, dequant_dtype=cfg.dequant_dtype,
                               prefer_pallas=cfg.prefer_pallas)
        return out

    out = fn(x, pq_stacked)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def row_linear(x, pq_stacked: PlanarQuant, mesh: Mesh, *,
               axis: str = "tp", cfg: QuantConfig = DEFAULT_CONFIG,
               bias=None):
    """x (…, K) sharded on last dim → (…, R) replicated via one psum."""
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(*([None] * (x.ndim - 1) + [axis])),
                  _spec_for(pq_stacked, axis)),
        out_specs=P(),
        check_vma=False,
    )
    def fn(x, pq):
        local = shard_view(pq)
        out = quantized_matmul(x, local, dequant_dtype=cfg.dequant_dtype,
                               prefer_pallas=cfg.prefer_pallas)
        return jax.lax.psum(out, axis)

    out = fn(x, pq_stacked)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def tp_mlp(x, w_up: PlanarQuant, w_down: PlanarQuant, mesh: Mesh, *,
           axis: str = "tp", cfg: QuantConfig = DEFAULT_CONFIG,
           act=jax.nn.gelu, bias_up=None, bias_down=None):
    """Column-parallel up-proj → local activation → row-parallel down-proj.
    One psum total; the intermediate activation never materializes
    replicated."""
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), _spec_for(w_up, axis), _spec_for(w_down, axis),
                  P(axis) if bias_up is not None else P(),
                  ),
        out_specs=P(),
        check_vma=False,
    )
    def fn(x, wu, wd, bu):
        h = quantized_matmul(x, shard_view(wu),
                             dequant_dtype=cfg.dequant_dtype,
                             prefer_pallas=cfg.prefer_pallas)
        if bias_up is not None:
            h = h + bu.astype(h.dtype)
        h = act(h.astype(jnp.float32)).astype(h.dtype)
        out = quantized_matmul(h, shard_view(wd),
                               dequant_dtype=cfg.dequant_dtype,
                               prefer_pallas=cfg.prefer_pallas)
        return jax.lax.psum(out, axis)

    bu = bias_up if bias_up is not None else jnp.zeros((1,), x.dtype)
    out = fn(x, w_up, w_down, bu)
    if bias_down is not None:
        out = out + bias_down.astype(out.dtype)
    return out
