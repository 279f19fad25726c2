"""Expert parallelism: MoE experts sharded over a mesh axis.

Each device owns one (or depth/n) expert's FFN weights (stacked leading
axis, ``P("ep")``); every device computes ITS expert over the full token
set and the weighted outputs reduce with one ``psum`` — per-device FLOPs
drop from E experts to 1, exactly matching the dense mask-weighted
reference (models/hidream.py moe_ffn) with zero routing-drop semantics.

This is the throughput-shape for small expert counts (HiDream: E=4);
capacity-dispatch + all_to_all (which also cuts the k/E compute waste)
layers on top once token counts grow — see PARITY round-2 notes.

No reference counterpart (single GPU, dense compute).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ep_moe_local(expert_fn, expert_params, x, probs, axis_name: str):
    """Inside shard_map. expert_params: (E/devices, ...) LOCAL slice of
    the stacked expert weights; probs: (..., E) routing weights
    (replicated); x: (..., D) tokens (replicated). Each device computes
    ALL of its local experts (usually 1) — previously only slice [0] ran,
    silently dropping experts whenever devices < E — and the weighted
    outputs reduce with one psum: Σ_e probs_e · expert_e(x)."""
    local_e = jax.tree_util.tree_leaves(expert_params)[0].shape[0]
    base = jax.lax.axis_index(axis_name) * local_e
    y = None
    for j in range(local_e):
        mine = jax.tree_util.tree_map(lambda a, j=j: a[j], expert_params)
        w = jax.lax.dynamic_index_in_dim(probs, base + j, axis=-1,
                                         keepdims=True)
        yj = expert_fn(mine, x)
        yj = yj * w.astype(yj.dtype)
        y = yj if y is None else y + yj
    return jax.lax.psum(y, axis_name)


@functools.partial(jax.jit, static_argnames=("expert_fn", "mesh", "axis"))
def _ep_jit(expert_fn, expert_params, x, probs, mesh, axis):
    fn = jax.shard_map(
        functools.partial(ep_moe_local, expert_fn, axis_name=axis),
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(expert_params, x, probs)


def ep_moe_inline(expert_fn, expert_params, x, probs, mesh: Mesh,
                  axis: str = "ep"):
    """shard_map-only variant for use INSIDE an existing jit (e.g. the
    HiDream forward, models/hidream.py moe_ffn "ep" mode): no nested jit,
    no device_put — the caller owns placement of the stacked (E, ...)
    expert tree. E must divide evenly over the axis (each device then
    computes E/devices local experts)."""
    E = jax.tree_util.tree_leaves(expert_params)[0].shape[0]
    if E % mesh.shape[axis]:
        raise ValueError(f"{E} experts not divisible by {axis} axis size "
                         f"{mesh.shape[axis]}")
    fn = jax.shard_map(
        functools.partial(ep_moe_local, expert_fn, axis_name=axis),
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(axis), expert_params),
                  P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(expert_params, x, probs)


def ep_moe(expert_fn, expert_params, x, probs, mesh: Mesh,
           axis: str = "ep"):
    """Top-level: stacked expert params (E, ...) sharded over ``axis``
    (E must equal the axis size), tokens + routing probs replicated."""
    E = jax.tree_util.tree_leaves(expert_params)[0].shape[0]
    if E % mesh.shape[axis]:
        raise ValueError(f"{E} experts not divisible by {axis} axis size "
                         f"{mesh.shape[axis]}")
    expert_params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(axis))),
        expert_params)
    return _ep_jit(expert_fn, expert_params, x, probs, mesh, axis)
