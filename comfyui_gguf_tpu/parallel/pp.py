"""Inference pipeline parallelism: depth sharded over a mesh axis.

GPipe-style single-direction pipeline for the repeated-block trunk of a
DiT (flux double/single stacks, MMDiT joint blocks): each device owns
depth/n contiguous blocks (stacked leading-axis params sharded over the
``pp`` axis), microbatches stream through the ring with
``jax.lax.ppermute`` — activations hop one ICI neighbour per step, no
host involvement, n_micro + n_stages − 1 steps total.

No reference counterpart (single GPU). Complements tp.py (within-block
sharding) for chips-times-deeper models: pp divides WEIGHT residency,
which is what runs out first at 4.5 bpw (a 100-block video DiT fits only
sharded).

Layout contract: stage weights are stacked on axis 0 (n_stages, ...) and
placed with ``P("pp")``; inside the shard_map each device sees its own
(1, ...) slice. The block function must keep the activation shape
unchanged (true for all transformer trunks here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pp_trunk_local(block_fn, stage_params, x_micro, axis_name: str):
    """Run inside shard_map: stream microbatches through the stage ring.

    block_fn(stage_params, x) -> x  — this device's blocks (a whole stage).
    stage_params: this device's (1, ...)-sliced stacked params.
    x_micro: (n_micro, mb, ...) microbatches, REPLICATED (every device
    holds the input; only stage 0's compute consumes it, and only the
    last stage's output is meaningful — selected by the caller).
    Returns (n_micro, mb, ...) where entry i is microbatch i after ALL
    stages on the LAST stage's device (garbage elsewhere).
    """
    n_stages = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    n_micro = x_micro.shape[0]
    total = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    sq = jax.tree_util.tree_map(lambda a: a[0], stage_params)

    def step(carry, t):
        buf, out = carry
        # which microbatch does this stage see at step t? stage s works
        # on microbatch t - s while 0 <= t - s < n_micro
        mb_id = t - idx
        active = jnp.logical_and(mb_id >= 0, mb_id < n_micro)
        # stage 0 reads fresh input; others read the ring buffer
        x_in = jnp.where(idx == 0,
                         x_micro[jnp.clip(mb_id, 0, n_micro - 1)], buf)
        y = block_fn(sq, x_in)
        y = jnp.where(active, y, buf)
        # last stage records finished microbatches
        done = jnp.logical_and(active, idx == n_stages - 1)
        out = jax.lax.cond(
            done,
            lambda o: o.at[jnp.clip(mb_id, 0, n_micro - 1)].set(y),
            lambda o: o, out)
        # pass activation to the next stage
        buf_next = jax.lax.ppermute(y, axis_name, perm)
        return (buf_next, out), None

    buf0 = jnp.zeros_like(x_micro[0])
    out0 = jnp.zeros_like(x_micro)
    (_, out), _ = jax.lax.scan(step, (buf0, out0), jnp.arange(total))
    # only the last stage recorded anything; psum broadcasts it (other
    # stages contribute zeros), making the replicated out_spec truthful
    return jax.lax.psum(out, axis_name)


@functools.partial(jax.jit, static_argnames=("block_fn", "mesh", "axis",
                                             "n_micro"))
def _pp_jit(block_fn, stage_params, x, mesh, axis, n_micro):
    B = x.shape[0]
    mb = B // n_micro
    x_micro = x.reshape(n_micro, mb, *x.shape[1:])

    fn = jax.shard_map(
        functools.partial(pp_trunk_local, block_fn, axis_name=axis),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),  # replicated; last stage's values are the real ones
        check_vma=False,
    )
    out = fn(stage_params, x_micro)
    return out.reshape(B, *x.shape[1:])


def pp_trunk(block_fn, stage_params, x, mesh: Mesh, axis: str = "pp",
             n_micro: int | None = None):
    """Top-level: place stacked stage params on the pp axis and run the
    pipelined trunk. x: (B, ...); B must divide n_micro."""
    n_stages = mesh.shape[axis]
    if n_micro is None:
        n_micro = max(1, min(x.shape[0], 2 * n_stages))
    if x.shape[0] % n_micro:
        raise ValueError(f"batch {x.shape[0]} not divisible by "
                         f"n_micro={n_micro}")
    stage_params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(axis))),
        stage_params)
    return _pp_jit(block_fn, stage_params, x, mesh, axis, n_micro)
