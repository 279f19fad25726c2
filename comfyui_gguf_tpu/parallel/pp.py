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
    x_micro: PYTREE of (n_micro, mb, ...) microbatches, REPLICATED (every
    device holds the input; only stage 0's compute consumes it, and only
    the last stage's output is meaningful — selected by the caller). A
    pytree payload lets per-sample conditioning (DiT modulation vec, RoPE
    table) ride the ring alongside the activation; block_fn must return
    the same structure (pass-through for leaves it doesn't update).
    Returns the same pytree where entry i is microbatch i after ALL
    stages on the LAST stage's device (garbage elsewhere).
    """
    tmap = jax.tree_util.tree_map
    n_stages = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    n_micro = jax.tree_util.tree_leaves(x_micro)[0].shape[0]
    total = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    sq = tmap(lambda a: a[0], stage_params)

    def step(carry, t):
        buf, out = carry
        # which microbatch does this stage see at step t? stage s works
        # on microbatch t - s while 0 <= t - s < n_micro
        mb_id = jnp.clip(t - idx, 0, n_micro - 1)
        active = jnp.logical_and(t - idx >= 0, t - idx < n_micro)
        # stage 0 reads fresh input; others read the ring buffer
        x_in = tmap(lambda xm, b: jnp.where(idx == 0, xm[mb_id], b),
                    x_micro, buf)
        y = block_fn(sq, x_in)
        y = tmap(lambda yy, b: jnp.where(active, yy, b), y, buf)
        # last stage records finished microbatches
        done = jnp.logical_and(active, idx == n_stages - 1)
        out = jax.lax.cond(
            done,
            lambda o: tmap(lambda oo, yy: oo.at[mb_id].set(yy), o, y),
            lambda o: o, out)
        # pass activation to the next stage
        buf_next = tmap(lambda yy: jax.lax.ppermute(yy, axis_name, perm), y)
        return (buf_next, out), None

    buf0 = tmap(lambda xm: jnp.zeros_like(xm[0]), x_micro)
    out0 = tmap(jnp.zeros_like, x_micro)
    (_, out), _ = jax.lax.scan(step, (buf0, out0), jnp.arange(total))
    # only the last stage recorded anything; psum broadcasts it (other
    # stages contribute zeros), making the replicated out_spec truthful
    return tmap(lambda o: jax.lax.psum(o, axis_name), out)


@functools.partial(jax.jit, static_argnames=("block_fn", "mesh", "axis",
                                             "n_micro"))
def _pp_jit(block_fn, stage_params, x, mesh, axis, n_micro):
    tmap = jax.tree_util.tree_map
    B = jax.tree_util.tree_leaves(x)[0].shape[0]
    mb = B // n_micro
    x_micro = tmap(lambda a: a.reshape(n_micro, mb, *a.shape[1:]), x)

    fn = jax.shard_map(
        functools.partial(pp_trunk_local, block_fn, axis_name=axis),
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(axis), stage_params),
                  jax.tree_util.tree_map(lambda _: P(), x_micro)),
        out_specs=P(),  # replicated; last stage's values are the real ones
        check_vma=False,
    )
    out = fn(stage_params, x_micro)
    return tmap(lambda a: a.reshape(B, *a.shape[2:]), out)


def pp_trunk(block_fn, stage_params, x, mesh: Mesh, axis: str = "pp",
             n_micro: int | None = None):
    """Top-level: place stacked stage params on the pp axis and run the
    pipelined trunk. x: pytree of (B, ...); n_micro must divide B."""
    n_stages = mesh.shape[axis]
    B = jax.tree_util.tree_leaves(x)[0].shape[0]
    if n_micro is None:
        n_micro = max(1, min(B, 2 * n_stages))
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    stage_params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(axis))),
        stage_params)
    return _pp_jit(block_fn, stage_params, x, mesh, axis, n_micro)


# ---------------------------------------------------------------------------
# real-model wiring: flux single-block trunk (VERDICT r1 item 4)
# ---------------------------------------------------------------------------

def pp_flux_single_trunk(single_stacked: dict, x, vec, pe, cfg, qcfg,
                         mesh: Mesh, axis: str = "pp",
                         n_micro: int | None = None):
    """Pipeline the flux single-block stack (stack_flux_params layout,
    leaves (depth, ...)) over pp stages: each stage scans depth/n_stages
    real blocks; (x, vec, pe) microbatches stream through the ring.

    x: (B, L, hidden) joint txt|img stream; vec: (B, hidden); pe RoPE
    (B, L, d/2, 2). Exact vs the sequential scan (tests/test_pp.py).
    """
    from ..models.flux import _single_block, scan_blocks

    n_stages = mesh.shape[axis]
    depth = jax.tree_util.tree_leaves(single_stacked)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape(n_stages, depth // n_stages, *a.shape[1:]),
        single_stacked)

    def stage_fn(stage_params, payload):
        xm, vecm, pem = payload

        def body(x, bp):
            return _single_block(bp, x, vecm, pem, cfg, qcfg)

        # zero-copy block scan (scalar-prefetch indexed kernel)
        xm = scan_blocks(stage_params, body, xm, depth // n_stages)
        return (xm, vecm, pem)

    out, _, _ = pp_trunk(stage_fn, staged, (x, vec, pe), mesh, axis=axis,
                         n_micro=n_micro)
    return out


def pp_qwen_image_trunk(blocks_stacked: dict, img, txt, vec, pe, cfg,
                        qcfg, mesh: Mesh, axis: str = "pp",
                        n_micro: int | None = None):
    """Pipeline the Qwen-Image transformer_blocks stack (60 homogeneous
    MMDiT blocks at 20B — the depth-dominant trunk in the allowlist)
    over pp stages: each stage scans depth/n_stages real blocks; the
    dual-stream (img, txt) state plus (vec, pe) conditioning ride the
    microbatch ring. Exact vs the sequential scan (tests/test_pp.py)."""
    from ..models.flux import scan_blocks
    from ..models.qwen_image import _block

    n_stages = mesh.shape[axis]
    depth = jax.tree_util.tree_leaves(blocks_stacked)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape(n_stages, depth // n_stages, *a.shape[1:]),
        blocks_stacked)

    def stage_fn(stage_params, payload):
        im, tx, vecm, pem = payload

        def body(carry, bp):
            return _block(bp, carry[0], carry[1], vecm, pem, cfg, qcfg)

        im, tx = scan_blocks(stage_params, body, (im, tx),
                             depth // n_stages)
        return (im, tx, vecm, pem)

    im, tx, _, _ = pp_trunk(stage_fn, staged, (img, txt, vec, pe), mesh,
                            axis=axis, n_micro=n_micro)
    return im, tx
