"""Tensor-parallel flux forward: the fused Pallas kernel under shard_map.

VERDICT r1 item 2: the serving TP path. The whole stacked-scan flux
forward (models/flux.py forward_stacked) runs inside ONE ``shard_map``
over a ``tp`` mesh axis; every quantized block weight is pre-split with
``planarize_shards`` so each device runs ``quantized_matmul`` (Pallas on
TPU, interpret-mode kernel on CPU test meshes) on its OWN packed shard —
no GSPMD repartitioning of the packed leaves, no dequantized weight ever
materializes.

Layout (Megatron-style, scaling-book collective budget):

* fused qkv / linear1 — column-parallel with HEAD-UNIFORM groups
  (``planarize_shards(..., axis="r", groups=[h,h,h(,mlp)])``): each shard
  owns heads_local = H/tp complete heads of q, k and v, so joint attention
  runs fully local per shard.
* attn proj / linear2 / mlp down — row-parallel (axis="k"); the local
  attention/activation outputs ARE the matching K-chunks, one ``psum``
  per matmul produces the replicated residual delta.
* modulation — column-parallel + one tiny ``all_gather`` (the (B, 6·h)
  vector must be replicated to modulate the full hidden stream).
* norm scales / biases-after-psum / embedders / final layer — replicated.

Collectives per double block: 4 psums + 2 all_gathers (both O(B·h));
per single block: 1 psum + 1 all_gather — all riding ICI.

Per-shard K chunks only need quant-GROUP alignment (32), not superblock
alignment: see quant/planar.py planarize_shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.flux import (FluxConfig, _attention, _final, _prelude,
                           _qknorm, timestep_embedding)
from ..nn.layers import QuantConfig, DEFAULT_CONFIG, layer_norm, linear, linear_gelu
from ..quant import codecs
from ..quant.planar import PlanarQuant, planarize_shards

AXIS = "tp"


# ---------------------------------------------------------------------------
# param sharding (host-side, load-time)
# ---------------------------------------------------------------------------

# dense (R, …) → (tp, R/tp, …) splitter shared with the spec-driven
# sharder (one definition of the head-uniform group semantics)
from .tp_spec import _split_dense  # noqa: E402


def _pack_shards(w: np.ndarray, qtype, tp: int, axis: str,
                 groups=None) -> PlanarQuant:
    blocks = codecs.quantize(np.asarray(w, np.float32), qtype)
    return planarize_shards(blocks, qtype, w.shape, tp, axis=axis,
                            groups=groups)


def shard_flux_params(sd: dict[str, np.ndarray], cfg: FluxConfig, tp: int,
                      qtype) -> dict:
    """Flat BFL-keyed f32 state dict → stacked TP-sharded param tree.

    Block weights come back as pytrees whose leaves lead with (tp, depth,
    ...); everything else is replicated. Quantized leaves are packed
    per-shard (planarize_shards); biases/norm scales stay dense.
    """
    h = cfg.hidden
    mlp = int(h * cfg.mlp_ratio)
    nd, ns = cfg.depth_double, cfg.depth_single

    # (key-suffix → (axis, groups)) per block kind; None = replicate
    double_plan = {}
    for s in ("img", "txt"):
        double_plan[f"{s}_mod.lin.weight"] = ("r", None)
        double_plan[f"{s}_mod.lin.bias"] = ("dense-r", None)
        double_plan[f"{s}_attn.qkv.weight"] = ("r", [h, h, h])
        double_plan[f"{s}_attn.qkv.bias"] = ("dense-r", [h, h, h])
        double_plan[f"{s}_attn.proj.weight"] = ("k", None)
        double_plan[f"{s}_attn.proj.bias"] = (None, None)
        double_plan[f"{s}_mlp.0.weight"] = ("r", None)
        double_plan[f"{s}_mlp.0.bias"] = ("dense-r", None)
        double_plan[f"{s}_mlp.2.weight"] = ("k", None)
        double_plan[f"{s}_mlp.2.bias"] = (None, None)
        double_plan[f"{s}_attn.norm.query_norm.scale"] = (None, None)
        double_plan[f"{s}_attn.norm.key_norm.scale"] = (None, None)
    single_plan = {
        "linear1.weight": ("r", [h, h, h, mlp]),
        "linear1.bias": ("dense-r", [h, h, h, mlp]),
        "linear2.weight": ("k", [h, mlp]),
        "linear2.bias": (None, None),
        "modulation.lin.weight": ("r", None),
        "modulation.lin.bias": ("dense-r", None),
        "norm.query_norm.scale": (None, None),
        "norm.key_norm.scale": (None, None),
    }

    def build(kind: str, n: int, plan: dict) -> dict:
        out = {}
        for suffix, (axis, groups) in plan.items():
            per = [sd[f"{kind}.{i}.{suffix}"] for i in range(n)]
            if axis == "r" or axis == "k":
                shards = [_pack_shards(w, qtype, tp, axis, groups)
                          for w in per]  # each (tp, ...)
                out[suffix] = jax.tree_util.tree_map(
                    lambda *leaves: jnp.stack(leaves, axis=1), *shards)
            elif axis == "dense-r":
                st = np.stack([_split_dense(np.asarray(w, np.float32),
                                            tp, groups) for w in per],
                              axis=1)  # (tp, depth, R/tp)
                out[suffix] = jnp.asarray(st, jnp.float32)
            else:  # replicated: broadcast a tp axis so specs stay uniform
                st = np.stack([np.asarray(w, np.float32) for w in per])
                out[suffix] = jnp.broadcast_to(
                    jnp.asarray(st, jnp.float32)[None],
                    (tp, *st.shape))
        return out

    params = {k: jnp.asarray(np.asarray(v, np.float32))
              for k, v in sd.items()
              if not k.startswith(("double_blocks.", "single_blocks."))}
    params["double_blocks"] = build("double_blocks", nd, double_plan)
    params["single_blocks"] = build("single_blocks", ns, single_plan)
    return params


def place_tp_params(params: dict, mesh: Mesh) -> dict:
    """Device placement: block subtrees shard axis 0 over tp; rest
    replicated."""
    blk = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in params.items():
        sh = blk if k in ("double_blocks", "single_blocks") else repl
        out[k] = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, sh), v)
    return out


# ---------------------------------------------------------------------------
# per-shard block math (runs INSIDE shard_map; leaves pre-stripped of tp)
# ---------------------------------------------------------------------------

def _gathered_modulation(p, prefix, vec, n, qcfg):
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    local = linear(v, p[f"{prefix}.lin.weight"],
                   p.get(f"{prefix}.lin.bias"), cfg=qcfg)
    full = jax.lax.all_gather(local, AXIS, axis=-1, tiled=True)
    return jnp.split(full[:, None, :], n, axis=-1)


def _psum_linear(x, weight, bias, qcfg):
    out = jax.lax.psum(linear(x, weight, cfg=qcfg), AXIS)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _split_heads_local(x, n_heads_local):
    B, L, _ = x.shape
    qkv = x.reshape(B, L, 3, n_heads_local, -1)
    return tuple(qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))


def _tp_double_block(p, img, txt, vec, pe, cfg: FluxConfig, qcfg, tp: int):
    Hl = cfg.n_heads // tp

    i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = _gathered_modulation(
        p, "img_mod", vec, 6, qcfg)
    t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = _gathered_modulation(
        p, "txt_mod", vec, 6, qcfg)

    img_mod = layer_norm(img, eps=1e-6) * (1 + i_sc1) + i_sh1
    txt_mod = layer_norm(txt, eps=1e-6) * (1 + t_sc1) + t_sh1

    iq, ik, iv = _split_heads_local(
        linear(img_mod, p["img_attn.qkv.weight"],
               p.get("img_attn.qkv.bias"), cfg=qcfg), Hl)
    tq, tk, tv = _split_heads_local(
        linear(txt_mod, p["txt_attn.qkv.weight"],
               p.get("txt_attn.qkv.bias"), cfg=qcfg), Hl)
    iq, ik = _qknorm(p, "img_attn.norm", iq, ik)
    tq, tk = _qknorm(p, "txt_attn.norm", tq, tk)

    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    attn = _attention(q, k, v, pe)  # (B, L, Hl·d) — local heads only
    L_txt = txt.shape[1]
    txt_attn, img_attn = attn[:, :L_txt], attn[:, L_txt:]

    img = img + i_g1 * _psum_linear(img_attn, p["img_attn.proj.weight"],
                                    p.get("img_attn.proj.bias"), qcfg)
    h = layer_norm(img, eps=1e-6) * (1 + i_sc2) + i_sh2
    # bias+GELU fused into the per-shard kernel epilogue (elementwise, so
    # per-shard fusion is exact) — the unfused form pays the (M, MLP/tp)
    # HBM round trip the single-device path already eliminated
    h = linear_gelu(h, p["img_mlp.0.weight"], p.get("img_mlp.0.bias"),
                    cfg=qcfg)
    img = img + i_g2 * _psum_linear(h, p["img_mlp.2.weight"],
                                    p.get("img_mlp.2.bias"), qcfg)

    txt = txt + t_g1 * _psum_linear(txt_attn, p["txt_attn.proj.weight"],
                                    p.get("txt_attn.proj.bias"), qcfg)
    h = layer_norm(txt, eps=1e-6) * (1 + t_sc2) + t_sh2
    h = linear_gelu(h, p["txt_mlp.0.weight"], p.get("txt_mlp.0.bias"),
                    cfg=qcfg)
    txt = txt + t_g2 * _psum_linear(h, p["txt_mlp.2.weight"],
                                    p.get("txt_mlp.2.bias"), qcfg)
    return img, txt


def _tp_single_block(p, x, vec, pe, cfg: FluxConfig, qcfg, tp: int):
    Hl = cfg.n_heads // tp
    h_loc = cfg.hidden // tp
    shift, scale, gate = _gathered_modulation(p, "modulation", vec, 3, qcfg)
    x_mod = layer_norm(x, eps=1e-6) * (1 + scale) + shift

    # fused linear1: GELU applied in the kernel epilogue from the local
    # mlp tail (columns >= 3·h_loc — per-shard columns are r-tile aligned)
    hid = linear_gelu(x_mod, p["linear1.weight"], p.get("linear1.bias"),
                      tail_from=3 * h_loc, cfg=qcfg)
    qkv, act = hid[..., : 3 * h_loc], hid[..., 3 * h_loc:]
    q, k, v = _split_heads_local(qkv, Hl)
    q, k = _qknorm(p, "norm", q, k)
    attn = _attention(q, k, v, pe)
    out = _psum_linear(jnp.concatenate([attn, act], axis=-1),
                       p["linear2.weight"], p.get("linear2.bias"), qcfg)
    return x + gate * out


# ---------------------------------------------------------------------------
# full TP forward
# ---------------------------------------------------------------------------

def tp_forward_stacked(params: dict, cfg: FluxConfig, img, img_ids, txt,
                       txt_ids, timesteps, y, guidance=None,
                       mesh: Mesh | None = None,
                       qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward_stacked semantics over TP-sharded params: one shard_map,
    scan over depth inside, per-shard fused kernels, psum/all_gather on
    the tp axis. Bit-matches the unsharded forward (tests/test_tp_flux)."""
    tp = mesh.shape[AXIS]

    def spec_tree(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    blk_keys = ("double_blocks", "single_blocks")
    nonblk = {k: v for k, v in params.items() if k not in blk_keys}
    dbl, sgl = params["double_blocks"], params["single_blocks"]

    in_specs = (spec_tree(nonblk, P()), spec_tree(dbl, P(AXIS)),
                spec_tree(sgl, P(AXIS)),
                P(), P(), P(), P(), P(), P()) + (
                    (P(),) if guidance is not None else ())

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=P(),
        check_vma=False,
    )
    def fwd(nonblk, dbl, sgl, img, img_ids, txt, txt_ids, timesteps, y,
            *maybe_g):
        g = maybe_g[0] if maybe_g else None
        strip = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
        dbl_l, sgl_l = strip(dbl), strip(sgl)

        img, txt, vec, pe = _prelude(nonblk, cfg, img, img_ids, txt,
                                     txt_ids, timesteps, y, g, qcfg)

        # scan_blocks keeps the per-shard packed stacks whole (scalar-
        # prefetch indexed kernel) — same zero-copy property as the
        # single-device forward_stacked
        from ..models.flux import scan_blocks

        def dbody(carry, bp):
            i, t = carry
            return _tp_double_block(bp, i, t, vec, pe, cfg, qcfg, tp)

        img, txt = scan_blocks(dbl_l, dbody, (img, txt), cfg.depth_double)

        x = jnp.concatenate([txt, img], axis=1)

        def sbody(x, bp):
            return _tp_single_block(bp, x, vec, pe, cfg, qcfg, tp)

        x = scan_blocks(sgl_l, sbody, x, cfg.depth_single)
        img = x[:, txt.shape[1]:]
        return _final(nonblk, img, vec, qcfg)

    args = (nonblk, dbl, sgl, img, img_ids, txt, txt_ids, timesteps, y)
    if guidance is not None:
        args += (guidance,)
    return fwd(*args)
