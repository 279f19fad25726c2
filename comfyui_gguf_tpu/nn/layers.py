"""Quantization-aware functional layer library.

TPU-native replacement for the reference's ``GGMLOps`` custom layer classes
(reference ops.py:227-271) and its ``GGMLLayer.get_weight`` lazy-dequant
machinery (reference ops.py:166-191). Design differences, per SURVEY.md §7.4:

* Layers are pure functions over plain pytrees — no tensor subclasses. The
  torch-specific ``GGMLTensor`` traps (clone/detach/copy_, reference
  ops.py:57-91) have no JAX analogue and vanish.
* A weight leaf is either a dense ``jax.Array`` or a packed
  ``quant.planar.PlanarQuant``. Packed 2-D weights never materialize in HBM:
  ``linear`` routes them through the fused dequant+matmul kernel
  (ops/qmatmul.py). Everything else (norms, biases, convs, embeddings) is
  dense, matching the reference's eager-dequant special cases
  (reference loader.py:122-124, 384-397).
* LoRA is an epilogue on the *output* (rank-factored) rather than a rewrite
  of the dequantized weight (reference ops.py:184-190) — mathematically the
  same linear map, but it keeps the MXU on packed weights and makes the
  patch cost O(rank·(K+R)) instead of O(K·R). See lora.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.qmatmul import quantized_matmul
from ..quant.i8 import I8Planar, dequantize_i8
from ..quant.planar import (IndexedQuant, PlanarQuant, TPNormShard,
                            TPShard, dequantize as planar_dequantize)


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Runtime dequant policy.

    Mirrors the reference's loader-node knobs ``dequant_dtype`` /
    ``patch_dtype`` (reference nodes.py:179-191, consumed dequant.py:22 and
    ops.py:185-190). ``prefer_pallas=None`` auto-selects by backend.
    """

    dequant_dtype: Any = jnp.bfloat16
    patch_dtype: Any = None  # None = follow dequant_dtype
    prefer_pallas: bool | None = None
    compute_dtype: Any = jnp.bfloat16

    @property
    def effective_patch_dtype(self):
        return self.patch_dtype or self.dequant_dtype


DEFAULT_CONFIG = QuantConfig()


def is_quantized(leaf) -> bool:
    return isinstance(leaf, (PlanarQuant, I8Planar))


def out_features(weight) -> int:
    """Logical out-features (R) of any linear weight leaf — dense,
    packed, LoRA-patched, scan-indexed, or TP-sharded (for TPShard the
    PER-SHARD width, which is what the local matmul produces)."""
    if isinstance(weight, TPShard):
        return out_features(weight.inner)
    if isinstance(weight, IndexedQuant):
        return out_features(weight.pq)
    if isinstance(weight, (PlanarQuant, I8Planar)):
        return weight.out_features
    if hasattr(weight, "patches") and hasattr(weight, "base"):
        return out_features(weight.base)
    return int(weight.shape[-2])  # dense (…, R, K)


def in_features(weight) -> int:
    """Logical in-features (K) of any linear weight leaf (per-shard
    width for TPShard — see out_features)."""
    if isinstance(weight, TPShard):
        return in_features(weight.inner)
    if isinstance(weight, IndexedQuant):
        return in_features(weight.pq)
    if isinstance(weight, (PlanarQuant, I8Planar)):
        return weight.in_features
    if hasattr(weight, "patches") and hasattr(weight, "base"):
        return in_features(weight.base)
    return int(weight.shape[-1])  # dense (…, R, K)


def materialize(leaf, dtype=jnp.float32) -> jax.Array:
    """Dense logical-shape weight from any leaf (debug / fallback path).
    PatchedWeight leaves fold their LoRA deltas into the dense result."""
    if hasattr(leaf, "patches") and hasattr(leaf, "base"):
        w = materialize(leaf.base, jnp.float32)
        shape = w.shape
        # conv weights (O, I, kh, kw) fold to the (O, I·kh·kw) matrix the
        # rank factors were trained against (kohya LoCon flattens the same
        # way; the reference reshapes in comfy.lora.calculate_weight)
        w = w.reshape(shape[0], -1)
        w0 = w
        for p in leaf.patches:
            if getattr(p, "a1", None) is not None:  # glora: + s·W@a2@a1
                w = w + p.scale * (w0 @ p.a2.astype(jnp.float32)
                                   @ p.a1.astype(jnp.float32))
            if p.diff is not None:
                w = w + p.scale * p.diff.astype(jnp.float32).reshape(w.shape)
            elif p.up is not None:
                delta = p.up.astype(jnp.float32) @ (
                    (p.mid.astype(jnp.float32) @ p.down.astype(jnp.float32))
                    if p.mid is not None else p.down.astype(jnp.float32))
                w = w + p.scale * delta.reshape(w.shape)
        return w.reshape(shape).astype(dtype)
    if isinstance(leaf, PlanarQuant):
        return planar_dequantize(leaf, dtype)
    if isinstance(leaf, I8Planar):
        return dequantize_i8(leaf, dtype)
    return jnp.asarray(leaf, dtype)


def _tp_linear(x, weight: TPShard, bias, cfg, inner_fn, **inner_kw):
    """Collective wrapper shared by linear/linear_gelu for TPShard
    weights (runs INSIDE shard_map; see quant.planar.TPShard)."""
    if weight.mode == "row":
        out = jax.lax.psum(inner_fn(x, weight.inner, None, cfg=cfg,
                                    **inner_kw), weight.axis)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out
    out = inner_fn(x, weight.inner, bias, cfg=cfg, **inner_kw)
    if weight.mode == "gather":
        return jax.lax.all_gather(out, weight.axis, axis=-1, tiled=True)
    if weight.mode != "col":
        raise ValueError(f"unknown TPShard mode {weight.mode!r}")
    return out


def linear(x: jax.Array, weight, bias=None, *,
           cfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """x: (..., K) -> (..., R). weight: PlanarQuant, dense (R, K), or
    lora.PatchedWeight — patches apply as a rank-factored output epilogue
    (the patch-on-dequant equivalent of reference ops.py:166-191)."""
    if isinstance(weight, TPShard):
        return _tp_linear(x, weight, bias, cfg, linear)
    patches = None
    fac = None  # (h, upᵀ) rank factorization for the fused kernel epilogue
    x_in = x  # epilogue b-branches see the unrewritten input
    if hasattr(weight, "patches") and hasattr(weight, "base"):
        patches = weight.patches
        weight = weight.base
        if any(getattr(p, "a1", None) is not None for p in patches):
            from ..lora import apply_patch_prologue

            x = apply_patch_prologue(x, patches,
                                     patch_dtype=cfg.effective_patch_dtype)
        if isinstance(weight, (PlanarQuant, I8Planar, IndexedQuant)):
            # rank patches fuse into the kernel epilogue (the (M, R)
            # delta never round-trips HBM); dense-delta patches (diff/
            # loha/lokr) return None and take the unfused path below
            from ..lora import rank_factorize

            fac = rank_factorize(x_in, patches,
                                 patch_dtype=cfg.effective_patch_dtype)
    lh, lu = fac if fac is not None else (None, None)
    if isinstance(weight, IndexedQuant):
        if isinstance(weight.pq, I8Planar):
            from ..ops.i8mm import i8_indexed_matmul

            out = i8_indexed_matmul(
                x, weight.pq, weight.idx, out_dtype=x.dtype,
                prefer_pallas=cfg.prefer_pallas, lora_h=lh, lora_up=lu)
        else:
            from ..ops.qmatmul import indexed_matmul

            out = indexed_matmul(
                x, weight.pq, weight.idx,
                dequant_dtype=cfg.dequant_dtype,
                out_dtype=x.dtype,
                prefer_pallas=cfg.prefer_pallas,
                lora_h=lh, lora_up=lu,
            )
    elif isinstance(weight, I8Planar):
        from ..ops.i8mm import i8_matmul

        out = i8_matmul(
            x, weight, out_dtype=x.dtype,
            prefer_pallas=cfg.prefer_pallas, lora_h=lh, lora_up=lu)
    elif isinstance(weight, PlanarQuant):
        out = quantized_matmul(
            x, weight,
            dequant_dtype=cfg.dequant_dtype,
            out_dtype=x.dtype,
            prefer_pallas=cfg.prefer_pallas,
            lora_h=lh, lora_up=lu,
        )
    else:
        w = weight.astype(cfg.compute_dtype)
        out = jnp.dot(x.astype(cfg.compute_dtype), w.T,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    if patches and fac is None:
        from ..lora import apply_patch_epilogue

        out = apply_patch_epilogue(x_in, out, patches,
                                   patch_dtype=cfg.effective_patch_dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def linear_gelu(x: jax.Array, weight, bias=None, *, tail_from: int = 0,
                cfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """linear() followed by GELU-tanh on output columns >= ``tail_from``
    (0 = the whole output), with the activation and bias FUSED into the
    Pallas kernel epilogue for packed weights.

    Custom calls are fusion barriers for XLA, so the unfused form pays a
    full HBM round trip on the widest activations in a DiT (the mlp-up
    output); the epilogue applies them on the f32 accumulator in VMEM.
    Rank-factorable LoRA patches ride the same kernel epilogue (delta
    added on the accumulator BEFORE bias/activation — exactly patching
    W); only dense-delta patches (diff/loha/lokr) fall back to the
    unfused composition."""
    if isinstance(weight, TPShard):
        if weight.mode == "row":
            if tail_from:
                # col/gather callers pass SHARD-LOCAL tail_from; a row
                # weight's output is full-width after the psum, so the
                # local offset would activate the wrong columns — no
                # shipped table does this; refuse rather than corrupt
                raise ValueError(
                    "linear_gelu(tail_from>0) is unsupported for "
                    "row-parallel TPShard weights (local offset vs "
                    "full-width output)")
            # GELU after a psum is NOT the sum of per-shard GELUs — take
            # the unfused composition on the replicated output
            out = _tp_linear(x, weight, bias, cfg, linear)
            from ..ops.qmatmul import _host_epilogue

            return _host_epilogue(out, None, tail_from)
        # col/gather: activation is elementwise on local columns, so the
        # fused per-shard epilogue is exact. NOTE tail_from is the LOCAL
        # column index — callers under TP pass shard-local offsets.
        return _tp_linear(x, weight, bias, cfg, linear_gelu,
                          tail_from=tail_from)
    base, patches = weight, None
    if hasattr(weight, "patches") and hasattr(weight, "base"):
        base, patches = weight.base, weight.patches
    if isinstance(base, (PlanarQuant, I8Planar, IndexedQuant)):
        lh = lu = None
        xk = x
        fused_ok = patches is None
        if patches is not None:
            from ..lora import apply_patch_prologue, rank_factorize

            fac = rank_factorize(x, patches,
                                 patch_dtype=cfg.effective_patch_dtype)
            if fac is not None:
                lh, lu = fac
                fused_ok = True
                if any(getattr(p, "a1", None) is not None
                       for p in patches):
                    xk = apply_patch_prologue(
                        x, patches,
                        patch_dtype=cfg.effective_patch_dtype)
        if fused_ok:
            if isinstance(base, IndexedQuant):
                if isinstance(base.pq, I8Planar):
                    from ..ops.i8mm import i8_indexed_matmul

                    return i8_indexed_matmul(
                        xk, base.pq, base.idx, out_dtype=x.dtype,
                        prefer_pallas=cfg.prefer_pallas, bias=bias,
                        act_from_col=tail_from, lora_h=lh, lora_up=lu)
                from ..ops.qmatmul import indexed_matmul

                return indexed_matmul(
                    xk, base.pq, base.idx,
                    dequant_dtype=cfg.dequant_dtype, out_dtype=x.dtype,
                    prefer_pallas=cfg.prefer_pallas, bias=bias,
                    act_from_col=tail_from, lora_h=lh, lora_up=lu)
            if isinstance(base, I8Planar):
                from ..ops.i8mm import i8_matmul

                return i8_matmul(
                    xk, base, out_dtype=x.dtype,
                    prefer_pallas=cfg.prefer_pallas, bias=bias,
                    act_from_col=tail_from, lora_h=lh, lora_up=lu)
            return quantized_matmul(
                xk, base, dequant_dtype=cfg.dequant_dtype,
                out_dtype=x.dtype, prefer_pallas=cfg.prefer_pallas,
                bias=bias, act_from_col=tail_from, lora_h=lh, lora_up=lu)
    # dense/unfused path: same epilogue the kernel fallback uses (one
    # definition of the GELU-from-column semantics)
    from ..ops.qmatmul import _host_epilogue

    out = linear(x, weight, None, cfg=cfg)
    return _host_epilogue(out, bias, tail_from)


def embedding(ids: jax.Array, table, *,
              cfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """ids: int (...,) -> (..., D). table: dense (V, D) (big quantized
    embeddings are eagerly dequantized at load, reference loader.py:384-397).
    """
    if isinstance(table, (PlanarQuant, I8Planar)):
        table = materialize(table, cfg.dequant_dtype)
    return jnp.take(table, ids, axis=0)


def layer_norm(x: jax.Array, weight=None, bias=None, *,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm with optional affine, fp32 statistics (VPU-friendly).

    A ``TPNormShard`` weight marks the input's feature axis as
    TP-sharded: statistics reduce across the mesh axis against the true
    full width (see quant.planar.TPNormShard)."""
    xf = x.astype(jnp.float32)
    if isinstance(weight, TPNormShard):
        n = jnp.float32(weight.full_dim)
        s = jax.lax.psum(jnp.sum(xf, axis=-1, keepdims=True), weight.axis)
        mu = s / n
        ss = jax.lax.psum(jnp.sum(jnp.square(xf - mu), axis=-1,
                                  keepdims=True), weight.axis)
        y = (xf - mu) * jax.lax.rsqrt(ss / n + eps)
        y = y * materialize(weight.weight, jnp.float32)
        if bias is not None:
            b = (bias.weight if isinstance(bias, TPNormShard) else bias)
            y = y + materialize(b, jnp.float32)
        return y.astype(x.dtype)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * materialize(weight, jnp.float32)
    if bias is not None:
        y = y + materialize(bias, jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jax.Array, weight=None, *, eps: float = 1e-6,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm (T5/Llama style), fp32 statistics.

    ``offset=1.0`` supports (1+w) parameterizations (e.g. Gemma-style).
    A ``TPNormShard`` weight reduces the statistics across the mesh axis
    (full-width norms over column-sharded activations, e.g. Wan qk-norm).
    """
    xf = x.astype(jnp.float32)
    if isinstance(weight, TPNormShard):
        ss = jax.lax.psum(jnp.sum(jnp.square(xf), axis=-1, keepdims=True),
                          weight.axis)
        y = xf * jax.lax.rsqrt(ss / jnp.float32(weight.full_dim) + eps)
        return (y * (materialize(weight.weight, jnp.float32) + offset)
                ).astype(x.dtype)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * (materialize(weight, jnp.float32) + offset)
    return y.astype(x.dtype)


def group_norm(x: jax.Array, weight=None, bias=None, *, num_groups: int = 32,
               eps: float = 1e-6) -> jax.Array:
    """GroupNorm over NHWC input (TPU-native channel-minor layout)."""
    *lead, c = x.shape
    xf = x.astype(jnp.float32).reshape(x.shape[0], -1, num_groups,
                                       c // num_groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 3), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    if weight is not None:
        y = y * materialize(weight, jnp.float32)
    if bias is not None:
        y = y + materialize(bias, jnp.float32)
    return y.astype(x.dtype)


def conv2d(x: jax.Array, weight, bias=None, *, stride=1, padding=0,
           cfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """2-D conv, NHWC activations, weight (O, I, kh, kw) dense or packed.

    Channel-minor (NHWC) is the TPU-native layout: the channel dim maps onto
    lanes so XLA tiles the conv onto the MXU.
    """
    w = materialize(weight, cfg.compute_dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    out = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype), w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3d(x: jax.Array, weight, bias=None, *, stride=1, padding=0,
           cfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """3-D conv (video patch embeds: HyVid/Wan), NDHWC activations."""
    w = materialize(weight, cfg.compute_dtype)
    if isinstance(stride, int):
        stride = (stride, stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding),) * 3
    out = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype), w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
