"""w8a8 integer-MXU matmul — the 2x-rate hot path.

TPU MXUs multiply s8xs8->s32 at twice the bf16 FLOP rate (measured here:
361-366 TOP/s vs 169 TF/s on v5e-1 — tools_i8_microbench.py), and the
flux full-depth step is compute-bound at 0.93 of bf16 peak, so routing
the DiT matmuls through int8 is the single largest step-time lever on
this hardware. The reference has no analogue (it always matmuls in
fp16/bf16 after dequant, reference ops.py:242-244); this is new
TPU-native capability layered on the same packed-GGUF load path.

Pipeline per matmul:
  1. activations quantize dynamically per token row (quant/i8.quantize_rows)
     — one fused XLA pass over x;
  2. the kernel streams int8 weight tiles HBM->VMEM and accumulates the
     whole contraction in an EXACT s32 VMEM accumulator (K*127^2 < 2^31);
  3. one f32 rescale in the epilogue (xs[m] * ws[r] * acc) followed by the
     same fused epilogue the bf16 kernel uses (LoRA rank delta, bias,
     GELU-tanh from a column) — reusing ops/qmatmul._epilogue.

Weight requantization (Q4_K etc -> per-column int8) happens once at load
(quant/i8.requantize_i8); see that module for the accuracy argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.i8 import I8Planar, quantize_rows
from .qmatmul import (LANE, _cdiv, _epilogue, _have_tpu, _interpret_default,
                      _largest_divisor_tile, _prep_lora)


def _pick_tiles_i8(m: int, kp: int, rp: int, out_bytes: int = 2):
    """(mt, kt, rt). Whole-K tiles win for i8 (microbench: kt=3072 beats
    kt=1536 by 20% — fewer accumulator revisits and s8 bytes are half of
    bf16), so the depth cap is 3072 under a VMEM budget."""
    kt = _largest_divisor_tile(kp, LANE, 3072)
    # int8 min tile is (32, 128): keep the m-tile >= 32 sublanes
    mp2 = max(32, 1 << max(0, (m - 1)).bit_length()) if m > 0 else 32
    mt = min(512, mp2)
    rt = _largest_divisor_tile(rp, LANE, 512) or LANE

    def vmem_est(mt, kt, rt):
        # double-buffered s8 xq + s8 wq, s32 acc, out, xs column
        return (2 * mt * kt + 2 * kt * rt + 4 * mt * rt
                + out_bytes * mt * rt + 4 * mt * LANE)

    budget = 15_800_000
    while kt and vmem_est(mt, kt, rt) > budget:
        if kt > 1536:
            kt = _largest_divisor_tile(kp, LANE, 1536) or kt
            if vmem_est(mt, kt, rt) <= budget:
                break
            if kt > 512:
                kt = _largest_divisor_tile(kp, LANE, 512) or kt
        elif rt > 256:
            rt //= 2
        elif mt > 256:
            mt //= 2
        else:
            break
    return mt, kt, rt


def _make_i8_kernel(*, kt, rt, n_k, lead=False, has_bias=False,
                    act_tile_from=None, has_lora=False):
    w = (lambda r: r[0]) if lead else (lambda r: r[:])

    def kernel(*refs):
        if lead:
            refs = refs[1:]  # scalar-prefetch ref consumed by index_maps
        bias_ref = lh_ref = lu_ref = None
        if has_bias:
            bias_ref = refs[0]
            refs = refs[1:]
        if has_lora:
            lh_ref, lu_ref = refs[0], refs[1]
            refs = refs[2:]
        xq_ref, xs_ref, wq_ref, ws_ref, out_ref, acc_ref = refs
        k = pl.program_id(2)
        j = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(xq_ref[:], w(wq_ref),
                              preferred_element_type=jnp.int32)

        @pl.when(k == n_k - 1)
        def _():
            accf = (acc_ref[:].astype(jnp.float32)
                    * xs_ref[:]
                    * w(ws_ref)[0].astype(jnp.float32)[None, :])
            out_ref[:] = _epilogue(accf, bias_ref, act_tile_from,
                                   j, lh_ref, lu_ref).astype(out_ref.dtype)

    return kernel


def _prep_inputs(x, ip: I8Planar, mt: int):
    """Flatten/pad/quantize x for the kernel grid. Returns
    (xq (mp, Kp) s8, xs (mp, 1) f32, m, mp, lead_shape)."""
    R, K = ip.shape
    kp = ip.padded_in
    lead_sh = x.shape[:-1]
    x2 = x.reshape(-1, K)
    m = x2.shape[0]
    if kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - K)))
    mp = _cdiv(m, mt) * mt
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    xq, xs = quantize_rows(x2)
    return xq, xs, m, mp, lead_sh


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "interpret", "act_from_col"),
)
def pallas_i8mm(x: jax.Array, ip: I8Planar, *, out_dtype=None,
                interpret: bool = False, bias=None,
                act_from_col: int | None = None, lora_h=None,
                lora_up=None) -> jax.Array:
    """Fused w8a8 x @ W^T. x: (..., K) -> (..., R)."""
    out_dtype = out_dtype or x.dtype
    R, K = ip.shape
    rp = ip.padded_out
    kp = ip.padded_in
    mt, kt, rt = _pick_tiles_i8(_flat_m(x), kp, rp,
                                out_bytes=jnp.dtype(out_dtype).itemsize)
    if kt is None:
        raise ValueError(f"untileable padded K {kp}")
    xq, xs, m, mp, lead_sh = _prep_inputs(x, ip, mt)

    n_m, n_r, n_k = mp // mt, rp // rt, kp // kt
    grid = (n_m, n_r, n_k)

    def vmem(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    has_bias = bias is not None
    act_tile_from = None
    if act_from_col is not None:
        if act_from_col % rt:
            raise ValueError(f"act_from_col {act_from_col} not a multiple "
                             f"of r-tile {rt}")
        act_tile_from = act_from_col // rt
    has_lora = lora_h is not None

    ep_specs, ep_args = [], []
    if has_bias:
        ep_specs.append(vmem((1, rt), lambda i, j, k: (0, j)))
        ep_args.append(jnp.pad(bias.astype(jnp.float32),
                               (0, rp - bias.shape[0]))[None, :])
    if has_lora:
        lh, lu = _prep_lora(lora_h, lora_up, mp, rp, jnp.bfloat16)
        rk = lh.shape[1]
        ep_specs += [vmem((mt, rk), lambda i, j, k: (i, 0)),
                     vmem((rk, rt), lambda i, j, k: (0, j))]
        ep_args += [lh, lu]

    kernel = _make_i8_kernel(kt=kt, rt=rt, n_k=n_k, has_bias=has_bias,
                             act_tile_from=act_tile_from, has_lora=has_lora)
    in_specs = ep_specs + [
        vmem((mt, kt), lambda i, j, k: (i, k)),
        vmem((mt, 1), lambda i, j, k: (i, 0)),
        vmem((kt, rt), lambda i, j, k: (k, j)),
        vmem((1, rt), lambda i, j, k: (0, j)),
    ]
    args = ep_args + [xq, xs, ip.qs, ip.scales]

    cost = pl.CostEstimate(
        flops=2 * mp * kp * rp,
        bytes_accessed=ip.nbytes_packed + mp * kp + mp * rp * 2,
        transcendentals=0,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=vmem((mt, rt), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, rp), out_dtype),
        scratch_shapes=[pltpu.VMEM((mt, rt), jnp.int32)],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return out[:m, :R].reshape(*lead_sh, R)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "interpret", "act_from_col"),
)
def pallas_i8mm_indexed(x: jax.Array, ip: I8Planar, idx: jax.Array, *,
                        out_dtype=None, interpret: bool = False, bias=None,
                        act_from_col: int | None = None, lora_h=None,
                        lora_up=None) -> jax.Array:
    """w8a8 x @ W_idx^T over depth-stacked weights: idx is a traced block
    index (the lax.scan induction variable); weight tiles stream straight
    from the stacked HBM buffer via scalar prefetch (same motivation as
    ops/qmatmul.pallas_qmm_indexed — no per-block slice/copy)."""
    out_dtype = out_dtype or x.dtype
    R, K = ip.shape
    rp = ip.padded_out
    kp = ip.padded_in
    mt, kt, rt = _pick_tiles_i8(_flat_m(x), kp, rp,
                                out_bytes=jnp.dtype(out_dtype).itemsize)
    if kt is None:
        raise ValueError(f"untileable padded K {kp}")
    xq, xs, m, mp, lead_sh = _prep_inputs(x, ip, mt)

    n_m, n_r, n_k = mp // mt, rp // rt, kp // kt

    def vmem(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    has_bias = bias is not None
    act_tile_from = None
    if act_from_col is not None:
        if act_from_col % rt:
            raise ValueError(f"act_from_col {act_from_col} not a multiple "
                             f"of r-tile {rt}")
        act_tile_from = act_from_col // rt
    has_lora = lora_h is not None

    ep_specs, ep_args = [], []
    if has_bias:
        if bias.ndim == 2:  # depth-stacked (depth, R)
            ep_specs.append(vmem((1, rt), lambda i, j, k, s: (s[0], j)))
            ep_args.append(jnp.pad(bias.astype(jnp.float32),
                                   ((0, 0), (0, rp - bias.shape[1]))))
        else:
            ep_specs.append(vmem((1, rt), lambda i, j, k, s: (0, j)))
            ep_args.append(jnp.pad(bias.astype(jnp.float32),
                                   (0, rp - bias.shape[0]))[None, :])
    if has_lora:
        lh, lu = _prep_lora(lora_h, lora_up, mp, rp, jnp.bfloat16)
        rk = lh.shape[1]
        ep_specs += [vmem((mt, rk), lambda i, j, k, s: (i, 0)),
                     vmem((rk, rt), lambda i, j, k, s: (0, j))]
        ep_args += [lh, lu]

    kernel = _make_i8_kernel(kt=kt, rt=rt, n_k=n_k, lead=True,
                             has_bias=has_bias,
                             act_tile_from=act_tile_from, has_lora=has_lora)
    in_specs = ep_specs + [
        vmem((mt, kt), lambda i, j, k, s: (i, k)),
        vmem((mt, 1), lambda i, j, k, s: (i, 0)),
        vmem((1, kt, rt), lambda i, j, k, s: (s[0], k, j)),
        vmem((1, 1, rt), lambda i, j, k, s: (s[0], 0, j)),
    ]
    args = ep_args + [xq, xs, ip.qs, ip.scales]

    cost = pl.CostEstimate(
        flops=2 * mp * kp * rp,
        bytes_accessed=ip.nbytes_packed // ip.qs.shape[0]
        + mp * kp + mp * rp * 2,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_m, n_r, n_k),
        in_specs=in_specs,
        out_specs=vmem((mt, rt), lambda i, j, k, s: (i, j)),
        scratch_shapes=[pltpu.VMEM((mt, rt), jnp.int32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, rp), out_dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.atleast_1d(idx).astype(jnp.int32), *args)
    return out[:m, :R].reshape(*lead_sh, R)


def _flat_m(x) -> int:
    m = 1
    for d in x.shape[:-1]:
        m *= d
    return m


def xla_i8mm(x: jax.Array, ip: I8Planar, *, out_dtype=None, bias=None,
             act_from_col: int | None = None, lora_h=None,
             lora_up=None) -> jax.Array:
    """Same-math XLA path (CPU tests / untileable shapes): identical
    integer operands (shared quantize_rows), s32 dot, f32 rescale, then
    the same f32-domain epilogue order as the kernel (lora -> bias ->
    gelu before the single output cast)."""
    out_dtype = out_dtype or x.dtype
    R, K = ip.shape
    lead_sh = x.shape[:-1]
    x2 = x.reshape(-1, K)
    kp = ip.padded_in
    if kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - K)))
    xq, xs = quantize_rows(x2)
    acc = jnp.dot(xq, ip.qs, preferred_element_type=jnp.int32)
    accf = acc.astype(jnp.float32) * xs * ip.scales.astype(jnp.float32)
    accf = accf[:, :R]
    if lora_h is not None:
        lh = lora_h.reshape(-1, lora_h.shape[-1])
        accf = accf + jnp.dot(lh, lora_up.astype(lh.dtype),
                              preferred_element_type=jnp.float32)[:, :R]
    if bias is not None:
        accf = accf + bias.astype(jnp.float32)[None, :]
    if act_from_col is not None:
        from .qmatmul import _gelu_tanh

        if act_from_col == 0:
            accf = _gelu_tanh(accf)
        else:
            accf = jnp.concatenate(
                [accf[:, :act_from_col], _gelu_tanh(accf[:, act_from_col:])],
                axis=1)
    return accf.astype(out_dtype).reshape(*lead_sh, R)


def i8_matmul(x: jax.Array, ip: I8Planar, *, out_dtype=None,
              prefer_pallas: bool | None = None, bias=None,
              act_from_col: int | None = None, lora_h=None,
              lora_up=None) -> jax.Array:
    """Dispatcher: Pallas on TPU, same-math XLA otherwise.

    Note the BW tradeoff vs the bf16 fused path: int8 weights are ~8 bpw
    against nib4's ~4.5, so tiny-M (BW-bound) matmuls are better off on
    the PlanarQuant path — w8a8 is for the compute-bound serving shapes.
    Model-level conversion (quant/i8.convert_tree_i8) is all-or-nothing
    per tree; callers choose per model.
    """
    if prefer_pallas is None:
        prefer_pallas = _have_tpu()
    if prefer_pallas and _i8_tileable(ip) \
            and _i8_epilogue_ok(_flat_m(x), ip, act_from_col):
        return pallas_i8mm(x, ip, out_dtype=out_dtype,
                           interpret=_interpret_default(), bias=bias,
                           act_from_col=act_from_col, lora_h=lora_h,
                           lora_up=lora_up)
    return xla_i8mm(x, ip, out_dtype=out_dtype, bias=bias,
                    act_from_col=act_from_col, lora_h=lora_h,
                    lora_up=lora_up)


def i8_indexed_matmul(x: jax.Array, ip: I8Planar, idx, *, out_dtype=None,
                      prefer_pallas: bool | None = None, bias=None,
                      act_from_col: int | None = None, lora_h=None,
                      lora_up=None) -> jax.Array:
    """Depth-stacked dispatcher (scan hot path)."""
    if prefer_pallas is None:
        prefer_pallas = _have_tpu()
    shape1 = I8Planar(
        qs=jax.ShapeDtypeStruct(ip.qs.shape[1:], ip.qs.dtype),
        scales=None, qtype=ip.qtype, shape=ip.shape)
    if prefer_pallas and _i8_tileable(shape1) \
            and _i8_epilogue_ok(_flat_m(x), shape1, act_from_col):
        return pallas_i8mm_indexed(x, ip, idx, out_dtype=out_dtype,
                                   interpret=_interpret_default(),
                                   bias=bias, act_from_col=act_from_col,
                                   lora_h=lora_h, lora_up=lora_up)
    sliced = I8Planar(
        qs=jax.lax.dynamic_index_in_dim(ip.qs, idx, axis=0, keepdims=False),
        scales=jax.lax.dynamic_index_in_dim(ip.scales, idx, axis=0,
                                            keepdims=False),
        qtype=ip.qtype, shape=ip.shape)
    if bias is not None and bias.ndim == 2:
        bias = jax.lax.dynamic_index_in_dim(bias, idx, axis=0,
                                            keepdims=False)
    return xla_i8mm(x, sliced, out_dtype=out_dtype, bias=bias,
                    act_from_col=act_from_col, lora_h=lora_h,
                    lora_up=lora_up)


def _i8_tileable(ip: I8Planar) -> bool:
    kp = ip.qs.shape[-2]
    if _largest_divisor_tile(kp, LANE, 3072) is None:
        return False
    K = ip.shape[1]
    return K >= 512 and kp <= K * 1.25


def _i8_epilogue_ok(m, ip, act_from_col) -> bool:
    if act_from_col is None or act_from_col == 0:
        return True
    _, _, rt = _pick_tiles_i8(m, ip.qs.shape[-2], ip.padded_out)
    return act_from_col % rt == 0
