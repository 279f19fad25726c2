"""Fused dequantize + matmul — the TPU hot path.

Replaces the reference's per-forward unpack-then-linear stack
(reference dequant.py:30-44 per-block torch unpacking followed by
``torch.nn.functional.linear`` at ops.py:244): packed planar weight
components stream HBM→VMEM, codes are unpacked and scaled in-register on the
VPU, and the MXU consumes the dequantized tile directly — no fp16 weight is
ever materialized in HBM.

Two implementations with identical semantics:

* ``pallas_qmm`` — Pallas TPU kernel. Grid (m, r, k) with k innermost; the
  fp32 accumulator tile lives in VMEM across the k loop. The planar "nib4"
  layout's global K-split (quant/planar.py) means one packed byte holds the
  codes for logical rows j and j+K/2, so the kernel reads two x tiles per
  step and issues two MXU dots per unpacked byte-plane.
* ``xla_qmm`` — pure jax.numpy dequant→dot. XLA fuses the unpack arithmetic
  into the matmul prologue; used as the correctness oracle, the CPU path,
  and the fallback for shapes the kernel doesn't tile.

``quantized_matmul`` dispatches between them.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.planar import PlanarQuant, dequantize_kmajor

LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------

def xla_qmm(x: jax.Array, pq: PlanarQuant, *, dequant_dtype=jnp.bfloat16,
            out_dtype=None) -> jax.Array:
    """x: (..., K) @ W^T -> (..., R) via XLA-fused dequant."""
    w = dequantize_kmajor(pq, dequant_dtype)  # (K, R)
    out = jnp.dot(x.astype(dequant_dtype), w, preferred_element_type=jnp.float32)
    return out.astype(out_dtype or x.dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _expand_scales(s, gs: int, rows: int, rt: int):
    """(rows//gs, rt) per-group values -> (rows, rt) per-element (VPU)."""
    g = rows // gs
    return jnp.broadcast_to(s.reshape(g, 1, rt), (g, gs, rt)).reshape(rows, rt)


# experiment flag: issue one 2·kt-deep MXU dot per step instead of two
# kt-deep dots (halves per-dot pipeline overhead on K-heavy shapes)
FUSE_NIB4_DOT = True


def _gelu_tanh(x):
    # tanh-approximate GELU on the f32 accumulator (matches
    # jax.nn.gelu(approximate=True))
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _epilogue(acc, bias_ref, act_tile_from, j, lh_ref=None, lu_ref=None):
    # j (the r-grid index) is hoisted to kernel top level: program_id
    # doesn't lower inside pl.when branches in interpret mode
    if lh_ref is not None:
        # fused LoRA: += h @ upᵀ on the f32 accumulator. h is the tiny
        # (m, Σr) rank intermediate computed outside the kernel; doing
        # the rank-expand here (instead of an XLA epilogue after the
        # custom call) saves the full (M, R) delta HBM write + the
        # out-buffer re-read for the add — measured +77.5 ms/step at
        # flux full depth for the unfused form (BASELINE config 5).
        acc = acc + jnp.dot(lh_ref[:], lu_ref[:],
                            preferred_element_type=jnp.float32)
    if bias_ref is not None:
        acc = acc + bias_ref[0].astype(jnp.float32)[None, :]
    if act_tile_from is not None:
        acc = jnp.where(j >= act_tile_from, _gelu_tanh(acc), acc)
    return acc


def _make_nib4_kernel(*, zp, gs, kt, rt, n_k, compute_dtype, has_offsets,
                      lead=False, has_bias=False, act_tile_from=None,
                      has_lora=False):
    # lead=True: weight refs carry a leading depth-block dim of 1 (the
    # scalar-prefetch indexed path over stacked per-block weights).
    # has_bias / act_tile_from: fused epilogue — bias add and GELU-tanh on
    # r-tiles >= act_tile_from applied on the f32 accumulator before the
    # output cast (custom calls block XLA fusion, so doing it here saves
    # a full HBM round trip of the activation).
    # has_lora: rank-factored LoRA delta h @ upᵀ added on the accumulator
    # (operand order: [bias], [h, upᵀ], then the packed-weight refs).
    w = (lambda r: r[0]) if lead else (lambda r: r[:])

    def kernel(*refs):
        if lead:
            refs = refs[1:]  # scalar-prefetch ref (depth index) unused here
        bias_ref = lh_ref = lu_ref = None
        if has_bias:
            bias_ref = refs[0]  # bias is the FIRST tensor operand
            refs = refs[1:]
        if has_lora:
            lh_ref, lu_ref = refs[0], refs[1]
            refs = refs[2:]
        if has_offsets:
            (x_lo_ref, x_hi_ref, qs_ref, sc_lo_ref, sc_hi_ref,
             of_lo_ref, of_hi_ref, out_ref, acc_ref) = refs
        else:
            (x_lo_ref, x_hi_ref, qs_ref, sc_lo_ref, sc_hi_ref,
             out_ref, acc_ref) = refs
        k = pl.program_id(2)
        j = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # (kt, rt) u8: codes for rows j (lo nibble) and j+K/2 (hi nibble).
        # Mosaic has no u8 shifts or u8->f32 casts; widen to i32 first.
        qs = w(qs_ref).astype(jnp.int32)
        lo = (qs & 0x0F).astype(jnp.float32)
        hi = ((qs >> 4) & 0x0F).astype(jnp.float32)
        if zp:
            lo = lo - float(zp)
            hi = hi - float(zp)
        w_lo = lo * _expand_scales(w(sc_lo_ref), gs, kt, rt)
        w_hi = hi * _expand_scales(w(sc_hi_ref), gs, kt, rt)
        if has_offsets:
            w_lo = w_lo + _expand_scales(w(of_lo_ref), gs, kt, rt)
            w_hi = w_hi + _expand_scales(w(of_hi_ref), gs, kt, rt)

        if FUSE_NIB4_DOT:
            xc = jnp.concatenate([x_lo_ref[:], x_hi_ref[:]], axis=1)
            wc = jnp.concatenate([w_lo, w_hi], axis=0).astype(compute_dtype)
            acc_ref[:] += jnp.dot(xc, wc,
                                  preferred_element_type=jnp.float32)
        else:
            acc_ref[:] += jnp.dot(
                x_lo_ref[:], w_lo.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ) + jnp.dot(
                x_hi_ref[:], w_hi.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        @pl.when(k == n_k - 1)
        def _():
            out_ref[:] = _epilogue(acc_ref[:], bias_ref, act_tile_from,
                                   j, lh_ref, lu_ref).astype(out_ref.dtype)

    return kernel


def _make_int8_kernel(*, gs, kt, rt, n_k, compute_dtype, has_offsets,
                      lead=False, has_bias=False, act_tile_from=None,
                      has_lora=False):
    w = (lambda r: r[0]) if lead else (lambda r: r[:])

    def kernel(*refs):
        if lead:
            refs = refs[1:]
        bias_ref = lh_ref = lu_ref = None
        if has_bias:
            bias_ref = refs[0]
            refs = refs[1:]
        if has_lora:
            lh_ref, lu_ref = refs[0], refs[1]
            refs = refs[2:]
        if has_offsets:
            x_ref, qs_ref, sc_ref, of_ref, out_ref, acc_ref = refs
        else:
            x_ref, qs_ref, sc_ref, out_ref, acc_ref = refs
        k = pl.program_id(2)
        j = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        wv = (w(qs_ref).astype(jnp.int32).astype(jnp.float32)
              * _expand_scales(w(sc_ref), gs, kt, rt))
        if has_offsets:
            wv = wv + _expand_scales(w(of_ref), gs, kt, rt)

        acc_ref[:] += jnp.dot(
            x_ref[:], wv.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == n_k - 1)
        def _():
            out_ref[:] = _epilogue(acc_ref[:], bias_ref, act_tile_from,
                                   j, lh_ref, lu_ref).astype(out_ref.dtype)

    return kernel


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


def _largest_divisor_tile(total: int, align: int, cap: int) -> int | None:
    """Largest divisor of ``total`` that is a multiple of ``align`` and
    ≤ ``cap`` (None if there is none). Tile dims must DIVIDE the array
    dim (Mosaic block legality) — a fixed power-of-two candidate list
    misses every legal tile of non-power-of-two dims like sd3.5-large's
    2432/7296/1280."""
    best = None
    for d in range(align, min(total, cap) + 1, align):
        if total % d == 0:
            best = d
    return best


def _pick_kt(k_rows: int, gs: int) -> int | None:
    # Mosaic block legality: x block last dim -> kt % 128 == 0; scale
    # block sublanes -> (kt // gs) % 8 == 0. Smaller kt would need the
    # block to equal the full array dim, which defeats k-tiling.
    return _largest_divisor_tile(k_rows, _lcm(LANE, 8 * gs), 512)


# overridable for autotuning (see tests/bench sweeps)
log = logging.getLogger(__name__)

TILE_OVERRIDES: dict = {}

# per-shape tuned tiles: {(m_bucket, k_rows, rp, layout): (mt, kt, rt)}.
# Populated by ops.autotune (profile-driven) or loaded from the JSON at
# $GGUF_TPU_TILE_CACHE; consulted before the heuristics. m is bucketed to
# the next power of two so serving batch jitter reuses entries.
SHAPE_TILES: dict = {}


def _m_bucket(m: int) -> int:
    return 1 << max(0, (m - 1)).bit_length() if m > 0 else 1


def shape_key(m: int, k_rows: int, rp: int, layout: str) -> tuple:
    return (_m_bucket(m), k_rows, rp, layout)

# experimental: prefer 1024-wide r-tiles on wide weights (qkv/lin1-type).
# +8-10% TF/s on the isolated kernel (163-170 vs 150 @ M=4608) but a net
# LOSS at whole-model level (flux single blocks 11.8→14.1 ms — VMEM
# pressure starves the surrounding ops' double buffering). Keep off; left
# as a knob for per-shape re-evaluation on other chips.
SERVING_TILES = os.environ.get("GGUF_TPU_SERVING_TILES", "") not in ("", "0")


def _pick_tiles(m: int, k_rows: int, rp: int, gs: int,
                out_bytes: int = 2, layout: str = "nib4"):
    """(mt, kt, rt) tile sizes. kt tiles the stored code rows (K/2 for nib4).

    Large m-tiles amortize the VPU unpack (each (k, r) code tile is
    unpacked once per m-tile); large r-tiles amortize x re-streaming.
    Budget: acc (mt, rt) f32 + unpacked w (2·kt, rt) bf16 + x tiles must
    fit VMEM (~16 MB with double buffering).
    """
    ov_mt = ov_kt = ov_rt = None
    if TILE_OVERRIDES:
        # overrides are process-global and hit EVERY quantized matmul:
        # an indivisible tile would leave grid-tail rows/columns
        # unwritten (silent garbage), and a PARTIAL override dict must
        # not surface None tiles — merge per-key over the heuristics
        ov_mt = TILE_OVERRIDES.get("mt")
        ov_kt = TILE_OVERRIDES.get("kt")
        ov_rt = TILE_OVERRIDES.get("rt")
        if ov_kt is not None and k_rows % ov_kt:
            log.warning("TILE_OVERRIDES kt=%d indivisible for k_rows=%d; "
                        "using heuristic kt", ov_kt, k_rows)
            ov_kt = None
        if ov_rt is not None and rp % ov_rt:
            log.warning("TILE_OVERRIDES rt=%d indivisible for rp=%d; "
                        "using heuristic rt", ov_rt, rp)
            ov_rt = None

    def _merge(mt, kt, rt):
        return (ov_mt or mt, ov_kt or kt, ov_rt or rt)

    tuned = SHAPE_TILES.get(shape_key(m, k_rows, rp, layout))
    if tuned is not None:
        return _merge(*tuned)
    # DEEP k-tiles win at MODEL level (round-2 A/B ladder on v5e,
    # flux-dev full depth: kt256→512 687→658 ms; kt→1536 everywhere
    # 658→589 ms — whole-K single-pass for hidden-3072 shapes kills the
    # k-loop accumulator revisits; docs/NOTES_ROUND2.md). kt=3072 blows
    # the 16 MB scoped-VMEM budget (measured compile OOM: 23.4 MB), so
    # 1536 is the ceiling; the estimate below keeps (mt, rt) honest.
    # Tiles are chosen as the LARGEST LEGAL DIVISOR under the cap, not
    # from a fixed candidate list: non-power-of-two dims (sd3.5-large
    # hidden 2432 → code rows 1280, qkv rp 7296 = 57·128) have no
    # 512-series divisors at all and previously collapsed to kt=256 /
    # rt=128 shallow tiles (measured 1134 ms step vs the ~1.7× fused
    # advantage flux shapes get).
    kt = _largest_divisor_tile(k_rows, _lcm(LANE, 8 * gs), 1536)
    mp2 = max(8, 1 << max(0, (m - 1)).bit_length()) if m > 0 else 8
    mt = min(512, mp2)
    rt = _largest_divisor_tile(rp, LANE, 512) or LANE

    def vmem_est(mt, kt, rt):
        # calibrated against the measured compile-OOM report (kt=3072,
        # rt=512 → 23.4 MB scoped): acc f32 + out + double-buffered x
        # (two operands for nib4) + double-buffered u8 codes + the two
        # f32 unpack planes
        ktx = kt or 256
        return (4 * mt * rt + out_bytes * mt * rt
                + 2 * 2 * mt * ktx * 2
                + 2 * ktx * rt + 2 * 4 * ktx * rt)

    budget = 15_800_000  # scoped-vmem limit is 16 MiB
    while kt and vmem_est(mt, kt, rt) > budget:
        if kt > 512:
            # deep-kt over budget: drop to the next legal depth first
            shallow = _largest_divisor_tile(k_rows, _lcm(LANE, 8 * gs), 512)
            if shallow is None or shallow == kt:
                mt //= 2  # no shallower legal depth; shrink m instead
            kt = shallow or kt
        elif rt > 256:
            rt //= 2
        elif mt > 256:
            mt //= 2
        else:
            break
    return _merge(mt, kt, rt)


def _prep_lora(lora_h, lora_up, mp: int, rp: int, dt):
    """Pad the rank-factored epilogue operands to kernel-legal shapes:
    h (..., r) → (mp, rk), upᵀ (r, R) → (rk, rp), rk = r padded to a lane
    multiple (zero pad — padded rank rows contribute nothing)."""
    r = lora_up.shape[0]
    rk = _cdiv(r, LANE) * LANE
    lh = lora_h.reshape(-1, r).astype(dt)
    lh = jnp.pad(lh, ((0, mp - lh.shape[0]), (0, rk - r)))
    lu = jnp.pad(lora_up.astype(dt),
                 ((0, rk - r), (0, rp - lora_up.shape[1])))
    return lh, lu


@functools.partial(
    jax.jit,
    static_argnames=("dequant_dtype", "out_dtype", "interpret",
                     "act_from_col"),
)
def pallas_qmm(x: jax.Array, pq: PlanarQuant, *, dequant_dtype=jnp.bfloat16,
               out_dtype=None, interpret: bool = False, bias=None,
               act_from_col: int | None = None, lora_h=None,
               lora_up=None) -> jax.Array:
    """Fused x @ W^T with W kept packed. x: (..., K) -> (..., R).

    bias: optional (R,) added on the f32 accumulator in-kernel.
    act_from_col: apply GELU-tanh to output columns >= this index (0 =
    whole output) inside the kernel — must be a multiple of the r-tile
    (callers check via fusable_epilogue).
    lora_h / lora_up: rank-factored LoRA epilogue fused into the kernel —
    ``out += lora_h @ lora_up`` with lora_h (..., Σr) the precomputed
    rank intermediate and lora_up (Σr, R) the scale-folded upᵀ; applied
    on the f32 accumulator BEFORE bias/activation (= patching W itself).
    """
    out_dtype = out_dtype or x.dtype
    R, K = pq.shape
    rp = pq.padded_out
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    m = x2.shape[0]
    gs = pq.group_size
    has_offsets = pq.offsets is not None
    nib4 = pq.layout == "nib4"
    k_rows = pq.qs.shape[0]  # Kp//2 for nib4, Kp for int8
    kp = k_rows * (2 if nib4 else 1)  # planar-padded K
    if kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - K)))

    mt, kt, rt = _pick_tiles(m, k_rows, rp, gs,
                             out_bytes=jnp.dtype(out_dtype).itemsize,
                             layout=pq.layout)
    if kt is None:
        raise ValueError(f"untileable K rows {k_rows} (gs={gs})")
    mp = _cdiv(m, mt) * mt
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    x2 = x2.astype(dequant_dtype)

    n_m, n_r, n_k = mp // mt, rp // rt, k_rows // kt
    grid = (n_m, n_r, n_k)
    sg = kt // gs  # scale rows per k tile

    def vmem(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    out_spec = vmem((mt, rt), lambda i, j, k: (i, j))
    cost = pl.CostEstimate(
        flops=2 * mp * K * rp,
        bytes_accessed=pq.nbytes_packed + mp * K * 2 + mp * rp * 2,
        transcendentals=0,
    )

    has_bias = bias is not None
    act_tile_from = None
    if act_from_col is not None:
        if act_from_col % rt:
            raise ValueError(f"act_from_col {act_from_col} not a multiple "
                             f"of r-tile {rt}")
        act_tile_from = act_from_col // rt
    has_lora = lora_h is not None
    ep = dict(has_bias=has_bias, act_tile_from=act_tile_from,
              has_lora=has_lora)
    bias_specs, bias_args = [], []
    if has_bias:
        bias_specs = [vmem((1, rt), lambda i, j, k: (0, j))]
        bias_args = [jnp.pad(bias.astype(jnp.float32),
                             (0, rp - bias.shape[0]))[None, :]]
    if has_lora:
        lh, lu = _prep_lora(lora_h, lora_up, mp, rp, dequant_dtype)
        rk = lh.shape[1]
        bias_specs += [vmem((mt, rk), lambda i, j, k: (i, 0)),
                       vmem((rk, rt), lambda i, j, k: (0, j))]
        bias_args += [lh, lu]

    if nib4:
        kernel = _make_nib4_kernel(
            zp=pq.zero_point, gs=gs, kt=kt, rt=rt, n_k=n_k,
            compute_dtype=dequant_dtype, has_offsets=has_offsets, **ep,
        )
        # lo covers logical k rows [k*kt, (k+1)*kt); hi the same + K/2,
        # i.e. block index shifted by n_k.
        in_specs = bias_specs + [
            vmem((mt, kt), lambda i, j, k: (i, k)),
            vmem((mt, kt), lambda i, j, k: (i, k + n_k)),
            vmem((kt, rt), lambda i, j, k: (k, j)),
            vmem((sg, rt), lambda i, j, k: (k, j)),
            vmem((sg, rt), lambda i, j, k: (k + n_k, j)),
        ]
        args = bias_args + [x2, x2, pq.qs, pq.scales, pq.scales]
        if has_offsets:
            in_specs += [
                vmem((sg, rt), lambda i, j, k: (k, j)),
                vmem((sg, rt), lambda i, j, k: (k + n_k, j)),
            ]
            args += [pq.offsets, pq.offsets]
    else:
        kernel = _make_int8_kernel(
            gs=gs, kt=kt, rt=rt, n_k=n_k,
            compute_dtype=dequant_dtype, has_offsets=has_offsets, **ep,
        )
        in_specs = bias_specs + [
            vmem((mt, kt), lambda i, j, k: (i, k)),
            vmem((kt, rt), lambda i, j, k: (k, j)),
            vmem((sg, rt), lambda i, j, k: (k, j)),
        ]
        args = bias_args + [x2, pq.qs, pq.scales]
        if has_offsets:
            in_specs.append(vmem((sg, rt), lambda i, j, k: (k, j)))
            args.append(pq.offsets)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((mp, rp), out_dtype),
        scratch_shapes=[pltpu.VMEM((mt, rt), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    return out[:m, :R].reshape(*lead, R)


# ---------------------------------------------------------------------------
# indexed (stacked-depth) kernel — the scan hot path
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("dequant_dtype", "out_dtype", "interpret",
                     "act_from_col"),
)
def pallas_qmm_indexed(x: jax.Array, pq: PlanarQuant, idx: jax.Array, *,
                       dequant_dtype=jnp.bfloat16, out_dtype=None,
                       interpret: bool = False, bias=None,
                       act_from_col: int | None = None, lora_h=None,
                       lora_up=None) -> jax.Array:
    """x @ W_idxᵀ where pq leaves carry a leading DEPTH axis and ``idx``
    is a traced block index (e.g. the lax.scan induction variable).

    Motivation (round-2 profile of the full-depth flux forward): scanning
    over scan-sliced stacked weights forced XLA to MATERIALIZE each
    block's packed bytes before the custom call — ``copy`` (770 ms) +
    ``slice`` (332 ms) dwarfed the matmul work itself (394 ms). Pallas
    scalar prefetch moves the depth index into the kernel's index_maps,
    so weight tiles stream straight from the stacked HBM buffer — the
    slice/copy pair disappears entirely.
    """
    out_dtype = out_dtype or x.dtype
    R, K = pq.shape
    rp = pq.padded_out
    lead_sh = x.shape[:-1]
    x2 = x.reshape(-1, K)
    m = x2.shape[0]
    gs = pq.group_size
    has_offsets = pq.offsets is not None
    nib4 = pq.layout == "nib4"
    k_rows = pq.qs.shape[1]  # leaves are (depth, k_rows, rp)
    kp = k_rows * (2 if nib4 else 1)
    if kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - K)))

    mt, kt, rt = _pick_tiles(m, k_rows, rp, gs,
                             out_bytes=jnp.dtype(out_dtype).itemsize,
                             layout=pq.layout)
    if kt is None:
        raise ValueError(f"untileable K rows {k_rows} (gs={gs})")
    mp = _cdiv(m, mt) * mt
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    x2 = x2.astype(dequant_dtype)

    n_m, n_r, n_k = mp // mt, rp // rt, k_rows // kt
    sg = kt // gs

    def vmem(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    out_spec = vmem((mt, rt), lambda i, j, k, s: (i, j))
    cost = pl.CostEstimate(
        flops=2 * mp * K * rp,
        bytes_accessed=pq.nbytes_packed // pq.qs.shape[0]
        + mp * K * 2 + mp * rp * 2,
        transcendentals=0,
    )

    has_bias = bias is not None
    act_tile_from = None
    if act_from_col is not None:
        if act_from_col % rt:
            raise ValueError(f"act_from_col {act_from_col} not a multiple "
                             f"of r-tile {rt}")
        act_tile_from = act_from_col // rt
    has_lora = lora_h is not None
    ep = dict(has_bias=has_bias, act_tile_from=act_tile_from,
              has_lora=has_lora)
    bias_specs, bias_args = [], []
    if has_bias:
        # bias may itself be depth-stacked (depth, R) or shared (R,)
        if bias.ndim == 2:
            bias_specs = [vmem((1, rt), lambda i, j, k, s: (s[0], j))]
            bias_args = [jnp.pad(bias.astype(jnp.float32),
                                 ((0, 0), (0, rp - bias.shape[1])))]
        else:
            bias_specs = [vmem((1, rt), lambda i, j, k, s: (0, j))]
            bias_args = [jnp.pad(bias.astype(jnp.float32),
                                 (0, rp - bias.shape[0]))[None, :]]
    if has_lora:
        # h/upᵀ are per-block values computed in the scan body (the patch
        # factors ride the scan's xs), so no depth indexing here
        lh, lu = _prep_lora(lora_h, lora_up, mp, rp, dequant_dtype)
        rk = lh.shape[1]
        bias_specs += [vmem((mt, rk), lambda i, j, k, s: (i, 0)),
                       vmem((rk, rt), lambda i, j, k, s: (0, j))]
        bias_args += [lh, lu]

    # weight index_maps read the depth index from the scalar-prefetch ref
    if nib4:
        kernel = _make_nib4_kernel(
            zp=pq.zero_point, gs=gs, kt=kt, rt=rt, n_k=n_k,
            compute_dtype=dequant_dtype, has_offsets=has_offsets,
            lead=True, **ep,
        )
        in_specs = bias_specs + [
            vmem((mt, kt), lambda i, j, k, s: (i, k)),
            vmem((mt, kt), lambda i, j, k, s: (i, k + n_k)),
            vmem((1, kt, rt), lambda i, j, k, s: (s[0], k, j)),
            vmem((1, sg, rt), lambda i, j, k, s: (s[0], k, j)),
            vmem((1, sg, rt), lambda i, j, k, s: (s[0], k + n_k, j)),
        ]
        args = bias_args + [x2, x2, pq.qs, pq.scales, pq.scales]
        if has_offsets:
            in_specs += [
                vmem((1, sg, rt), lambda i, j, k, s: (s[0], k, j)),
                vmem((1, sg, rt), lambda i, j, k, s: (s[0], k + n_k, j)),
            ]
            args += [pq.offsets, pq.offsets]
    else:
        kernel = _make_int8_kernel(
            gs=gs, kt=kt, rt=rt, n_k=n_k,
            compute_dtype=dequant_dtype, has_offsets=has_offsets,
            lead=True, **ep,
        )
        in_specs = bias_specs + [
            vmem((mt, kt), lambda i, j, k, s: (i, k)),
            vmem((1, kt, rt), lambda i, j, k, s: (s[0], k, j)),
            vmem((1, sg, rt), lambda i, j, k, s: (s[0], k, j)),
        ]
        args = bias_args + [x2, pq.qs, pq.scales]
        if has_offsets:
            in_specs.append(vmem((1, sg, rt), lambda i, j, k, s: (s[0], k, j)))
            args.append(pq.offsets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_m, n_r, n_k),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((mt, rt), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, rp), out_dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.atleast_1d(idx).astype(jnp.int32), *args)

    return out[:m, :R].reshape(*lead_sh, R)


def indexed_matmul(x: jax.Array, pq_stacked: PlanarQuant, idx, *,
                   dequant_dtype=jnp.bfloat16, out_dtype=None,
                   prefer_pallas: bool | None = None, bias=None,
                   act_from_col: int | None = None, lora_h=None,
                   lora_up=None) -> jax.Array:
    """Dispatcher for depth-stacked weights + traced index. Pallas on TPU
    via scalar prefetch (zero-copy); XLA fallback slices then dequantizes
    (the copy is unavoidable without the custom kernel)."""
    shape1 = PlanarQuant(
        qs=jax.ShapeDtypeStruct(pq_stacked.qs.shape[1:],
                                pq_stacked.qs.dtype),
        scales=None, offsets=None, qtype=pq_stacked.qtype,
        layout=pq_stacked.layout, group_size=pq_stacked.group_size,
        zero_point=pq_stacked.zero_point, shape=pq_stacked.shape)
    if prefer_pallas is None:
        prefer_pallas = _have_tpu()
    m = 1
    for d in x.shape[:-1]:
        m *= d
    big_weight = pq_stacked.shape[0] * pq_stacked.shape[1] >= (1 << 23)
    if (prefer_pallas and (m >= 16 or big_weight)
            and pallas_tileable(shape1)
            and _epilogue_tiles_ok(m, pq_stacked, act_from_col)):
        return pallas_qmm_indexed(x, pq_stacked, idx,
                                  dequant_dtype=dequant_dtype,
                                  out_dtype=out_dtype,
                                  interpret=_interpret_default(),
                                  bias=bias, act_from_col=act_from_col,
                                  lora_h=lora_h, lora_up=lora_up)
    sliced = jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_index_in_dim(a, idx, axis=0,
                                               keepdims=False), pq_stacked)
    if bias is not None and bias.ndim == 2:
        bias = jax.lax.dynamic_index_in_dim(bias, idx, axis=0,
                                            keepdims=False)
    return _host_epilogue(
        xla_qmm(x, sliced, dequant_dtype=dequant_dtype,
                out_dtype=out_dtype), bias, act_from_col,
        lora_h, lora_up)


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

def pallas_tileable(pq: PlanarQuant) -> bool:
    if _pick_kt(pq.qs.shape[0], pq.group_size) is None:
        return False
    # planarize pads K to a 512 multiple; on tiny in_features the pad
    # dominates (K=64 → 8× wasted FLOPs and a pointless Mosaic compile
    # per shape) — leave those on the XLA path
    K = pq.shape[1]
    kp = pq.qs.shape[0] * (2 if pq.layout == "nib4" else 1)
    return K >= 512 and kp <= K * 1.25


@functools.cache
def _have_tpu() -> bool:
    return any(d.platform == "tpu" for d in jax.devices())


def _interpret_default() -> bool:
    """Pallas interpret mode: forced via env, or automatic off-TPU.

    Lets the REAL kernel logic (not the XLA fallback) run under CPU test
    meshes — the only way to validate per-shard kernel semantics without
    n real chips (VERDICT r1 item 2)."""
    if os.environ.get("GGUF_TPU_PALLAS_INTERPRET", "") not in ("", "0"):
        return True
    return not _have_tpu()


def _host_epilogue(out, bias, act_from_col, lora_h=None, lora_up=None):
    """Unfused fallback for the kernel epilogue (XLA/CPU paths)."""
    if lora_h is not None:
        dt = lora_h.dtype
        delta = jnp.dot(lora_h.reshape(-1, lora_h.shape[-1]),
                        lora_up.astype(dt),
                        preferred_element_type=jnp.float32)
        out = out + delta.reshape(*out.shape[:-1],
                                  lora_up.shape[1]).astype(out.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if act_from_col is not None:
        act = lambda t: jax.nn.gelu(t.astype(jnp.float32),
                                    approximate=True).astype(t.dtype)
        if act_from_col == 0:
            out = act(out)
        else:
            out = jnp.concatenate(
                [out[..., :act_from_col], act(out[..., act_from_col:])],
                axis=-1)
    return out


def _epilogue_tiles_ok(m, pq, act_from_col, out_bytes=2):
    if act_from_col is None or act_from_col == 0:
        return True
    _, _, rt = _pick_tiles(m, pq.qs.shape[-2], pq.padded_out,
                           pq.group_size, out_bytes=out_bytes,
                           layout=pq.layout)
    return act_from_col % rt == 0


def quantized_matmul(x: jax.Array, pq: PlanarQuant, *,
                     dequant_dtype=jnp.bfloat16, out_dtype=None,
                     prefer_pallas: bool | None = None, bias=None,
                     act_from_col: int | None = None, lora_h=None,
                     lora_up=None) -> jax.Array:
    """x @ W^T with packed planar W. Dispatches Pallas on TPU, XLA otherwise.

    Tiny-M calls on small weights stay on the XLA path (m-tile padding
    would waste the launch and each distinct M adds a Mosaic compile) —
    but BIG weights always take the kernel: at M=1 the XLA path
    materializes the dequantized matrix, while the kernel only streams
    packed bytes (e.g. flux modulation projections, 18432×3072 every
    denoise step).
    """
    if prefer_pallas is None:
        prefer_pallas = _have_tpu()
    m = 1
    for d in x.shape[:-1]:
        m *= d
    big_weight = pq.shape[0] * pq.shape[1] >= (1 << 23)
    if (prefer_pallas and (m >= 16 or big_weight) and pallas_tileable(pq)
            and _epilogue_tiles_ok(m, pq, act_from_col)):
        # prefer_pallas=True off-TPU runs the kernel in interpret mode
        # (slow, test-only) rather than failing the Mosaic compile
        return pallas_qmm(x, pq, dequant_dtype=dequant_dtype,
                          out_dtype=out_dtype,
                          interpret=_interpret_default(),
                          bias=bias, act_from_col=act_from_col,
                          lora_h=lora_h, lora_up=lora_up)
    return _host_epilogue(
        xla_qmm(x, pq, dequant_dtype=dequant_dtype, out_dtype=out_dtype),
        bias, act_from_col, lora_h, lora_up)
