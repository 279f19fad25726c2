"""int8 flash attention — attention on the integer MXU.

After the w8a8 matmul path landed, the flux step profile is: matmul
kernels ~172 ms (≈95% of the measured s8 MXU rate), splash attention
~89 ms (168 TF/s = bf16 peak), fusions ~67 ms. Attention is the last
big FLOP block still running at the bf16 rate, so this kernel moves the
two attention dots onto the MXU's 2x int8 mode (SageAttention-style;
the reference has no attention code at all — attention is host-owned,
SURVEY.md §5 "long-context").

MEASURED VERDICT (v5e-1, flux joint shape; docs/KERNEL.md table): the
bf16 splash kernel stays the default — 2.18 ms vs 2.59/2.47 ms here.
The s8 QK dot is contraction-starved (D=128 → ~120 TOP/s, far from the
361 TOP/s deep-K rate) and the f32 softmax VPU chain (~1.5 ms/call) is
the true floor; the int8 path adds VPU passes worth more than the dot
time it saves. Kept as a gated option (`attention_i8` /
GGUF_TPU_ATTN_I8) — correctness-tested, off by default per the
ops/autotune acceptance protocol.

Quantization scheme (exactness/invariance arguments):

* K is smoothed by its per-(batch,head) token mean before quantization:
  ``s_ij = q_i·(k_j − k̄) + q_i·k̄`` and the second term is constant
  across j for a fixed query row, so the softmax is EXACTLY invariant —
  smoothing costs nothing and removes the common mode that eats int8
  range (the SageAttention trick).
* Q and K quantize per token row (symmetric, scale = rowmax/127); the
  softmax scale folds into the Q scales. s32 QK accumulation over
  D ≤ 16k is exact (D·127² < 2³¹).
* The online-softmax probabilities ``p = exp(s − m) ∈ [0, 1]`` quantize
  at the STATIC scale 127 (their max is 1 by construction once the row
  max has been seen; earlier kv blocks are additionally downweighted by
  the standard flash rescale, which happens in f32).
* V quantizes per OUTPUT CHANNEL (scale over tokens), so the per-j
  int8 products factor as ``(1/127)·vs_d·Σ_j pq_ij·vq_jd`` — the only
  factorization compatible with the j-contraction.
* m / l / rescales / accumulator all stay f32; the int8 noise is
  confined to the two dots.

Fallback ``xla_i8_attention`` consumes IDENTICAL integer operands (same
prep function) so kernel-vs-fallback tests compare integer math, not two
quantizations — same discipline as ops/i8mm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qmatmul import LANE, _have_tpu, _interpret_default

_SCALE_FLOOR = 1e-20
_NEG = -1e30


def _quant_rows(x3):
    """(BH, L, D) -> per-row symmetric int8: (xq s8, xs (BH, L, 1) f32)."""
    xf = x3.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     _SCALE_FLOOR) / 127.0
    return jnp.round(xf / xs).astype(jnp.int8), xs


def _quant_cols(x3):
    """(BH, L, D) -> per-channel symmetric int8: (xq s8, xs (BH,1,D) f32)."""
    xf = x3.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                     _SCALE_FLOOR) / 127.0
    return jnp.round(xf / xs).astype(jnp.int8), xs


def quantize_attn_inputs(q, k, v, scale: float, pv_int8: bool = True):
    """Shared prep for kernel + XLA fallback.

    q/k/v: (B, H, L, D) -> flattened (BH, ...) integer operands:
      qq (BH,L,D) s8, qs (BH,L,1) f32 (softmax scale folded in),
      kqT (BH,D,L) s8, ks (BH,1,L) f32,
      vq (BH,L,D) s8, vs (BH,1,D) f32.
    K is mean-smoothed over tokens first (softmax-invariant).
    ``pv_int8=False``: v passes through as bf16 (vs is all-ones).
    """
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    q3 = q.reshape(B * H, Lq, D)
    k3 = k.reshape(B * H, Lk, D)
    v3 = v.reshape(B * H, Lk, D)
    k3 = (k3.astype(jnp.float32)
          - jnp.mean(k3.astype(jnp.float32), axis=1, keepdims=True))
    qq, qs = _quant_rows(q3)
    qs = qs * jnp.float32(scale)
    kq, ks = _quant_rows(k3)
    if pv_int8:
        vq, vs = _quant_cols(v3)
    else:
        vq = v3.astype(jnp.bfloat16)
        vs = jnp.ones((B * H, 1, D), jnp.float32)
    return qq, qs, kq.transpose(0, 2, 1), ks.transpose(0, 2, 1), vq, vs


def _pad_to(x, axis: int, mult: int):
    pad = -x.shape[axis] % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _make_attn_kernel(*, bq, bkv, n_k, lk, pv_int8=True):
    """lk = real key count (static); mask pad keys iff lk % bkv != 0
    after padding. ``pv_int8=False`` keeps the PV dot in bf16 (QK-only
    int8 — the accuracy-conservative mode: the probability quantization
    is the dominant int8-attention error term on flat distributions)."""
    masked = lk % bkv != 0

    def kernel(qq_ref, qs_ref, kT_ref, ks_ref, vq_ref, vs_ref, out_ref,
               acc_ref, m_ref, l_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)

        s32 = jax.lax.dot_general(
            qq_ref[0], kT_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qs_ref[0] * ks_ref[0]
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
            valid = (ki * bkv + col) < lk
            s = jnp.where(valid, s, _NEG)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if pv_int8:
            pq = jnp.round(p * 127.0).astype(jnp.int8)
            pv = jax.lax.dot_general(
                pq, vq_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vq_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

        @pl.when(ki == n_k - 1)
        def _():
            if pv_int8:
                inv = jnp.float32(1.0 / 127.0) / l_ref[:]
                out_ref[0] = (acc_ref[:] * inv
                              * vs_ref[0]).astype(out_ref.dtype)
            else:
                out_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)

    return kernel


BLOCK_Q = 512
BLOCK_KV = 1536


def _pick_blocks(Lq, Lk, block_kv=None):
    bq = next((b for b in (BLOCK_Q, 256, 128) if Lq % b == 0), None)
    # kv blocks tile the PADDED key axis; pad keys are masked in-kernel
    Lkp = Lk + (-Lk % LANE)
    bkv = next((b for b in (block_kv or BLOCK_KV, 1024, 512, 256, 128)
                if Lkp % b == 0), None)
    return bq, bkv, Lkp


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "pv_int8",
                                    "block_kv"))
def pallas_i8_attention(q, k, v, *, scale: float, interpret: bool = False,
                        pv_int8: bool = True,
                        block_kv: int | None = None) -> jax.Array:
    """(B, H, L, D) heads-major int8 flash attention -> (B, H, L, D).

    Self-attention shapes (Lq lane-aligned, D % 128 == 0); the dispatcher
    gates everything else back to the bf16 path.
    """
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    bq, bkv, Lkp = _pick_blocks(Lq, Lk, block_kv)
    if bq is None or bkv is None or D % LANE:
        raise ValueError(f"i8 attention: untileable ({Lq}, {Lk}, {D})")
    qq, qs, kT, ks, vq, vs = quantize_attn_inputs(q, k, v, scale,
                                                  pv_int8=pv_int8)
    if Lkp != Lk:
        kT = _pad_to(kT, 2, LANE)
        ks = _pad_to(ks, 2, LANE)
        vq = _pad_to(vq, 1, LANE)
    BH = B * H
    n_q, n_k = Lq // bq, Lkp // bkv
    grid = (BH, n_q, n_k)

    def vmem(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    kernel = _make_attn_kernel(bq=bq, bkv=bkv, n_k=n_k, lk=Lk,
                               pv_int8=pv_int8)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem((1, bq, D), lambda b, i, j: (b, i, 0)),
            vmem((1, bq, 1), lambda b, i, j: (b, i, 0)),
            vmem((1, D, bkv), lambda b, i, j: (b, 0, j)),
            vmem((1, 1, bkv), lambda b, i, j: (b, 0, j)),
            vmem((1, bkv, D), lambda b, i, j: (b, j, 0)),
            vmem((1, 1, D), lambda b, i, j: (b, 0, 0)),
        ],
        out_specs=vmem((1, bq, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Lq * Lkp * D,
            # by operand dtype: int8 q/kT/v (1 B/elem), bf16 output
            # (2 B/elem); the f32 scale vectors are negligible
            bytes_accessed=BH * (Lq * D + Lkp * D + Lkp * D
                                 + 2 * Lq * D),
            transcendentals=BH * Lq * Lkp,
        ),
        interpret=interpret,
    )(qq, qs, kT, ks, vq, vs)
    return out.reshape(B, H, Lq, D)


def xla_i8_attention(q, k, v, *, scale: float,
                     pv_int8: bool = True) -> jax.Array:
    """Same-math XLA path over IDENTICAL integer operands (CPU tests,
    ungated shapes): s32 dots, f32 softmax, static-127 p quantization."""
    B, H, Lq, D = q.shape
    qq, qs, kT, ks, vq, vs = quantize_attn_inputs(q, k, v, scale,
                                                  pv_int8=pv_int8)
    s32 = jnp.einsum("bld,bdm->blm", qq.astype(jnp.int32),
                     kT.astype(jnp.int32))
    s = s32.astype(jnp.float32) * qs * ks
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if pv_int8:
        pq = jnp.round(p * 127.0).astype(jnp.int8)
        pv = jnp.einsum("blm,bmd->bld", pq.astype(jnp.int32),
                        vq.astype(jnp.int32))
        out = pv.astype(jnp.float32) / 127.0 / l * vs
    else:
        pv = jnp.einsum("blm,bmd->bld", p.astype(jnp.bfloat16),
                        vq, preferred_element_type=jnp.float32)
        out = pv / l
    return out.astype(q.dtype).reshape(B, H, Lq, D)


def i8_attention_ok(q, k) -> bool:
    """Gate: self-attention, lane-tileable, MXU-friendly head dim."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if Lq != Lk or D % LANE or Lq < 512 or Lk > 8192:
        return False
    bq, bkv, _ = _pick_blocks(Lq, Lk)
    return bq is not None and bkv is not None


def i8_dot_product_attention(q, k, v, *, scale: float,
                             pv_int8: bool = True) -> jax.Array:
    # off-TPU the (very slow) interpret-mode Pallas kernel is only worth
    # running when explicitly forced via GGUF_TPU_PALLAS_INTERPRET;
    # otherwise take the same-math XLA path
    import os

    forced = os.environ.get("GGUF_TPU_PALLAS_INTERPRET", "") not in ("",
                                                                     "0")
    if _have_tpu() or forced:
        return pallas_i8_attention(q, k, v, scale=scale,
                                   interpret=_interpret_default(),
                                   pv_int8=pv_int8)
    return xla_i8_attention(q, k, v, scale=scale, pv_int8=pv_int8)
