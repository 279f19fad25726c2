"""Attention dispatch: TPU flash kernel for long sequences, XLA otherwise.

DiT joint attention at 1024² runs over ~4.6k tokens; the naive
(B, H, L, L) score tensor is the HBM hot spot after the weight stream.
On TPU this routes to the in-tree Pallas flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention — tiled online-softmax,
no L×L materialization); elsewhere (CPU tests, odd shapes) it falls back
to ``jax.nn.dot_product_attention``.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax

_LANE = 128

# sequence-parallel mode: inside `with sequence_parallel("sp"):` every
# dispatcher call routes to the ring-attention collective (the caller is
# responsible for being inside a shard_map whose L axis is sharded over
# that mesh axis). This lets the video model forwards run unmodified on
# an SP mesh — the attention dispatch is the only thing that changes.
_SP_AXIS: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "gguf_tpu_sp_axis", default=None)


@contextlib.contextmanager
def sequence_parallel(axis_name: str):
    """Route attention through parallel.ring for the enclosed calls.

    Contract inside the scope: calls with Lq == Lk are sequence-sharded
    self-attention (ring collective over ``axis_name``); calls with
    Lq != Lk are cross-attention whose k/v are REPLICATED (text states)
    and compute locally — exact either way for the video-model forwards
    this serves (wan/ltxv cross-attend to replicated conditioning)."""
    tok = _SP_AXIS.set(axis_name)
    try:
        yield
    finally:
        _SP_AXIS.reset(tok)

# flash kernel q/k block caps, measured on v5e @ L=4608 (see
# docs/NOTES_ROUND1.md): symmetric (512, 512) reaches ~130 TF/s and cuts
# whole-model flux step time 12% vs (256, 512); first Mosaic compile of
# the block config costs minutes in the worst case (once per process),
# then reuses. Set GGUF_TPU_FAST_COMPILE=1 to drop to (256, 512) for
# short-lived/interactive runs where compile latency dominates.
import os

FLASH_BLOCK_Q = 512
FLASH_BLOCK_K = 512
if os.environ.get("GGUF_TPU_FAST_COMPILE", "") not in ("", "0"):
    FLASH_BLOCK_Q = 256

# attention kernel implementation: "splash" (default) or "flash".
# splash (fwd-only, self-attn, lane-aligned L, blocks bq=512/bkv=full/
# compute=1536) won BOTH the kernel harness (tools_attn_ab.py: 2.23 vs
# 2.6-2.8 ms/call) and the full-depth flux model A/B
# (tools_attn_model_ab.py: 551.4 vs 574.3 ms step, same chip session,
# max output delta 1.3% = bf16 accumulation) — accepted as default per
# the ops/autotune.py protocol. Shapes splash can't take (masking,
# cross-attn, lane-odd, Lk>8192 video) fall through to flash.
ATTN_IMPL = os.environ.get("GGUF_TPU_ATTN", "splash")
SPLASH_BLOCK_Q = 512
SPLASH_BLOCK_KV_COMPUTE = 1536
# widened splash gate: lane-odd self-attn lengths (padded + static
# NumpyMask over the pad keys) and sub-lane head dims (e.g. sd3.5-large's
# 4250-token hd=64 joint attention, lumina2 hd=96) — semantics validated
# exact in interpret mode (tests/test_attention.py). OFF by default
# pending the model-level A/B on chip (ops/autotune.py protocol:
# kernel-level wins are candidates, not defaults); enable with
# GGUF_TPU_SPLASH_WIDE=1.
SPLASH_WIDE = os.environ.get("GGUF_TPU_SPLASH_WIDE", "0") not in ("", "0")

# int8 attention (ops/i8attn): both dots on the MXU's 2x s8 mode.
# "pv" = full int8 (QK + PV), "qk" = QK only (accuracy-conservative),
# "" = off. Env default; override per scope with `attention_i8(...)`.
_I8_ALLOWED = ("", "qk", "pv", "0", "1")


def _i8_env_default() -> str:
    v = os.environ.get("GGUF_TPU_ATTN_I8", "")
    if v not in _I8_ALLOWED:
        raise ValueError(
            f"GGUF_TPU_ATTN_I8={v!r}: expected one of {_I8_ALLOWED} "
            "('pv'/'1' full int8, 'qk' QK-dot only, ''/'0' off)")
    return v


_I8_MODE: contextvars.ContextVar[str] = contextvars.ContextVar(
    "gguf_tpu_attn_i8", default=_i8_env_default())


@contextlib.contextmanager
def attention_i8(mode: str = "pv"):
    """Route eligible self-attention calls through the int8 kernel for
    the enclosed scope. mode: "pv" (full int8) | "qk" (QK dot only) |
    "" (off)."""
    if mode not in _I8_ALLOWED:
        raise ValueError(f"attention_i8 mode {mode!r}")
    tok = _I8_MODE.set(mode)
    try:
        yield
    finally:
        _I8_MODE.reset(tok)


@functools.cache
def _on_tpu() -> bool:
    return any(d.platform == "tpu" for d in jax.devices())


def _flash_ok(q, k) -> bool:
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    # lane-odd lengths are handled by masked padding in the dispatcher.
    # head_dim: the in-tree kernel takes sub-lane dims natively (its
    # l_broadcast slices l[:, :head_dim] when head_dim < 128) — e.g.
    # sd3.5-large's hd=64 (2432/38). Gating hd<128 OUT sent sd3's joint
    # attention to XLA, which materialized 38×4250² score tensors: 835 ms
    # of fusion per step in the xplane profile, 5× the qmm time.
    return ((D <= _LANE or D % _LANE == 0)
            and Lq >= 512 and Lk >= 512)


def _pad128(x, L):
    pad = -L % _LANE
    if pad == 0:
        return x
    return jax.numpy.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


# relative per-unit-work cost of the in-tree flash kernel by block size,
# measured at the sd3.5 joint geometry (B1 H38 hd64 L4250, 20-chained
# device timing): 512-blocks 4.91 ms, 256 → 8.30 (×1.9 after the (Lp/L)²
# work normalization), 128 → 22.9 (×5.2). Block efficiency dominates pad
# overhead: padding 4250→4608 (+8.4% rows, +17% score work) for
# 512-blocks still nets 1.69×. The first 4%-pad-cap heuristic left sd3
# on 256-blocks and (before it existed) hyvid's 34,936 joint tokens on
# 128-blocks — measured 56.2 s/forward vs 11.7 after.
_FLASH_BLOCK_COST = {512: 1.0, 256: 1.9, 128: 5.2}


def _pad_target(L: int) -> int:
    """Padded length for the flash path: choose the block size (and its
    multiple) minimizing (Lp/L)² × per-block-cost — the score work grows
    with Lq·Lk while kernel efficiency grows with block size. Masked pad
    keys never enter the softmax (segment ids); pad query rows are
    sliced off after."""
    best, best_cost = None, None
    for m in (FLASH_BLOCK_Q, 256, _LANE):
        Lp = -(-L // m) * m
        cost = (Lp / L) ** 2 * _FLASH_BLOCK_COST.get(m, 1.0)
        if best is None or cost < best_cost:
            best, best_cost = Lp, cost
    return best


def _pad_to(x, L: int, Lp: int):
    if Lp == L:
        return x
    return jax.numpy.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))


def _splash_attention(q, k, v, scale: float, interpret: bool = False):
    """Splash kernel path: self-attention, Lq == Lk, D ≤ 128 or D%128==0.

    Lk cap (dispatcher): block_kv=Lk keeps whole-KV rows resident per q
    block (~2.4 MB at flux's 4608×128); video token counts fall through
    to flash's tiled KV instead of blowing VMEM.
    Lane-odd lengths (SD3's 154+4096=4250 joint tokens) are padded to a
    128 multiple with a STATIC NumpyMask excluding the pad keys — the
    mask is a trace-time constant, so the block-sparse mask info is built
    once per compile. Pad query rows never see a valid key (their output
    is garbage by construction) and are sliced off. splash applies no
    sm_scale internally, so q is pre-scaled. ``interpret=True`` runs the
    kernel in Pallas interpret mode for CPU tests.
    """
    import numpy as np
    from jax.experimental.pallas.ops.tpu import splash_attention as sa

    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    qs = (q * scale).astype(q.dtype)
    # pad to the block-cost-optimal length (see _pad_target): sd3's 4250
    # joint tokens → 4608 = 512·9 (bq 512 / bkvc 1536 measured 4.16 ms
    # vs 4.26 at the bare-128 pad 4352 and 4.91 on the flash kernel).
    # splash's block-sparse mask info additionally SKIPS fully-padded
    # key blocks, so pad FLOPs are mostly free.
    Lkp = _pad_target(Lk)
    out_d = D
    if Lkp != Lk:
        qs = _pad_to(qs, Lq, Lkp)
        k, v = _pad_to(k, Lk, Lkp), _pad_to(v, Lk, Lkp)
        if D < _LANE:
            # SINK-DIMENSION masking (round 5): NumpyMask's block-sparse
            # mask info materializes a dense s32 operand (~19 MB at sd3
            # scale) that VMEM-OOMs inside scanned forwards — the
            # round-4 dead end. Instead append ONE feature dim:
            # q_extra = 1 (after pre-scaling, so the bias is unscaled),
            # k_extra = 0 for real keys and -1e9 for pad keys → pad
            # logits are -1e9 and exp to exactly 0 in the f32 online
            # softmax. FullMask → zero mask-info operands. Only for
            # D < 128: the extra dim rides the same lane bucket (sd3
            # hd64→65, lumina2 hd96→97); at D=128 it would spill to a
            # second 128-lane tile.
            jnp_ = jax.numpy
            B_, H_ = qs.shape[:2]
            qs = jnp_.concatenate(
                [qs, jnp_.ones((B_, H_, Lkp, 1), qs.dtype)], axis=-1)
            kex = jnp_.concatenate(
                [jnp_.zeros((B_, H_, Lk, 1), k.dtype),
                 jnp_.full((B_, H_, Lkp - Lk, 1), -1e9, k.dtype)], axis=2)
            k = jnp_.concatenate([k, kex], axis=-1)
            v = jnp_.concatenate(
                [v, jnp_.zeros((B_, H_, Lkp, 1), v.dtype)], axis=-1)
            head_mask = sa.FullMask((Lkp, Lkp))
        else:
            m = np.zeros((Lkp, Lkp), bool)
            m[:Lq, :Lk] = True
            head_mask = sa.NumpyMask(m)
    else:
        head_mask = sa.FullMask((Lq, Lk))
    bq = next(b for b in (SPLASH_BLOCK_Q, 256, 128) if Lkp % b == 0)
    bkvc = next(b for b in (SPLASH_BLOCK_KV_COMPUTE, 512, 256, 128)
                if Lkp % b == 0)
    bs = sa.BlockSizes(block_q=bq, block_kv=Lkp, block_kv_compute=bkvc)
    mask = sa.MultiHeadMask([head_mask] * H)
    kernel = sa.make_splash_mha_single_device(
        mask, block_sizes=bs, interpret=interpret)
    out = jax.vmap(kernel)(qs, k, v)
    if Lkp != Lk:
        out = out[:, :, :Lq, :out_d]  # drop pad rows + the sink channel
    return out


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          scale: float | None = None) -> jax.Array:
    """q/k/v: (B, H, L, D) heads-major → (B, H, L, D).

    Softmax scale defaults to D^-0.5 (pass ``scale`` to override, e.g. 1.0
    for T5-style unscaled logits).

    Lane-odd sequence lengths (e.g. SD3's 154+4096 = 4250 joint tokens)
    are padded to a 128 multiple and masked out via flash segment ids —
    pad keys get a different segment than real queries, so they never
    enter the softmax; pad query rows are sliced off after.
    """
    import jax.numpy as jnp

    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = D ** -0.5
    # cross-attention k/v may arrive in a different dtype (f32 text states
    # vs bf16 latents); harmonize on the query dtype
    k = k.astype(q.dtype)
    v = v.astype(q.dtype)

    sp = _SP_AXIS.get()
    if sp is not None and Lq == Lk:
        from ..parallel.ring import ring_attention_local

        out = ring_attention_local(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), axis_name=sp, scale=float(scale))
        return out.transpose(0, 2, 1, 3)
    # SP contract for unequal lengths: q is L-sharded, k/v are
    # REPLICATED (cross-attention to text states — wan/ltxv) — each
    # shard's local dense attention over the full k/v IS the exact
    # global answer, no collective needed. (Ring over replicated k/v
    # would also be exact — duplicate keys scale numerator and
    # denominator equally — but costs n_shards× the FLOPs.)

    i8_mode = _I8_MODE.get()
    if i8_mode not in ("", "0"):
        from ..ops.i8attn import i8_attention_ok, i8_dot_product_attention
        from ..ops.qmatmul import _interpret_default

        if (_on_tpu() or _interpret_default()) and i8_attention_ok(q, k):
            return i8_dot_product_attention(
                q, k, v, scale=float(scale),
                pv_int8=i8_mode in ("pv", "1"))

    # Lane-odd routing verdict (round 4): splash's kernel-level win at
    # the padded sd3 geometry (4.16 ms vs flash-512's 4.91) does NOT
    # survive the full model — its NumpyMask materializes a dense
    # s32[2,512,4608] mask-info operand (~19 MB) that VMEM-OOMs inside
    # the scanned forward (measured: tpu_compile stack OOM). Lane-odd
    # stays on the flash kernel with cost-model 512-block padding (the
    # 1.43× sd3 win); SPLASH_WIDE still opts lane-odd/sub-lane shapes in
    # for experimentation.
    splash_shape_ok = (
        Lq == Lk and Lk <= 8192
        and (D % _LANE == 0 or (SPLASH_WIDE and D <= _LANE))
        and ((Lq % _LANE == 0 and Lq % SPLASH_BLOCK_Q == 0) or SPLASH_WIDE))
    if (ATTN_IMPL == "splash" and _on_tpu() and _flash_ok(q, k)
            and splash_shape_ok):
        return _splash_attention(q, k, v, float(scale))

    if _on_tpu() and _flash_ok(q, k):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        Lqp, Lkp = _pad_target(Lq), _pad_target(Lk)
        qp, kp, vp = (_pad_to(q, Lq, Lqp), _pad_to(k, Lk, Lkp),
                      _pad_to(v, Lk, Lkp))
        seg = None
        if Lqp != Lq or Lkp != Lk:
            q_ids = (jnp.arange(Lqp) < Lq).astype(jnp.int32)[None]
            kv_ids = (jnp.arange(Lkp) < Lk).astype(jnp.int32)[None]
            seg = fa.SegmentIds(q=jnp.broadcast_to(q_ids, (B, Lqp)),
                                kv=jnp.broadcast_to(kv_ids, (B, Lkp)))
        bq = next(b for b in (FLASH_BLOCK_Q, 256, 128) if Lqp % b == 0)
        bk = next(b for b in (FLASH_BLOCK_K, 256, 128) if Lkp % b == 0)
        bs = fa.BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
            block_q_dq=bq,
        )
        out = fa.flash_attention(
            qp, kp, vp, segment_ids=seg, causal=False,
            sm_scale=float(scale), block_sizes=bs,
        )
        return out[:, :, :Lq] if Lqp != Lq else out

    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), scale=float(scale),
    )
    return out.transpose(0, 2, 1, 3)
