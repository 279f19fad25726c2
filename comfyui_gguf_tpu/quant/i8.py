"""w8a8 integer-MXU weight format: per-column int8 requantization.

The fused bf16 dequant-matmul path (ops/qmatmul.py) runs the MXU at bf16
rate. v5e (and every TPU since v4) multiplies s8xs8->s32 at ~2x the bf16
FLOP rate (measured on this chip: 361-366 TOP/s vs 169 TF/s —
tools_i8_microbench.py), and flux full-depth is compute-bound at 0.93 of
bf16 peak (BASELINE.md). This module converts already-loaded GGUF planar
weights (quant/planar.PlanarQuant) into a layout the integer MXU path
(ops/i8mm.py) consumes directly:

    w[k, r] ~= ws[r] * wq[k, r]        wq int8, ws f32 per OUT column

Activations are quantized dynamically per token row at matmul time
(x[m, :] ~= xs[m] * xq[m, :]) so the whole contraction runs in s8 with an
exact s32 accumulator (K*127^2 < 2^31 for K up to ~133k) and ONE f32
rescale in the kernel epilogue: out = (xs ⊗ ws) * acc.

Accuracy: per-column symmetric int8 on weights is far finer than the
4-6-bit grouped GGML codes being requantized (a Q4_K group of 32 has 16
levels; int8 per column has 255), so the additional weight error is
negligible against the quantization noise already in the file. Dynamic
per-token activation scales are the standard production w8a8 recipe.
Measured end-to-end deltas vs the bf16 fused path are recorded in
BASELINE.md and asserted in tests/test_i8.py.

This path exists only in the new framework — the reference
(city96/ComfyUI-GGUF) always dequantizes to fp16/bf16 before the matmul
(reference dequant.py:15-28, ops.py:242-244).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial

import jax
import jax.numpy as jnp

from .planar import PlanarQuant, TPShard

log = logging.getLogger(__name__)

LANE = 128

# floor for dynamic scales: keeps all-zero rows/columns finite (quantized
# values are exactly 0 there)
_SCALE_FLOOR = 1e-30


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qs", "scales"],
    meta_fields=["qtype", "shape"],
)
@dataclasses.dataclass(frozen=True)
class I8Planar:
    """Per-column-int8 K-major weight for the integer MXU path.

    Leaves may carry a leading depth axis (stacked-scan form):
      qs: (Kp, Rp) int8 or (depth, Kp, Rp)
      scales: (1, Rp) float32 or (depth, 1, Rp) — per out-column
    shape is the LOGICAL torch-order (out=R, in=K); Kp/Rp keep the source
    PlanarQuant's padding (pad rows/columns requantize to exactly 0).
    ``qtype`` records the source GGML format for census/reporting.
    """

    qs: jax.Array
    scales: jax.Array
    qtype: int
    shape: tuple[int, int]

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]

    @property
    def padded_out(self) -> int:
        return self.qs.shape[-1]

    @property
    def padded_in(self) -> int:
        return self.qs.shape[-2]

    @property
    def nbytes_packed(self) -> int:
        return (self.qs.size * self.qs.dtype.itemsize
                + self.scales.size * self.scales.dtype.itemsize)


def _dequant_padded(qs, scales, offsets, layout, gs, zero_point):
    """Dense f32 (Kp, Rp) from one planar slice WITHOUT un-padding.

    Same math as planar.dequantize_kmajor but keeps the padded domain
    (pad codes have zero scales -> dequantize to exactly 0), so the
    requantized layout inherits kernel-legal dims from the source.
    """
    if layout == "nib4":
        q = jnp.concatenate([qs & 0x0F, qs >> 4], axis=0).astype(jnp.float32)
    else:
        q = qs.astype(jnp.float32)
    if zero_point:
        q = q - jnp.float32(zero_point)
    kp = q.shape[0]
    s = jnp.repeat(scales.astype(jnp.float32), gs, axis=0,
                   total_repeat_length=kp)
    w = s * q
    if offsets is not None:
        w = w + jnp.repeat(offsets.astype(jnp.float32), gs, axis=0,
                           total_repeat_length=kp)
    return w


def _req_slice(qs, scales, offsets, *, layout, gs, zero_point):
    """One planar slice -> (wq int8 (Kp, Rp), ws f32 (1, Rp))."""
    w = _dequant_padded(qs, scales, offsets, layout, gs, zero_point)
    ws = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                     _SCALE_FLOOR) / 127.0
    wq = jnp.round(w / ws).astype(jnp.int8)
    return wq, ws


_req_slice_jit = jax.jit(_req_slice,
                         static_argnames=("layout", "gs", "zero_point"))


@partial(jax.jit, static_argnames=("layout", "gs", "zero_point"))
def _req_stacked(qs, scales, offsets, *, layout, gs, zero_point):
    """Depth-stacked requantization under ONE jit via lax.map: the int8
    output buffer is allocated once and written slice by slice, so the
    peak transient is one block's dense f32 — NOT a second copy of the
    whole int8 leaf (a python stack of per-slice results OOM'd full-depth
    flux: jnp.stack duplicates the 2.5 GB single-trunk leaf)."""
    if offsets is None:
        return jax.lax.map(
            lambda a: _req_slice(a[0], a[1], None, layout=layout, gs=gs,
                                 zero_point=zero_point), (qs, scales))
    return jax.lax.map(
        lambda a: _req_slice(a[0], a[1], a[2], layout=layout, gs=gs,
                             zero_point=zero_point), (qs, scales, offsets))


def requantize_i8(pq: PlanarQuant) -> I8Planar:
    """PlanarQuant -> I8Planar (handles 2-D and depth-stacked leaves).

    Stacked weights are converted one depth slice at a time so the dense
    f32 transient stays one block's worth of HBM (a stacked flux single
    trunk would otherwise materialize ~10 GB at once).
    """
    kw = dict(layout=pq.layout, gs=pq.group_size, zero_point=pq.zero_point)
    if pq.qs.ndim == 2:
        wq, ws = _req_slice_jit(pq.qs, pq.scales, pq.offsets, **kw)
        return I8Planar(qs=wq, scales=ws, qtype=pq.qtype, shape=pq.shape)
    # any leading axes (depth; or tp x depth for TP-sharded trees) flatten
    # onto the lax.map axis and restore after
    lead = pq.qs.shape[:-2]
    flat = lambda a: (None if a is None
                      else a.reshape(-1, *a.shape[len(lead):]))
    wq, ws = _req_stacked(flat(pq.qs), flat(pq.scales), flat(pq.offsets),
                          **kw)
    wq = wq.reshape(*lead, *wq.shape[1:])
    ws = ws.reshape(*lead, *ws.shape[1:])
    return I8Planar(qs=wq, scales=ws, qtype=pq.qtype, shape=pq.shape)


def _req_slice_host(qs, scales, offsets, *, layout, gs, zero_point):
    """Numpy mirror of _req_slice. Bit-identical to the device path for
    offset-free formats; for offset formats (Q4_1/Q4_K/Q5_K) XLA fuses
    ``s·q + o`` into an FMA whose single rounding differs from numpy's
    two-step by ≤1 ulp — scales match to ~1e-7 rel and codes may flip by
    ±1 ls exactly on rounding boundaries (asserted in tests/test_i8.py;
    both deltas are far below the int8 quantization noise itself)."""
    import numpy as np

    if layout == "nib4":
        q = np.concatenate([qs & 0x0F, qs >> 4], axis=0).astype(np.float32)
    else:
        q = qs.astype(np.float32)
    if zero_point:
        q = q - np.float32(zero_point)
    kp = q.shape[0]
    s = np.repeat(scales.astype(np.float32), gs, axis=0)[:kp]
    w = s * q
    if offsets is not None:
        w = w + np.repeat(offsets.astype(np.float32), gs, axis=0)[:kp]
    ws = np.maximum(np.max(np.abs(w), axis=0, keepdims=True),
                    np.float32(_SCALE_FLOOR)) / np.float32(127.0)
    wq = np.rint(w / ws).astype(np.int8)  # rint = round-half-even = jnp.round
    return wq, ws.astype(np.float32)


def requantize_i8_host(pq: PlanarQuant, *, free_source: bool = False,
                       device=None) -> I8Planar:
    """PlanarQuant -> I8Planar via HOST-staged conversion.

    The on-device path (requantize_i8) holds the full planar tree PLUS
    the leaf being converted in HBM: on HiDream-I1 that transient
    (13.51 GB tree + the 2.35 GB single-stream-expert int8 copy) pushed
    the 14.4 GB budget plan over a 16 GB chip (round-4 verdict item 3).
    Here the planar components move to host RAM FIRST, their device
    buffers are freed (free_source=True), the dequant+requant math runs
    in numpy slice-by-slice (same f32 math; see _req_slice_host for the
    ≤1-ulp FMA caveat on offset formats), and only the final int8
    leaf is placed — so the device peak per leaf is
    (tree − planar_leaf + i8_leaf) ≤ the final converted footprint, i.e.
    exactly the budget the planner already enforces.

    Cost: host-side numpy throughput (~1-2 GB/s) instead of the MXU —
    seconds per GB at load time, paid only on budget-constrained models.
    """
    import numpy as np

    host_qs = np.asarray(jax.device_get(pq.qs))
    host_scales = np.asarray(jax.device_get(pq.scales))
    host_offsets = (None if pq.offsets is None
                    else np.asarray(jax.device_get(pq.offsets)))
    if free_source:
        for leaf in (pq.qs, pq.scales, pq.offsets):
            if leaf is not None and hasattr(leaf, "delete"):
                leaf.delete()

    kw = dict(layout=pq.layout, gs=pq.group_size, zero_point=pq.zero_point)
    if host_qs.ndim == 2:
        wq, ws = _req_slice_host(host_qs, host_scales, host_offsets, **kw)
    else:
        lead = host_qs.shape[:-2]
        n = int(np.prod(lead))
        fq = host_qs.reshape(n, *host_qs.shape[len(lead):])
        fs = host_scales.reshape(n, *host_scales.shape[len(lead):])
        fo = (None if host_offsets is None
              else host_offsets.reshape(n, *host_offsets.shape[len(lead):]))
        kp = fq.shape[1] * (2 if pq.layout == "nib4" else 1)
        wq = np.empty((n, kp, fq.shape[2]), np.int8)
        ws = np.empty((n, 1, fq.shape[2]), np.float32)
        for i in range(n):
            wq[i], ws[i] = _req_slice_host(
                fq[i], fs[i], None if fo is None else fo[i], **kw)
        wq = wq.reshape(*lead, *wq.shape[1:])
        ws = ws.reshape(*lead, *ws.shape[1:])
    put = partial(jax.device_put, device=device) if device else jnp.asarray
    return I8Planar(qs=put(wq), scales=put(ws), qtype=pq.qtype,
                    shape=pq.shape)


def dequantize_kmajor_i8(ip: I8Planar, dtype=jnp.float32) -> jax.Array:
    """Dense (K, R) logical-domain weight (oracle / fallback path)."""
    w = ip.qs.astype(jnp.float32) * ip.scales.astype(jnp.float32)
    return w[..., : ip.in_features, : ip.out_features].astype(dtype)


def dequantize_i8(ip: I8Planar, dtype=jnp.float32) -> jax.Array:
    """Dense logical torch-order (out=R, in=K) weight."""
    return jnp.swapaxes(dequantize_kmajor_i8(ip, dtype), -1, -2)


def quantize_rows(x2: jax.Array):
    """Dynamic per-token activation quantization.

    x2: (m, K) any float -> (xq (m, K) int8, xs (m, 1) float32) with
    x2 ~= xs * xq. Shared by the Pallas kernel dispatch and the XLA
    fallback so both paths consume IDENTICAL integer operands.
    """
    xf = x2.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     _SCALE_FLOOR) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    return xq, xs


def is_modulation_key(key: str) -> bool:
    """True for adaLN/modulation projection keys across the supported
    arch families (flux img_mod/txt_mod/modulation, sd3/hidream
    adaLN_modulation, cosmos adaln, wan .modulation, sgm-UNet resblock
    emb_layers). These weights only ever see M=batch activation rows —
    HBM-bandwidth-bound, where int8's ~8 bpw loses to the 4.5-bpw nib4
    planar path — so w8a8 conversion keeps them planar by default."""
    return any(seg == "modulation" or seg.endswith("mod")
               or seg == "emb_layers" or "adaln" in seg.lower()
               for seg in key.split("."))


def _leaf_bytes(b: PlanarQuant) -> tuple[int, int]:
    """(planar_bytes, i8_bytes) for one packed leaf (any leading axes)."""
    rp = b.qs.shape[-1]
    code_rows = b.qs.shape[-2]
    lead = 1
    for d in b.qs.shape[:-2]:
        lead *= d
    kp = code_rows * (2 if b.layout == "nib4" else 1)
    i8 = lead * (kp * rp + 4 * rp)  # s8 codes + f32 per-column scales
    return b.nbytes_packed, i8


def plan_i8_budget(params, *, max_bytes: int, pred=None) -> set:
    """Greedy selection of leaves to convert under a TOTAL packed-weight
    byte budget (planar leaves kept + int8 leaves converted ≤ max_bytes).

    Models whose int8 form exceeds HBM (HiDream-I1: 17.8B params ≈ 18 GB
    at ~8 bpw on a 16 GB chip — a measured hard OOM) convert only as much
    as fits instead of failing.

    Selection is by descending byte delta (big leaves first): every
    token-facing matmul buys the same int-MXU time per converted byte, so
    filling the budget with the fewest leaves maximizes converted bytes.
    (An earlier experts-last heuristic assumed capacity/EP routing where
    experts see ~k/E of the tokens — under the DENSE MoE dispatch HiDream
    defaults to, every expert runs over all tokens, so experts deserve no
    deprioritization; callers on capacity/EP dispatch can still exclude
    them via ``pred``. NOTE: the first HiDream "zero speedup" campaign
    rows compared nothing — the 13.5 GB budget sat below the 13.51 GB
    planar footprint and converted zero leaves, hence the loud warning
    below.)

    Returns the set of key paths (same dotted/indexed paths the walk
    builds) to convert; feed it back via ``pred``.
    """
    cands = []
    total = 0

    def scan(node, path):
        nonlocal total
        if isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                scan(v, f"{path}[{i}]")
            return
        if isinstance(node, dict):
            for k, v in node.items():
                scan(v, f"{path}.{k}" if path else str(k))
            return
        b = node
        if hasattr(b, "patches") and hasattr(b, "base"):
            b = b.base
        if isinstance(b, TPShard):
            b = b.inner
        if isinstance(b, PlanarQuant):
            pb, ib = _leaf_bytes(b)
            total += pb
            if pred is None or pred(path, b):
                cands.append((path, pb, ib))

    scan(params, "")
    cands.sort(key=lambda c: -(c[2] - c[1]))
    chosen = set()
    planar_total = total
    for path, pb, ib in cands:
        if total + (ib - pb) <= max_bytes:
            chosen.add(path)
            total += ib - pb
    # no silent caps: a budget below/near the planar footprint converts
    # nothing and the "w8a8" model would silently be the planar one
    # (exactly what invalidated the first HiDream --i8 campaign rows:
    # planar 13.51 GB vs a 13.5 GB budget -> 0 leaves converted, both
    # rows measured the same model)
    log.info(
        "plan_i8_budget: %d/%d leaves chosen, packed %.2f -> %.2f GB "
        "(budget %.2f GB)", len(chosen), len(cands),
        planar_total / 1e9, total / 1e9, max_bytes / 1e9)
    if cands and not chosen:
        log.warning(
            "plan_i8_budget: budget %.2f GB <= planar footprint %.2f GB "
            "— NOTHING will be converted; the model stays fully planar",
            max_bytes / 1e9, planar_total / 1e9)
    return chosen


def convert_tree_i8(params, *, free_source: bool = False, pred=None,
                    max_bytes: int | None = None,
                    host_stage: bool = False):
    """Replace PlanarQuant leaves in a pytree with their I8Planar
    requantization (the w8a8 model-conversion entry point).

    free_source: drop each source leaf's device buffers as soon as its
    int8 copy exists (requires dict containers, which all param trees
    are) — full-depth models can't hold both trees in HBM at once
    (flux-dev: ~7 GB planar + ~12 GB int8 on a 16 GB chip).

    pred(key, leaf) -> bool: convert only matching leaves. Weights that
    only ever see batch-size-M rows (adaLN modulation projections) are
    HBM-bandwidth-bound, where int8's ~8 bpw LOSES to the 4.5-bpw nib4
    planar path — keep those planar with the shared helper:
    ``pred=lambda k, v: not is_modulation_key(k)``.

    max_bytes: cap on the TOTAL packed-weight bytes after conversion —
    leaves are converted greedily (plan_i8_budget; experts last) until
    the next one would exceed the cap, the rest stay planar. Use for
    models whose full int8 form doesn't fit HBM (HiDream on 16 GB).

    host_stage: route each leaf through requantize_i8_host — the planar
    source moves to host and frees BEFORE the int8 copy exists, so the
    device peak never exceeds the final converted footprint (vs the
    on-device path's tree+largest-leaf transient that OOM'd HiDream's
    14.4 GB plan). Slower (host numpy), bit-identical output.
    """
    import dataclasses as _dc

    if max_bytes is not None:
        chosen = plan_i8_budget(params, max_bytes=max_bytes, pred=pred)
        pred = lambda path, b: path in chosen

    is_pq = lambda l: isinstance(l, PlanarQuant)

    def base_of(v):
        # LoRA-patched leaves: convert the packed base, keep the patches
        if hasattr(v, "patches") and hasattr(v, "base") and is_pq(v.base):
            return v.base
        # TP-sharded leaves: convert the per-shard packed stack (the
        # requantize lax.map flattens the (tp, depth) lead axes); scales
        # come out per shard-column, which is what the per-shard kernels
        # under shard_map consume
        if isinstance(v, TPShard) and is_pq(v.inner):
            return v.inner
        return v if is_pq(v) else None

    def rewrap(v, b, ip):
        if v is b:
            return ip
        if isinstance(v, TPShard):
            return _dc.replace(v, inner=ip)
        return _dc.replace(v, base=ip)

    if not free_source and pred is None and not host_stage:
        def conv(l):
            b = base_of(l)
            if b is None:
                return l
            return rewrap(l, b, requantize_i8(b))
        is_leaf = lambda l: base_of(l) is not None
        return jax.tree_util.tree_map(conv, params, is_leaf=is_leaf)

    def convert_one(v, b):
        if host_stage:
            ip = requantize_i8_host(b, free_source=free_source)
        else:
            ip = requantize_i8(b)
            if free_source:
                for leaf in (b.qs, b.scales, b.offsets):
                    if leaf is not None and hasattr(leaf, "delete"):
                        leaf.delete()
        return rewrap(v, b, ip)

    def walk(node, path):
        if base_of(node) is not None:
            raise TypeError(
                "convert_tree_i8(free_source/pred) needs container nodes "
                f"to rebind leaves; got a bare packed leaf at {path!r}")
        if isinstance(node, (list, tuple)):
            # packed leaves inside sequences convert too (the dict-slot
            # ref-drop doesn't apply, but the device buffers are still
            # freed — that's what free_source promises)
            items = [walk(v, f"{path}[{i}]") if isinstance(v, (dict, list,
                                                               tuple))
                     else (convert_one(v, base_of(v))
                           if base_of(v) is not None
                           and (pred is None or pred(f"{path}[{i}]",
                                                     base_of(v)))
                           else v)
                     for i, v in enumerate(node)]
            return type(node)(items)
        out = {}
        for k, v in node.items():
            kp = f"{path}.{k}" if path else str(k)
            b = base_of(v)
            if isinstance(v, (dict, list, tuple)):
                out[k] = walk(v, kp)
            elif b is not None and (pred is None or pred(kp, b)):
                out[k] = convert_one(v, b)
                if free_source:
                    node[k] = None  # drop the dict's ref
            else:
                out[k] = v
        return out

    return walk(params, "")
