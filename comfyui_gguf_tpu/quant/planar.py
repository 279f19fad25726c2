"""Planar (TPU-friendly) re-tiling of GGML quantized tensors.

The GGUF on-disk layout packs each row as a sequence of heterogeneous byte
blocks (scales interleaved with codes). That layout is hostile to TPU lane
tiling, so at load time every 2-D quantized weight is re-tiled ONCE into a
structure-of-arrays "planar" form (SURVEY.md §7.3 "one-time re-tiling"):

    w[k, r] = scales[k // gs, r] * (q[k, r] - zero_point) + offsets[k // gs, r]

stored **K-major** (transposed): the lane (minor) dimension is R = out
features, so a fused Pallas kernel computes ``x @ w`` with no transposes, the
per-group scale expansion broadcasts along the sublane axis, and
tensor-parallel sharding maps to simple lane/sublane partitioning.

Two code layouts:
  * ``nib4``: 4-bit codes, two per byte, **global split along K** —
    ``qs[j, r]`` holds code for k=j in its low nibble and k=j+K/2 in its high
    nibble. Unpacking is a single concat along the sublane axis.
  * ``int8``: one (possibly zero-point-folded) int8 code per element.

The decomposition per format comes from quant.codecs.COMPONENT_EXTRACTORS
(single source of truth with the tested decoders). Dequantization here is
bit-identical to codecs.dequantize (asserted in tests/test_planar.py).

Replaces the per-forward torch unpacking of reference dequant.py:30-44 +
ops.py:166-191 with load-time re-tiling + on-device fused math.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGML_QUANT_SIZES, GGMLQuantizationType
from . import codecs

Q = GGMLQuantizationType

# formats whose codes fit in a nibble and keep a packed 4-bit plane
_NIB4_TYPES = frozenset({Q.Q4_0, Q.Q4_1, Q.Q4_K, Q.Q2_K})

# lane-dimension padding granularity (TPU lane width)
LANE = 128


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


def _best_tile(total: int, align: int, cap: int) -> int | None:
    """Largest divisor of ``total`` that is a multiple of ``align`` and
    ≤ ``cap`` (mirrors ops/qmatmul._largest_divisor_tile — kept local to
    avoid a quant→ops import cycle)."""
    best = None
    for d in range(align, min(total, cap) + 1, align):
        if total % d == 0:
            best = d
    return best


def _pad_for_deep_tiles(base: int, step: int, tile_of, target: int) -> int:
    """Smallest ``base + i·step`` (i ≥ 0, ≤6.25% over ``base``) whose
    best tile per ``tile_of`` reaches ``target``; ``base`` if none does."""
    cand = base
    while cand <= base + base // 16:
        if tile_of(cand) >= target:
            return cand
        cand += step
    return base


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qs", "scales", "offsets"],
    meta_fields=["qtype", "layout", "group_size", "zero_point", "shape"],
)
@dataclasses.dataclass(frozen=True)
class PlanarQuant:
    """Packed quantized 2-D weight in planar K-major layout.

    shape is the LOGICAL torch-order weight shape (out=R, in=K); array leaves
    are stored transposed with R padded up to a multiple of LANE.
    """

    qs: jax.Array  # nib4: (K//2, Rp) uint8 | int8: (K, Rp) int8
    scales: jax.Array  # (K//gs, Rp) float32
    offsets: jax.Array | None  # (K//gs, Rp) float32 or None
    qtype: int
    layout: str  # "nib4" | "int8"
    group_size: int
    zero_point: int
    shape: tuple[int, int]  # logical (R, K)

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
    def nbytes_packed(self) -> int:
        n = self.qs.size * self.qs.dtype.itemsize
        n += self.scales.size * self.scales.dtype.itemsize
        if self.offsets is not None:
            n += self.offsets.size * self.offsets.dtype.itemsize
        return n


def planarize(
    data: np.ndarray,
    qtype: GGMLQuantizationType,
    shape: tuple[int, int],
    device=None,
    scale_dtype=np.float32,
) -> PlanarQuant:
    """Re-tile raw GGUF packed blocks into PlanarQuant (host-side, one-time).

    data: (n_blocks, type_size) uint8 (as produced by gguf.reader).
    shape: logical (out=R, in=K) weight shape.
    """
    qtype = GGMLQuantizationType(qtype)
    if len(shape) != 2:
        raise ValueError(f"planarize needs 2-D logical shape, got {shape}")
    R, K = int(shape[0]), int(shape[1])
    comp = codecs.COMPONENT_EXTRACTORS[qtype](np.ascontiguousarray(data))
    gs = comp.group_size
    out = _components_to_planar(comp.q, comp.scales, comp.offsets, qtype,
                                comp.zero_point, gs, (R, K),
                                scale_dtype=scale_dtype)
    if device is not None:
        put = partial(jax.device_put, device=device)
        out = jax.tree_util.tree_map(put, out)
    return out


def _shard_index_sets(total: int, n_shards: int, groups, gran: int,
                      what: str) -> list[np.ndarray]:
    """Per-shard index arrays along a split axis.

    ``groups``: segment lengths summing to ``total`` (e.g. fused-qkv head
    groups). Each segment is split uniformly; shard s takes the s-th slice
    of EVERY segment, concatenated — so a head-uniform split of a fused
    [q|k|v] weight gives each shard its own heads of all three. Per-shard
    slices must align to ``gran`` (the quant group size along K; 1 along R).
    """
    groups = [total] if groups is None else list(groups)
    if sum(groups) != total:
        raise ValueError(f"groups {groups} don't sum to {what}={total}")
    idx: list[list[int]] = [[] for _ in range(n_shards)]
    base = 0
    for g in groups:
        if g % n_shards:
            raise ValueError(f"segment {g} not divisible by {n_shards}")
        per = g // n_shards
        if per % gran:
            raise ValueError(
                f"per-shard slice {per} not a multiple of granularity "
                f"{gran} ({what} split)")
        for s in range(n_shards):
            idx[s].extend(range(base + s * per, base + (s + 1) * per))
        base += g
    return [np.asarray(i, dtype=np.int64) for i in idx]


def planarize_shards(
    data: np.ndarray,
    qtype: GGMLQuantizationType,
    shape: tuple[int, int],
    n_shards: int,
    axis: str = "r",
    groups=None,
) -> PlanarQuant:
    """Shard-aware re-tiling for tensor parallelism (SURVEY.md §7.8).

    Returns ONE PlanarQuant whose leaves carry a leading shard axis
    (n_shards, ...) — place it with ``P("tp", ...)`` and squeeze inside
    shard_map (or feed shard_view under vmap/scan). Two layouts:

    * ``axis="r"`` (column parallel): out-features split across shards,
      each shard lane-padded independently.
    * ``axis="k"`` (row parallel): in-features split across shards, each
      chunk re-tiled INDEPENDENTLY — necessary because the nib4 global
      K-split pairs rows (j, j+K/2) in one byte, which must not straddle
      shards.

    The split happens at the **extracted-component** level (per-element
    codes + per-group scales), so K cuts need only align to the quant
    group size (16/32), not the 256-element superblock — e.g. a 24-head
    proj weight (K=3072) row-splits across 8 shards at 384 even though
    384 splits Q4_K superblocks; each chunk re-pads K to 512 internally.
    (The reference's C++ quantizer constraint on whole-superblock row
    widths, tools/lcpp.patch:229-239, applies to ENCODING, not to
    re-tiling already-encoded components.)

    ``groups``: optional segment lengths along the split axis for fused
    weights (e.g. qkv → (3·H/2·H splits)): shard s gets the s-th uniform
    slice of every segment, keeping head locality under TP.
    """
    qtype = GGMLQuantizationType(qtype)
    R, K = int(shape[0]), int(shape[1])
    comp = codecs.COMPONENT_EXTRACTORS[qtype](np.ascontiguousarray(data))
    gs = comp.group_size
    q = comp.q.reshape(R, K)
    scales = comp.scales.reshape(R, K // gs)
    offsets = (None if comp.offsets is None
               else comp.offsets.reshape(R, K // gs))

    shards = []
    if axis == "r":
        for ridx in _shard_index_sets(R, n_shards, groups, 1, "R"):
            shards.append(_components_to_planar(
                q[ridx], scales[ridx],
                None if offsets is None else offsets[ridx],
                qtype, comp.zero_point, gs, (len(ridx), K)))
    elif axis == "k":
        for kidx in _shard_index_sets(K, n_shards, groups, gs, "K"):
            gidx = kidx[::gs] // gs  # group rows for the scale planes
            shards.append(_components_to_planar(
                q[:, kidx], scales[:, gidx],
                None if offsets is None else offsets[:, gidx],
                qtype, comp.zero_point, gs, (R, len(kidx))))
    else:
        raise ValueError(f"axis must be 'r' or 'k', got {axis!r}")

    first = shards[0]
    stack = lambda leaves: jnp.stack(leaves, axis=0)
    return PlanarQuant(
        qs=stack([s.qs for s in shards]),
        scales=stack([s.scales for s in shards]),
        offsets=(None if first.offsets is None
                 else stack([s.offsets for s in shards])),
        qtype=first.qtype, layout=first.layout,
        group_size=first.group_size, zero_point=first.zero_point,
        shape=first.shape,
    )


def _components_to_planar(q, scales, offsets, qtype, zero_point, gs,
                          shape, scale_dtype=np.float32) -> PlanarQuant:
    """Assemble a PlanarQuant from already-extracted component slices.

    ``scale_dtype=jnp.bfloat16`` halves scale/offset bytes (Q4_K planar
    drops from ~6 to ~5 bpw); the ~2⁻⁸ relative scale rounding is far
    below the quantization noise itself — opt-in for HBM-tight deploys.

    K is padded up to a multiple of 512 (zero-contribution pad codes +
    zero scales) so the kernel's k tiling stays Mosaic-legal for any
    block-multiple in-features (e.g. SD3.5-large's 2432): the x block
    needs kt%128, the scale block needs (kt/gs)%8 sublanes, and the nib4
    K-split halves the code rows — 512 covers all of gs∈{16,32}.

    Beyond legality, K and R are padded (within a ≤6.25% byte-waste cap)
    to the nearest sizes whose code rows / lanes admit DEEP tiles: a
    dim like 9728 = 19·512 has code rows 4864 = 19·256 whose only legal
    k-tile is a shallow 256, and out-features like 2432 = 19·128 admit
    only 128-wide r-tiles — both measured as large whole-model
    regressions on sd3.5-large (1134 ms step vs the deep-tile flux
    efficiency). Pad codes dequantize to exactly 0 (zero scales), pad
    output lanes are sliced off, so the only cost is the padded bytes.
    """
    R, K = shape
    kp = _pad_for_deep_tiles(
        -(-K // 512) * 512, 512,
        # nib4 halves the code rows; kt must divide them, be a multiple
        # of lcm(128, 8·gs), and a depth ≥512 is what the model-level
        # A/B ladder wants (ops/qmatmul._pick_tiles)
        lambda kpc: _best_tile(
            kpc // (2 if qtype in _NIB4_TYPES else 1),
            _lcm(128, 8 * gs), 1536) or 0,
        target=512)
    if kp != K:
        q = q.reshape(R, K)
        qpad = np.full((R, kp - K), zero_point, dtype=q.dtype)
        q = np.concatenate([q, qpad], axis=1)
        scales = np.concatenate(
            [scales.reshape(R, K // gs),
             np.zeros((R, (kp - K) // gs), dtype=np.float32)], axis=1)
        if offsets is not None:
            offsets = np.concatenate(
                [offsets.reshape(R, K // gs),
                 np.zeros((R, (kp - K) // gs), dtype=np.float32)], axis=1)
        K = kp
    rp = _pad_for_deep_tiles(
        -(-R // LANE) * LANE, LANE,
        lambda rpc: _best_tile(rpc, LANE, 512) or 0, target=384)
    pad = rp - R
    scales_t = np.pad(scales.reshape(R, K // gs).T, ((0, 0), (0, pad)))
    offsets_t = (None if offsets is None
                 else np.pad(offsets.reshape(R, K // gs).T,
                             ((0, 0), (0, pad))))
    # the (R, K) -> (K, R) byte transpose dominates real-checkpoint load
    # time in numpy (~40 MB/s cache-hostile strided copy); the tiled C++
    # paths run it at memory bandwidth (native/quant_kernels.cc)
    from .. import native

    if qtype in _NIB4_TYPES:
        qu = q.reshape(R, K).astype(np.uint8, copy=False)
        qs = native.pack_nib4_planar(qu, rp)
        if qs is None:
            qt = qu.T.astype(np.uint8)
            packed = qt[: K // 2] | (qt[K // 2:] << 4)
            qs = np.pad(packed, ((0, 0), (0, pad)))
        layout, zp = "nib4", zero_point
    else:
        qi = q.reshape(R, K).astype(np.int16) - int(zero_point)
        if qi.min(initial=0) < -128 or qi.max(initial=0) > 127:
            raise ValueError(f"{qtype!r}: codes out of int8 range")
        qi8 = qi.astype(np.int8)
        qs = native.transpose_i8(qi8, rp)
        if qs is None:
            qs = np.pad(qi8.T, ((0, 0), (0, pad)))
        layout, zp = "int8", 0
    sdt = jnp.dtype(scale_dtype) if not isinstance(scale_dtype, np.dtype) \
        else scale_dtype
    return PlanarQuant(
        qs=jnp.asarray(qs),
        scales=jnp.asarray(scales_t.astype(np.float32)).astype(sdt),
        offsets=(None if offsets_t is None
                 else jnp.asarray(offsets_t.astype(np.float32)).astype(sdt)),
        qtype=int(qtype), layout=layout, group_size=gs, zero_point=zp,
        shape=shape,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pq", "idx"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class IndexedQuant:
    """A depth-STACKED PlanarQuant (leaves (depth, ...)) plus a traced
    block index — the weight handle inside a lax.scan over block depth.

    nn.layers.linear routes this through ops.qmatmul.indexed_matmul: the
    Pallas kernel gathers its tiles from the stacked HBM buffer via
    scalar prefetch, so the scan never materializes a per-block copy of
    the packed weights (round-2 profile: those copies cost more than the
    matmuls themselves)."""

    pq: PlanarQuant
    idx: jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["inner"],
    meta_fields=["mode", "axis"],
)
@dataclasses.dataclass(frozen=True)
class TPShard:
    """A tensor-parallel-sharded weight leaf (spec-driven TP marker).

    Wraps a packed weight (PlanarQuant / I8Planar / IndexedQuant — or a
    dense array) whose leaves were pre-split per shard by
    ``parallel.tp_spec.shard_stacked_params`` and carry a leading mesh
    axis outside shard_map. ``nn.layers.linear`` dispatches on the
    wrapper INSIDE shard_map, so unmodified model forwards become
    Megatron-style TP programs:

    * ``mode="col"`` — out-features split; the local matmul output IS the
      shard's columns, no collective (qkv / mlp-up; any per-shard bias
      is pre-split to match).
    * ``mode="row"`` — in-features split; local contraction over the K
      chunk, then one ``psum`` over ``axis`` replicates the output
      (attn-proj / mlp-down; bias added once, after the psum).
    * ``mode="gather"`` — column split whose output must be replicated
      (modulation / adaLN projections feeding the whole hidden stream):
      local matmul (+ local bias) then ``all_gather(tiled=True)``, which
      restores the ORIGINAL row order for contiguous splits.
    """

    inner: object
    mode: str  # "col" | "row" | "gather"
    axis: str = "tp"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["weight"],
    meta_fields=["axis", "full_dim"],
)
@dataclasses.dataclass(frozen=True)
class TPNormShard:
    """A norm scale whose INPUT feature axis is TP-sharded.

    Some archs (Wan) apply full-width RMS norms to q/k *before* the head
    split; under column-parallel q/k the per-shard activation only holds
    D/tp features, so the norm statistics must be reduced across shards.
    ``nn.layers.rms_norm``/``layer_norm`` dispatch on this wrapper and
    compute sum-of-squares (and mean) via ``psum`` over ``axis`` against
    the true ``full_dim``, then apply the pre-split local scale.
    """

    weight: jax.Array  # local (D/tp,) slice (possibly with leading axes)
    axis: str
    full_dim: int


def shard_view(p: PlanarQuant) -> PlanarQuant:
    """Inside shard_map: strip the leading shard axis from a stacked
    PlanarQuant (each device sees a (1, ...) slice)."""
    return PlanarQuant(
        qs=p.qs[0], scales=p.scales[0],
        offsets=None if p.offsets is None else p.offsets[0],
        qtype=p.qtype, layout=p.layout, group_size=p.group_size,
        zero_point=p.zero_point, shape=p.shape,
    )


def unpack_codes(p: PlanarQuant) -> jax.Array:
    """Integer codes in logical order, shape (K, Rp)."""
    if p.layout == "nib4":
        return jnp.concatenate([p.qs & 0x0F, p.qs >> 4], axis=0)
    return p.qs


def dequantize_kmajor(p: PlanarQuant, dtype=jnp.float32) -> jax.Array:
    """Dequantize to a dense (K, R) array (i.e. W^T), logical R (un-padded).

    Bit-identical (in float32) to codecs.dequantize of the original blocks.
    """
    q = unpack_codes(p).astype(jnp.float32)
    if p.zero_point:
        q = q - jnp.float32(p.zero_point)
    kp = q.shape[0]  # padded K (see _components_to_planar)
    gs = p.group_size
    a = jnp.repeat(p.scales, gs, axis=0, total_repeat_length=kp)
    w = a * q
    if p.offsets is not None:
        w = w + jnp.repeat(p.offsets, gs, axis=0, total_repeat_length=kp)
    return w[: p.in_features, : p.out_features].astype(dtype)


def dequantize(p: PlanarQuant, dtype=jnp.float32) -> jax.Array:
    """Dequantize to the logical torch-order (out=R, in=K) weight."""
    return dequantize_kmajor(p, dtype).T
