"""Profile-driven tile autotuner for the fused dequant+matmul kernel.

The heuristics in ``_pick_tiles`` are good (≈0.76 SoL) but not optimal
for every (M, K, R, layout); this module measures REAL custom-call
durations — via ``jax.profiler`` + the xplane parser, the only timing
source that survives the remote-tunnel RTT floor (docs/NOTES_ROUND1.md)
— for a candidate tile list and records winners in
``qmatmul.SHAPE_TILES``. Results persist to JSON so a serving fleet pays
the search once per chip generation.

Usage (on the target chip):

    from comfyui_gguf_tpu.ops import autotune
    autotune.tune_for_params(params, m=4608)     # all PlanarQuant leaves
    autotune.save(path)                          # → JSON
    # on boot: autotune.load(path)  (or set $GGUF_TPU_TILE_CACHE)

MODEL-LEVEL ACCEPTANCE (round 2): per-kernel wins must be confirmed at
the model step before becoming defaults. Round 1's regression (wide
r-tiles: kernel +7-10%%, model -4%%) was an artifact of the scan-sliced
copy era; with the scalar-prefetch indexed kernel the same candidates
WIN at model level (step 687->658->644 ms across kt=512 and wide
rt=1024, tools_tile_ab*.py, docs/NOTES_ROUND2.md) and are now the
_pick_tiles defaults. Use this module's per-kernel search to produce
CANDIDATES, then A/B them with a full-model step before persisting.
"""

from __future__ import annotations

import json
import logging
import os
import tempfile

import numpy as np

from . import qmatmul
from ..quant.planar import PlanarQuant

log = logging.getLogger(__name__)

# candidate (mt, kt, rt); all Mosaic-legal for gs in {16, 32} given
# k_rows % kt == 0 and rp % rt == 0 (filtered per shape below).
# Deep-kt entries added after the round-2 model-level ladder (whole-K
# single-pass tiles were the biggest win; docs/NOTES_ROUND2.md).
CANDIDATES = (
    (512, 1536, 512),
    (512, 1024, 512),
    (512, 512, 512),
    (512, 512, 1024),
    (512, 256, 512),
    (256, 256, 512),
    (512, 256, 1024),
)


def _legal(pq: PlanarQuant, m: int, tiles) -> bool:
    mt, kt, rt = tiles
    k_rows = pq.qs.shape[0]
    gs = pq.group_size
    return (k_rows % kt == 0 and kt % (8 * gs) == 0 and kt % 128 == 0
            and pq.padded_out % rt == 0)


def _profile_ms(pq: PlanarQuant, m: int, iters: int = 8) -> float:
    """Custom-call time for one pallas_qmm at the CURRENT tile choice."""
    import jax
    import jax.numpy as jnp

    from ..tools.read_xplane import summarize

    K = pq.in_features
    x = jnp.asarray(np.random.default_rng(0).standard_normal((m, K)),
                    jnp.bfloat16)

    @jax.jit
    def chain(x, pq):
        def body(i, x):
            o = qmatmul.pallas_qmm(x, pq)
            return (x + 1e-6 * o[:, :1].astype(jnp.float32)).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    chain(x, pq).block_until_ready()  # compile + warm
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            chain(x, pq).block_until_ready()
        rows = summarize(td, top_n=10)
    for r in rows:
        if r["op"] == "pallas/custom-call":
            return r["ms"] / iters
    return float("inf")


def tune_shape(pq: PlanarQuant, m: int,
               candidates=CANDIDATES) -> tuple | None:
    """Measure candidates for one weight; record + return the winner."""
    key = qmatmul.shape_key(m, pq.qs.shape[0], pq.padded_out, pq.layout)
    best, best_ms = None, float("inf")
    for tiles in candidates:
        if not _legal(pq, m, tiles):
            continue
        qmatmul.SHAPE_TILES[key] = tiles
        qmatmul.pallas_qmm.clear_cache()
        try:
            ms = _profile_ms(pq, m)
        except Exception as e:  # illegal tiling at runtime → skip
            log.info("tiles %s failed for %s: %s", tiles, key, str(e)[:80])
            continue
        log.info("shape %s tiles %s: %.3f ms", key, tiles, ms)
        if ms < best_ms:
            best, best_ms = tiles, ms
    if best is None:
        qmatmul.SHAPE_TILES.pop(key, None)
        return None
    qmatmul.SHAPE_TILES[key] = best
    qmatmul.pallas_qmm.clear_cache()
    return best


def tune_for_params(params: dict, m: int, candidates=CANDIDATES) -> dict:
    """Tune every distinct PlanarQuant shape in a param tree."""
    seen = {}
    for k, v in params.items():
        if not isinstance(v, PlanarQuant):
            continue
        key = qmatmul.shape_key(m, v.qs.shape[0], v.padded_out, v.layout)
        if key in seen:
            continue
        seen[key] = tune_shape(v, m, candidates)
    return seen


def save(path: str) -> None:
    data = {json.dumps(list(k)): list(v)
            for k, v in qmatmul.SHAPE_TILES.items()}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def load(path: str) -> int:
    with open(path) as f:
        data = json.load(f)
    for k, v in data.items():
        key = json.loads(k)
        qmatmul.SHAPE_TILES[tuple(key)] = tuple(v)
    return len(data)


_cache = os.environ.get("GGUF_TPU_TILE_CACHE")
if _cache and os.path.exists(_cache):
    try:
        n = load(_cache)
        log.info("loaded %d tuned tile entries from %s", n, _cache)
    except Exception:
        log.exception("failed to load tile cache %s", _cache)
