"""Autotuner bookkeeping (no TPU needed: save/load + key plumbing)."""

import jax.numpy as jnp
import numpy as np

from comfyui_gguf_tpu.ops import autotune, qmatmul
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models.testing import random_planar


def test_shape_key_buckets_m():
    assert qmatmul.shape_key(4608, 1536, 3072, "nib4") == \
        qmatmul.shape_key(8192, 1536, 3072, "nib4")
    assert qmatmul.shape_key(4096, 1536, 3072, "nib4")[0] == 4096


def test_save_load_roundtrip(tmp_path):
    qmatmul.SHAPE_TILES.clear()
    key = qmatmul.shape_key(4608, 1536, 3072, "nib4")
    qmatmul.SHAPE_TILES[key] = (512, 256, 512)
    f = str(tmp_path / "tiles.json")
    autotune.save(f)
    qmatmul.SHAPE_TILES.clear()
    n = autotune.load(f)
    assert n == 1
    assert qmatmul.SHAPE_TILES[key] == (512, 256, 512)
    qmatmul.SHAPE_TILES.clear()


def test_shape_tiles_consulted():
    """_pick_tiles returns the tuned entry when present."""
    rng = np.random.default_rng(0)
    pq = random_planar(Q.Q4_K, (256, 1024), rng)
    key = qmatmul.shape_key(64, pq.qs.shape[0], pq.padded_out, pq.layout)
    qmatmul.SHAPE_TILES[key] = (64, 128, 256)
    try:
        got = qmatmul._pick_tiles(64, pq.qs.shape[0], pq.padded_out,
                                  pq.group_size, layout=pq.layout)
        assert got == (64, 128, 256)
    finally:
        qmatmul.SHAPE_TILES.clear()


def test_legal_filter():
    rng = np.random.default_rng(1)
    pq = random_planar(Q.Q4_K, (256, 1024), rng)  # k_rows 512, gs 32
    assert autotune._legal(pq, 64, (512, 256, 256))
    assert not autotune._legal(pq, 64, (512, 384, 256))   # kt not legal
    assert not autotune._legal(pq, 64, (512, 256, 3000))  # rt misaligned
