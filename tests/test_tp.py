"""Tensor-parallel tests on the 8-device virtual CPU mesh: sharded packed
matmuls must equal the single-device result exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.parallel import make_mesh
from comfyui_gguf_tpu.parallel.tp import (
    column_linear,
    place_stacked,
    row_linear,
    tp_mlp,
)
from comfyui_gguf_tpu.quant import codecs
from comfyui_gguf_tpu.quant.planar import (
    dequantize as planar_deq,
    planarize_shards,
    shard_view,
)

TP = 4
F32CFG = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                     prefer_pallas=False)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= TP
    return make_mesh(TP, tp=TP)


def _packed(rng, R, K, qtype=Q.Q8_0):
    w = rng.standard_normal((R, K), dtype=np.float32)
    blocks = codecs.quantize(w, qtype)
    ref = codecs.dequantize(blocks, qtype, (R, K))
    return blocks, ref


@pytest.mark.parametrize("qtype", [Q.Q8_0, Q.Q4_K, Q.Q4_0, Q.Q6_K])
@pytest.mark.parametrize("axis", ["r", "k"])
def test_planarize_shards_matches_unsharded(qtype, axis):
    rng = np.random.default_rng(0)
    # K large enough that a K-split keeps whole 256-elem superblocks
    R, K = 256, 1024
    blocks, ref = _packed(rng, R, K, qtype)
    stacked = planarize_shards(blocks, qtype, (R, K), TP, axis=axis)
    # per-shard dequant reassembles the full matrix
    parts = []
    for s in range(TP):
        view = jax.tree_util.tree_map(lambda x: x[s: s + 1], stacked)
        parts.append(np.asarray(planar_deq(shard_view(view), jnp.float32)))
    full = np.concatenate(parts, axis=0 if axis == "r" else 1)
    np.testing.assert_allclose(full, ref, atol=1e-6)


def test_k_split_inside_superblocks_is_exact():
    """Component-level splitting cuts K at quant-GROUP granularity (32 for
    Q4_K), inside the 256-element superblock — each chunk re-tiles exactly
    (round 2: replaces the old block-aligned-only restriction)."""
    from comfyui_gguf_tpu.quant.planar import dequantize

    rng = np.random.default_rng(9)
    R, K, n = 64, 512, 4  # 128 per shard: half a superblock
    blocks, ref = _packed(rng, R, K, Q.Q4_K)
    st = planarize_shards(blocks, Q.Q4_K, (R, K), n, axis="k")
    ks = K // n
    for s in range(n):
        shard = jax.tree_util.tree_map(lambda leaf: leaf[s], st)
        got = np.asarray(dequantize(shard, jnp.float32))
        np.testing.assert_allclose(got, ref[:, s * ks:(s + 1) * ks],
                                   rtol=1e-6, atol=1e-6)


def test_k_split_rejects_sub_group_cuts():
    rng = np.random.default_rng(10)
    blocks, _ = _packed(rng, 64, 512, Q.Q4_K)
    with pytest.raises(ValueError, match="granularity"):
        planarize_shards(blocks, Q.Q4_K, (64, 512), 32, axis="k")


def test_column_linear(mesh):
    rng = np.random.default_rng(1)
    R, K, M = 512, 256, 24
    blocks, ref = _packed(rng, R, K)
    stacked = place_stacked(
        planarize_shards(blocks, Q.Q8_0, (R, K), TP, axis="r"), mesh)
    x = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32))
    got = np.asarray(column_linear(x, stacked, mesh, cfg=F32CFG))
    np.testing.assert_allclose(got, np.asarray(x) @ ref.T, rtol=2e-4,
                               atol=2e-4)


def test_row_linear(mesh):
    rng = np.random.default_rng(2)
    R, K, M = 256, 512, 24
    blocks, ref = _packed(rng, R, K)
    stacked = place_stacked(
        planarize_shards(blocks, Q.Q8_0, (R, K), TP, axis="k"), mesh)
    x = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32))
    # shard the input on its last dim to match row-parallel entry
    got = np.asarray(row_linear(x, stacked, mesh, cfg=F32CFG))
    np.testing.assert_allclose(got, np.asarray(x) @ ref.T, rtol=2e-4,
                               atol=2e-4)


def test_tp_mlp_matches_dense(mesh):
    rng = np.random.default_rng(3)
    D, F, M = 256, 512, 16
    up_blocks, up_ref = _packed(rng, F, D)
    down_blocks, down_ref = _packed(rng, D, F)
    w_up = place_stacked(
        planarize_shards(up_blocks, Q.Q8_0, (F, D), TP, axis="r"), mesh)
    w_down = place_stacked(
        planarize_shards(down_blocks, Q.Q8_0, (D, F), TP, axis="k"), mesh)
    x = jnp.asarray(rng.standard_normal((M, D), dtype=np.float32))

    got = np.asarray(tp_mlp(x, w_up, w_down, mesh, cfg=F32CFG))
    h = np.asarray(x) @ up_ref.T
    hj = np.asarray(jax.nn.gelu(jnp.asarray(h, jnp.float32)))
    want = hj @ down_ref.T
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_tp_mlp_jits_under_outer_jit(mesh):
    rng = np.random.default_rng(4)
    D, F, M = 256, 512, 8
    up_blocks, _ = _packed(rng, F, D)
    down_blocks, _ = _packed(rng, D, F)
    w_up = place_stacked(
        planarize_shards(up_blocks, Q.Q8_0, (F, D), TP, axis="r"), mesh)
    w_down = place_stacked(
        planarize_shards(down_blocks, Q.Q8_0, (D, F), TP, axis="k"), mesh)
    x = jnp.asarray(rng.standard_normal((M, D), dtype=np.float32))

    @jax.jit
    def step(x, w_up, w_down):
        return tp_mlp(x, w_up, w_down, mesh, cfg=F32CFG)

    eager = np.asarray(tp_mlp(x, w_up, w_down, mesh, cfg=F32CFG))
    jitted = np.asarray(step(x, w_up, w_down))
    np.testing.assert_allclose(jitted, eager, rtol=1e-4, atol=1e-3)


def test_multihost_mesh_single_process():
    """Single-process: all devices share process_index 0 → 1-host mesh;
    batch_spec spans (host, dp) so the batch partitions over both."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from comfyui_gguf_tpu.parallel.mesh import (batch_spec, make_mesh,
                                                make_multihost_mesh)

    mesh = make_multihost_mesh(tp=2)
    assert mesh.shape["host"] == 1
    assert mesh.shape["tp"] == 2
    assert mesh.shape["host"] * mesh.shape["dp"] * mesh.shape["tp"] == len(
        jax.devices())
    x = jnp.zeros((8, 16))
    xs = jax.device_put(x, NamedSharding(mesh, batch_spec(mesh)))
    assert xs.sharding.spec == batch_spec(mesh)
    # plain (dp, tp) mesh → P("dp")
    assert batch_spec(make_mesh(8, tp=4)) == __import__(
        "jax").sharding.PartitionSpec("dp")
