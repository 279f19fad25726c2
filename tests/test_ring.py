"""Ring attention (sequence parallelism) vs dense reference on the
8-device CPU mesh (conftest forces xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from comfyui_gguf_tpu.parallel.ring import ring_attention


def _dense(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("sp",))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ring_matches_dense(mesh, dtype):
    rng = np.random.default_rng(0)
    B, L, H, D = 2, 64, 4, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D)), dtype)
               for _ in range(3))
    got = ring_attention(q, k, v, mesh)
    want = _dense(q, k, v, D ** -0.5)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_ring_custom_scale(mesh):
    rng = np.random.default_rng(1)
    B, L, H, D = 1, 32, 2, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
               for _ in range(3))
    got = ring_attention(q, k, v, mesh, scale=0.5)
    want = _dense(q, k, v, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ring_rejects_indivisible(mesh):
    q = jnp.zeros((1, 30, 2, 8))
    with pytest.raises(ValueError):
        ring_attention(q, q, q, mesh)


def test_ring_extreme_logits_stable(mesh):
    """Streaming softmax must survive large logit magnitudes (running-max
    correction), where a naive exp-sum would overflow."""
    rng = np.random.default_rng(2)
    B, L, H, D = 1, 64, 2, 16
    q = jnp.asarray(rng.standard_normal((B, L, H, D)) * 30, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)) * 30, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    got = ring_attention(q, k, v, mesh)
    want = _dense(q, k, v, D ** -0.5)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sequence_parallel_context_routes_dispatcher(mesh):
    """`with sequence_parallel("sp")` inside a shard_map makes the
    ordinary nn.attention dispatcher compute EXACT global attention over
    the sharded sequence — the hook video models use unmodified."""
    import functools

    from comfyui_gguf_tpu.nn import attention as att

    rng = np.random.default_rng(5)
    B, H, L, D = 1, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)

    from jax.sharding import PartitionSpec as P

    def local_fn(q, k, v):
        with att.sequence_parallel("sp"):
            return att.dot_product_attention(q, k, v)

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(None, None, "sp"),) * 3,
                       out_specs=P(None, None, "sp"), check_vma=False)
    got = fn(q, k, v)
    want = _dense(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                  v.transpose(0, 2, 1, 3), D ** -0.5).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_wan_block_under_sp(mesh):
    """A REAL Wan video block runs unmodified under `sequence_parallel`
    on the 8-device mesh — self-attention rings over the sharded 192
    tokens (24/shard, a lane-odd per-shard length), cross-attention to
    the replicated text states computes locally — and matches the dense
    single-device block (round-4 verdict item 5: SP meets a model)."""
    from jax.sharding import PartitionSpec as P

    from comfyui_gguf_tpu.models import testing, wan
    from comfyui_gguf_tpu.models.flux import block_subtree
    from comfyui_gguf_tpu.nn import attention as att
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                      prefer_pallas=False)
    d = testing.WanDims()  # dim 128, 2 heads, hd 64
    nonblock, groups = testing.wan_shape_spec(d)
    sd = testing.random_flat_sd_from_spec(nonblock, groups, seed=9)
    params = {k: jnp.asarray(v) for k, v in sd.items()}
    cfg = d.config()
    bp = block_subtree(params, "blocks.0.")

    rng = np.random.default_rng(3)
    B, L, Lc = 1, 192, 6  # 192 = 8 shards x 24 tokens
    x = jnp.asarray(rng.standard_normal((B, L, d.dim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, Lc, d.dim)), jnp.float32)
    e0 = jnp.asarray(rng.standard_normal((B, 6 * d.dim)) * 0.1,
                     jnp.float32)
    pe = wan.rope_3d(3, 8, 8, cfg.axes_dim)  # (192, hd/2, 2)

    want = np.asarray(wan._block(bp, x, e0, ctx, pe, cfg, F32), np.float32)

    def local_fn(bp, x_l, e0, ctx, pe_l):
        with att.sequence_parallel("sp"):
            return wan._block(bp, x_l, e0, ctx, pe_l, cfg, F32)

    spec = lambda tree, s: jax.tree_util.tree_map(lambda _: s, tree)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec(bp, P()), P(None, "sp"), P(), P(), P("sp")),
        out_specs=P(None, "sp"), check_vma=False)
    got = np.asarray(fn(bp, x, e0, ctx, pe), np.float32)

    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
