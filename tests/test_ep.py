"""Expert parallelism vs dense mask-weighted reference (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from comfyui_gguf_tpu.parallel.ep import ep_moe


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("ep",))


def _ffn(w, x):
    return jnp.tanh(x @ w["w1"]) @ w["w2"]


def test_ep_matches_dense(mesh):
    rng = np.random.default_rng(0)
    E, D, F, T = 8, 16, 32, 10
    params = {"w1": jnp.asarray(rng.standard_normal((E, D, F)) * 0.2),
              "w2": jnp.asarray(rng.standard_normal((E, F, D)) * 0.2)}
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    # top-2 routing probs
    logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    top, _ = jax.lax.top_k(logits, 2)
    probs = jax.nn.softmax(
        jnp.where(logits >= top[..., -1:], logits, -jnp.inf), axis=-1)

    got = ep_moe(_ffn, params, x, probs, mesh)
    ref = sum(probs[:, e:e + 1] * _ffn(
        {"w1": params["w1"][e], "w2": params["w2"][e]}, x)
        for e in range(E))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ep_rejects_mismatch(mesh):
    params = {"w1": jnp.zeros((4, 8, 8)), "w2": jnp.zeros((4, 8, 8))}
    with pytest.raises(ValueError):
        ep_moe(_ffn, params, jnp.zeros((2, 8)), jnp.zeros((2, 4)), mesh)


def test_ep_multi_expert_per_device_matches_dense():
    """devices < experts (2 devices, 4 experts): every expert must still
    contribute — regression for the slice-[0]-only bug that silently
    dropped half the experts."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from comfyui_gguf_tpu.parallel.ep import ep_moe

    rng = np.random.default_rng(3)
    E, D, F, T = 4, 16, 32, 8
    ws = {
        "w1": jnp.asarray(rng.standard_normal((E, F, D)) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((E, D, F)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((1, T, D)), jnp.float32)
    probs = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((1, T, E)), jnp.float32), axis=-1)

    def expert(w, xx):
        h = jnp.tanh(xx @ w["w1"].T)
        return h @ w["w2"].T

    dense = sum(probs[..., e: e + 1] * expert(
        jax.tree_util.tree_map(lambda a, e=e: a[e], ws), x)
        for e in range(E))

    mesh = Mesh(np.array(jax.devices()[:2]), ("ep",))
    got = ep_moe(expert, ws, x, probs, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)
