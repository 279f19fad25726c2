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
