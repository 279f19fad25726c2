"""ResidencyManager: LRU offload within an HBM budget, pinning, stats."""

import numpy as np
import jax.numpy as jnp
import pytest

from comfyui_gguf_tpu.lifecycle import ResidencyManager, tree_bytes


def _params(mb: float):
    n = int(mb * 2**20 // 4)
    return {"w": jnp.zeros((n,), jnp.float32)}


def test_budget_evicts_lru():
    reg = ResidencyManager(hbm_budget=10 << 20)
    reg.register("a", _params(4))
    reg.register("b", _params(4))
    reg.register("c", _params(4))
    with reg.acquire("a"):
        pass
    with reg.acquire("b"):
        pass
    assert reg.stats()["a"]["resident"] and reg.stats()["b"]["resident"]
    with reg.acquire("c"):
        pass
    st = reg.stats()
    assert st["c"]["resident"]
    assert not st["a"]["resident"]  # oldest evicted
    assert st["b"]["resident"]
    assert reg.device_bytes() <= 10 << 20


def test_pinned_never_evicted():
    reg = ResidencyManager(hbm_budget=10 << 20)
    reg.register("a", _params(6))
    reg.register("b", _params(6))
    with reg.acquire("a"):
        with pytest.raises(MemoryError):
            with reg.acquire("b"):
                pass
    # after unpin, b fits (a evicted)
    with reg.acquire("b"):
        pass
    assert reg.stats()["b"]["resident"]
    assert not reg.stats()["a"]["resident"]


def test_reacquire_after_evict_roundtrips_values():
    reg = ResidencyManager(hbm_budget=None)
    v = {"w": jnp.arange(8, dtype=jnp.float32),
         "nested": {"b": jnp.ones((3,), jnp.bfloat16)}}
    reg.register("m", v)
    reg.evict("m")
    with reg.acquire("m") as p:
        np.testing.assert_array_equal(np.asarray(p["w"]), np.arange(8))
        assert p["nested"]["b"].dtype == jnp.bfloat16


def test_planar_quant_leaves_survive():
    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models.testing import random_planar
    from comfyui_gguf_tpu.quant.planar import dequantize

    rng = np.random.default_rng(0)
    pq = random_planar(Q.Q4_K, (64, 512), rng)
    want = np.asarray(dequantize(pq))
    reg = ResidencyManager()
    reg.register("m", {"w": pq})
    reg.evict("m")
    with reg.acquire("m") as p:
        got = np.asarray(dequantize(p["w"]))
    np.testing.assert_array_equal(got, want)


def test_register_duplicate_and_unregister_pinned():
    reg = ResidencyManager()
    reg.register("a", _params(1))
    with pytest.raises(ValueError):
        reg.register("a", _params(1))
    with reg.acquire("a"):
        with pytest.raises(RuntimeError):
            reg.unregister("a")
    reg.unregister("a")
    assert "a" not in reg.stats()


def test_tree_bytes_counts_quant_components():
    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models.testing import random_planar

    rng = np.random.default_rng(1)
    pq = random_planar(Q.Q8_0, (128, 512), rng)
    assert tree_bytes({"w": pq}) == pq.nbytes_packed
