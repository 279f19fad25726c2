"""ResidencyManager: LRU offload within an HBM budget, pinning, stats."""

import numpy as np
import jax.numpy as jnp
import pytest

from comfyui_gguf_tpu.lifecycle import ResidencyManager, tree_bytes


def _params(mb: float):
    n = int(mb * 2**20 // 4)
    return {"w": jnp.zeros((n,), jnp.float32)}


def test_register_free_source_deletes_device_buffers():
    """free_source=True must delete the caller's device leaves after the
    host copy exists — the HBM-budget guarantee for callers whose source
    tree stays referenced (round-4 advisor finding). The host copy must
    still round-trip to a usable device tree."""
    import jax

    reg = ResidencyManager()
    src = _params(1)
    reg.register("m", src, free_source=True)
    assert all(leaf.is_deleted()
               for leaf in jax.tree_util.tree_leaves(src)
               if isinstance(leaf, jax.Array))
    with reg.acquire("m") as p:
        assert float(jnp.sum(p["w"])) == 0.0  # re-placed from host copy

    # default stays non-destructive
    reg2 = ResidencyManager()
    src2 = _params(1)
    reg2.register("m", src2)
    assert not src2["w"].is_deleted()


def test_free_tree_ignores_host_leaves():
    from comfyui_gguf_tpu.lifecycle import free_tree

    dev = jnp.ones((4,))
    tree = {"d": dev, "h": np.ones((4,)), "s": 3}
    free_tree(tree)
    assert dev.is_deleted()
    np.testing.assert_array_equal(tree["h"], np.ones((4,)))


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
