"""Planar checkpoint round trip (quantized + dense + bf16 leaves)."""

import jax.numpy as jnp
import numpy as np

from comfyui_gguf_tpu import checkpoint
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models.testing import random_planar
from comfyui_gguf_tpu.quant.planar import PlanarQuant, dequantize


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    params = {
        "blk.q": random_planar(Q.Q4_K, (64, 512), rng),
        "blk.q8": random_planar(Q.Q8_0, (64, 512), rng),
        "norm.weight": jnp.asarray(rng.standard_normal(64), jnp.float32),
        "big.bf16": jnp.asarray(rng.standard_normal((8, 16)), jnp.bfloat16),
    }
    f = str(tmp_path / "m.npz")
    checkpoint.save_params(f, params)
    got = checkpoint.load_params(f)

    assert isinstance(got["blk.q"], PlanarQuant)
    np.testing.assert_array_equal(np.asarray(dequantize(got["blk.q"])),
                                  np.asarray(dequantize(params["blk.q"])))
    assert got["blk.q8"].layout == "int8" and got["blk.q8"].zero_point == 0
    assert got["blk.q"].shape == (64, 512)
    np.testing.assert_array_equal(np.asarray(got["norm.weight"]),
                                  np.asarray(params["norm.weight"]))
    assert got["big.bf16"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got["big.bf16"], np.float32),
        np.asarray(params["big.bf16"], np.float32))


def test_rejects_foreign_file(tmp_path):
    f = str(tmp_path / "x.npz")
    np.savez(f, a=np.zeros(3))
    try:
        checkpoint.load_params(f)
        raise AssertionError("should have raised")
    except (ValueError, KeyError):
        pass


def test_extensionless_path(tmp_path):
    """np.savez appends .npz to bare paths; save/load must agree on the
    on-disk name (ADVICE r1)."""
    rng = np.random.default_rng(2)
    params = {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)}
    p = str(tmp_path / "ckpt")  # no extension
    checkpoint.save_params(p, params)
    out = checkpoint.load_params(p)
    np.testing.assert_array_equal(np.asarray(out["w"]),
                                  np.asarray(params["w"]))
