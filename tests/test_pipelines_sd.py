"""SD3/SDXL pipeline conditioning assembly tests (stub encoders)."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from comfyui_gguf_tpu import pipeline


@dataclasses.dataclass
class StubEncoder:
    kind: str
    hidden: int
    pooled_dim: int

    def encode(self, ids, **kw):
        B, L = ids.shape
        rng = np.random.default_rng(int(jnp.sum(ids)))
        return {
            "penultimate": jnp.asarray(
                rng.standard_normal((B, L, self.hidden)), jnp.float32),
            "last_hidden": jnp.asarray(
                rng.standard_normal((B, L, self.hidden)), jnp.float32),
            "pooled": jnp.asarray(
                rng.standard_normal((B, self.pooled_dim)), jnp.float32),
        }


def test_sd3_condition_concat_and_pad():
    p = pipeline.SD3Pipeline(
        model=None, clip_l=StubEncoder("clip_l", 768, 768),
        clip_g=StubEncoder("clip_g", 1280, 1280), t5=None)
    ids = jnp.zeros((1, 7), jnp.int32)
    ctx, pooled = p._condition(ids, ids, None)
    # CLIP-L(768) ⊕ CLIP-G(1280) = 2048, zero-padded to 4096
    assert ctx.shape == (1, 7, 4096)
    assert pooled.shape == (1, 768 + 1280)
    np.testing.assert_array_equal(np.asarray(ctx[..., 2048:]), 0.0)


def test_sd3_condition_with_t5():
    class StubT5:
        kind = "t5"

        def encode(self, ids, **kw):
            return jnp.ones((1, 5, 4096), jnp.float32)

    p = pipeline.SD3Pipeline(
        model=None, clip_l=StubEncoder("clip_l", 768, 768),
        clip_g=StubEncoder("clip_g", 1280, 1280), t5=StubT5())
    ids = jnp.zeros((1, 7), jnp.int32)
    ctx, _ = p._condition(ids, ids, jnp.zeros((1, 5), jnp.int32))
    assert ctx.shape == (1, 12, 4096)  # 7 clip + 5 t5 tokens
    np.testing.assert_array_equal(np.asarray(ctx[:, 7:]), 1.0)


def test_sdxl_size_embedding_width():
    from comfyui_gguf_tpu.models.flux import timestep_embedding

    sizes = jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32)
    emb = timestep_embedding(sizes.reshape(-1), 256, time_factor=1.0)
    assert emb.shape == (6, 256)
    # SDXL adm vector = pooled_g (1280) + 6*256 = 2816
    assert 1280 + 6 * 256 == 2816
