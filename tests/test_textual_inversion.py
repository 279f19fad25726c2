"""Textual inversion: table extension, prompt splicing, pooled-EOT fix."""

import numpy as np
import jax.numpy as jnp
import pytest

from comfyui_gguf_tpu import textual_inversion as ti
from comfyui_gguf_tpu.models import clip


class StubTok:
    bos_id, eos_id, pad_id = 90, 91, 91  # CLIP pads with EOT

    def encode(self, text, add_special=True):
        ids = [ord(c) % 80 for c in text.replace(" ", "")]
        if add_special:
            ids = [self.bos_id] + ids + [self.eos_id]
        return ids


def _tiny_clip_params(rng, vocab=92, hidden=64, layers=2, inter=128):
    p = {
        "text_model.embeddings.token_embedding.weight":
            jnp.asarray(rng.standard_normal((vocab, hidden)), jnp.float32),
        "text_model.embeddings.position_embedding.weight":
            jnp.asarray(rng.standard_normal((77, hidden)) * 0.01,
                        jnp.float32),
        "text_model.final_layer_norm.weight": jnp.ones((hidden,)),
        "text_model.final_layer_norm.bias": jnp.zeros((hidden,)),
    }
    for i in range(layers):
        pre = f"text_model.encoder.layers.{i}"
        for nm, shape in (("self_attn.q_proj", (hidden, hidden)),
                          ("self_attn.k_proj", (hidden, hidden)),
                          ("self_attn.v_proj", (hidden, hidden)),
                          ("self_attn.out_proj", (hidden, hidden)),
                          ("mlp.fc1", (inter, hidden)),
                          ("mlp.fc2", (hidden, inter))):
            p[f"{pre}.{nm}.weight"] = jnp.asarray(
                rng.standard_normal(shape) * 0.02, jnp.float32)
            p[f"{pre}.{nm}.bias"] = jnp.zeros((shape[0],), jnp.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            p[f"{pre}.{ln}.weight"] = jnp.ones((hidden,))
            p[f"{pre}.{ln}.bias"] = jnp.zeros((hidden,))
    return p


def test_extend_and_splice():
    rng = np.random.default_rng(0)
    p = _tiny_clip_params(rng)
    es = ti.EmbeddingSet(p, hidden=64)
    vecs = rng.standard_normal((3, 64)).astype(np.float32)
    ids = es.register("cat", vecs)
    assert ids == [92, 93, 94]
    assert es.params[ti.TOKEN_TABLE_KEY].shape[0] == 95
    np.testing.assert_allclose(
        np.asarray(es.params[ti.TOKEN_TABLE_KEY][92:]), vecs, rtol=1e-6)

    tok = StubTok()
    out = es.encode(tok, "a embedding:cat b", max_length=16)
    assert out.shape == (1, 16)
    row = out[0].tolist()
    assert row[0] == tok.bos_id
    i = row.index(92)
    assert row[i:i + 3] == [92, 93, 94]
    assert tok.eos_id in row[i + 3:]


def test_wrong_width_bank_skipped():
    rng = np.random.default_rng(1)
    es = ti.EmbeddingSet(_tiny_clip_params(rng), hidden=64, slot="clip_g")
    got = es.register("x", {"clip_l": rng.standard_normal((2, 48))
                            .astype(np.float32)})
    assert got is None


def test_unknown_name_tokenizes_literally():
    tok = StubTok()
    out = ti.encode_prompt_ids(tok, "embedding:nope", {}, max_length=24)
    # falls back to encoding the literal text, not crashing
    assert out.shape == (1, 24)


def test_pooled_uses_first_eos_not_argmax():
    """With TI tokens appended (ids > eos), argmax pooling would read the
    TI position; eos_token_id pooling must read the true EOT."""
    rng = np.random.default_rng(2)
    p = _tiny_clip_params(rng)
    cfg = clip.CLIPTextConfig(hidden=64, n_layers=2, n_heads=2,
                              intermediate=128, vocab_size=92,
                              eos_token_id=91)
    es = ti.EmbeddingSet(p, hidden=64)
    es.register("cat", rng.standard_normal((2, 64)).astype(np.float32))
    tok = StubTok()
    ids = es.encode(tok, "hi embedding:cat", max_length=12)
    out = es.params and clip.encode(es.params, cfg, jnp.asarray(ids))
    eos_pos = ids[0].tolist().index(91)
    np.testing.assert_allclose(np.asarray(out["pooled"][0]),
                               np.asarray(out["last_hidden"][0, eos_pos]),
                               rtol=1e-6)


def test_safetensors_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(3)
    v = rng.standard_normal((4, 64)).astype(np.float32)
    f = str(tmp_path / "emb.safetensors")
    save_file({"emb_params": v}, f)
    banks = ti.load_embedding_file(f)
    np.testing.assert_array_equal(banks["any"], v)

    f2 = str(tmp_path / "dual.safetensors")
    save_file({"clip_l": v, "clip_g": rng.standard_normal((4, 96))
               .astype(np.float32)}, f2)
    banks = ti.load_embedding_file(f2)
    assert set(banks) == {"clip_l", "clip_g"}
    assert ti.pick_slot(banks, 96, "clip_g").shape == (4, 96)
    assert ti.pick_slot(banks, 64, "clip_l").shape == (4, 64)


def test_torch_pt_legacy(tmp_path):
    import torch

    v = torch.randn(2, 64)
    f = str(tmp_path / "old.pt")
    torch.save({"string_to_param": {"*": v}}, f)
    banks = ti.load_embedding_file(f)
    np.testing.assert_allclose(banks["any"], v.numpy(), rtol=1e-6)
