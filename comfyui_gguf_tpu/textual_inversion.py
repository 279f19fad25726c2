"""Textual-inversion embeddings: learned token vectors spliced into a text
encoder's vocabulary at load time.

Role of the reference ecosystem's ``embedding:name`` prompt syntax (ComfyUI
sd1_clip resolves the name to a .safetensors/.pt file and prepends its
vectors to the token stream; the reference loader itself defers to it).
TPU-native shape: instead of editing the token stream with ragged inserts
per call, the vectors are **appended to the embedding table once** and the
prompt parser emits the new (static) token ids — the jitted encoder graph
is untouched and keeps its static shapes.

File formats accepted (all public conventions):
* safetensors with ``emb_params`` (A1111 SD1) → slot ``"any"``
* safetensors with ``clip_l`` / ``clip_g`` keys (SDXL dual-encoder)
* torch ``.pt`` with ``string_to_param: {"*": tensor}`` (legacy A1111)
"""

from __future__ import annotations

import logging
import re

import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

EMB_RE = re.compile(r"embedding:([\w.\-]+)")

TOKEN_TABLE_KEY = "text_model.embeddings.token_embedding.weight"


def load_embedding_file(path: str) -> dict[str, np.ndarray]:
    """→ {slot: (n_vectors, dim) float32}; slots: "clip_l", "clip_g", "any"."""
    out: dict[str, np.ndarray] = {}
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="np") as f:
            keys = set(f.keys())
            for key, slot in (("clip_l", "clip_l"), ("clip_g", "clip_g"),
                              ("emb_params", "any")):
                if key in keys:
                    out[slot] = np.atleast_2d(
                        np.asarray(f.get_tensor(key), np.float32))
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(obj, dict):
            if "string_to_param" in obj:
                t = next(iter(obj["string_to_param"].values()))
                out["any"] = np.atleast_2d(t.float().numpy())
            elif "emb_params" in obj:
                out["any"] = np.atleast_2d(obj["emb_params"].float().numpy())
    if not out:
        raise ValueError(f"unrecognized embedding file format: {path}")
    return out


def pick_slot(vectors: dict[str, np.ndarray], hidden: int,
              slot: str | None = None) -> np.ndarray | None:
    """Choose the vector bank matching an encoder's hidden size."""
    if slot and slot in vectors:
        v = vectors[slot]
        return v if v.shape[-1] == hidden else None
    for v in vectors.values():
        if v.shape[-1] == hidden:
            return v
    return None


def extend_token_table(params: dict, vecs: np.ndarray,
                       key: str = TOKEN_TABLE_KEY) -> tuple[dict, int]:
    """Append embedding rows to the (dense) token table.

    Returns (new params dict, first new token id). The table is always a
    dense array at this point — the loader eagerly dequantizes big
    embeddings (loader.py gguf_clip_loader)."""
    table = params[key]
    if not hasattr(table, "dtype") or not hasattr(table, "shape"):
        raise TypeError(f"{key} is not a dense array")
    first = int(table.shape[0])
    new = dict(params)
    new[key] = jnp.concatenate(
        [jnp.asarray(table), jnp.asarray(vecs, table.dtype)], axis=0)
    return new, first


class EmbeddingSet:
    """Registered textual inversions for ONE text encoder.

    >>> es = EmbeddingSet(encoder_params, hidden=768, slot="clip_l")
    >>> es.register("mycat", "/path/mycat.safetensors")
    >>> ids = es.encode(tokenizer, "a photo of embedding:mycat", 77)
    >>> out = clip.encode(es.params, cfg, ids)
    """

    def __init__(self, params: dict, hidden: int, slot: str | None = None,
                 table_key: str = TOKEN_TABLE_KEY):
        self.params = params
        self.hidden = hidden
        self.slot = slot
        self.table_key = table_key
        self.token_ids: dict[str, list[int]] = {}

    def register(self, name: str, path_or_vectors) -> list[int] | None:
        """Load + append one concept; returns its token ids (None if the
        file has no bank matching this encoder's width — reference
        behavior is to skip silently for the non-matching encoder)."""
        if name in self.token_ids:
            return self.token_ids[name]
        if isinstance(path_or_vectors, str):
            banks = load_embedding_file(path_or_vectors)
        elif isinstance(path_or_vectors, dict):
            banks = path_or_vectors
        else:
            banks = {"any": np.atleast_2d(
                np.asarray(path_or_vectors, np.float32))}
        vecs = pick_slot(banks, self.hidden, self.slot)
        if vecs is None:
            log.info("embedding %s: no %d-dim bank, skipped", name,
                     self.hidden)
            return None
        self.params, first = extend_token_table(self.params, vecs,
                                                self.table_key)
        ids = list(range(first, first + vecs.shape[0]))
        self.token_ids[name] = ids
        return ids

    def encode(self, tokenizer, prompt: str,
               max_length: int | None = None) -> np.ndarray:
        """Tokenize with ``embedding:name`` splicing → (1, L) int32 ids."""
        ids = encode_prompt_ids(tokenizer, prompt, self.token_ids,
                                max_length)
        return ids


def _enc_plain(tokenizer, text: str) -> list[int]:
    try:
        return tokenizer.encode(text, add_special=False)
    except TypeError:  # unigram tokenizers use add_eos
        return tokenizer.encode(text, add_eos=False)


def encode_prompt_ids(tokenizer, prompt: str,
                      registry: dict[str, list[int]],
                      max_length: int | None = None) -> np.ndarray:
    """Encode a prompt, replacing ``embedding:name`` spans with the
    registered token ids. Unknown names tokenize as literal text (the
    reference warns and keeps the text)."""
    body: list[int] = []
    pos = 0
    for m in EMB_RE.finditer(prompt):
        frag = prompt[pos:m.start()]
        if frag.strip():
            body.extend(_enc_plain(tokenizer, frag.strip()))
        name = m.group(1)
        if name in registry:
            body.extend(registry[name])
        else:
            log.warning("unknown embedding %r; tokenized literally", name)
            body.extend(_enc_plain(tokenizer, m.group(0)))
        pos = m.end()
    tail = prompt[pos:]
    if tail.strip():
        body.extend(_enc_plain(tokenizer, tail.strip()))

    bos = getattr(tokenizer, "bos_id", None)
    eos = getattr(tokenizer, "eos_id", None)
    if bos is not None:
        body = [bos] + body
    if eos is not None:
        body = body + [eos]
    L = max_length or len(body)
    pad = getattr(tokenizer, "pad_id", 0) or 0
    out = np.full((1, L), pad, dtype=np.int32)
    out[0, : min(len(body), L)] = body[:L]
    if eos is not None and len(body) > L:
        out[0, -1] = eos  # never truncate away the EOT token
    return out
