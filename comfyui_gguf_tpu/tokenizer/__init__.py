from .unigram import UnigramTokenizer
from .bpe import BPETokenizer
from .tekken import TekkenTokenizer


def build_tokenizer(spec):
    """TokenizerSpec (loader.gguf_tokenizer_spec) → tokenizer instance."""
    if spec.model == "t5":
        return UnigramTokenizer(spec)
    if spec.model in ("gpt2", "llama-bpe"):
        # Mistral-family ("tekken") GGUFs ship NO merges list — the BPE
        # merge rule is implicit in vocab rank order (reference
        # loader.py:334-375 rebuilds tekken.json for the same case)
        if not spec.merges:
            return TekkenTokenizer(spec)
        return BPETokenizer(spec)
    raise NotImplementedError(f"tokenizer model {spec.model!r}")


__all__ = ["UnigramTokenizer", "BPETokenizer", "TekkenTokenizer",
           "build_tokenizer"]
