from .unigram import UnigramTokenizer
from .bpe import BPETokenizer


def build_tokenizer(spec):
    """TokenizerSpec (loader.gguf_tokenizer_spec) → tokenizer instance."""
    if spec.model == "t5":
        return UnigramTokenizer(spec)
    if spec.model in ("gpt2", "llama-bpe"):
        return BPETokenizer(spec)
    raise NotImplementedError(f"tokenizer model {spec.model!r}")


__all__ = ["UnigramTokenizer", "BPETokenizer", "build_tokenizer"]
