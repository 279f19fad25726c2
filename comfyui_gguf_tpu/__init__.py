"""comfyui-gguf-tpu: TPU-native GGUF diffusion inference engine.

Standalone JAX/XLA/Pallas framework with the capabilities of the
city96/ComfyUI-GGUF plugin plus the host-side machinery ComfyUI provided
for it (model graphs, samplers, tokenizers, VAE, serving, sharding).
See README.md for the component map and PARITY.md for the line-by-line
coverage of the reference.
"""

__version__ = "0.1.0"

# The reference gates its exports on running inside ComfyUI (reference
# __init__.py:1-9); this is a library, so the public API is always exported
# — but lazily, to keep bare-metadata imports (tools, gguf io) light.

_PUBLIC = {
    "GGUFReader": ".gguf.reader",
    "GGUFWriter": ".gguf.writer",
    "LatentPreviewer": ".preview",
    "fit_latent_preview": ".preview",
    "previewer_for_vae": ".preview",
    "gguf_sd_loader": ".loader",
    "gguf_clip_loader": ".loader",
    "to_jax_params": ".loader",
    "load_diffusion_model": ".pipeline",
    "load_text_encoder": ".pipeline",
    "load_text_encoders": ".pipeline",
    "load_vae": ".pipeline",
    "FluxPipeline": ".pipeline",
    "SD3Pipeline": ".pipeline",
    "SDXLPipeline": ".pipeline",
    "SD1Pipeline": ".pipeline",
    "flux_engine": ".pipeline",
    "sd3_engine": ".pipeline",
    "qwen_image_engine": ".pipeline",
    "wan_engine": ".pipeline",
    "hyvid_engine": ".pipeline",
    "ltxv_engine": ".pipeline",
    "lumina2_engine": ".pipeline",
    "aura_engine": ".pipeline",
    "cosmos_engine": ".pipeline",
    "hidream_engine": ".pipeline",
    "unet_engine": ".pipeline",
    "ModelRegistry": ".registry",
    "QuantConfig": ".nn.layers",
    "quantized_matmul": ".ops.qmatmul",
    "PlanarQuant": ".quant.planar",
    "planarize": ".quant.planar",
    "ContinuousBatchEngine": ".serving",
    "EngineGroup": ".serving",
    "ResidencyManager": ".lifecycle",
    "enable_compile_cache": ".compile_cache",
    "save_params": ".checkpoint",
    "load_params": ".checkpoint",
    "ring_attention": ".parallel.ring",
    "EmbeddingSet": ".textual_inversion",
    "WanPipeline": ".pipeline",
    "HyVidPipeline": ".pipeline",
    "LTXVPipeline": ".pipeline",
    "QwenImagePipeline": ".pipeline",
    "AuraPipeline": ".pipeline",
    "CosmosPipeline": ".pipeline",
    "Lumina2Pipeline": ".pipeline",
    "HiDreamPipeline": ".pipeline",
}


def __getattr__(name):
    if name in _PUBLIC:
        import importlib

        mod = importlib.import_module(_PUBLIC[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = list(_PUBLIC)
