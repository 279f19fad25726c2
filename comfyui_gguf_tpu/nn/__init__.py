from .layers import (
    QuantConfig,
    linear,
    embedding,
    layer_norm,
    rms_norm,
    group_norm,
    conv2d,
    materialize,
)

__all__ = [
    "QuantConfig",
    "linear",
    "embedding",
    "layer_norm",
    "rms_norm",
    "group_norm",
    "conv2d",
    "materialize",
]
