from .mesh import make_mesh, shard_quant_params, replicate

__all__ = ["make_mesh", "shard_quant_params", "replicate"]
