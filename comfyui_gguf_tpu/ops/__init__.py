from .qmatmul import quantized_matmul, xla_qmm, pallas_qmm

__all__ = ["quantized_matmul", "xla_qmm", "pallas_qmm"]
