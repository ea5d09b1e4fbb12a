"""Pallas TPU kernels — the hand-fused hot paths.

- :mod:`fake_quant`: fused quant-dequant (div/add-zp/round/clamp/sub-zp/mul)
  in one VMEM pass with a custom VJP, replacing the reference's C++ STE
  extension (``src/brevitas/csrc/autograd_ste_ops.cpp``) with something the
  reference cannot express: the whole fake-quant chain as one kernel.
- :mod:`int_matmul`: int8 x int8 → int32 MXU matmul with the dequant epilogue
  (scale, bias, activation) fused in VMEM — the serving GEMM for the
  integer-domain inference path Brevitas delegates to ONNX backends.
"""

from brevitas_tpu.kernels.fake_quant import fake_quant, fake_quant_reference
from brevitas_tpu.kernels.int_matmul import int8_matmul, int8_matmul_reference

__all__ = ["fake_quant", "fake_quant_reference",
           "int8_matmul", "int8_matmul_reference"]
