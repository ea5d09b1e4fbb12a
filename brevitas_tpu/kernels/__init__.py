"""Pallas TPU kernels — the hand-fused hot paths.

- :mod:`fake_quant`: fused quant-dequant (div/add-zp/round/clamp/sub-zp/mul)
  in one VMEM pass with a custom VJP, replacing the reference's C++ STE
  extension (``src/brevitas/csrc/autograd_ste_ops.cpp``) with something the
  reference cannot express: the whole fake-quant chain as one kernel.
- :mod:`int_matmul`: int8 x int8 → int32 MXU matmul with the dequant epilogue
  (scale, bias, activation) fused in VMEM — the serving GEMM for the
  integer-domain inference path Brevitas delegates to ONNX backends.
- :mod:`int8_attention`: fused quantized attention (int8 QK^T on the MXU,
  softmax + probs requantization in VMEM, PV matmul) — the serving core for
  QuantMultiheadAttention; the (T, T) probability matrix never reaches HBM.
"""

from brevitas_tpu.kernels.fake_quant import fake_quant, fake_quant_reference
from brevitas_tpu.kernels.int8_attention import (
    int4kv_decode_attention,
    int8_attention,
    int8_attention_dispatch,
    int8_attention_reference,
    int8_decode_attention,
    pack_kv_halves,
    quant_attention_serving,
    unpack_kv_halves,
    update_kv_packed,
)
from brevitas_tpu.kernels.int4 import (
    int4_matmul,
    int4_matmul_reference,
    pack_int4,
    pack_int4_rows,
    unpack_int4,
)
from brevitas_tpu.kernels.int_matmul import int8_matmul, int8_matmul_reference

__all__ = ["fake_quant", "fake_quant_reference",
           "int8_matmul", "int8_matmul_reference",
           "int8_attention", "int8_attention_dispatch", "int8_attention_reference",
           "int8_decode_attention",
           "int4kv_decode_attention", "pack_kv_halves", "unpack_kv_halves",
           "update_kv_packed",
           "quant_attention_serving",
           "int4_matmul", "int4_matmul_reference", "pack_int4",
           "pack_int4_rows", "unpack_int4"]
