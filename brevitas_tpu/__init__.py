"""brevitas_tpu — a TPU-native quantization-aware-training / PTQ framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Brevitas
(reference: /root/reference, a PyTorch QAT/PTQ library). The architecture is
deliberately NOT a port:

- STE rounding/clamping primitives are ``jax.custom_vjp`` functions
  (reference: ``src/brevitas/ops/autograd_ste_ops.py``,
  ``src/brevitas/csrc/autograd_ste_ops.cpp``) — see :mod:`brevitas_tpu.ops`.
- The injector/proxy dependency-injection DSL (reference:
  ``src/brevitas/inject``, ``src/brevitas/quant/solver``) is replaced by frozen
  dataclass quantizer *configs* resolved once into flax NNX quantizer modules —
  see :mod:`brevitas_tpu.quant`.
- Quantized tensors flow as a registered pytree :class:`QuantTensor`
  (reference: ``src/brevitas/quant_tensor/__init__.py``).
- Hot fake-quant paths compile to fused Pallas TPU kernels with custom VJPs —
  see :mod:`brevitas_tpu.kernels`.
- Integer-domain inference runs as true int8 ``dot_general`` on the MXU with
  the dequant folded into the epilogue — a capability Brevitas delegates to
  ONNX backends.
- Data/tensor parallel scaling is first-class via ``jax.sharding`` meshes —
  see :mod:`brevitas_tpu.parallel`.
"""

from brevitas_tpu import config
from brevitas_tpu.quant_tensor import QuantTensor

__version__ = "0.1.0"

__all__ = ["config", "QuantTensor", "__version__"]
