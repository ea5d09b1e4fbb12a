"""Functional numeric + STE primitives (reference layer 0).

Mirrors the capability surface of reference ``src/brevitas/function/`` and
``src/brevitas/ops/autograd_ste_ops.py`` as pure JAX functions with
``jax.custom_vjp`` straight-through estimators.
"""

from brevitas_tpu.ops.numeric import (
    binary_sign,
    dpu_round,
    identity,
    max_int,
    min_int,
    round_to_zero,
    tensor_clamp,
)
from brevitas_tpu.ops.ste import (
    abs_binary_sign_grad,
    binary_sign_ste,
    ceil_ste,
    dpu_round_ste,
    floor_ste,
    round_ste,
    round_to_zero_ste,
    scalar_clamp_min_ste,
    scalar_clamp_ste,
    tensor_clamp_ste,
    ternary_sign_ste,
)

__all__ = [
    "binary_sign",
    "round_to_zero",
    "dpu_round",
    "tensor_clamp",
    "identity",
    "max_int",
    "min_int",
    "round_ste",
    "floor_ste",
    "ceil_ste",
    "round_to_zero_ste",
    "dpu_round_ste",
    "binary_sign_ste",
    "ternary_sign_ste",
    "tensor_clamp_ste",
    "scalar_clamp_ste",
    "scalar_clamp_min_ste",
    "abs_binary_sign_grad",
]
