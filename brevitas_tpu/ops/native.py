"""Native (C++ XLA custom-call) STE backend.

Parity with the reference's dual-backend dispatch
(``src/brevitas/function/ops_ste.py:38-44``: Python autograd vs C++ extension
selected by BREVITAS_NATIVE_STE_BACKEND). Here the native library registers
XLA FFI handlers on the CPU platform; `native_ste_available()` gates usage and
every op keeps the same ``jax.custom_vjp`` STE backward as the pure-jnp path.
On TPU the Pallas/XLA-fused implementations remain the production path —
host C++ cannot execute on the TPU itself.
"""

import ctypes
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_LIB = None
_REGISTERED = False

_OPS = [
    "round_ste", "floor_ste", "ceil_ste", "round_to_zero_ste",
    "dpu_round_ste", "binary_sign_ste", "ternary_sign_ste",
    "abs_binary_sign_grad", "tensor_clamp_ste", "scalar_clamp_min_ste",
    "fake_quant",
]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _REGISTERED
    if _REGISTERED:
        return _LIB
    try:
        from brevitas_tpu.csrc.build import build

        path = build()
        lib = ctypes.CDLL(path)
        for op in _OPS:
            fn = getattr(lib, f"brevitas_tpu_{op}")
            fn.restype = ctypes.c_void_p
            capsule = jax.ffi.pycapsule(fn())
            jax.ffi.register_ffi_target(f"brevitas_tpu_{op}", capsule,
                                        platform="cpu")
        _LIB = lib
    except Exception:  # toolchain or platform unavailable → jnp fallback
        _LIB = None
    _REGISTERED = True
    return _LIB


def native_ste_available() -> bool:
    return _load() is not None


def _unary_native(op_name: str):
    def call(x):
        x = jnp.asarray(x, jnp.float32)
        return jax.ffi.ffi_call(
            f"brevitas_tpu_{op_name}",
            jax.ShapeDtypeStruct(x.shape, x.dtype))(x)

    return call


def make_native_ste(op_name: str, jnp_fwd):
    """Build a custom_vjp STE op whose forward runs the native kernel."""
    native_fwd = _unary_native(op_name)

    @jax.custom_vjp
    def op(x):
        return native_fwd(x)

    op.defvjp(lambda x: (native_fwd(x), None), lambda _, g: (g,))
    op.__name__ = f"native_{op_name}"
    return op


def native_fake_quant(x, scale, zero_point, lo: float, hi: float):
    """Fused native fake-quant forward (per-tensor)."""
    x = jnp.asarray(x, jnp.float32)
    return jax.ffi.ffi_call(
        "brevitas_tpu_fake_quant",
        jax.ShapeDtypeStruct(x.shape, x.dtype))(
            x, jnp.asarray(scale, jnp.float32).reshape(1),
            jnp.asarray(zero_point, jnp.float32).reshape(1),
            lo=np.float32(lo), hi=np.float32(hi))


def native_tensor_clamp_ste(x, lo, hi):
    x = jnp.asarray(x, jnp.float32)
    return jax.ffi.ffi_call(
        "brevitas_tpu_tensor_clamp_ste",
        jax.ShapeDtypeStruct(x.shape, x.dtype))(
            x, jnp.asarray(lo, jnp.float32).reshape(-1),
            jnp.asarray(hi, jnp.float32).reshape(-1))
