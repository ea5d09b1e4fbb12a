"""Straight-through-estimator primitives as ``jax.custom_vjp`` functions.

Capability parity with the reference's dual Python/C++ STE backend
(``src/brevitas/ops/autograd_ste_ops.py``, ``src/brevitas/csrc/autograd_ste_ops.cpp``):
eleven ops whose forward is a rounding/clamping primitive and whose backward
passes gradients straight through (identity), plus ``abs_binary_sign_grad``
(abs with subgradient +-1, never 0).

Design note: the reference needs an entire C++ extension because
``torch.autograd.Function`` could not be TorchScript-compiled. In JAX a
``custom_vjp`` composes natively with jit/vmap/pjit/scan, so each op here is a
few lines, fuses into surrounding XLA computations, and shards transparently.
An optional native XLA custom-call backend lives in ``brevitas_tpu/csrc`` for
parity with the reference's native component.
"""

import jax
import jax.numpy as jnp

from brevitas_tpu.ops import numeric

Array = jnp.ndarray


def _unary_ste(fwd_fn, name: str, doc: str):
    """Build a unary op with identity (straight-through) gradient."""

    @jax.custom_vjp
    def op(x):
        return fwd_fn(x)

    def op_fwd(x):
        return fwd_fn(x), None

    def op_bwd(_, g):
        return (g,)

    op.defvjp(op_fwd, op_bwd)
    op.__name__ = name
    op.__qualname__ = name
    op.__doc__ = doc
    return op


round_ste = _unary_ste(
    jnp.round, "round_ste",
    "Round-half-to-even with straight-through gradient "
    "(reference RoundSteFn, ops/autograd_ste_ops.py:329).")

floor_ste = _unary_ste(
    jnp.floor, "floor_ste",
    "Floor with straight-through gradient (reference FloorSteFn).")

ceil_ste = _unary_ste(
    jnp.ceil, "ceil_ste",
    "Ceil with straight-through gradient (reference CeilSteFn).")

round_to_zero_ste = _unary_ste(
    numeric.round_to_zero, "round_to_zero_ste",
    "Truncation with straight-through gradient (reference RoundToZeroSteFn).")

dpu_round_ste = _unary_ste(
    numeric.dpu_round, "dpu_round_ste",
    "DPU rounding with straight-through gradient (reference DPURoundSteFn).")

binary_sign_ste = _unary_ste(
    numeric.binary_sign, "binary_sign_ste",
    "Two-valued sign with straight-through gradient (reference BinarySignSteFn).")

ternary_sign_ste = _unary_ste(
    jnp.sign, "ternary_sign_ste",
    "Three-valued sign with straight-through gradient (reference TernarySignSteFn).")


@jax.custom_vjp
def tensor_clamp_ste(x: Array, min_val: Array, max_val: Array) -> Array:
    """Clamp with tensor bounds; gradient passes straight through to ``x``
    (zero to the bounds). Reference TensorClampSteFn
    (ops/autograd_ste_ops.py / csrc/autograd_ste_ops.cpp:27)."""
    return numeric.tensor_clamp(x, min_val, max_val)


def _tensor_clamp_ste_fwd(x, min_val, max_val):
    zeros = (jnp.zeros_like(min_val), jnp.zeros_like(max_val))
    return numeric.tensor_clamp(x, min_val, max_val), zeros


def _tensor_clamp_ste_bwd(zeros, g):
    return (g,) + zeros


tensor_clamp_ste.defvjp(_tensor_clamp_ste_fwd, _tensor_clamp_ste_bwd)


def scalar_clamp_ste(x: Array, min_val: float, max_val: float) -> Array:
    """Clamp with static scalar bounds; straight-through gradient
    (reference ScalarClampSteFn)."""

    @jax.custom_vjp
    def _clamp(x):
        return jnp.clip(x, min_val, max_val)

    _clamp.defvjp(lambda x: (jnp.clip(x, min_val, max_val), None),
                  lambda _, g: (g,))
    return _clamp(x)


def scalar_clamp_min_ste(x: Array, min_val: float) -> Array:
    """Lower-bound clamp with static scalar bound; straight-through gradient
    (reference ScalarClampMinSteFn)."""

    @jax.custom_vjp
    def _clamp(x):
        return jnp.maximum(x, min_val)

    _clamp.defvjp(lambda x: (jnp.maximum(x, min_val), None),
                  lambda _, g: (g,))
    return _clamp(x)


@jax.custom_vjp
def _stochastic_round(x: Array, noise: Array) -> Array:
    # noise is an explicit primal (zero cotangent), NOT a closure capture: a
    # closed-over noise tracer inside a locally-defined custom_vjp leaks
    # across jax.checkpoint/transpose traces (UnexpectedTracerError when a
    # stochastic-round quantizer runs inside a rematted pipeline stage).
    return jnp.floor(x + noise)


def _stochastic_round_fwd(x, noise):
    # residual = a zero-size sentinel carrying the noise aval, so the bwd
    # rule emits a correctly shaped/dtyped zero cotangent even if the noise
    # dtype or broadcasting ever diverges from the output gradient's
    return jnp.floor(x + noise), jnp.zeros_like(noise)


def _stochastic_round_bwd(noise_zeros, g):
    return g, noise_zeros


_stochastic_round.defvjp(_stochastic_round_fwd, _stochastic_round_bwd)


def stochastic_round_ste(x: Array, key) -> Array:
    """Stochastic rounding with straight-through gradient: rounds up with
    probability equal to the fractional part (unbiased in expectation),
    backward identity. The key is consumed here — the custom_vjp sees only
    the drawn noise, so forward and any rematerialized recompute use the
    same bits."""
    noise = jax.random.uniform(key, jnp.shape(x), jnp.float32)
    return _stochastic_round(x, noise)


@jax.custom_vjp
def abs_binary_sign_grad(x: Array) -> Array:
    """``abs`` whose subgradient at 0 is 1 instead of 0: backward multiplies
    the cotangent by binary_sign(x). Used on learned scales/zero-points so
    they never get stuck at 0 (reference AbsBinarySignGradFn,
    ops/autograd_ste_ops.py:356)."""
    return jnp.abs(x)


def _absbsg_fwd(x):
    return jnp.abs(x), numeric.binary_sign(x)


def _absbsg_bwd(sign, g):
    return (g * sign,)


abs_binary_sign_grad.defvjp(_absbsg_fwd, _absbsg_bwd)
