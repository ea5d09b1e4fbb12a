"""Int8 MXU matmul with fused dequant epilogue — the serving GEMM.

y = act( (x_i8 @ w_i8)_i32 * (x_scale * w_scale[col]) + bias )

The int32 accumulation runs on the MXU; the dequant multiply, bias add and
activation run in VMEM on the accumulator block before it ever reaches HBM —
one kernel, no intermediate tensors. Asymmetric activations are handled by
the zero-point correction term zp_x * colsum(w) folded into the bias by the
caller (standard QGEMM identity), so the kernel itself stays symmetric.

This is the piece the reference cannot do in-framework: Brevitas exports to
ONNX runtimes for integer execution (SURVEY §1 layer 6); here it is a Pallas
kernel on the same chip that trained the model.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_BM = 256
_BN = 256
_BK = 1024         # K-slab for blocked accumulation
_BK_SINGLE = 4096  # below this, one K pass fits VMEM comfortably


def int8_matmul_reference(x_i8: Array, w_i8: Array, x_scale: Array,
                          w_scale: Array, bias: Optional[Array] = None,
                          act: Optional[str] = None,
                          out_dtype=jnp.float32) -> Array:
    acc = jax.lax.dot_general(
        x_i8, w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (jnp.asarray(x_scale, jnp.float32)
                                   * jnp.asarray(w_scale, jnp.float32))
    if bias is not None:
        y = y + bias
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


def _kernel(x_ref, w_ref, xs_ref, ws_ref, b_ref, y_ref, *, act, out_dtype):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    scale = xs_ref[0, 0] * ws_ref[0, :]
    y = acc.astype(jnp.float32) * scale[None, :]
    y = y + b_ref[0, :][None, :]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    y_ref[:] = y.astype(out_dtype)


def _kernel_kblocked(x_ref, w_ref, xs_ref, ws_ref, b_ref, y_ref, acc_ref,
                     *, act, out_dtype):
    """Grid (M, N, K): int32 accumulation in VMEM scratch across K steps,
    dequant epilogue on the last step (double-buffered K slabs stream from
    HBM while the MXU works — the standard blocked-GEMM pattern)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        scale = xs_ref[0, 0] * ws_ref[0, :]
        y = acc_ref[:].astype(jnp.float32) * scale[None, :]
        y = y + b_ref[0, :][None, :]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        y_ref[:] = y.astype(out_dtype)


def _pad_to(x: Array, axis: int, mult: int) -> Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def int8_matmul(x_i8: Array, w_i8: Array, x_scale: Array, w_scale: Array,
                bias: Optional[Array] = None, act: Optional[str] = None,
                out_dtype=jnp.float32) -> Array:
    """Fused quantized GEMM. x_i8 (M, K) int8; w_i8 (K, N) int8;
    x_scale scalar; w_scale scalar or (N,); bias None or (N,)."""
    assert x_i8.dtype == jnp.int8 and w_i8.dtype == jnp.int8
    m, k = x_i8.shape
    k2, n = w_i8.shape
    assert k == k2
    # int8 MXU tiling: last dim 128, second-to-last 32
    xp = _pad_to(_pad_to(x_i8, 0, _BM), 1, 128)
    wp = _pad_to(_pad_to(w_i8, 0, 128), 1, _BN)
    mp, kp = xp.shape
    _, np_ = wp.shape
    ws = jnp.broadcast_to(jnp.asarray(w_scale, jnp.float32).reshape(-1),
                          (n,))
    wsp = _pad_to(ws, 0, _BN).reshape(1, np_)
    b = jnp.zeros((n,), jnp.float32) if bias is None else jnp.asarray(
        bias, jnp.float32)
    bp = _pad_to(b, 0, _BN).reshape(1, np_)
    xs = jnp.asarray(x_scale, jnp.float32).reshape(1, 1)

    if kp <= _BK_SINGLE:
        grid = (mp // _BM, np_ // _BN)
        y = pl.pallas_call(
            functools.partial(_kernel, act=act, out_dtype=out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((_BM, kp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kp, _BN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BM, _BN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * np_ * kp,
                bytes_accessed=mp * kp + kp * np_ + mp * np_ * 4,
                transcendentals=0),
        )(xp, wp, xs, wsp, bp)
        return y[:m, :n]

    # large K: blocked accumulation so VMEM holds only (BM,BK)+(BK,BN) slabs
    xp = _pad_to(xp, 1, _BK)
    wp = _pad_to(wp, 0, _BK)
    kp = xp.shape[1]
    grid = (mp // _BM, np_ // _BN, kp // _BK)
    y = pl.pallas_call(
        functools.partial(_kernel_kblocked, act=act, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, _BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BK, _BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, _BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((_BM, _BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 4,
            transcendentals=0),
    )(xp, wp, xs, wsp, bp)
    return y[:m, :n]
