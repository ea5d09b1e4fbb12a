"""Fused fake-quant Pallas kernel with custom VJP.

Forward (one VMEM pass over x):
    q  = round(x / scale + zp)
    qc = clamp(q, lo, hi)
    y  = (qc - zp) * scale

Backward (recompute, no residual tensor traffic beyond x):
    dx      = g                      (STE clamp)
    dx      = g * in_range(q)        (zeroing clamp)
    dscale  = sum(g * (y/scale - in_range * x/scale)) per scale group
              == sum over out-of-range of g * (qc - zp)  [standard LSQ-free
              scale grad of fake-quant with round-STE]
    dzp     = sum over out-of-range of -g * scale        (zp grad only where
              clamped; in-range contributions cancel)

The scale/zp gradients match jax.grad of the jnp reference implementation
(verified by tests/test_kernels.py against fake_quant_reference).

Reference for the op semantics: IntQuant (core/quant/int_base.py:64-97);
the reference computes this as ~7 separate torch ops + 2 autograd Functions.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brevitas_tpu.core import quant as Qf
from brevitas_tpu.ops import round_ste, tensor_clamp, tensor_clamp_ste

Array = jnp.ndarray

_LANES = 128
_SUBLANES = 8
_BLOCK_ROWS = 512  # rows of 128 lanes per grid step ≈ 256KB fp32 per buffer


def fake_quant_reference(x, scale, zero_point, *, lo: float, hi: float,
                         ste_clamp: bool = False):
    """Pure-jnp reference (also the CPU/interpret fallback)."""
    clamp = tensor_clamp_ste if ste_clamp else tensor_clamp
    q = round_ste(x / scale + zero_point)
    qc = clamp(q, jnp.asarray(lo, x.dtype), jnp.asarray(hi, x.dtype))
    return (qc - zero_point) * scale


# ---------------------------------------------------------------------------
# per-tensor scalar scale/zp kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, s_ref, z_ref, y_ref, *, lo, hi):
    scale = s_ref[0, 0]
    zp = z_ref[0, 0]
    inv = 1.0 / scale
    q = jnp.round(x_ref[:] * inv + zp)
    qc = jnp.clip(q, lo, hi)
    y_ref[:] = (qc - zp) * scale


def _bwd_kernel(x_ref, s_ref, z_ref, g_ref, dx_ref, ds_ref, dz_ref,
                *, lo, hi, ste_clamp):
    scale = s_ref[0, 0]
    zp = z_ref[0, 0]
    inv = 1.0 / scale
    q = jnp.round(x_ref[:] * inv + zp)
    in_range = (q >= lo) & (q <= hi)
    g = g_ref[:]
    qc = jnp.clip(q, lo, hi)
    if ste_clamp:
        # clamp passes gradients: dy/ds = (qc-zp) - x/s everywhere, dy/dzp = 0
        dx_ref[:] = g
        dscale_elem = g * ((qc - zp) - x_ref[:] * inv)
        dzp_elem = jnp.zeros_like(g)
    else:
        dx_ref[:] = jnp.where(in_range, g, 0.0)
        # d y / d scale = (qc - zp) - in_range * x / scale
        dscale_elem = g * ((qc - zp) - jnp.where(in_range, x_ref[:] * inv, 0.0))
        # d y / d zp = scale * (in_range * 1 - 1) = -scale where clamped
        dzp_elem = jnp.where(in_range, 0.0, -g * scale)
    # accumulate across grid steps
    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[0, 0] = 0.0
        dz_ref[0, 0] = 0.0

    ds_ref[0, 0] += jnp.sum(dscale_elem)
    dz_ref[0, 0] += jnp.sum(dzp_elem)


def _pad_2d(x: Array) -> Tuple[Array, Tuple[int, ...], int]:
    """Flatten to (rows, 128), zero-padded so every grid block is fully
    in-bounds (multi-step grids pad to a _BLOCK_ROWS multiple — reading a
    ragged tail block would fold undefined VMEM into the dscale/dzp sums)."""
    orig_shape = x.shape
    flat = x.reshape(-1)
    n = flat.shape[0]
    cols = _LANES
    rows = -(-n // cols)
    mult = _SUBLANES if rows <= _BLOCK_ROWS else _BLOCK_ROWS
    rows_pad = -(-rows // mult) * mult
    padded = jnp.zeros((rows_pad * cols,), x.dtype).at[:n].set(flat)
    return padded.reshape(rows_pad, cols), orig_shape, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fake_quant(x: Array, scale: Array, zero_point: Array,
               lo: float, hi: float, ste_clamp: bool = False) -> Array:
    """Fused per-tensor fake-quant. ``scale``/``zero_point`` are scalars;
    ``lo``/``hi`` are the static integer clamp bounds."""
    return _fake_quant_fwd_impl(x, scale, zero_point, lo, hi)


def _grid_rows(rows: int) -> Tuple[int, int]:
    block = min(_BLOCK_ROWS, rows)
    return -(-rows // block), block


def _fake_quant_fwd_impl(x, scale, zero_point, lo, hi):
    x2, orig_shape, n = _pad_2d(x)
    rows = x2.shape[0]
    steps, block = _grid_rows(rows)
    s = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    z = jnp.asarray(zero_point, jnp.float32).reshape(1, 1)
    y2 = pl.pallas_call(
        functools.partial(_fwd_kernel, lo=float(lo), hi=float(hi)),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((block, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    )(x2, s, z)
    return y2.reshape(-1)[:n].reshape(orig_shape)


def _fake_quant_fwd(x, scale, zero_point, lo, hi, ste_clamp):
    y = _fake_quant_fwd_impl(x, scale, zero_point, lo, hi)
    return y, (x, scale, zero_point)


def _fake_quant_bwd(lo, hi, ste_clamp, res, g):
    x, scale, zero_point = res
    x2, orig_shape, n = _pad_2d(x)
    g2, _, _ = _pad_2d(g)
    rows = x2.shape[0]
    steps, block = _grid_rows(rows)
    s = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    z = jnp.asarray(zero_point, jnp.float32).reshape(1, 1)
    dx2, ds, dz = pl.pallas_call(
        functools.partial(_bwd_kernel, lo=float(lo), hi=float(hi),
                          ste_clamp=ste_clamp),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((block, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )(x2, s, z, g2)
    dx = dx2.reshape(-1)[:n].reshape(orig_shape)
    dscale = ds.reshape(()).astype(jnp.result_type(scale))
    dzp = dz.reshape(()).astype(jnp.result_type(zero_point))
    dscale = jnp.broadcast_to(dscale, jnp.shape(scale))
    dzp = jnp.broadcast_to(dzp, jnp.shape(zero_point))
    return dx, dscale, dzp


fake_quant.defvjp(_fake_quant_fwd, _fake_quant_bwd)
