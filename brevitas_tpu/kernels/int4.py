"""Int4 pack/unpack utilities.

The v5e MXU computes int8; int4's win is storage and HBM bandwidth — weights
are stored two nibbles per byte and unpacked to int8 at the VMEM boundary.
Used by the native export artifact (halves int4 checkpoint size) and by
int4 serving GEMMs (unpack fuses into the matmul's weight load under XLA).
"""

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def pack_int4(values: Array) -> Array:
    """Pack int4 values (range [-8, 7], stored in an int8/int32 array whose
    LAST dim is even) into int8 bytes: low nibble = even index, high nibble =
    odd index. Output last dim is halved."""
    v = jnp.asarray(values, jnp.int8)
    assert v.shape[-1] % 2 == 0, "last dim must be even to pack"
    lo = v[..., 0::2] & 0x0F
    hi = (v[..., 1::2] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4(packed: Array, signed: bool = True) -> Array:
    """Inverse of pack_int4 — sign-extends nibbles when ``signed`` (int4 in
    [-8,7]); zero-extends for uint4 values in [0,15]."""
    p = jnp.asarray(packed, jnp.int8)
    if signed:
        lo = (p << 4) >> 4       # arithmetic shifts sign-extend the nibble
        hi = p >> 4
    else:
        lo = p & 0x0F
        hi = (p >> 4) & 0x0F
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*p.shape[:-1], p.shape[-1] * 2)


def pack_int4_np(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.int8)
    lo = v[..., 0::2] & 0x0F
    hi = (v[..., 1::2] & 0x0F) << 4
    return (lo | hi).astype(np.int8)


def unpack_int4_np(packed: np.ndarray, signed: bool = True) -> np.ndarray:
    p = packed.astype(np.int8)
    if signed:
        lo = ((p << 4).astype(np.int8) >> 4)
        hi = p >> 4
    else:
        lo = p & 0x0F
        hi = (p >> 4) & 0x0F
    out = np.stack([lo, hi], axis=-1)
    return out.reshape(*p.shape[:-1], p.shape[-1] * 2)


# ---------------------------------------------------------------------------
# int4 weight-only decode GEMM — fused in-VMEM unpack
# ---------------------------------------------------------------------------
#
# At decode/serving batch sizes the GEMM is weight-bandwidth-bound, and the
# XLA route (unpack to int8 in HBM, then dot) pays 2.5x the traffic of the
# packed weights (measured: 0.35x of the plain int8 dot, PERF.md). This
# kernel streams the PACKED bytes into VMEM and unpacks there, so HBM sees
# half the int8 traffic.
#
# Packing layout (split halves, not interleaved — a sublane interleave would
# force a Mosaic relayout inside the kernel): byte row j holds weight row j
# in its LOW nibble and weight row j + K/2 in its HIGH nibble, i.e.
#   packed = (w[K/2:] << 4) | (w[:K/2] & 0xF),  shape (K/2, N) int8.
# The kernel keeps the whole activation block (M, K) in VMEM (decode M is
# small) and accumulates x[:, j-block] @ lo + x[:, j-block + K/2] @ hi.

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN4 = 512
_BK4 = 1024  # packed rows per block (= 2*BK4 weight rows per step)


def pack_int4_rows(w: Array) -> Array:
    """Split-halves packing for int4_matmul: (K, N) int4-valued int8 →
    (K/2, N) packed bytes (row j = rows j | j + K/2)."""
    k = w.shape[0]
    assert k % 2 == 0
    lo = jnp.asarray(w[: k // 2], jnp.int8) & 0x0F
    hi = (jnp.asarray(w[k // 2:], jnp.int8) & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def _int4_kernel(x_ref, wp_ref, xs_ref, ws_ref, b_ref, o_ref, acc_ref, *,
                 n_k_blocks, act):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic cannot legalize int8 vector shifts ('arith.shli' on i8) — the
    # unpack runs in int32 VREGs, then narrows back for the int8 MXU dot
    p32 = wp_ref[...].astype(jnp.int32)   # (BK4, BN) packed bytes
    lo = (jnp.left_shift(p32, 28) >> 28).astype(jnp.int8)  # sign-extend low
    hi = (p32 >> 4).astype(jnp.int8)      # arithmetic shift: high nibble
    bk = p32.shape[0]
    x_lo = x_ref[:, pl.dslice(j * bk, bk)]
    x_hi = x_ref[:, pl.dslice((n_k_blocks + j) * bk, bk)]
    acc_ref[...] += jax.lax.dot_general(
        x_lo, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    acc_ref[...] += jax.lax.dot_general(
        x_hi, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @pl.when(j == n_k_blocks - 1)
    def _():
        y = acc_ref[...].astype(jnp.float32) * (xs_ref[0, 0] * ws_ref[...])
        y = y + b_ref[...]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        o_ref[...] = y


def int4_matmul(x_i8: Array, w_packed: Array, x_scale: Array, w_scale: Array,
                bias: Array = None, act: str = None) -> Array:
    """Weight-only int4 GEMM: x (M, K) int8 (int4-valued), w_packed (K/2, N)
    from :func:`pack_int4_rows`. Returns (M, N) f32 dequantized by
    x_scale * w_scale (+ bias, + act). Keeps x fully in VMEM — intended for
    decode/serving M (≤ ~1024)."""
    m, k = x_i8.shape
    kp2, n = w_packed.shape
    assert k == 2 * kp2, (k, kp2)
    mp = max(8, m)
    if mp % 8:
        mp += 8 - mp % 8
    xp = jnp.pad(x_i8, ((0, mp - m), (0, 0)))
    bk = min(_BK4, kp2)
    assert kp2 % bk == 0, "packed K/2 must divide the K block"
    bn = min(_BN4, n)
    assert n % bn == 0, "N must divide the N block"
    n_k_blocks = kp2 // bk
    ws = jnp.broadcast_to(jnp.asarray(w_scale, jnp.float32).reshape(-1), (n,))
    b = (jnp.zeros((n,), jnp.float32) if bias is None
         else jnp.asarray(bias, jnp.float32))
    y = pl.pallas_call(
        functools.partial(_int4_kernel, n_k_blocks=n_k_blocks, act=act),
        grid=(n // bn, n_k_blocks),
        in_specs=[
            pl.BlockSpec((mp, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k + kp2 * n + mp * n * 4,
            transcendentals=0),
    )(xp, w_packed, jnp.asarray(x_scale, jnp.float32).reshape(1, 1),
      ws.reshape(1, n), b.reshape(1, n))
    return y[:m]


def int4_matmul_reference(x_i8: Array, w_packed: Array, x_scale: Array,
                          w_scale: Array, bias: Array = None,
                          act: str = None) -> Array:
    """jnp reference for int4_matmul (unpacks in HBM — correctness only)."""
    kp2 = w_packed.shape[0]
    lo = (jnp.left_shift(w_packed, 4) >> 4).astype(jnp.int8)
    hi = (w_packed >> 4).astype(jnp.int8)
    w = jnp.concatenate([lo, hi], axis=0)
    acc = jax.lax.dot_general(x_i8, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (jnp.asarray(x_scale, jnp.float32)
                                   * jnp.asarray(w_scale, jnp.float32).reshape(1, -1))
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y


def _int4_w16_kernel(x_ref, wp_ref, ws_ref, b_ref, o_ref, acc_ref, *,
                     n_k_blocks, act):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # unpack in int32 VREGs (int8 vector shifts don't legalize in Mosaic),
    # then widen to bf16 for the bf16 MXU — the weight-only a16 path
    p32 = wp_ref[...].astype(jnp.int32)
    lo = (jnp.left_shift(p32, 28) >> 28).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    bk = p32.shape[0]
    x_lo = x_ref[:, pl.dslice(j * bk, bk)]
    x_hi = x_ref[:, pl.dslice((n_k_blocks + j) * bk, bk)]
    acc_ref[...] += jax.lax.dot_general(
        x_lo, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        x_hi, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_k_blocks - 1)
    def _():
        # per-out-column scale commutes with the K-accumulation: y = (x @
        # w_int) * s_col
        y = acc_ref[...] * ws_ref[...] + b_ref[...]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        o_ref[...] = y


def int4_weight_only_matmul(x: Array, w_packed: Array, w_scale: Array,
                            bias: Array = None, act: str = None) -> Array:
    """w4a16 GEMM: bf16 activations × packed-int4 weights, unpacked at the
    VMEM boundary (weights move through HBM at 4 bits). x (M, K) float,
    w_packed (K/2, N) from :func:`pack_int4_rows`; returns (M, N) f32."""
    m, k = x.shape
    kp2, n = w_packed.shape
    assert k == 2 * kp2, (k, kp2)
    mp = max(8, m)
    if mp % 8:
        mp += 8 - mp % 8
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, mp - m), (0, 0)))
    bk = min(_BK4, kp2)
    assert kp2 % bk == 0, "packed K/2 must divide the K block"
    bn = min(_BN4, n)
    assert n % bn == 0, "N must divide the N block"
    n_k_blocks = kp2 // bk
    ws = jnp.broadcast_to(jnp.asarray(w_scale, jnp.float32).reshape(-1), (n,))
    b = (jnp.zeros((n,), jnp.float32) if bias is None
         else jnp.asarray(bias, jnp.float32))
    y = pl.pallas_call(
        functools.partial(_int4_w16_kernel, n_k_blocks=n_k_blocks, act=act),
        grid=(n // bn, n_k_blocks),
        in_specs=[
            pl.BlockSpec((mp, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + kp2 * n + mp * n * 4,
            transcendentals=0),
    )(xp, w_packed, ws.reshape(1, n), b.reshape(1, n))
    return y[:m]


def int4_weight_only_matmul_reference(x: Array, w_packed: Array,
                                      w_scale: Array, bias: Array = None,
                                      act: str = None) -> Array:
    """jnp reference for int4_weight_only_matmul (unpacks in HBM)."""
    lo = (jnp.left_shift(w_packed, 4) >> 4).astype(jnp.int8)
    hi = (w_packed >> 4).astype(jnp.int8)
    w = jnp.concatenate([lo, hi], axis=0)
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = acc * jnp.asarray(w_scale, jnp.float32).reshape(1, -1)
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y


def int4_block_shapes_ok(k: int, n: int) -> bool:
    """Whether a (K, N) weight satisfies the packed-kernel grid constraints:
    512-aligned (measured dispatch boundary) AND the packed K/2 rows tile the
    K block exactly (kp2 <= _BK4 or a multiple — e.g. K=2560 gives kp2=1280,
    which is 512-aligned but does NOT tile the 1024-row block)."""
    kp2 = k // 2
    return (k % 512 == 0 and n % 512 == 0
            and (kp2 <= _BK4 or kp2 % _BK4 == 0))
