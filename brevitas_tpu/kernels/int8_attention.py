"""Fused int8 attention — the serving path for QuantMultiheadAttention.

Semantics match the fake-quant model's eval forward exactly
(``nn/attention.py``): with symmetric int8 Q/K/V (zero zero-point) and a
fixed probs quantizer (scale ``p_scale``, ``p_levels`` levels),

    scores = (q_i8 @ k_i8^T)_i32 * (q_s * k_s / sqrt(d))
    p      = softmax(mask(scores))
    p_q    = clip(round(p / p_scale), 0, p_levels)        # exact integers
    out    = (p_q @ v_i8) * (p_scale * v_s)

One Pallas kernel does all of it per (batch*head, q-block): the QK^T matmul
runs int8 on the MXU, softmax + requantize run in VMEM on the score block,
and the PV matmul feeds the MXU again — the (T, T) probability matrix never
touches HBM. The PV product runs in f32 (its operands are exact small
integers, ≤ p_levels and ≤ 127, so f32 products are exact; int8×uint8 MXU
pairing is not expressible in Mosaic today).

This capability has no reference analogue: Brevitas has no attention layer
at all (SURVEY §2.4) and delegates integer execution to ONNX backends.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_BQ = 256  # q rows per block


def int8_attention_reference(q_i8: Array, k_i8: Array, v_i8: Array,
                             qk_scale: float, p_scale: float, v_scale: float,
                             p_levels: int = 255,
                             causal: bool = False) -> Array:
    """Pure-jnp reference. q: (BH, Tq, D), k/v: (BH, Tk, D) int8.
    Returns (BH, Tq, D) f32."""
    s = jax.lax.dot_general(
        q_i8, k_i8, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).astype(jnp.float32) * qk_scale
    if causal:
        tq, tk = s.shape[-2], s.shape[-1]
        neg = jnp.finfo(jnp.float32).min / 2
        # rectangular causal: query row i sees keys up to i + (Tk - Tq),
        # matching the model's tril offset (nn/attention.py)
        s = jnp.where(jnp.tril(jnp.ones((tq, tk), bool), tk - tq), s, neg)
    p = jax.nn.softmax(s, axis=-1)
    p_q = jnp.clip(jnp.round(p / p_scale), 0, p_levels)
    out = jax.lax.dot_general(
        p_q, v_i8.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return out * (p_scale * v_scale)


def _attn_kernel(scales_ref, q_ref, k_ref, v_ref, o_ref, *,
                 p_levels, tq_real, tk_real, causal):
    qk_scale, p_scale, v_scale = (scales_ref[0], scales_ref[1], scales_ref[2])
    q = q_ref[0]                                   # (BQ, Dp) int8
    k = k_ref[0]                                   # (Tkp, Dp) int8
    v = v_ref[0]                                   # (Tkp, Dp) int8
    s = jax.lax.dot_general(                       # (BQ, Tkp) int32 on MXU
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * qk_scale
    bq, tp = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, tp), 1)
    valid = col < tk_real
    if causal:
        # rectangular causal: row i sees cols ≤ i + (Tk - Tq) (model tril)
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, tp), 0) \
            + pl.program_id(1) * bq
        valid = jnp.logical_and(valid, col <= row + (tk_real - tq_real))
    neg = jnp.finfo(jnp.float32).min / 2
    s = jnp.where(valid, s, neg)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p_q = jnp.clip(jnp.round(p / p_scale), 0.0, float(p_levels))
    out = jax.lax.dot_general(                     # exact f32 integer matmul
        p_q, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out * (p_scale * v_scale)


def _pad_axis(x: Array, axis: int, mult: int) -> Array:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def int8_attention(q_i8: Array, k_i8: Array, v_i8: Array,
                   qk_scale: float, p_scale: float, v_scale: float,
                   p_levels: int = 255, causal: bool = False,
                   block_q: int = _BQ) -> Array:
    """Fused attention. q: (BH, Tq, D), k/v: (BH, Tk, D) int8; returns
    (BH, Tq, D) f32.

    Holds the full K/V for one (batch, head) in VMEM — fine for serving
    lengths (T·D int8 ≤ ~2 MB at T=16k, D=128); longer sequences should use
    the reference path (XLA still fuses well there).
    """
    assert q_i8.dtype == jnp.int8 and k_i8.dtype == jnp.int8
    bh, t, d = q_i8.shape
    t_k = k_i8.shape[1]
    qp = _pad_axis(_pad_axis(q_i8, 1, block_q), 2, 128)
    kp = _pad_axis(_pad_axis(k_i8, 1, 128), 2, 128)
    vp = _pad_axis(_pad_axis(v_i8, 1, 128), 2, 128)
    tq = qp.shape[1]
    tk = kp.shape[1]
    dp = qp.shape[2]
    grid = (bh, tq // block_q)
    scales = jnp.stack([jnp.asarray(qk_scale, jnp.float32).reshape(()),
                        jnp.asarray(p_scale, jnp.float32).reshape(()),
                        jnp.asarray(v_scale, jnp.float32).reshape(())])
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, p_levels=int(p_levels), tq_real=t, tk_real=t_k,
            causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3,), lambda b, i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq, dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq * tk * dp,
            bytes_accessed=bh * (tq * dp * 2 + 2 * tk * dp) * 1
            + bh * tq * dp * 4,
            transcendentals=bh * tq * tk),
    )(scales, qp, kp, vp)
    return out[:, :t, :d]


def int8_attention_dispatch(q_i8: Array, k_i8: Array, v_i8: Array,
                            q_scale, k_scale, v_scale, p_scale,
                            head_dim: int, p_levels: int = 255,
                            causal: bool = False,
                            use_pallas: Optional[bool] = None) -> Array:
    """Integer-domain entry point: q (BH, Tq, D), k/v (BH, Tk, D) int8.
    Picks the Pallas kernel on its measured winning region, XLA otherwise."""
    bh, t, d = q_i8.shape
    # scales stay jnp scalars: they are traced module state under jit
    qk_scale = (jnp.asarray(q_scale, jnp.float32)
                * jnp.asarray(k_scale, jnp.float32)) / math.sqrt(head_dim)
    if use_pallas is None:
        # measured on v5e (PERF.md round-5 sweep): the fused kernel wins at
        # head_dim ≤ 64 in two regions — few batch*head rows (bh ≤ 16,
        # 1.4x; XLA underutilizes) and FULL row-tile grids at short
        # sequence (bh % 128 == 0 with T ≤ 512: 1.07-1.18x, maxdiff 0.0 —
        # the llama prefill shape). Partial tiles (bh=96/112: 0.96) and
        # longer T (1024: 0.94, 2048: 0.89) lose to XLA — stay there.
        use_pallas = (jax.default_backend() == "tpu" and d <= 64
                      and ((bh <= 16 and k_i8.shape[1] <= 16384)
                           or (bh % 128 == 0 and k_i8.shape[1] <= 512)))
    fn = int8_attention if use_pallas else int8_attention_reference
    return fn(q_i8, k_i8, v_i8, qk_scale, jnp.asarray(p_scale, jnp.float32),
              jnp.asarray(v_scale, jnp.float32),
              p_levels=p_levels, causal=causal)


def quant_attention_serving(q: Array, k: Array, v: Array,
                            q_scale, k_scale, v_scale, p_scale,
                            head_dim: int, p_levels: int = 255,
                            causal: bool = False,
                            use_pallas: Optional[bool] = None) -> Array:
    """Int8 attention over fake-quant Q/K/V activations.

    q: (B, H, Tq, D), k/v: (B, H, Tk, D) FLOAT fake-quantized values (exact
    multiples of their scales, as produced by the model's act quantizers);
    returns the float attention output before the out-projection, matching
    the model's eval numerics. Cross-attention (Tk != Tq) is supported.
    """
    b, h, t, d = q.shape
    tk = k.shape[2]
    q_i8 = jnp.round(q / q_scale).astype(jnp.int8).reshape(b * h, t, d)
    k_i8 = jnp.round(k / k_scale).astype(jnp.int8).reshape(b * h, tk, d)
    v_i8 = jnp.round(v / v_scale).astype(jnp.int8).reshape(b * h, tk, d)
    out = int8_attention_dispatch(
        q_i8, k_i8, v_i8, q_scale, k_scale, v_scale, p_scale,
        head_dim=head_dim, p_levels=p_levels, causal=causal,
        use_pallas=use_pallas)
    return out.reshape(b, h, t, d)


def int8_decode_attention(q_i8: Array, k_cache: Array, v_cache: Array,
                          pos: Array, q_scale, k_scale, v_scale, p_scale,
                          head_dim: int, p_levels: int = 255) -> Array:
    """One decode step against an int8 KV cache.

    q_i8: (BH, 1, D) int8 — the new token's query.
    k_cache/v_cache: (BH, L, D) int8, valid through index ``pos`` inclusive.
    ``pos`` may be traced (jit-compatible). Returns (BH, 1, D) f32 in the
    same requantized-probs numerics as the full-sequence paths.

    Decode is one row of scores per head — XLA fuses this fine; no Pallas
    kernel needed (the win of the int8 cache is memory: 2x vs bf16, 4x vs
    f32, exact because K/V quantizers are frozen per-tensor grids).
    """
    qk_scale = (jnp.asarray(q_scale, jnp.float32)
                * jnp.asarray(k_scale, jnp.float32)) / math.sqrt(head_dim)
    s = jax.lax.dot_general(
        q_i8, k_cache, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).astype(jnp.float32) * qk_scale
    length = k_cache.shape[1]
    valid = jnp.arange(length)[None, None, :] <= pos
    s = jnp.where(valid, s, jnp.finfo(jnp.float32).min / 2)
    p = jax.nn.softmax(s, axis=-1)
    p_q = jnp.clip(jnp.round(p / jnp.asarray(p_scale, jnp.float32)),
                   0, p_levels)
    out = jax.lax.dot_general(
        p_q, v_cache.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return out * (jnp.asarray(p_scale, jnp.float32)
                  * jnp.asarray(v_scale, jnp.float32))


# ---------------------------------------------------------------------------
# int4 KV-cache decode — packed nibbles unpacked at the VMEM boundary
# ---------------------------------------------------------------------------
#
# Decode attention is KV-cache-bandwidth-bound: per step the whole (L, D)
# cache crosses HBM while the compute is one score row per head. With 4-bit
# K/V quantizers the cache stores two positions per byte (split halves over
# POSITIONS, like the int4 GEMM's split-halves over rows, kernels/int4.py:
# byte row r holds position r in its low nibble and position r + Lh in its
# high nibble — an interleave would force a Mosaic relayout), so HBM sees
# half the int8 traffic and a quarter of bf16, and the cache itself is 2x
# (4x) smaller. The nibbles unpack in int32 VREGs inside the kernel; an
# XLA-level unpack would round-trip the unpacked cache through HBM and lose
# the bandwidth win (PERF.md, int4 GEMM section).
#
# Numerics are EXACT vs the 4-bit fake-quant model: the codes are the
# quantizer's own integers, packing is lossless, and the score/probs/PV
# pipeline is the same requantized grid as int8_decode_attention.

_NEG_HALF = float(jnp.finfo(jnp.float32).min) / 2


def pack_kv_halves(codes: Array, l_half: int) -> Array:
    """Pack int4 codes (BH, L, D), L <= 2*l_half, into (BH, l_half, D) bytes
    (position r low nibble, position r + l_half high nibble)."""
    bh, l, d = codes.shape
    pad = 2 * l_half - l
    c = jnp.pad(jnp.asarray(codes, jnp.int8), ((0, 0), (0, pad), (0, 0)))
    lo = c[:, :l_half] & 0x0F
    hi = (c[:, l_half:] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_kv_halves(packed: Array) -> Array:
    """Inverse of :func:`pack_kv_halves` → (BH, 2*l_half, D) int8 codes."""
    p = jnp.asarray(packed, jnp.int8)
    lo = (p << 4) >> 4
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=1)


def update_kv_packed(packed: Array, codes_t: Array, pos) -> Array:
    """Write one token's codes (BH, 1, D) at position ``pos`` (traced OK)
    into a packed cache (BH, l_half, D): read-modify-write of one byte row,
    touching only the nibble that owns the position."""
    l_half = packed.shape[1]
    r = jnp.mod(pos, l_half)
    is_lo = pos < l_half
    row = jax.lax.dynamic_slice(packed, (0, r, 0),
                                (packed.shape[0], 1, packed.shape[2]))
    c = jnp.asarray(codes_t, jnp.int8) & 0x0F
    new = jnp.where(is_lo,
                    (row & ~jnp.int8(0x0F)) | c,
                    (row & jnp.int8(0x0F)) | (c << 4)).astype(jnp.int8)
    return jax.lax.dynamic_update_slice(packed, new, (0, r, 0))


def _int4kv_decode_kernel(scales_ref, pos_ref, q_ref, kp_ref, vp_ref, o_ref,
                          *, l_half, p_levels):
    qk_scale, p_scale, v_scale = (scales_ref[0], scales_ref[1], scales_ref[2])
    pos = pos_ref[0]
    q = q_ref[0]                              # (8, Dp) int8 (row 0 is real)
    kp32 = kp_ref[0].astype(jnp.int32)        # (Lh, Dp) packed bytes
    # int8 vector shifts don't legalize in Mosaic — unpack in int32 VREGs
    k_lo = (jnp.left_shift(kp32, 28) >> 28).astype(jnp.int8)
    k_hi = (kp32 >> 4).astype(jnp.int8)
    s_lo = jax.lax.dot_general(               # (8, Lh) int32 on the MXU
        q, k_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * qk_scale
    s_hi = jax.lax.dot_general(
        q, k_hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * qk_scale
    col = jax.lax.broadcasted_iota(jnp.int32, s_lo.shape, 1)
    s_lo = jnp.where(col <= pos, s_lo, _NEG_HALF)
    s_hi = jnp.where(col + l_half <= pos, s_hi, _NEG_HALF)
    s = jnp.concatenate([s_lo, s_hi], axis=1)  # (8, 2*Lh)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p_q = jnp.clip(jnp.round(p / p_scale), 0.0, float(p_levels))
    vp32 = vp_ref[0].astype(jnp.int32)
    v_lo = (jnp.left_shift(vp32, 28) >> 28).astype(jnp.float32)
    v_hi = (vp32 >> 4).astype(jnp.float32)
    out = jax.lax.dot_general(                # exact f32 integer matmul
        p_q[:, :l_half], v_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(
        p_q[:, l_half:], v_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out * (p_scale * v_scale)


def int4kv_decode_attention(q_i8: Array, k_packed: Array, v_packed: Array,
                            pos, q_scale, k_scale, v_scale, p_scale,
                            head_dim: int, p_levels: int = 255,
                            use_pallas: Optional[bool] = None) -> Array:
    """One decode step against an int4-packed KV cache.

    q_i8: (BH, 1, D) int8; k_packed/v_packed: (BH, Lh, D) packed bytes from
    :func:`pack_kv_halves`/:func:`update_kv_packed` (valid through position
    ``pos`` inclusive, positions split low/high nibble at Lh). Returns
    (BH, 1, D) f32 on the same requantized grid as the int8 paths.
    """
    bh, _, d = q_i8.shape
    l_half = k_packed.shape[1]
    qk_scale = (jnp.asarray(q_scale, jnp.float32)
                * jnp.asarray(k_scale, jnp.float32)) / math.sqrt(head_dim)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and l_half % 128 == 0
    if not use_pallas:
        k_cache = unpack_kv_halves(k_packed)
        v_cache = unpack_kv_halves(v_packed)
        s = jax.lax.dot_general(
            q_i8, k_cache, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.float32) * qk_scale
        valid = jnp.arange(k_cache.shape[1])[None, None, :] <= pos
        s = jnp.where(valid, s, _NEG_HALF)
        p = jax.nn.softmax(s, axis=-1)
        p_q = jnp.clip(jnp.round(p / jnp.asarray(p_scale, jnp.float32)),
                       0, p_levels)
        out = jax.lax.dot_general(
            p_q, v_cache.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out * (jnp.asarray(p_scale, jnp.float32)
                      * jnp.asarray(v_scale, jnp.float32))

    dp = (-d) % 128
    qp = jnp.pad(q_i8[:, 0, :], ((0, 0), (0, dp)))          # (BH, Dp)
    qp = jnp.pad(qp[:, None, :], ((0, 0), (0, 7), (0, 0)))  # (BH, 8, Dp)
    kp = jnp.pad(k_packed, ((0, 0), (0, 0), (0, dp)))
    vp = jnp.pad(v_packed, ((0, 0), (0, 0), (0, dp)))
    scales = jnp.stack([qk_scale.reshape(()),
                        jnp.asarray(p_scale, jnp.float32).reshape(()),
                        jnp.asarray(v_scale, jnp.float32).reshape(())])
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    dpad = d + dp
    out = pl.pallas_call(
        functools.partial(_int4kv_decode_kernel, l_half=l_half,
                          p_levels=int(p_levels)),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((3,), lambda b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, dpad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_half, dpad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_half, dpad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, dpad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, 8, dpad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * 8 * 2 * l_half * dpad,
            bytes_accessed=bh * (8 * dpad + 2 * l_half * dpad + 8 * dpad * 4),
            transcendentals=bh * 8 * 2 * l_half),
    )(scales, pos_arr, qp, kp, vp)
    return out[:, :1, :d]
