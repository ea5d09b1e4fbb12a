"""Fused quantized-LSTM cell elementwise kernel (Pallas, fwd + custom VJP).

The QAT LSTM hot loop (reference _QuantLSTMCell.forward_iter,
nn/quant_rnn.py:193-303) applies SIX fake-quant stages per timestep around
the gate nonlinearities. As XLA fusions inside ``lax.scan`` these cost
~4x the float cell's elementwise time (BENCH quantlstm ~0.6x FP); this
kernel runs the ENTIRE post-GEMM cell — gate-accumulator quant, sigmoid/tanh,
activation quants, cell/hidden state quants — in one VMEM pass (one more for
the backward), reading only ``gates`` (B, 4H) and ``c`` (B, H).

Semantics are IDENTICAL to the jnp fused path (nn/rnn.py _fused_scan):
symmetric INT fake-quant ``y = clip(round(x/s), lo, hi) * s`` with round-STE
and zeroing clamp, zero zero-points, static bounds. Scale gradients match
``jax.grad`` of the jnp composition (verified in tests/test_kernels.py):

    dy/dx = g * in_range
    dy/ds = g * (q_clipped - in_range * x/s)    summed per scale element

Supported (the caller falls back to the jnp path otherwise): non-CIFG,
all six stages quantized, f32, H a multiple of 128, B a multiple of 8.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_LANES = 128
_SUBLANES = 8


def _fq(x, inv_s, s, lo, hi):
    qc = jnp.clip(jnp.round(x * inv_s), lo, hi)
    return qc * s


def _fq_bwd(x, inv_s, s, lo, hi, g):
    """(dx, dscale_elem) of y = clip(round(x/s), lo, hi) * s, round-STE,
    zeroing clamp, matching jnp tensor_clamp (where-based: the bound wins
    ties, gradient passes at exact equality)."""
    q = jnp.round(x * inv_s)
    in_range = (q <= hi) & (q >= lo)
    qc = jnp.clip(q, lo, hi)
    dx = jnp.where(in_range, g, 0.0)
    dscale = g * (qc - jnp.where(in_range, x * inv_s, 0.0))
    return dx, dscale


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _cell_fwd_kernel(gates_ref, c_ref, sa_ref, ss_ref, st_ref, sc_ref,
                     sth_ref, sh_ref, h_ref, cn_ref, *, H, bounds):
    (alo, ahi), (slo, shi), (tlo, thi), (clo, chi), (thlo, thhi), \
        (hlo, hhi) = bounds
    sa = sa_ref[0, :]                      # (4H,)
    ss = ss_ref[0, :]                      # (3H,) order (i, f, o)
    st = st_ref[0, 0]
    sc = sc_ref[0, 0]
    sth = sth_ref[0, 0]
    sh = sh_ref[0, 0]

    ga = _fq(gates_ref[:], 1.0 / sa, sa, alo, ahi)
    i_a, f_a = ga[:, :H], ga[:, H:2 * H]
    g_a, o_a = ga[:, 2 * H:3 * H], ga[:, 3 * H:]
    i_t = _fq(_sigmoid(i_a), 1.0 / ss[:H], ss[:H], slo, shi)
    f_t = _fq(_sigmoid(f_a), 1.0 / ss[H:2 * H], ss[H:2 * H], slo, shi)
    o_t = _fq(_sigmoid(o_a), 1.0 / ss[2 * H:], ss[2 * H:], slo, shi)
    g_t = _fq(jnp.tanh(g_a), 1.0 / st, st, tlo, thi)
    c_new = _fq(f_t * c_ref[:] + i_t * g_t, 1.0 / sc, sc, clo, chi)
    th = _fq(jnp.tanh(c_new), 1.0 / sth, sth, thlo, thhi)
    h_ref[:] = _fq(o_t * th, 1.0 / sh, sh, hlo, hhi)
    cn_ref[:] = c_new


def _cell_bwd_kernel(gates_ref, c_ref, sa_ref, ss_ref, st_ref, sc_ref,
                     sth_ref, sh_ref, dh_ref, dcn_ref,
                     dgates_ref, dc_ref, dsa_ref, dss_ref, dst_ref, dsc_ref,
                     dsth_ref, dsh_ref, *, H, bounds):
    (alo, ahi), (slo, shi), (tlo, thi), (clo, chi), (thlo, thhi), \
        (hlo, hhi) = bounds
    sa = sa_ref[0, :]
    ss = ss_ref[0, :]
    st = st_ref[0, 0]
    sc = sc_ref[0, 0]
    sth = sth_ref[0, 0]
    sh = sh_ref[0, 0]

    # ---- recompute forward -------------------------------------------------
    ga = _fq(gates_ref[:], 1.0 / sa, sa, alo, ahi)
    i_a, f_a = ga[:, :H], ga[:, H:2 * H]
    g_a, o_a = ga[:, 2 * H:3 * H], ga[:, 3 * H:]
    i_s, f_s, o_s = _sigmoid(i_a), _sigmoid(f_a), _sigmoid(o_a)
    g_s = jnp.tanh(g_a)
    i_t = _fq(i_s, 1.0 / ss[:H], ss[:H], slo, shi)
    f_t = _fq(f_s, 1.0 / ss[H:2 * H], ss[H:2 * H], slo, shi)
    o_t = _fq(o_s, 1.0 / ss[2 * H:], ss[2 * H:], slo, shi)
    g_t = _fq(g_s, 1.0 / st, st, tlo, thi)
    cpre = f_t * c_ref[:] + i_t * g_t
    c_new = _fq(cpre, 1.0 / sc, sc, clo, chi)
    tc = jnp.tanh(c_new)
    th = _fq(tc, 1.0 / sth, sth, thlo, thhi)

    # ---- backward ----------------------------------------------------------
    dh = dh_ref[:]
    # h = Hq(o_t * th)
    dprod, dsh_e = _fq_bwd(o_t * th, 1.0 / sh, sh, hlo, hhi, dh)
    do_t = dprod * th
    dth = dprod * o_t
    # th = Th(tanh(c_new))
    dtc, dsth_e = _fq_bwd(tc, 1.0 / sth, sth, thlo, thhi, dth)
    dc_new = dcn_ref[:] + dtc * (1.0 - tc * tc)
    # c_new = C(cpre)
    dcpre, dsc_e = _fq_bwd(cpre, 1.0 / sc, sc, clo, chi, dc_new)
    df_t = dcpre * c_ref[:]
    dc_ref[:] = dcpre * f_t
    di_t = dcpre * g_t
    dg_t = dcpre * i_t
    # activation quants
    di_s, dss_i = _fq_bwd(i_s, 1.0 / ss[:H], ss[:H], slo, shi, di_t)
    df_s, dss_f = _fq_bwd(f_s, 1.0 / ss[H:2 * H], ss[H:2 * H], slo, shi,
                          df_t)
    do_s, dss_o = _fq_bwd(o_s, 1.0 / ss[2 * H:], ss[2 * H:], slo, shi, do_t)
    dg_s, dst_e = _fq_bwd(g_s, 1.0 / st, st, tlo, thi, dg_t)
    # nonlinearities
    di_a = di_s * i_s * (1.0 - i_s)
    df_a = df_s * f_s * (1.0 - f_s)
    do_a = do_s * o_s * (1.0 - o_s)
    dg_a = dg_s * (1.0 - g_s * g_s)
    dga = jnp.concatenate([di_a, df_a, dg_a, do_a], axis=1)
    # gate accumulator quant
    dgates, dsa_e = _fq_bwd(gates_ref[:], 1.0 / sa, sa, alo, ahi, dga)
    dgates_ref[:] = dgates

    @pl.when(pl.program_id(0) == 0)
    def _():
        dsa_ref[0, :] = jnp.zeros_like(dsa_ref[0, :])
        dss_ref[0, :] = jnp.zeros_like(dss_ref[0, :])
        dst_ref[0, 0] = 0.0
        dsc_ref[0, 0] = 0.0
        dsth_ref[0, 0] = 0.0
        dsh_ref[0, 0] = 0.0

    dsa_ref[0, :] += jnp.sum(dsa_e, axis=0)
    dss_ref[0, :] += jnp.sum(
        jnp.concatenate([dss_i, dss_f, dss_o], axis=1), axis=0)
    dst_ref[0, 0] += jnp.sum(dst_e)
    dsc_ref[0, 0] += jnp.sum(dsc_e)
    dsth_ref[0, 0] += jnp.sum(dsth_e)
    dsh_ref[0, 0] += jnp.sum(dsh_e)


def cell_shapes_ok(batch: int, hidden: int) -> bool:
    return hidden % _LANES == 0 and batch % _SUBLANES == 0


def _specs(B, H):
    vm = pltpu.VMEM
    return dict(
        gates=pl.BlockSpec((B, 4 * H), lambda i: (0, 0), memory_space=vm),
        c=pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=vm),
        sa=pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
        ss=pl.BlockSpec((1, 3 * H), lambda i: (0, 0), memory_space=vm),
        scalar=pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def quant_lstm_cell(gates: Array, c: Array, sa: Array, ss: Array, st: Array,
                    sc: Array, sth: Array, sh: Array,
                    hidden: int, bounds: Tuple, interpret: bool = False
                    ) -> Tuple[Array, Array]:
    """One fused quantized LSTM cell step (post-GEMM elementwise).

    ``gates``: (B, 4H) pre-activations packed (i, f, g, o); ``c``: (B, H).
    ``sa`` (4H,) / ``ss`` (3H, packed i,f,o) / scalars ``st, sc, sth, sh``
    are the static per-stage quant scales (gradients flow). ``bounds`` is a
    6-tuple of static (lo, hi) int clamp bounds per stage in order
    (acc, sigmoid, tanh_g, cell, tanh_h, hidden).
    """
    return _cell_fwd(gates, c, sa, ss, st, sc, sth, sh, hidden, bounds,
                     interpret)[0]


def _scalarize(v):
    return jnp.asarray(v, jnp.float32).reshape(1, 1)


def _cell_fwd(gates, c, sa, ss, st, sc, sth, sh, hidden, bounds, interpret):
    B, GH = gates.shape
    H = hidden
    assert GH == 4 * H
    sp = _specs(B, H)
    bounds_f = tuple((float(lo), float(hi)) for lo, hi in bounds)
    h_new, c_new = pl.pallas_call(
        functools.partial(_cell_fwd_kernel, H=H, bounds=bounds_f),
        grid=(1,),
        in_specs=[sp["gates"], sp["c"], sp["sa"], sp["ss"], sp["scalar"],
                  sp["scalar"], sp["scalar"], sp["scalar"]],
        out_specs=[sp["c"], sp["c"]],
        out_shape=[jax.ShapeDtypeStruct((B, H), gates.dtype),
                   jax.ShapeDtypeStruct((B, H), gates.dtype)],
        interpret=interpret,
    )(gates, c, sa.reshape(1, -1).astype(jnp.float32),
      ss.reshape(1, -1).astype(jnp.float32), _scalarize(st), _scalarize(sc),
      _scalarize(sth), _scalarize(sh))
    return (h_new, c_new), (gates, c, sa, ss, st, sc, sth, sh)


def _cell_fwd_rule(gates, c, sa, ss, st, sc, sth, sh, hidden, bounds,
                   interpret):
    out, res = _cell_fwd(gates, c, sa, ss, st, sc, sth, sh, hidden, bounds,
                         interpret)
    return out, res


def _cell_bwd_rule(hidden, bounds, interpret, res, grads):
    gates, c, sa, ss, st, sc, sth, sh = res
    dh, dcn = grads
    B, GH = gates.shape
    H = hidden
    sp = _specs(B, H)
    bounds_f = tuple((float(lo), float(hi)) for lo, hi in bounds)
    outs = pl.pallas_call(
        functools.partial(_cell_bwd_kernel, H=H, bounds=bounds_f),
        grid=(1,),
        in_specs=[sp["gates"], sp["c"], sp["sa"], sp["ss"], sp["scalar"],
                  sp["scalar"], sp["scalar"], sp["scalar"], sp["c"],
                  sp["c"]],
        out_specs=[sp["gates"], sp["c"], sp["sa"], sp["ss"], sp["scalar"],
                   sp["scalar"], sp["scalar"], sp["scalar"]],
        out_shape=[
            jax.ShapeDtypeStruct((B, 4 * H), gates.dtype),
            jax.ShapeDtypeStruct((B, H), gates.dtype),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(gates, c, sa.reshape(1, -1).astype(jnp.float32),
      ss.reshape(1, -1).astype(jnp.float32), _scalarize(st), _scalarize(sc),
      _scalarize(sth), _scalarize(sh), dh, dcn)
    dgates, dc, dsa, dss, dst, dsc, dsth, dsh = outs

    def like(g2, ref):
        g2 = g2.reshape(jnp.shape(ref)) if jnp.size(ref) == jnp.size(g2) \
            else jnp.broadcast_to(g2.reshape(()), jnp.shape(ref))
        return g2.astype(jnp.result_type(ref))

    return (dgates, dc, like(dsa, sa), like(dss, ss),
            like(dst.reshape(()), st), like(dsc.reshape(()), sc),
            like(dsth.reshape(()), sth), like(dsh.reshape(()), sh))


quant_lstm_cell.defvjp(_cell_fwd_rule, _cell_bwd_rule)
