"""GPTQ — Hessian-based post-training weight quantization (arXiv:2210.17323).

Beyond the reference snapshot's parity surface (later Brevitas ships a GPxQ
family); TPU-native formulation. Per layer, the calibration inputs define a
proxy Hessian H = XᵀX over the layer's reduction dimension; weights are
quantized one input-row at a time and the remaining rows absorb the induced
error through the upper Cholesky factor of H⁻¹ (the GPTQ recursion). The
whole per-layer solve is dense linear algebra (Cholesky + a `fori_loop` of
rank-1 updates) — MXU-friendly, no Python in the loop.

Convolutions are lowered to matmul form with
`lax.conv_general_dilated_patches` (channel-major feature order), grouped
convs solve per group.

Usage (after calibration, instead of — or before — bias correction)::

    with calibration_mode(model):
        for b in batches: model(b)
    apply_gptq(model, batches)
"""

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.graph.base import find_modules
from brevitas_tpu.graph.learned_round import (
    _capture_inputs,
    eligible_for_learned_round,
    freeze_weight_scale,
)
from brevitas_tpu.nn.conv import _QuantConvNd
from brevitas_tpu.nn.linear import QuantLinear
from brevitas_tpu.nn.quant_layer import QuantWBIOL
from brevitas_tpu.ops import max_int, min_int

Array = jnp.ndarray

# GPTQ layers can be eligible under exactly the learned-round conditions
eligible_for_gptq = eligible_for_learned_round


def _gptq_solve(W: Array, H: Array, scale: Array, nmin: Array, nmax: Array,
                damp: float) -> Array:
    """The GPTQ recursion on a (K, O) weight with (K, K) Hessian.

    Row i is fake-quantized against per-output-channel ``scale`` (shape
    broadcastable to (O,)); rows j > i absorb the quantization error scaled
    by row i of the upper Cholesky factor U of H⁻¹ (H⁻¹ = UᵀU).
    """
    K = W.shape[0]
    diag = jnp.diagonal(H)
    dead = diag == 0.0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    H = H + damp * (jnp.sum(diag) / K) * jnp.eye(K, dtype=H.dtype)
    W = jnp.where(dead[:, None], 0.0, W)

    L = jnp.linalg.cholesky(H)
    eye = jnp.eye(K, dtype=H.dtype)
    Hinv = jax.scipy.linalg.cho_solve((L, True), eye)
    U = jnp.linalg.cholesky(Hinv).T  # upper, H⁻¹ = UᵀU

    idx = jnp.arange(K)

    def quant_row(w):
        return jnp.clip(jnp.round(w / scale), nmin, nmax) * scale

    def body(i, W):
        w_i = W[i]
        q = quant_row(w_i)
        err = (w_i - q) / U[i, i]
        # j == i lands exactly on q (U[i,i]·err == w_i − q); j > i absorbs
        upd = jnp.where((idx >= i)[:, None], jnp.outer(U[i], err), 0.0)
        return W - upd

    return jax.lax.fori_loop(0, K, body, W)


def _layer_matrix_problems(layer: QuantWBIOL, x: Array):
    """Lower the layer to one or more (W(K,O), X(M,K), writeback) problems."""
    if isinstance(layer, QuantLinear):
        W = layer.weight[...]
        X = x.reshape(-1, W.shape[0])

        def write(Wn, _W=W):
            layer.weight[...] = Wn

        return [(W, X, write)]

    # conv: im2col with the layer's own geometry; patches are channel-major
    # (feature order C × prod(kernel)) so the kernel flattens via a
    # (spatial..., Cg, O) → (Cg, spatial..., O) transpose
    assert isinstance(layer, _QuantConvNd) and not layer.transposed
    w = layer.weight[...]
    sp = layer.spatial_dims
    kshape = w.shape[:sp]
    cg, out = w.shape[sp], w.shape[sp + 1]
    dn = layer._dn()
    patches = jax.lax.conv_general_dilated_patches(
        x, kshape, layer.stride, layer.padding,
        rhs_dilation=layer.dilation, dimension_numbers=dn)
    P = patches.reshape(-1, patches.shape[-1])  # (M, C*prod(k))
    ksz = 1
    for k in kshape:
        ksz *= k
    groups = layer.groups
    og = out // groups
    perm = (sp,) + tuple(range(sp)) + (sp + 1,)          # (Cg, spatial.., O)
    inv_perm = tuple(range(1, sp + 1)) + (0, sp + 1)     # back to kernel

    problems = []
    for g in range(groups):
        Wg = jnp.transpose(w[..., :, g * og:(g + 1) * og], perm).reshape(
            cg * ksz, og)
        Xg = P[:, g * cg * ksz:(g + 1) * cg * ksz]

        def write(Wn, g=g):
            blk = jnp.transpose(Wn.reshape((cg,) + kshape + (og,)), inv_perm)
            cur = layer.weight[...]
            layer.weight[...] = cur.at[..., :, g * og:(g + 1) * og].set(blk)

        problems.append((Wg, Xg, write))
    return problems


def _scale_for_problem(layer: QuantWBIOL, group: int, groups: int):
    """The weight quantizer's (frozen) scale, reshaped to broadcast over the
    (K, O)-form weight rows; plus integer clip bounds."""
    qt = layer.weight_quant(layer.weight[...])
    cfg = layer.weight_quant.cfg
    nmin = min_int(cfg.signed, cfg.narrow_range, qt.bit_width)
    nmax = max_int(cfg.signed, cfg.narrow_range, qt.bit_width)
    s = qt.scale
    if s.ndim > 0 and s.size > 1:
        s = s.reshape(-1)  # per-out-channel (O,)
        og = s.shape[0] // groups
        s = s[group * og:(group + 1) * og]
    return s, nmin, nmax


def apply_gptq(
    model: nnx.Module,
    calib_batches: Sequence,
    *,
    damp: float = 0.01,
    forward_fn: Optional[Callable] = None,
    layer_filter: Optional[Callable[[str], bool]] = None,
) -> Dict[str, Tuple[float, float]]:
    """Run GPTQ on every eligible quant layer, sequentially in definition
    order (inputs re-captured after earlier layers are solved, so error
    propagates as at deployment). Returns per-layer
    ``{path: (output_mse_nearest, output_mse_gptq)}`` where the MSE is the
    calibration-set proxy ``tr(ΔWᵀ H ΔW)/M``.
    """
    from brevitas_tpu.graph.calibrate import _restore_modes, _snapshot_modes
    from brevitas_tpu.utils import eval_mode

    snap = _snapshot_modes(model)
    eval_mode(model)
    report: Dict[str, Tuple[float, float]] = {}
    try:
        targets = [(p, l) for p, l in find_modules(model, QuantWBIOL)
                   if eligible_for_gptq(l)
                   and (layer_filter is None or layer_filter(p))]
        solve = jax.jit(_gptq_solve, static_argnames=("damp",))
        for path, layer in targets:
            x = _capture_inputs(model, layer, calib_batches, forward_fn)
            # freeze the scale BEFORE solving: the recursion moves unquantized
            # rows off their original magnitudes, and a stats-driven scale
            # would drift away from the grid the solve quantized against
            freeze_weight_scale(layer)
            mse_near = mse_gptq = 0.0
            groups = getattr(layer, "groups", 1)
            for g, (W, X, write) in enumerate(_layer_matrix_problems(layer, x)):
                scale, nmin, nmax = _scale_for_problem(layer, g, groups)
                H = X.T @ X
                M = X.shape[0]
                Wn = solve(W, H, scale, nmin, nmax, damp=damp)

                def _proxy_mse(Wq):
                    D = Wq - W
                    return float(jnp.sum(D * (H @ D)) / M / Wq.shape[1])

                mse_near += _proxy_mse(
                    jnp.clip(jnp.round(W / scale), nmin, nmax) * scale)
                mse_gptq += _proxy_mse(Wn)
                write(Wn)
            layer.clear_quant_weight_cache()
            report[path] = (mse_near, mse_gptq)
    finally:
        _restore_modes(snap)
    return report
