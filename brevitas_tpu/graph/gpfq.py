"""GPFQ — greedy path-following post-training weight quantization
(arXiv:2201.11113; later Brevitas ships it alongside GPTQ in the GPxQ
family — the reference snapshot at /root/reference predates both).

Where GPTQ absorbs each row's quantization error through the Cholesky
factor of the input Hessian, GPFQ tracks the *actual running output
residual* on the calibration set: input dimensions are quantized one at a
time, each integer chosen to best reconstruct the accumulated output so
far. Per (K, O) weight with calibration inputs X (M, K):

    u_0 = 0
    for t in 0..K-1:
        arg_t = <X_t, u_{t-1}> / ||X_t||^2 + W_t        # (O,)
        q_t   = quant(arg_t)
        u_t   = u_{t-1} + outer(X_t, W_t - q_t)          # (M, O)

so u_final = X (W - Q) exactly — the per-layer calibration output error —
and each greedy step minimizes ||u_{t-1} + (W_t - q) X_t||^2 over the grid.

TPU-native formulation: the whole solve is ONE `lax.fori_loop` carrying the
(M, O) residual; each iterate is a (M)x(M,O) contraction + rank-1 update —
dense MXU work, no Python in the loop, jitted once per (M, K, O) shape.
Convs lower to matmul form and grouped convs solve per group via the same
machinery as GPTQ (`_layer_matrix_problems`).

Usage (after calibration, like GPTQ)::

    with calibration_mode(model):
        for b in batches: model(b)
    apply_gpfq(model, batches)
"""

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.graph.base import find_modules
from brevitas_tpu.graph.gptq import _layer_matrix_problems, _scale_for_problem
from brevitas_tpu.graph.learned_round import (
    _capture_inputs,
    eligible_for_learned_round,
    freeze_weight_scale,
)
from brevitas_tpu.nn.quant_layer import QuantWBIOL

Array = jnp.ndarray

# same structural requirements as learned-round/GPTQ: symmetric INT weight
# quant on a plain linear/conv MAC
eligible_for_gpfq = eligible_for_learned_round


def _gpfq_solve(W: Array, X: Array, scale: Array, nmin: Array,
                nmax: Array) -> Tuple[Array, Array]:
    """Greedy path-following solve on a (K, O) weight with (M, K) inputs.

    Returns ``(Q, out_sqerr)`` where Q is the fake-quantized weight (already
    on the grid) and ``out_sqerr`` is ``||X (W - Q)||^2`` accumulated by the
    recursion itself (== the calibration-set output error of the solve).
    """
    M, K = X.shape
    O = W.shape[1]
    norms = jnp.sum(X * X, axis=0)  # (K,)
    safe = jnp.where(norms > 0.0, norms, 1.0)

    def quant_row(w):
        return jnp.clip(jnp.round(w / scale), nmin, nmax) * scale

    def body(t, carry):
        U, Q = carry
        x_t = jax.lax.dynamic_slice_in_dim(X, t, 1, axis=1)[:, 0]  # (M,)
        w_t = jax.lax.dynamic_slice_in_dim(W, t, 1, axis=0)[0]     # (O,)
        arg = (x_t @ U) / safe[t] + w_t                            # (O,)
        # dead input dimension: nothing flows through it, quantize nearest
        arg = jnp.where(norms[t] > 0.0, arg, w_t)
        q = quant_row(arg)
        U = U + jnp.outer(x_t, w_t - q)
        Q = jax.lax.dynamic_update_slice_in_dim(Q, q[None, :], t, axis=0)
        return U, Q

    U0 = jnp.zeros((M, O), dtype=W.dtype)
    U, Q = jax.lax.fori_loop(0, K, body, (U0, jnp.zeros_like(W)))
    return Q, jnp.sum(U * U)


def apply_gpfq(
    model: nnx.Module,
    calib_batches: Sequence,
    *,
    max_rows: Optional[int] = 4096,
    forward_fn: Optional[Callable] = None,
    layer_filter: Optional[Callable[[str], bool]] = None,
) -> Dict[str, Tuple[float, float]]:
    """Run GPFQ on every eligible quant layer, sequentially in definition
    order (inputs re-captured after earlier layers are solved, so error
    propagates as at deployment — same discipline as ``apply_gptq``).

    ``max_rows`` caps the number of calibration rows M carried in the (M, O)
    residual (rows are evenly strided, not truncated, so every batch keeps
    representation); ``None`` keeps all rows.

    Returns per-layer ``{path: (output_mse_nearest, output_mse_gpfq)}``
    measured on the (possibly subsampled) calibration rows.
    """
    from brevitas_tpu.graph.calibrate import _restore_modes, _snapshot_modes
    from brevitas_tpu.utils import eval_mode

    snap = _snapshot_modes(model)
    eval_mode(model)
    report: Dict[str, Tuple[float, float]] = {}
    try:
        targets = [(p, l) for p, l in find_modules(model, QuantWBIOL)
                   if eligible_for_gpfq(l)
                   and (layer_filter is None or layer_filter(p))]
        solve = jax.jit(_gpfq_solve)
        for path, layer in targets:
            x = _capture_inputs(model, layer, calib_batches, forward_fn)
            # freeze the scale BEFORE solving: the greedy targets drift off
            # the original weight magnitudes and a stats-driven scale would
            # move the grid out from under the already-chosen integers
            freeze_weight_scale(layer)
            mse_near = mse_gpfq = 0.0
            groups = getattr(layer, "groups", 1)
            for g, (W, X, write) in enumerate(_layer_matrix_problems(layer, x)):
                if max_rows is not None and X.shape[0] > max_rows:
                    stride = -(-X.shape[0] // max_rows)  # ceil div
                    X = X[::stride]
                scale, nmin, nmax = _scale_for_problem(layer, g, groups)
                Wq, sqerr = solve(W, X, scale, nmin, nmax)
                M = X.shape[0]
                D = W - jnp.clip(jnp.round(W / scale), nmin, nmax) * scale
                E = X @ D
                mse_near += float(jnp.sum(E * E) / M / W.shape[1])
                mse_gpfq += float(sqerr / M / W.shape[1])
                write(Wq)
            layer.clear_quant_weight_cache()
            report[path] = (mse_near, mse_gpfq)
    finally:
        _restore_modes(snap)
    return report
