"""Quantized Mixture-of-Experts FFN (net-new vs reference — Brevitas has no
MoE; this is the expert-parallel serving shape modern pods run).

TPU-first design:
- Experts live as ONE stacked parameter per projection — ``w1 (E, D, H)``,
  ``w2 (E, H, D)`` — so the whole layer is three einsums on the MXU and the
  expert axis is a plain shardable array axis
  (``parallel.rules.expert_parallel_rules``).
- Token routing is GShard-style top-k with a static capacity ``C``:
  dispatch/combine are dense ``(T, E, C)`` one-hots, so shapes stay static
  under jit and the dispatch itself is two more einsums. Overflowing tokens
  are dropped (their residual path carries them, as usual).
- Quantization: the stacked expert weights are quantized per-(expert,
  output-channel) by folding ``(E, D, H) -> (D, E*H)`` and running the
  standard :class:`ParameterQuantizer` with the fold's last axis as the
  channel axis — one scale per expert per channel, stored as a single
  ``(1, E*H)`` array whose blocks align with the expert axis (so it shards
  with the experts). The router stays float: routing logits are tiny and
  precision-critical.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.quantizers import (
    ActQuantizer,
    BiasQuantizer,
    ParameterQuantizer,
    TrainToggleMixin,
)

Array = jnp.ndarray


def _fold(w: Array) -> Array:
    """(E, A, B) -> (A, E*B): per-(expert, B-channel) columns last."""
    e, a, b = w.shape
    return jnp.moveaxis(w, 0, 1).reshape(a, e * b)


def _unfold(w2d: Array, e: int) -> Array:
    """Inverse of :func:`_fold`."""
    a, eb = w2d.shape
    return jnp.moveaxis(w2d.reshape(a, e, eb // e), 1, 0)


class QuantMoE(nnx.Module, TrainToggleMixin):
    """Top-k routed MoE FFN with quantized experts.

    ``capacity_factor`` sizes each expert's token queue as
    ``ceil(top_k * T / E * capacity_factor)``; tokens beyond it are dropped
    from that expert (contribute zero to the combine).
    """

    def __init__(self, dim: int, hidden: int, num_experts: int, *,
                 top_k: int = 2, capacity_factor: float = 1.25,
                 weight_quant: QuantConfig,
                 input_quant: Optional[QuantConfig] = None,
                 hidden_act_quant: Optional[QuantConfig] = None,
                 output_quant: Optional[QuantConfig] = None,
                 bias_quant: Optional[QuantConfig] = None,
                 use_bias: bool = True, rngs: nnx.Rngs):
        if top_k < 1 or top_k > num_experts:
            raise ValueError(f"top_k={top_k} out of range for "
                             f"{num_experts} experts")
        self.dim, self.hidden, self.num_experts = dim, hidden, num_experts
        self.top_k = top_k
        self.capacity_factor = capacity_factor
        self.router = nnx.Linear(dim, num_experts, use_bias=False, rngs=rngs)
        init = nnx.initializers.lecun_normal()
        self.w1 = nnx.Param(init(rngs.params(), (num_experts, dim, hidden)))
        self.w2 = nnx.Param(init(rngs.params(), (num_experts, hidden, dim)))
        self.w1_quant = ParameterQuantizer(
            weight_quant, _fold(self.w1[...]), channel_axis=-1, rngs=rngs)
        self.w2_quant = ParameterQuantizer(
            weight_quant, _fold(self.w2[...]), channel_axis=-1, rngs=rngs)
        self.use_bias = use_bias
        if use_bias:
            self.b1 = nnx.Param(jnp.zeros((num_experts, 1, hidden)))
            self.b2 = nnx.Param(jnp.zeros((num_experts, 1, dim)))
            if bias_quant is not None:
                self.b1_quant = BiasQuantizer(bias_quant, self.b1[...])
                self.b2_quant = BiasQuantizer(bias_quant, self.b2[...])
            else:
                self.b1_quant = self.b2_quant = None
        self.input_quant = (ActQuantizer(input_quant, rngs=rngs)
                            if input_quant is not None else None)
        self.hidden_act_quant = (ActQuantizer(hidden_act_quant, rngs=rngs)
                                 if hidden_act_quant is not None else None)
        self.output_quant = (ActQuantizer(output_quant, rngs=rngs)
                             if output_quant is not None else None)

    # -- routing -----------------------------------------------------------

    def _capacity(self, tokens: int) -> int:
        import math

        cap = math.ceil(self.top_k * tokens / self.num_experts
                        * self.capacity_factor)
        return max(cap, 1)

    def _route(self, logits: Array, capacity: int):
        """Return (combine (T,E,C), dispatch (T,E,C), aux_loss)."""
        t, e = logits.shape
        probs = jax.nn.softmax(logits, axis=-1)
        gate_vals, gate_idx = jax.lax.top_k(probs, self.top_k)  # (T,k)
        gate_vals = gate_vals / (jnp.sum(gate_vals, -1, keepdims=True) + 1e-9)
        combine = jnp.zeros((t, e, capacity), logits.dtype)
        offset = jnp.zeros((e,), jnp.int32)  # tokens already queued per expert
        for j in range(self.top_k):
            onehot = jax.nn.one_hot(gate_idx[:, j], e, dtype=jnp.int32)
            pos = jnp.cumsum(onehot, axis=0) - 1 + offset[None, :]  # (T,E)
            offset = offset + jnp.sum(onehot, axis=0)
            # one_hot() of pos >= capacity is all-zero: overflow drops itself
            slot = jax.nn.one_hot(pos, capacity, dtype=logits.dtype)
            combine = combine + (gate_vals[:, j, None, None]
                                 * onehot[:, :, None].astype(logits.dtype)
                                 * slot)
        dispatch = (combine > 0).astype(logits.dtype)
        # Switch-transformer load-balancing loss: E * sum_e f_e * p_e
        top1 = jax.nn.one_hot(gate_idx[:, 0], e, dtype=logits.dtype)
        aux = e * jnp.sum(jnp.mean(top1, axis=0) * jnp.mean(probs, axis=0))
        return combine, dispatch, aux

    # -- forward -----------------------------------------------------------

    def __call__(self, x: Array, return_aux_loss: bool = False):
        """x: (..., T?, D) — all leading axes are flattened into tokens."""
        lead = x.shape[:-1]
        xf = x.reshape(-1, self.dim)
        tokens = xf.shape[0]
        if self.input_quant is not None:
            q_in = self.input_quant(xf)
            xf = q_in.value
        logits = self.router(xf)
        combine, dispatch, aux = self._route(logits, self._capacity(tokens))
        qw1 = self.w1_quant(_fold(self.w1[...]))
        qw2 = self.w2_quant(_fold(self.w2[...]))
        w1 = _unfold(qw1.value, self.num_experts)  # (E, D, H)
        w2 = _unfold(qw2.value, self.num_experts)  # (E, H, D)
        expert_in = jnp.einsum("tec,td->ecd", dispatch, xf)
        h = jnp.einsum("ecd,edh->ech", expert_in, w1)
        in_scale = q_in.scale if self.input_quant is not None else None
        in_bw = q_in.bit_width if self.input_quant is not None else None
        if self.use_bias:
            h = h + self._quant_bias(self.b1_quant, self.b1[...], qw1,
                                     in_scale, in_bw)
        h = jax.nn.relu(h)
        if self.hidden_act_quant is not None:
            q_h = self.hidden_act_quant(h)
            h = q_h.value
        out = jnp.einsum("ech,ehd->ecd", h, w2)
        if self.use_bias:
            h_scale = (q_h.scale if self.hidden_act_quant is not None
                       else None)
            h_bw = (q_h.bit_width if self.hidden_act_quant is not None
                    else None)
            out = out + self._quant_bias(self.b2_quant, self.b2[...], qw2,
                                         h_scale, h_bw)
        y = jnp.einsum("tec,ecd->td", combine, out)
        if self.output_quant is not None:
            y = self.output_quant(y).value
        y = y.reshape(*lead, self.dim)
        return (y, aux) if return_aux_loss else y

    def _quant_bias(self, bq, b: Array, qw, in_scale, in_bw) -> Array:
        if bq is None:
            return b
        if bq.cfg.requires_input_scale:
            if in_scale is None:
                raise ValueError("bias quant needs the accumulator scale: "
                                 "configure input/hidden act quant")
            # qw.scale is (1, E*B) over the fold; per-expert stacked (E, 1, B)
            e = self.num_experts
            w_scale = jnp.reshape(qw.scale, (e, 1, -1))
            acc_scale = jnp.asarray(in_scale) * w_scale
            return bq(b, input_scale=acc_scale, input_bit_width=in_bw).value
        return bq(b).value
