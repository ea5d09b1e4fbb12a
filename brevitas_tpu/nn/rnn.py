"""Quant recurrent layers: QuantRNN and QuantLSTM.

Reference: ``src/brevitas/nn/quant_rnn.py`` — _QuantLSTMCell:153 (per-timestep
4-gate loop with gate-accumulator quant + sigmoid/tanh quant + cell/hidden
state quant), _QuantLSTMLayer:444 (gate weight/bias quantization outside the
time loop), QuantRecurrentStackBase:706 (stacking + bidirectional), QuantRNN
:803 / QuantLSTM:839.

TPU-native re-design: the reference iterates Python timesteps (with an
optional TorchScript "fast cell"); here the cell is a pure function scanned
with ``jax.lax.scan`` — one compiled program regardless of sequence length.
Gate weights are quantized ONCE per forward (as the reference does), the
per-gate matmuls are fused into two batched GEMMs (x @ W_ih for all gates is
hoisted out of the scan entirely; only h @ W_hh stays inside), and activation
quantizer state (EMA counters etc.) is threaded through the scan carry via
nnx.split/merge.

Layout: batch-first (B, T, F).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import (
    Int8ActPerTensorFloat,
    Int8WeightPerTensorFloat,
    NoneActQuant,
    NoneWeightQuant,
    Uint8ActPerTensorFloat,
)
from brevitas_tpu.quant.quantizers import (
    ActQuantizer,
    ParameterQuantizer,
    TrainToggleMixin,
)
from brevitas_tpu.quant_tensor import QuantTensor, unpack

Array = jnp.ndarray


def _acfg(q):
    return NoneActQuant if q is None else q


def _wcfg(q):
    return NoneWeightQuant if q is None else q


class _QuantLSTMCellQuant(nnx.Module):
    """The activation quantizers of one LSTM cell, grouped so their state
    can be threaded through lax.scan."""

    def __init__(self, act_quant, sigmoid_quant, tanh_quant, cell_quant,
                 io_quant):
        self.gate_acc = ActQuantizer(_acfg(act_quant))
        self.in_sigmoid = ActQuantizer(_acfg(sigmoid_quant))
        self.forget_sigmoid = ActQuantizer(_acfg(sigmoid_quant))
        self.out_sigmoid = ActQuantizer(_acfg(sigmoid_quant))
        self.cell_tanh = ActQuantizer(_acfg(tanh_quant))
        self.hidden_tanh = ActQuantizer(_acfg(tanh_quant))
        self.cell_state = ActQuantizer(_acfg(cell_quant))
        self.hidden_state = ActQuantizer(_acfg(io_quant))


class _QuantLSTMLayer(nnx.Module, TrainToggleMixin):
    """One direction of one LSTM layer."""

    def __init__(self, input_size: int, hidden_size: int, *,
                 weight_quant, bias_quant, io_quant, gate_acc_quant,
                 sigmoid_quant, tanh_quant, cell_state_quant,
                 use_bias: bool = True, reverse: bool = False,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.hidden_size = hidden_size
        self.reverse = reverse
        k = 1.0 / hidden_size ** 0.5
        shape_ih = (input_size, 4 * hidden_size)   # i, f, g(cell), o packed
        shape_hh = (hidden_size, 4 * hidden_size)
        u = nnx.initializers.uniform(2 * k)
        self.w_ih = nnx.Param(u(rngs.params(), shape_ih, dtype) - k)
        self.w_hh = nnx.Param(u(rngs.params(), shape_hh, dtype) - k)
        self.bias = nnx.Param(jnp.zeros((4 * hidden_size,), dtype)) if use_bias else None
        from brevitas_tpu.quant.quantizers import BiasQuantizer
        from brevitas_tpu.quant.presets import NoneBiasQuant

        # gate-bias quantization (internal-scaling configs only: no single
        # accumulator scale exists for the packed 4-gate bias)
        self.bias_quant = BiasQuantizer(
            bias_quant if bias_quant is not None else NoneBiasQuant,
            self.bias[...] if use_bias else jnp.zeros((4 * hidden_size,)))
        self.w_ih_quant = ParameterQuantizer(
            _wcfg(weight_quant), self.w_ih[...], channel_axis=1)
        self.w_hh_quant = ParameterQuantizer(
            _wcfg(weight_quant), self.w_hh[...], channel_axis=1)
        self.input_quant = ActQuantizer(_acfg(io_quant))
        self.quants = _QuantLSTMCellQuant(
            gate_acc_quant, sigmoid_quant, tanh_quant, cell_state_quant,
            io_quant)

    def __call__(self, x: Array, h0: Optional[Array] = None,
                 c0: Optional[Array] = None) -> Tuple[Array, Tuple[Array, Array]]:
        b, t, _ = x.shape
        hs = self.hidden_size
        if h0 is None:
            h0 = jnp.zeros((b, hs), x.dtype)
        if c0 is None:
            c0 = jnp.zeros((b, hs), x.dtype)
        x = unpack(self.input_quant(x))
        # quantize gate weights once per forward (reference gate_params_fwd,
        # nn/mixin/base.py:242), then hoist the input projection out of the
        # time loop as one big (B*T, I) x (I, 4H) GEMM — MXU-friendly
        qw_ih = unpack(self.w_ih_quant(self.w_ih[...]))
        qw_hh = unpack(self.w_hh_quant(self.w_hh[...]))
        x_proj = jnp.einsum("bti,ih->bth", x, qw_ih)
        if self.bias is not None:
            x_proj = x_proj + unpack(self.bias_quant(self.bias[...]))
        if self.reverse:
            x_proj = jnp.flip(x_proj, axis=1)

        graphdef, quant_state = nnx.split(self.quants)

        def step(carry, xp_t):
            h, c, qstate = carry
            q = nnx.merge(graphdef, qstate)
            gates = xp_t + h @ qw_hh
            gates = unpack(q.gate_acc(gates))
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            i_t = unpack(q.in_sigmoid(jax.nn.sigmoid(i_g)))
            f_t = unpack(q.forget_sigmoid(jax.nn.sigmoid(f_g)))
            g_t = unpack(q.cell_tanh(jnp.tanh(g_g)))
            o_t = unpack(q.out_sigmoid(jax.nn.sigmoid(o_g)))
            c_new = unpack(q.cell_state(f_t * c + i_t * g_t))
            h_new = unpack(q.hidden_state(o_t * unpack(q.hidden_tanh(jnp.tanh(c_new)))))
            _, qstate = nnx.split(q)
            return (h_new, c_new, qstate), h_new

        (h_T, c_T, quant_state), ys = jax.lax.scan(
            step, (h0, c0, quant_state), jnp.swapaxes(x_proj, 0, 1))
        nnx.update(self.quants, quant_state)
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, (h_T, c_T)


class _QuantRNNLayer(nnx.Module, TrainToggleMixin):
    """One direction of one vanilla-RNN layer (reference _QuantRNNLayer,
    nn/quant_rnn.py:304)."""

    def __init__(self, input_size: int, hidden_size: int, *,
                 weight_quant, io_quant, gate_acc_quant, act_fn="tanh",
                 use_bias: bool = True, reverse: bool = False,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.hidden_size = hidden_size
        self.reverse = reverse
        self.act_fn = jnp.tanh if act_fn == "tanh" else jax.nn.relu
        k = 1.0 / hidden_size ** 0.5
        u = nnx.initializers.uniform(2 * k)
        self.w_ih = nnx.Param(u(rngs.params(), (input_size, hidden_size), dtype) - k)
        self.w_hh = nnx.Param(u(rngs.params(), (hidden_size, hidden_size), dtype) - k)
        self.bias = nnx.Param(jnp.zeros((hidden_size,), dtype)) if use_bias else None
        self.w_ih_quant = ParameterQuantizer(_wcfg(weight_quant), self.w_ih[...], 1)
        self.w_hh_quant = ParameterQuantizer(_wcfg(weight_quant), self.w_hh[...], 1)
        self.input_quant = ActQuantizer(_acfg(io_quant))
        self.gate_acc_quant = ActQuantizer(_acfg(gate_acc_quant))
        self.out_quant = ActQuantizer(_acfg(io_quant))

    def __call__(self, x: Array, h0: Optional[Array] = None):
        b, t, _ = x.shape
        if h0 is None:
            h0 = jnp.zeros((b, self.hidden_size), x.dtype)
        x = unpack(self.input_quant(x))
        qw_ih = unpack(self.w_ih_quant(self.w_ih[...]))
        qw_hh = unpack(self.w_hh_quant(self.w_hh[...]))
        x_proj = jnp.einsum("bti,ih->bth", x, qw_ih)
        if self.bias is not None:
            x_proj = x_proj + self.bias[...]
        if self.reverse:
            x_proj = jnp.flip(x_proj, axis=1)

        quant_mods = nnx.List([self.gate_acc_quant, self.out_quant])
        graphdef, qstate0 = nnx.split(quant_mods)

        def step(carry, xp_t):
            h, qstate = carry
            mods = nnx.merge(graphdef, qstate)
            acc = unpack(mods[0](xp_t + h @ qw_hh))
            h_new = unpack(mods[1](self.act_fn(acc)))
            _, qstate = nnx.split(mods)
            return (h_new, qstate), h_new

        (h_T, qstate), ys = jax.lax.scan(
            step, (h0, qstate0), jnp.swapaxes(x_proj, 0, 1))
        nnx.update(quant_mods, qstate)
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, h_T


class QuantLSTM(nnx.Module, TrainToggleMixin):
    """Stacked (optionally bidirectional) quantized LSTM
    (reference QuantLSTM, nn/quant_rnn.py:839)."""

    def __init__(self, input_size: int, hidden_size: int, num_layers: int = 1,
                 *, bidirectional: bool = False, use_bias: bool = True,
                 weight_quant: Optional[QuantConfig] = Int8WeightPerTensorFloat,
                 bias_quant: Optional[QuantConfig] = None,
                 io_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 gate_acc_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 sigmoid_quant: Optional[QuantConfig] = Uint8ActPerTensorFloat,
                 tanh_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 cell_state_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 rngs: nnx.Rngs):
        self.hidden_size = hidden_size
        self.bidirectional = bidirectional
        layers = []
        for i in range(num_layers):
            in_sz = input_size if i == 0 else hidden_size * (2 if bidirectional else 1)
            kw = dict(weight_quant=weight_quant, bias_quant=bias_quant,
                      io_quant=io_quant, gate_acc_quant=gate_acc_quant,
                      sigmoid_quant=sigmoid_quant, tanh_quant=tanh_quant,
                      cell_state_quant=cell_state_quant, use_bias=use_bias,
                      rngs=rngs)
            layers.append(_QuantLSTMLayer(in_sz, hidden_size, **kw))
            if bidirectional:
                layers.append(_QuantLSTMLayer(in_sz, hidden_size,
                                              reverse=True, **kw))
        self.layers = nnx.List(layers)

    def __call__(self, x: Array, h0: Optional[Array] = None,
                 c0: Optional[Array] = None):
        """h0/c0: (num_layers * num_directions, B, H) initial states, torch
        layout — sliced per layer/direction for stateful decoding."""
        step = 2 if self.bidirectional else 1
        finals = []
        idx = 0
        for i in range(0, len(self.layers), step):
            h_f = h0[idx] if h0 is not None else None
            c_f = c0[idx] if c0 is not None else None
            if self.bidirectional:
                h_b = h0[idx + 1] if h0 is not None else None
                c_b = c0[idx + 1] if c0 is not None else None
                y_f, s_f = self.layers[i](x, h_f, c_f)
                y_b, s_b = self.layers[i + 1](x, h_b, c_b)
                x = jnp.concatenate([y_f, y_b], axis=-1)
                finals.extend([s_f, s_b])
            else:
                x, s = self.layers[i](x, h_f, c_f)
                finals.append(s)
            idx += step
        h_n = jnp.stack([s[0] for s in finals])
        c_n = jnp.stack([s[1] for s in finals])
        return x, (h_n, c_n)


class QuantRNN(nnx.Module, TrainToggleMixin):
    """Stacked (optionally bidirectional) quantized vanilla RNN
    (reference QuantRNN, nn/quant_rnn.py:803)."""

    def __init__(self, input_size: int, hidden_size: int, num_layers: int = 1,
                 *, bidirectional: bool = False, use_bias: bool = True,
                 act_fn: str = "tanh",
                 weight_quant: Optional[QuantConfig] = Int8WeightPerTensorFloat,
                 io_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 gate_acc_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 rngs: nnx.Rngs):
        self.bidirectional = bidirectional
        layers = []
        for i in range(num_layers):
            in_sz = input_size if i == 0 else hidden_size * (2 if bidirectional else 1)
            kw = dict(weight_quant=weight_quant, io_quant=io_quant,
                      gate_acc_quant=gate_acc_quant, act_fn=act_fn,
                      use_bias=use_bias, rngs=rngs)
            layers.append(_QuantRNNLayer(in_sz, hidden_size, **kw))
            if bidirectional:
                layers.append(_QuantRNNLayer(in_sz, hidden_size,
                                             reverse=True, **kw))
        self.layers = nnx.List(layers)

    def __call__(self, x: Array, h0: Optional[Array] = None):
        """h0: (num_layers * num_directions, B, H) initial hidden states."""
        step = 2 if self.bidirectional else 1
        finals = []
        idx = 0
        for i in range(0, len(self.layers), step):
            hf = h0[idx] if h0 is not None else None
            if self.bidirectional:
                hb = h0[idx + 1] if h0 is not None else None
                y_f, h_f = self.layers[i](x, hf)
                y_b, h_b = self.layers[i + 1](x, hb)
                x = jnp.concatenate([y_f, y_b], axis=-1)
                finals.extend([h_f, h_b])
            else:
                x, h = self.layers[i](x, hf)
                finals.append(h)
            idx += step
        return x, jnp.stack(finals)
