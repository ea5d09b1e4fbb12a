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

from brevitas_tpu.ops import round_ste
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


class _FusedUnsupported(Exception):
    """A cell quantizer needs its stateful per-call path — run the slow cell."""


def _acfg(q):
    return NoneActQuant if q is None else q


def _wcfg(q):
    return NoneWeightQuant if q is None else q


class _QuantLSTMCellQuant(nnx.Module):
    """The activation quantizers of one LSTM cell, grouped so their state
    can be threaded through lax.scan.

    Option parity (reference _QuantLSTMLayer.__init__, quant_rnn.py:470-546):

    - ``shared_gate_acc`` → one accumulator quantizer for all four gates
      (reference ``shared_intra_layer_gate_acc_quant``).
    - ``cifg`` → the forget gate reuses the input gate's accumulator and
      sigmoid quantizers ("avoid dealing with None").
    - ``cell_state``/``hidden_state`` accept an EXISTING ActQuantizer to
      share across directions/layers (reference ``quantizers_to_share``:
      the first direction's io_quant always propagates; its cell-state
      quantizer propagates when ``shared_cell_state_quant``).
    """

    def __init__(self, act_quant, sigmoid_quant, tanh_quant, cell_quant,
                 io_quant, *, cifg: bool = False,
                 shared_gate_acc: bool = False,
                 shared_cell_state: Optional[ActQuantizer] = None,
                 shared_io: Optional[ActQuantizer] = None):
        self.gate_acc = ActQuantizer(_acfg(act_quant))  # input gate
        if shared_gate_acc:
            self.forget_acc = self.gate_acc
            self.cell_acc = self.gate_acc
            self.out_acc = self.gate_acc
        else:
            self.cell_acc = ActQuantizer(_acfg(act_quant))
            self.out_acc = ActQuantizer(_acfg(act_quant))
            self.forget_acc = (self.gate_acc if cifg
                               else ActQuantizer(_acfg(act_quant)))
        self.in_sigmoid = ActQuantizer(_acfg(sigmoid_quant))
        self.forget_sigmoid = (self.in_sigmoid if cifg
                               else ActQuantizer(_acfg(sigmoid_quant)))
        self.out_sigmoid = ActQuantizer(_acfg(sigmoid_quant))
        self.cell_tanh = ActQuantizer(_acfg(tanh_quant))
        self.hidden_tanh = ActQuantizer(_acfg(tanh_quant))
        self.cell_state = (shared_cell_state if shared_cell_state is not None
                           else ActQuantizer(_acfg(cell_quant)))
        self.hidden_state = (shared_io if shared_io is not None
                             else ActQuantizer(_acfg(io_quant)))


def _quant_ones_like(qt: QuantTensor, x: Array, narrow: bool) -> Array:
    """Ones fake-quantized onto ``qt``'s grid (reference CIFG forget gate:
    ``quant_ones = sigmoid_quant.tensor_quant(ones)``, quant_rnn.py:217-221)."""
    ones = jnp.ones_like(x)
    if qt.scale is None:
        return ones
    from brevitas_tpu.core import quant as Qf

    zp = qt.zero_point if qt.zero_point is not None else jnp.asarray(0.0)
    return Qf.int_quant(ones, qt.scale, zp, qt.bit_width,
                        signed=bool(qt.signed), narrow_range=narrow)


class _QuantLSTMLayer(nnx.Module, TrainToggleMixin):
    """One direction of one LSTM layer.

    Weights stay PACKED per matrix ((I, G·H) / (H, G·H), G gates) so the
    input projection is one MXU GEMM hoisted out of the scan, but
    quantization runs PER GATE (each gate block through its own quantizer,
    reference GateParams semantics) unless ``shared_intra_layer_weight_quant``
    selects the reference's single shared weight quantizer, whose scaling
    stats span BOTH matrices (the analogue of the shared proxy's tracked
    parameter list)."""

    def __init__(self, input_size: int, hidden_size: int, *,
                 weight_quant, bias_quant, io_quant, gate_acc_quant,
                 sigmoid_quant, tanh_quant, cell_state_quant,
                 use_bias: bool = True, reverse: bool = False,
                 cifg: bool = False,
                 shared_intra_layer_weight_quant: bool = False,
                 shared_intra_layer_gate_acc_quant: bool = False,
                 shared_cell_state: Optional[ActQuantizer] = None,
                 shared_io: Optional[ActQuantizer] = None,
                 shared_input_hidden: Optional[Tuple] = None,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.hidden_size = hidden_size
        self.reverse = reverse
        self.cifg = cifg
        self.fused_cell: bool = True  # auto fast path; False forces module cell
        self.num_gates = 3 if cifg else 4  # (i, g, o) | (i, f, g, o)
        G = self.num_gates
        k = 1.0 / hidden_size ** 0.5
        shape_ih = (input_size, G * hidden_size)
        shape_hh = (hidden_size, G * hidden_size)
        u = nnx.initializers.uniform(2 * k)
        if shared_input_hidden is not None:
            # reference shared_input_hidden_weights: the reverse direction
            # reuses the forward direction's input-to-hidden weights AND
            # their quantizers (weights_to_share, quant_rnn.py:551-561)
            self.w_ih, ih_quants = shared_input_hidden
        else:
            self.w_ih = nnx.Param(u(rngs.params(), shape_ih, dtype) - k)
            ih_quants = None  # built below
        self.w_hh = nnx.Param(u(rngs.params(), shape_hh, dtype) - k)
        self.bias = nnx.Param(jnp.zeros((G * hidden_size,), dtype)) \
            if use_bias else None
        from brevitas_tpu.quant.presets import NoneBiasQuant
        from brevitas_tpu.quant.quantizers import BiasQuantizer

        # gate-bias quantization (internal-scaling configs only: no single
        # accumulator scale exists for the packed multi-gate bias)
        self.bias_quant = BiasQuantizer(
            bias_quant if bias_quant is not None else NoneBiasQuant,
            self.bias[...] if use_bias else jnp.zeros((G * hidden_size,)))

        wcfg = _wcfg(weight_quant)
        H = hidden_size
        if shared_intra_layer_weight_quant:
            # one quantizer; scaling stats over both packed matrices
            stats_init = jnp.concatenate(
                [self.w_ih[...], self.w_hh[...]], axis=0)
            shared_q = ParameterQuantizer(wcfg, stats_init, channel_axis=1)
            if ih_quants is None:
                ih_quants = nnx.List([shared_q])
            self.w_hh_quants = nnx.List([shared_q])
        else:
            if ih_quants is None:
                ih_quants = nnx.List([
                    ParameterQuantizer(wcfg, self.w_ih[...][:, g * H:(g + 1) * H],
                                       channel_axis=1) for g in range(G)])
            self.w_hh_quants = nnx.List([
                ParameterQuantizer(wcfg, self.w_hh[...][:, g * H:(g + 1) * H],
                                   channel_axis=1) for g in range(G)])
        self.w_ih_quants = ih_quants
        self.input_quant = ActQuantizer(_acfg(io_quant))
        self.quants = _QuantLSTMCellQuant(
            gate_acc_quant, sigmoid_quant, tanh_quant, cell_state_quant,
            io_quant, cifg=cifg,
            shared_gate_acc=shared_intra_layer_gate_acc_quant,
            shared_cell_state=shared_cell_state, shared_io=shared_io)

    def _quant_packed(self, w: Array, quants) -> Array:
        """Quantize a packed (X, G·H) gate matrix per gate (or through the
        single shared quantizer)."""
        if len(quants) == 1:
            return unpack(quants[0](w))
        H = self.hidden_size
        return jnp.concatenate(
            [unpack(q(w[:, g * H:(g + 1) * H]))
             for g, q in enumerate(quants)], axis=1)

    def _fused_stage(self, quants):
        """Static quant params for one packed stage of the fused cell.

        Returns ``(scale, bit_width, q0)`` where ``scale`` broadcasts over
        the packed (B, len(quants)·H) block (scalar when every quantizer is
        the same shared instance, else an (n·H,) vector with gradients
        flowing back into each learned scale), ``None`` for an all-identity
        stage, or raises ``_FusedUnsupported`` when any quantizer carries
        per-call state and the slow path must run."""
        params = [q.static_int_params() for q in quants]
        if any(p is None for p in params):
            raise _FusedUnsupported
        idents = [p == "identity" for p in params]
        if all(idents):
            return None
        if any(idents):
            raise _FusedUnsupported  # mixed identity/quant block
        q0 = quants[0]
        if any(q.cfg != q0.cfg for q in quants[1:]):
            raise _FusedUnsupported
        if all(q is q0 for q in quants[1:]):
            return params[0][0], params[0][1], q0
        from brevitas_tpu.quant.config import BitWidthImplType
        if BitWidthImplType(q0.cfg.bit_width_impl) != BitWidthImplType.CONST:
            # one packed clamp needs one shared static bit-width
            raise _FusedUnsupported
        H = self.hidden_size
        scale = jnp.concatenate(
            [jnp.broadcast_to(p[0].reshape(-1), (H,)) for p in params])
        return scale, params[0][1], q0

    def _fused_cell_params(self):
        """Build the per-stage static quant params of the whole cell, or
        return None when any quantizer needs its stateful path (runtime
        stats, two-phase collection, delay) — the caller then runs the
        per-gate module cell. Reference hot loop: _QuantLSTMCell.forward_iter
        (nn/quant_rnn.py:193-303); here the 8 per-timestep quant chains
        collapse to 3 batched fake-quants plus the cell/hidden chain."""
        q = self.quants
        if self.cifg:
            accs = [q.gate_acc, q.cell_acc, q.out_acc]
            sigs = [q.in_sigmoid, q.out_sigmoid]
        else:
            accs = [q.gate_acc, q.forget_acc, q.cell_acc, q.out_acc]
            sigs = [q.in_sigmoid, q.forget_sigmoid, q.out_sigmoid]
        try:
            stages = {
                "acc": self._fused_stage(accs),
                "sig": self._fused_stage(sigs),
                "tanh_g": self._fused_stage([q.cell_tanh]),
                "cell": self._fused_stage([q.cell_state]),
                "tanh_h": self._fused_stage([q.hidden_tanh]),
                "hidden": self._fused_stage([q.hidden_state]),
            }
            if self.cifg:
                # CIFG forget gate needs ones on the INPUT sigmoid's grid
                stages["sig_i"] = self._fused_stage([q.in_sigmoid])
            return stages
        except _FusedUnsupported:
            return None

    @staticmethod
    def _fused_quant(x: Array, stage) -> Array:
        if stage is None:
            return x
        scale, bit_width, q = stage
        from brevitas_tpu.core import quant as Qf
        from brevitas_tpu.ops import tensor_clamp, tensor_clamp_ste

        return Qf.int_quant(
            x, scale, jnp.zeros(()), bit_width, signed=q.cfg.signed,
            narrow_range=q.cfg.narrow_range, float_to_int=q._float_to_int,
            clamp_fn=tensor_clamp_ste if q.cfg.clamp_ste else tensor_clamp)

    def _pallas_cell_args(self, stages, batch: int, dtype):
        """Static scale/bounds arguments for the fused Pallas cell kernel
        (kernels/lstm_cell.py), or None when the jnp fused path must run
        (CIFG, a disabled stage, learned bit-widths, non-f32, unaligned
        shapes, non-TPU backend)."""
        from brevitas_tpu import config as _cfg
        from brevitas_tpu.kernels.lstm_cell import cell_shapes_ok
        from brevitas_tpu.quant.config import BitWidthImplType

        if not _cfg.PALLAS_RNN_CELL or self.cifg:
            return None
        if dtype != jnp.float32:
            return None
        keys = ("acc", "sig", "tanh_g", "cell", "tanh_h", "hidden")
        if any(stages[k] is None for k in keys):
            return None
        H = self.hidden_size
        if not cell_shapes_ok(batch, H):
            return None
        interpret = jax.default_backend() != "tpu"
        if interpret and not _cfg.PALLAS_INTERPRET:
            return None
        args = {}
        bounds = []
        for k in keys:
            scale, bit_width, q = stages[k]
            cfg = q.cfg
            if BitWidthImplType(cfg.bit_width_impl) != BitWidthImplType.CONST:
                return None
            if cfg.clamp_ste or q._stochastic \
                    or getattr(q, "_f2i_static", None) is not round_ste:
                return None
            # pure-Python bounds (ops.min_int/max_int build jnp constants,
            # which are TRACERS inside a jit trace on current jax)
            bw = float(cfg.bit_width)
            if cfg.signed:
                lo = -(2.0 ** (bw - 1.0)) + (1.0 if cfg.narrow_range else 0.0)
                hi = 2.0 ** (bw - 1.0) - 1.0
            else:
                lo = 0.0
                hi = 2.0 ** bw - (2.0 if cfg.narrow_range else 1.0)
            bounds.append((lo, hi))
            args[k] = scale
        sa = jnp.broadcast_to(args["acc"].reshape(-1),
                              (4 * H,)) if args["acc"].ndim <= 1 else None
        ss = jnp.broadcast_to(args["sig"].reshape(-1),
                              (3 * H,)) if args["sig"].ndim <= 1 else None
        if sa is None or ss is None:
            return None
        return (sa.astype(jnp.float32), ss.astype(jnp.float32),
                args["tanh_g"].reshape(()), args["cell"].reshape(()),
                args["tanh_h"].reshape(()), args["hidden"].reshape(()),
                tuple(bounds), interpret)

    def _fused_scan(self, x_proj: Array, h0: Array, c0: Array, qw_hh: Array,
                    stages) -> Tuple[Array, Tuple[Array, Array]]:
        """lax.scan with data-independent quant grids: no quantizer state in
        the carry, batched gate fake-quants instead of per-gate module calls."""
        H = self.hidden_size
        cifg = self.cifg
        fq = self._fused_quant

        def gemm(h):
            # bf16 operand storage (compute_dtype): cast the carry down,
            # accumulate in f32 on the MXU
            return jnp.matmul(h.astype(qw_hh.dtype), qw_hh,
                              preferred_element_type=jnp.float32)

        # TPU fast path: the whole post-GEMM cell in ONE Pallas kernel
        pallas_args = self._pallas_cell_args(stages, x_proj.shape[0],
                                             jnp.float32)
        if pallas_args is not None:
            from brevitas_tpu.kernels.lstm_cell import quant_lstm_cell

            sa, ss, st, sc, sth, sh, bounds, interpret = pallas_args

            # remat: save only the (h, c) carries per step and recompute the
            # GEMM + cell in the backward — residual HBM traffic drops from
            # ~5H floats/step to the carries the scan saves anyway, and this
            # leg is bandwidth-bound (PERF.md quantlstm)
            @jax.checkpoint
            def pallas_step(carry, xp_t):
                h, c = carry
                gates = xp_t.astype(jnp.float32) + gemm(h)
                h_new, c_new = quant_lstm_cell(gates, c, sa, ss, st, sc,
                                               sth, sh, H, bounds, interpret)
                return (h_new, c_new), h_new

            (h_T, c_T), ys = jax.lax.scan(pallas_step, (h0, c0),
                                          jnp.swapaxes(x_proj, 0, 1))
            return jnp.swapaxes(ys, 0, 1), (h_T, c_T)
        if cifg:
            # forget = quant(1) - input on the input sigmoid's grid
            # (reference forward_iter, quant_rnn.py:217-221) — static, so
            # hoisted out of the scan entirely
            q_ones = fq(jnp.ones(()), stages["sig_i"])
        else:
            q_ones = jnp.ones(())

        @jax.checkpoint
        def step(carry, xp_t):
            h, c = carry
            gates = fq(xp_t.astype(jnp.float32) + gemm(h), stages["acc"])
            if cifg:
                # packed (i, g, o): sigmoid blocks i,o; tanh block g
                sig = fq(jax.nn.sigmoid(
                    jnp.concatenate([gates[:, :H], gates[:, 2 * H:]], -1)),
                    stages["sig"])
                i_t, o_t = sig[:, :H], sig[:, H:]
                f_t = q_ones - i_t
                g_t = fq(jnp.tanh(gates[:, H:2 * H]), stages["tanh_g"])
            else:
                # packed (i, f, g, o): sigmoid blocks i,f,o; tanh block g
                sig = fq(jax.nn.sigmoid(
                    jnp.concatenate([gates[:, :2 * H], gates[:, 3 * H:]], -1)),
                    stages["sig"])
                i_t, f_t, o_t = sig[:, :H], sig[:, H:2 * H], sig[:, 2 * H:]
                g_t = fq(jnp.tanh(gates[:, 2 * H:3 * H]), stages["tanh_g"])
            c_new = fq(f_t * c + i_t * g_t, stages["cell"])
            h_new = fq(o_t * fq(jnp.tanh(c_new), stages["tanh_h"]),
                       stages["hidden"])
            return (h_new, c_new), h_new

        (h_T, c_T), ys = jax.lax.scan(step, (h0, c0),
                                      jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(ys, 0, 1), (h_T, c_T)

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
        # time loop as one big (B*T, I) x (I, G*H) GEMM — MXU-friendly
        qw_ih = self._quant_packed(self.w_ih[...], self.w_ih_quants)
        qw_hh = self._quant_packed(self.w_hh[...], self.w_hh_quants)
        x_proj = jnp.einsum("bti,ih->bth", x, qw_ih)
        if self.bias is not None:
            x_proj = x_proj + unpack(self.bias_quant(self.bias[...]))
        if self.reverse:
            x_proj = jnp.flip(x_proj, axis=1)

        # fast path: when every cell quantizer's grid is data-independent
        # (const/learned scales — e.g. after convert_runtime_stats_to_
        # parameter migration), run the fused scan: batched gate fake-quants,
        # no quantizer state in the carry
        if self.fused_cell:
            stages = self._fused_cell_params()
            if stages is not None:
                # compute_dtype (set_compute_dtype): store the streamed
                # input projection and the recurrent weight matrix in bf16 —
                # halves the scan's dominant HBM traffic; the per-step GEMM
                # accumulates in f32 and the cell math stays f32
                cd = getattr(self, "compute_dtype", None)
                if cd is not None:
                    x_proj = x_proj.astype(cd)
                    qw_hh = qw_hh.astype(cd)
                ys, (h_T, c_T) = self._fused_scan(x_proj, h0, c0, qw_hh,
                                                  stages)
                if self.reverse:
                    ys = jnp.flip(ys, axis=1)
                return ys, (h_T, c_T)

        graphdef, quant_state = nnx.split(self.quants)
        cifg = self.cifg

        def step(carry, xp_t):
            h, c, qstate = carry
            q = nnx.merge(graphdef, qstate)
            gates = xp_t + h @ qw_hh
            if cifg:
                i_g, g_g, o_g = jnp.split(gates, 3, axis=-1)
            else:
                i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            i_t_qt = q.in_sigmoid(jax.nn.sigmoid(unpack(q.gate_acc(i_g))))
            i_t = unpack(i_t_qt)
            if cifg:
                # 1 - input gate on the sigmoid quantizer's grid
                # (reference forward_iter, quant_rnn.py:217-221)
                if isinstance(i_t_qt, QuantTensor):
                    f_t = _quant_ones_like(
                        i_t_qt, i_t, q.in_sigmoid.cfg.narrow_range) - i_t
                else:
                    f_t = 1.0 - i_t
            else:
                f_t = unpack(q.forget_sigmoid(
                    jax.nn.sigmoid(unpack(q.forget_acc(f_g)))))
            g_t = unpack(q.cell_tanh(jnp.tanh(unpack(q.cell_acc(g_g)))))
            o_t = unpack(q.out_sigmoid(
                jax.nn.sigmoid(unpack(q.out_acc(o_g)))))
            c_new = unpack(q.cell_state(f_t * c + i_t * g_t))
            h_new = unpack(q.hidden_state(
                o_t * unpack(q.hidden_tanh(jnp.tanh(c_new)))))
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
                 shared_input_hidden: Optional[Tuple] = None,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.hidden_size = hidden_size
        self.reverse = reverse
        self.act_fn = jnp.tanh if act_fn == "tanh" else jax.nn.relu
        k = 1.0 / hidden_size ** 0.5
        u = nnx.initializers.uniform(2 * k)
        if shared_input_hidden is not None:
            # reference shared_input_hidden_weights (QuantRNN too): the
            # reverse direction reuses the forward input-to-hidden weights
            self.w_ih, self.w_ih_quant = shared_input_hidden
        else:
            self.w_ih = nnx.Param(
                u(rngs.params(), (input_size, hidden_size), dtype) - k)
            self.w_ih_quant = ParameterQuantizer(
                _wcfg(weight_quant), self.w_ih[...], 1)
        self.w_hh = nnx.Param(u(rngs.params(), (hidden_size, hidden_size), dtype) - k)
        self.bias = nnx.Param(jnp.zeros((hidden_size,), dtype)) if use_bias else None
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
    (reference QuantLSTM, nn/quant_rnn.py:839).

    Option parity with the reference signature (quant_rnn.py:706-839):
    ``coupled_input_forget_gates`` (CIFG: forget = 1 − input on the quant
    grid, no forget-gate weights), ``shared_input_hidden_weights``
    (bidirectional only: both directions share input-to-hidden weights),
    ``shared_intra_layer_weight_quant`` / ``shared_intra_layer_gate_acc_
    quant`` (single weight / gate-accumulator quantizer per layer), and
    ``shared_cell_state_quant`` (one cell-state quantizer instance shared
    across all layers and directions, required by ``cat_output_cell_states``).
    The first direction's io (hidden-state) quantizer is always shared, as
    in the reference's ``quantizers_to_share``."""

    def __init__(self, input_size: int, hidden_size: int, num_layers: int = 1,
                 *, bidirectional: bool = False, use_bias: bool = True,
                 weight_quant: Optional[QuantConfig] = Int8WeightPerTensorFloat,
                 bias_quant: Optional[QuantConfig] = None,
                 io_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 gate_acc_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 sigmoid_quant: Optional[QuantConfig] = Uint8ActPerTensorFloat,
                 tanh_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 cell_state_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 coupled_input_forget_gates: bool = False,
                 cat_output_cell_states: bool = True,
                 shared_input_hidden_weights: bool = False,
                 shared_intra_layer_weight_quant: bool = False,
                 shared_intra_layer_gate_acc_quant: bool = False,
                 shared_cell_state_quant: bool = True,
                 rngs: nnx.Rngs):
        if shared_input_hidden_weights and not bidirectional:
            raise ValueError("Shared input-hidden weights requires "
                             "bidirectional=True.")
        if cat_output_cell_states and cell_state_quant is not None \
                and not shared_cell_state_quant:
            raise ValueError("Concatenating cell states requires shared "
                             "cell quantizers.")
        self.hidden_size = hidden_size
        self.bidirectional = bidirectional
        self.cifg = coupled_input_forget_gates
        self.cat_output_cell_states = cat_output_cell_states
        layers = []
        shared_io = None
        shared_cell = None
        for i in range(num_layers):
            in_sz = input_size if i == 0 else hidden_size * (2 if bidirectional else 1)
            kw = dict(weight_quant=weight_quant, bias_quant=bias_quant,
                      io_quant=io_quant, gate_acc_quant=gate_acc_quant,
                      sigmoid_quant=sigmoid_quant, tanh_quant=tanh_quant,
                      cell_state_quant=cell_state_quant, use_bias=use_bias,
                      cifg=coupled_input_forget_gates,
                      shared_intra_layer_weight_quant=shared_intra_layer_weight_quant,
                      shared_intra_layer_gate_acc_quant=shared_intra_layer_gate_acc_quant,
                      rngs=rngs)
            fwd = _QuantLSTMLayer(in_sz, hidden_size, shared_io=shared_io,
                                  shared_cell_state=shared_cell, **kw)
            # reference quantizers_to_share: the first direction's io quant
            # always propagates; cell-state quant when shared_cell_state_quant
            if shared_io is None:
                shared_io = fwd.quants.hidden_state
            if shared_cell is None and shared_cell_state_quant:
                shared_cell = fwd.quants.cell_state
            layers.append(fwd)
            if bidirectional:
                shared_ih = ((fwd.w_ih, fwd.w_ih_quants)
                             if shared_input_hidden_weights else None)
                layers.append(_QuantLSTMLayer(
                    in_sz, hidden_size, reverse=True, shared_io=shared_io,
                    shared_cell_state=shared_cell,
                    shared_input_hidden=shared_ih, **kw))
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
                 shared_input_hidden_weights: bool = False,
                 rngs: nnx.Rngs):
        if shared_input_hidden_weights and not bidirectional:
            raise ValueError("Shared input-hidden weights requires "
                             "bidirectional=True.")
        self.bidirectional = bidirectional
        layers = []
        for i in range(num_layers):
            in_sz = input_size if i == 0 else hidden_size * (2 if bidirectional else 1)
            kw = dict(weight_quant=weight_quant, io_quant=io_quant,
                      gate_acc_quant=gate_acc_quant, act_fn=act_fn,
                      use_bias=use_bias, rngs=rngs)
            fwd = _QuantRNNLayer(in_sz, hidden_size, **kw)
            layers.append(fwd)
            if bidirectional:
                shared = ((fwd.w_ih, fwd.w_ih_quant)
                          if shared_input_hidden_weights else None)
                layers.append(_QuantRNNLayer(in_sz, hidden_size, reverse=True,
                                             shared_input_hidden=shared, **kw))
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
