"""Import trained reference (PyTorch Brevitas) checkpoints into brevitas_tpu.

The reference persists models as plain ``state_dict`` tensor maps
(``src/brevitas_examples/bnn_pynq/trainer.py:190-198`` saves
``{'state_dict': ..., 'epoch': ..., 'best_val_acc': ...}``). This module maps
those tensors onto a brevitas_tpu model so a reference user can migrate a
trained QAT/PTQ model without retraining.

Reference key layout (determined by the proxy module tree):

- WBIOL layers: ``<p>.weight`` / ``<p>.bias`` with torch layouts
  (Linear ``(O, I)``, ConvNd ``(O, I/g, *k)``, ConvTransposeNd
  ``(I, O/g, *k)``) — transposed here to our TPU layouts (Linear ``(I, O)``,
  conv HWIO ``(*k, I/g, O)``).
- Learned weight/zero-point/bit-width quantizer state:
  ``<p>.weight_quant.tensor_quant.scaling_impl.value`` (ParameterScaling,
  ``core/scaling/standalone.py:75`` — stored in the restrict domain, log2 for
  power-of-two, exactly like our ``_RestrictClamp.preprocess`` storage),
  ``...tensor_quant.pre_scaling_impl.value`` (decoupled),
  ``...tensor_quant.zero_point_impl.value`` (ParameterZeroPoint),
  ``...msb_clamp_bit_width_impl.bit_width_offset`` (learned bit width,
  ``core/bit_width/parameter.py:78``).
- Activation quantizers:
  ``<p>.act_quant.fused_activation_quant_proxy.tensor_quant.scaling_impl.*``
  (``proxy/runtime_quant.py:112``) with either ``value``
  (Parameter / ParameterFromRuntimeStats — the reference saves the stats
  buffer AS the value mid-collection, ``core/scaling/standalone.py:266-298``)
  or ``runtime_stats.running_stats`` (EMA buffer,
  ``core/stats/stats_wrapper.py:53``). WBIOL input/output quantizers use the
  same nesting under ``<p>.input_quant`` / ``<p>.output_quant``.
- Norms: ``running_mean`` / ``running_var`` / ``weight`` / ``bias``
  (torch BatchNorm and the bnn_pynq ``TensorNorm``,
  ``bnn_pynq/models/tensor_norm.py``).
- Recurrent stacks (``QuantLSTM``/``QuantRNN``): ``layers.<l>.<d>`` groups
  with per-gate ``<gate>_gate_params.{input,hidden}_weight.weight`` / ``bias``
  (``nn/quant_rnn.py:444-546``) map onto our packed ``w_ih (I, G*H)`` /
  ``w_hh (H, G*H)`` gate column blocks; ``io_quant`` / ``cell.*_quant``
  scaling state lands in the matching cell quantizer slots.

Matching strategy: reference keys are grouped by layer prefix and matched to
this model's importable modules **in definition order by kind** (parameter
layers / activations / norms). Faithful ports of the reference architectures
(models/fc.py, cnv.py, mobilenetv1.py, ...) define layers in the same order,
so order-matching needs no name map; pass ``pairs`` to pin any exceptions.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from flax import nnx

from brevitas_tpu.graph.base import named_modules

# proxy attribute names that split a reference key into (layer prefix, rest)
_PROXY_TOKENS = ("weight_quant", "bias_quant", "input_quant", "output_quant",
                 "act_quant")
_NORM_SUFFIXES = {"running_mean", "running_var", "num_batches_tracked"}
_ACT_SCALING = "fused_activation_quant_proxy.tensor_quant.scaling_impl"


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """``torch.load`` a reference checkpoint -> {key: np.ndarray}, unwrapping
    the trainer's ``{'state_dict': ...}`` envelope and DataParallel's
    ``module.`` prefix."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


_LSTM_MARKERS = ("input_gate_params", "forget_gate_params",
                 "cell_gate_params", "output_gate_params", "gate_params",
                 "io_quant", "cell")


def _recurrent_cut(parts: List[str]) -> Optional[int]:
    """Recurrent stacks nest as ``<name>.layers.<l>.<d>.<rest>``
    (reference QuantRecurrentStackBase, nn/quant_rnn.py:706): group
    everything under one (layer, direction) so the whole gate/quantizer
    bundle imports as a unit."""
    for i, p in enumerate(parts[:-3]):
        if (p == "layers" and parts[i + 1].isdigit()
                and parts[i + 2].isdigit()
                and parts[i + 3] in _LSTM_MARKERS):
            return i + 3
    return None


def _group_keys(sd: Dict[str, np.ndarray]) -> List[Tuple[str, Dict[str, np.ndarray]]]:
    """Group flat reference keys by owning-layer prefix, in first-appearance
    order. ``conv1.weight_quant.tensor_quant.scaling_impl.value`` and
    ``conv1.weight`` both land under prefix ``conv1``."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    order: List[str] = []
    for key, val in sd.items():
        parts = key.split(".")
        cut = _recurrent_cut(parts)
        if cut is None:
            for i, p in enumerate(parts):
                if p in _PROXY_TOKENS:
                    cut = i
                    break
        if cut is None:
            cut = len(parts) - 1  # plain parameter/buffer name
        prefix = ".".join(parts[:cut])
        rest = ".".join(parts[cut:])
        if prefix not in groups:
            groups[prefix] = {}
            order.append(prefix)
        groups[prefix][rest] = val
    return [(p, groups[p]) for p in order]


def _classify_group(g: Dict[str, np.ndarray]) -> str:
    if any("gate_params" in k for k in g):
        return "recurrent"
    if any(k in _NORM_SUFFIXES for k in g):
        return "norm"
    if "weight" in g or any(k.startswith(("weight_quant", "bias_quant"))
                            for k in g):
        return "param"
    if any(k.startswith("act_quant") for k in g):
        return "act"
    return "other"


def _classify_module(mod) -> Optional[str]:
    from brevitas_tpu.models.common import TensorNorm
    from brevitas_tpu.nn.activation import QuantNonLinearActLayer
    from brevitas_tpu.nn.misc import QuantEmbedding, ScaleBias
    from brevitas_tpu.nn.quant_layer import QuantWBIOL
    from brevitas_tpu.nn.rnn import _QuantLSTMLayer, _QuantRNNLayer

    if isinstance(mod, (QuantWBIOL, QuantEmbedding, ScaleBias,
                        nnx.Linear, nnx.Conv)):
        return "param"  # plain float heads import their weights too
    if isinstance(mod, (_QuantLSTMLayer, _QuantRNNLayer)):
        return "recurrent"
    if isinstance(mod, QuantNonLinearActLayer):
        return "act"
    if isinstance(mod, (nnx.BatchNorm, TensorNorm)):
        return "norm"
    return None


def _weight_to_tpu(mod, w: np.ndarray) -> np.ndarray:
    """Torch parameter layout -> our layout (see module docstring)."""
    from brevitas_tpu.nn.conv import _QuantConvNd
    from brevitas_tpu.nn.misc import QuantEmbedding, QuantScaleBias, ScaleBias

    if isinstance(mod, (QuantEmbedding, ScaleBias, QuantScaleBias)):
        return w  # identical layouts
    if isinstance(mod, _QuantConvNd):
        spatial = list(range(2, w.ndim))
        if mod.transposed:
            return w.transpose(*spatial, 0, 1)   # (I, O, *k) -> (*k, I, O)
        return w.transpose(*spatial, 1, 0)       # (O, I, *k) -> (*k, I, O)
    if w.ndim == 2:
        return w.T                               # Linear (O, I) -> (I, O)
    return w


def _assign_scaling(scaling_mod, torch_scaling: Dict[str, np.ndarray],
                    report: "ImportReport", path: str) -> None:
    """Copy reference scaling state onto one of our scaling modules.

    Both sides store learned values in the restrict-preprocessed domain
    (identity for float scaling, log2 for log/po2), so values copy through
    directly; only the broadcast shape differs (reference per-channel
    ``(O, 1, ...)`` vs our channels-last ``(1, ..., O)``)."""
    value = torch_scaling.get("value")
    stats = torch_scaling.get("runtime_stats.running_stats")

    def fit(src, dst_shape):
        src = np.asarray(src, np.float32).reshape(-1)
        if int(np.prod(dst_shape)) != src.size:
            raise ValueError(
                f"{path}: scaling size {src.size} != target {dst_shape}")
        return src.reshape(dst_shape)

    if value is not None and hasattr(scaling_mod, "value"):
        scaling_mod.value[...] = fit(value, scaling_mod.value[...].shape)
        # a loaded trained value means stats collection is over: fast-forward
        # the two-phase counter past the handoff (the reference disables
        # collection the same way on load, core/scaling/standalone.py:283-298)
        if hasattr(scaling_mod, "counter") and hasattr(scaling_mod, "steps"):
            scaling_mod.counter[...] = np.int32(scaling_mod.steps + 1)
        report.loaded.append(f"{path}.scaling.value")
    elif stats is not None and hasattr(scaling_mod, "buffer"):
        scaling_mod.buffer[...] = fit(stats, scaling_mod.buffer[...].shape)
        if hasattr(scaling_mod, "counter"):
            scaling_mod.counter[...] = np.int32(1)
        report.loaded.append(f"{path}.scaling.buffer")
    elif value is not None or stats is not None:
        report.skipped.append(
            f"{path}: checkpoint has scaling state but module "
            f"{type(scaling_mod).__name__} holds none")


def _assign_quantizer_extras(q, g: Dict[str, np.ndarray], proxy: str,
                             report: "ImportReport", path: str) -> None:
    """Zero-point / learned-bit-width / decoupled pre-scale state."""
    zp = g.get(f"{proxy}.tensor_quant.zero_point_impl.value")
    if zp is not None:
        zpm = getattr(q, "zero_point", None)
        if zpm is not None and hasattr(zpm, "value"):
            zpm.value[...] = np.asarray(zp, np.float32).reshape(
                zpm.value[...].shape)
            report.loaded.append(f"{path}.zero_point.value")
        else:
            report.skipped.append(f"{path}: zero-point value unmatched")
    bwo = g.get(f"{proxy}.tensor_quant.msb_clamp_bit_width_impl."
                f"bit_width_offset")
    if bwo is not None:
        bwm = getattr(q, "bit_width_impl", None)
        if bwm is not None and hasattr(bwm, "offset"):
            bwm.offset[...] = np.float32(bwo)
            report.loaded.append(f"{path}.bit_width.offset")
        else:
            report.skipped.append(f"{path}: learned bit-width unmatched")
    pre = g.get(f"{proxy}.tensor_quant.pre_scaling_impl.value")
    if pre is not None:
        ps = getattr(q, "pre_scaling", None)
        if ps is not None and hasattr(ps, "value"):
            ps.value[...] = np.asarray(pre, np.float32).reshape(
                ps.value[...].shape)
            report.loaded.append(f"{path}.pre_scaling.value")
        else:
            report.skipped.append(f"{path}: decoupled pre-scale unmatched")


def _sub_scaling(g: Dict[str, np.ndarray], proxy: str,
                 act: bool) -> Dict[str, np.ndarray]:
    base = (f"{proxy}.{_ACT_SCALING}." if act
            else f"{proxy}.tensor_quant.scaling_impl.")
    return {k[len(base):]: v for k, v in g.items() if k.startswith(base)}


def _scaling_state_equal(a: Dict[str, np.ndarray],
                         b: Dict[str, np.ndarray]) -> bool:
    if a.keys() != b.keys():
        return False
    return all(np.allclose(np.asarray(a[k], np.float32),
                           np.asarray(b[k], np.float32)) for k in a)


def _import_param_layer(mod, g, report, path):
    from brevitas_tpu.quant.quantizers import ActQuantizer

    if isinstance(mod, (nnx.Linear, nnx.Conv)):  # plain float module
        w = g.get("weight")
        if w is not None:
            tw = np.asarray(w, np.float32)
            tw = (tw.T if tw.ndim == 2 else
                  tw.transpose(*range(2, tw.ndim), 1, 0))
            if tw.shape != mod.kernel[...].shape:
                raise ValueError(
                    f"{path}: weight {tw.shape} != {mod.kernel[...].shape} "
                    f"after layout transform")
            mod.kernel[...] = tw
            report.loaded.append(f"{path}.kernel")
        b = g.get("bias")
        if b is not None and mod.bias is not None:
            mod.bias[...] = np.asarray(b, np.float32).reshape(
                mod.bias[...].shape)
            report.loaded.append(f"{path}.bias")
        return

    w = g.get("weight")
    if w is not None:
        tw = _weight_to_tpu(mod, np.asarray(w, np.float32))
        if tw.shape != mod.weight[...].shape:
            raise ValueError(f"{path}: weight {tw.shape} != "
                             f"{mod.weight[...].shape} after layout transform")
        mod.weight[...] = tw
        report.loaded.append(f"{path}.weight")
    b = g.get("bias")
    if b is not None and getattr(mod, "bias", None) is not None:
        mod.bias[...] = np.asarray(b, np.float32).reshape(
            mod.bias[...].shape)
        report.loaded.append(f"{path}.bias")
    elif b is not None:
        report.skipped.append(f"{path}: checkpoint bias but layer has none")

    wq = getattr(mod, "weight_quant", None)
    if wq is not None:
        ws = _sub_scaling(g, "weight_quant", act=False)
        if ws and hasattr(wq, "scaling"):
            _assign_scaling(wq.scaling, ws, report, f"{path}.weight_quant")
        _assign_quantizer_extras(wq, g, "weight_quant", report,
                                 f"{path}.weight_quant")
    for proxy in ("input_quant", "output_quant"):
        q = getattr(mod, proxy, None)
        if isinstance(q, ActQuantizer):
            s = _sub_scaling(g, proxy, act=True)
            if s and hasattr(q, "scaling"):
                _assign_scaling(q.scaling, s, report, f"{path}.{proxy}")
            _assign_quantizer_extras(
                q, {k.replace(f"{proxy}.fused_activation_quant_proxy.",
                              f"{proxy}."): v for k, v in g.items()},
                proxy, report, f"{path}.{proxy}")


def _import_act_layer(mod, g, report, path):
    s = _sub_scaling(g, "act_quant", act=True)
    if s and hasattr(mod.act_quant, "scaling"):
        _assign_scaling(mod.act_quant.scaling, s, report,
                        f"{path}.act_quant")
    _assign_quantizer_extras(
        mod.act_quant,
        {k.replace("act_quant.fused_activation_quant_proxy.",
                   "act_quant."): v for k, v in g.items()},
        "act_quant", report, f"{path}.act_quant")


def _import_norm(mod, g, report, path):
    from brevitas_tpu.models.common import TensorNorm

    if isinstance(mod, TensorNorm):
        pairs = [("weight", mod.weight), ("bias", mod.bias),
                 ("running_mean", mod.running_mean),
                 ("running_var", mod.running_var)]
    else:  # nnx.BatchNorm
        pairs = [("weight", mod.scale), ("bias", mod.bias),
                 ("running_mean", mod.mean), ("running_var", mod.var)]
    for key, target in pairs:
        v = g.get(key)
        if v is not None and target is not None:
            target[...] = np.asarray(v, np.float32).reshape(
                target[...].shape)
            report.loaded.append(f"{path}.{key}")


_LSTM_GATES = ("input", "forget", "cell", "output")


def _assign_act_scaling_from(g, ref_name, targets, report, path):
    base = f"{ref_name}.{_ACT_SCALING}."
    sub = {k[len(base):]: v for k, v in g.items() if k.startswith(base)}
    if not sub:
        return
    for q in targets:
        if q is not None and hasattr(q, "scaling"):
            _assign_scaling(q.scaling, sub, report, f"{path}.{ref_name}")


def _import_recurrent_layer(mod, g, report, path):
    """One reference recurrent direction (``layers.<l>.<d>``,
    nn/quant_rnn.py:304/444) onto our ``_QuantLSTMLayer``/``_QuantRNNLayer``.

    The reference keeps one ``GateParams`` per gate with separate
    ``input_weight``/``hidden_weight`` ``(H, in)`` matrices; ours pack the
    gates into ``w_ih (I, G*H)`` / ``w_hh (H, G*H)`` column blocks in
    (i, f, g, o) order (i, g, o under CIFG — the reference omits the forget
    gate's params the same way). Activation-quantizer scaling state maps by
    cell-slot name; the reference's ``cell.output_quant`` is the same object
    as the outer ``io_quant``, which here covers both ``input_quant`` and
    the ``hidden_state`` quantizer."""
    from brevitas_tpu.nn.rnn import _QuantLSTMLayer

    H = mod.hidden_size
    is_lstm = isinstance(mod, _QuantLSTMLayer)

    if is_lstm:
        gates = (("input", "cell", "output") if mod.cifg else _LSTM_GATES)
        gate_prefix = {name: f"{name}_gate_params" for name in gates}
        w_ih_quants, w_hh_quants = mod.w_ih_quants, mod.w_hh_quants
    else:
        gates = ("gate",)
        gate_prefix = {"gate": "gate_params"}
        w_ih_quants = [mod.w_ih_quant]
        w_hh_quants = [mod.w_hh_quant]

    w_ih = np.array(mod.w_ih[...])
    w_hh = np.array(mod.w_hh[...])
    bias = np.array(mod.bias[...]) if mod.bias is not None else None
    shared_scaling_seen: Dict[str, Dict[str, np.ndarray]] = {}
    for slot, name in enumerate(gates):
        p = gate_prefix[name]
        iw = g.get(f"{p}.input_weight.weight")
        hw = g.get(f"{p}.hidden_weight.weight")
        b = g.get(f"{p}.bias")
        sl = slice(slot * H, (slot + 1) * H)
        if iw is not None:
            w_ih[:, sl] = np.asarray(iw, np.float32).T
            report.loaded.append(f"{path}.w_ih[{name}]")
        if hw is not None:
            w_hh[:, sl] = np.asarray(hw, np.float32).T
            report.loaded.append(f"{path}.w_hh[{name}]")
        if b is not None and bias is not None:
            bias[sl] = np.asarray(b, np.float32)
            report.loaded.append(f"{path}.bias[{name}]")
        elif b is not None:
            report.skipped.append(f"{path}: checkpoint {p}.bias but "
                                  f"layer has none")
        # learned weight-quant scaling (ParameterScaling checkpoints), per
        # gate weight; stats-scaling configs persist nothing here
        for wk, quants in (("input_weight", w_ih_quants),
                           ("hidden_weight", w_hh_quants)):
            base = (f"{p}.{wk}.weight_quant.tensor_quant.scaling_impl.")
            sub = {k[len(base):]: v
                   for k, v in g.items() if k.startswith(base)}
            if sub:
                if len(quants) == 1:
                    # shared quantizer: first gate's scaling wins EXPLICITLY;
                    # later gates with different checkpoint values are a
                    # fidelity loss that must show up in the report
                    prev = shared_scaling_seen.get(wk)
                    if prev is None:
                        shared_scaling_seen[wk] = sub
                        if hasattr(quants[0], "scaling"):
                            _assign_scaling(quants[0].scaling, sub, report,
                                            f"{path}.{name}.{wk}")
                    elif not _scaling_state_equal(prev, sub):
                        report.skipped.append(
                            f"{path}.{name}.{wk}: checkpoint carries a "
                            f"distinct per-gate scaling but this layer "
                            f"shares one weight quantizer (first gate wins)")
                    continue
                q = quants[slot]
                if hasattr(q, "scaling"):
                    _assign_scaling(q.scaling, sub, report,
                                    f"{path}.{name}.{wk}")
    mod.w_ih[...] = w_ih
    mod.w_hh[...] = w_hh
    if bias is not None:
        mod.bias[...] = bias

    if is_lstm:
        q = mod.quants
        act_map = {
            "io_quant": (mod.input_quant, q.hidden_state),
            "cell.output_quant": (q.hidden_state,),
            "cell.input_acc_quant": (q.gate_acc,),
            "cell.forget_acc_quant": (q.forget_acc,),
            "cell.cell_acc_quant": (q.cell_acc,),
            "cell.output_acc_quant": (q.out_acc,),
            "cell.input_sigmoid_quant": (q.in_sigmoid,),
            "cell.forget_sigmoid_quant": (q.forget_sigmoid,),
            "cell.cell_tanh_quant": (q.cell_tanh,),
            "cell.output_sigmoid_quant": (q.out_sigmoid,),
            "cell.hidden_state_tanh_quant": (q.hidden_tanh,),
            "cell.cell_state_quant": (q.cell_state,),
        }
    else:
        act_map = {
            "io_quant": (mod.input_quant, mod.out_quant),
            "cell.output_quant": (mod.out_quant,),
            "cell.gate_acc_quant": (mod.gate_acc_quant,),
        }
    for ref_name, targets in act_map.items():
        _assign_act_scaling_from(g, ref_name, targets, report, path)


@dataclass
class ImportReport:
    loaded: List[str] = field(default_factory=list)
    skipped: List[str] = field(default_factory=list)
    unmatched_torch: List[str] = field(default_factory=list)
    unmatched_ours: List[str] = field(default_factory=list)

    def __str__(self):
        return (f"imported {len(self.loaded)} tensors, "
                f"{len(self.skipped)} skipped, "
                f"{len(self.unmatched_torch)} torch groups / "
                f"{len(self.unmatched_ours)} modules unmatched")


def import_torch_state_dict(model: nnx.Module, sd: Dict[str, np.ndarray],
                            pairs: Optional[Sequence[Tuple[str, str]]] = None,
                            strict: bool = True) -> ImportReport:
    """Load a reference Brevitas ``state_dict`` into ``model``.

    ``pairs`` optionally pins ``(our_module_path, torch_prefix)`` matches;
    everything else matches in definition order by kind. ``strict`` raises if
    any weight-bearing torch group finds no module (quantizer-state-only
    mismatches are reported, not fatal)."""
    report = ImportReport()
    groups = _group_keys(sd)
    pinned = dict(pairs or ())
    by_prefix = dict(groups)

    ours = [(path, mod, kind)
            for path, mod in named_modules(model)
            if (kind := _classify_module(mod)) is not None]
    used_prefix = set()
    used_path = set()

    # pinned matches first
    importers = {"param": _import_param_layer, "act": _import_act_layer,
                 "norm": _import_norm, "recurrent": _import_recurrent_layer}
    for path, mod, kind in ours:
        if path in pinned:
            prefix = pinned[path]
            if prefix not in by_prefix:
                raise KeyError(f"pinned torch prefix {prefix!r} not in "
                               f"checkpoint")
            importers[kind](mod, by_prefix[prefix], report, path)
            used_prefix.add(prefix)
            used_path.add(path)

    # then order-by-kind
    remaining_groups = [(p, g, _classify_group(g)) for p, g in groups
                        if p not in used_prefix]
    for kind in ("param", "act", "norm", "recurrent"):
        gs = [(p, g) for p, g, k in remaining_groups if k == kind]
        ms = [(path, mod) for path, mod, k in ours
              if k == kind and path not in used_path]
        if kind == "param":
            # a float module with no checkpoint counterpart (e.g. an extra
            # plain head) must not shift the zip for every later layer: on a
            # shape mismatch, skip the module and retry the same group
            # against the next one. _import_param_layer shape-checks before
            # mutating, so a failed attempt leaves the module untouched.
            gi = mi = 0
            while gi < len(gs) and mi < len(ms):
                prefix, g = gs[gi]
                path, mod = ms[mi]
                try:
                    importers[kind](mod, g, report, path)
                except ValueError as e:
                    report.skipped.append(
                        f"{path}: {e} — skipping module, retrying group "
                        f"{prefix!r} against the next param module")
                    mi += 1
                    continue
                used_prefix.add(prefix)
                used_path.add(path)
                gi += 1
                mi += 1
            for prefix, _g in gs[gi:]:
                report.unmatched_torch.append(prefix)
            for path, _m in ms[mi:]:
                report.unmatched_ours.append(path)
            continue
        for (prefix, g), (path, mod) in zip(gs, ms):
            importers[kind](mod, g, report, path)
            used_prefix.add(prefix)
            used_path.add(path)
        for prefix, _g in gs[len(ms):]:
            report.unmatched_torch.append(prefix)
        for path, _m in ms[len(gs):]:
            report.unmatched_ours.append(path)

    if strict:
        fatal = [p for p in report.unmatched_torch
                 if any(k == "weight" or k.endswith(".weight")
                        for k in by_prefix.get(p, {}))]
        if fatal:
            raise ValueError(f"unmatched torch layers with weights: {fatal}; "
                             f"pass pairs=[...] to pin them")
    return report
