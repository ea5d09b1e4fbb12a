"""Automatic export-item derivation from one traced forward.

Reference: ``src/brevitas/export/onnx/manager.py:66`` — the reference exports
ANY traced module because ``torch.onnx.export`` walks the call graph itself.
Here the analogue is :func:`brevitas_tpu.graph.autograph.trace_module_graph`
with ``per_call=True``: each module CALL becomes a node (the FX
``call_module`` analogue — a shared residual quantizer invoked three times
yields three nodes) and the functional glue between modules (relu, residual
adds, channel concats, flatten reshapes, functional pools, broadcasts) shows
up as jaxpr primitives.

:func:`derive_export_items` compiles that graph into the sequential
layer/glue item list ``export/qcdq.py:export_model`` consumes — the same
vocabulary the hand-authored ``export_layers()`` methods use (modules plus
``("relu",)/("save",n)/("load",n)/("add_saved",n)/("concat",ns)/("flatten",)/
("maxpool",k,s,p)`` …), so ResNet/DenseNet-style skip topologies no longer
need hand-written walks. Unknown primitives raise :class:`DeriveError` —
``export_model`` then falls back to ``export_layers()``/child order, keeping
exotic models exportable via the hand-authored override.
"""

from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["derive_export_items", "DeriveError"]


class DeriveError(ValueError):
    """The traced graph contains structure the deriver cannot map."""


_TRANSPARENT = {"convert_element_type", "stop_gradient", "copy",
                "squeeze", "expand_dims"}

_INPUT = object()  # sentinel emit-source for the model input tensor


class _Emit:
    """One scheduled export step: a module call or a glue op."""

    def __init__(self, kind: str, node=None, module=None, glue=None,
                 inputs=None, onnx_rank: int = 0):
        self.kind = kind      # 'module' | 'glue'
        self.node = node
        self.module = module
        self.glue = glue      # glue tuple WITHOUT save/load scheduling
        self.inputs: List = inputs or []   # _Emit | _INPUT, resolved sources
        self.onnx_rank = onnx_rank

    def __repr__(self):
        return (f"_Emit({type(self.module).__name__})" if self.module
                else f"_Emit{self.glue}")


def _lit(v):
    import jax.extend.core

    if isinstance(v, jax.extend.core.Literal):
        return np.asarray(v.val)
    return None


def _shape(v) -> Tuple[int, ...]:
    return tuple(getattr(v.aval, "shape", ()))


def derive_export_items(model, example_input, output_rank=None) -> list:
    """Derive the exporter's item list from one traced forward.

    ``output_rank`` (when known by the caller from a prior forward) is the
    rank of the model's actual output: a walk ending at rank 4 while the
    model returns rank 2 (a keepdims=False global mean as the final op,
    e.g. squeezenet's classifier mean) gets a trailing flatten so the ONNX
    output shape matches the model's."""
    import jax.numpy as jnp

    from brevitas_tpu.graph.autograph import trace_module_graph
    from brevitas_tpu.models.common import TensorNorm
    from brevitas_tpu.nn.linear import QuantLinear
    from brevitas_tpu.nn.misc import QuantUpsample

    g = trace_module_graph(model, jnp.asarray(example_input), per_call=True,
                           extra_classes=(QuantUpsample, TensorNorm))

    # ---- resolve each node's data source through transparent prims --------
    # g.nodes is in jaxpr eqn order = topological execution order.
    src_of: Dict[int, object] = {}   # id(node) -> _Emit | _INPUT
    emits: List[_Emit] = []
    absorbed: Dict[int, object] = {}  # prim nodes folded into an emit

    def resolve(node) -> object:
        """The emit (or _INPUT) whose output tensor this node carries."""
        if node is None:
            return _INPUT
        got = src_of.get(id(node))
        if got is None:
            raise DeriveError(f"unresolved producer {node}")
        return got

    def resolve_preds(node) -> List[object]:
        if not node.preds:
            return [_INPUT]
        return [resolve(p) for p in node.preds]

    def spatial_reduce_axes(eqn) -> bool:
        axes = tuple(eqn.params.get("axes", ()))
        rank = eqn.invars[0].aval.ndim
        return rank == 4 and set(axes) == {1, 2}

    for node in g.nodes:
        if node.kind == "module":
            # weight/state tensors are jaxpr invars (no producer) and never
            # create edges; module preds are data/metadata tensors. The DATA
            # input is the pred whose crossing tensor is largest — a
            # QuantTensor's scale flowing around a pool into a conv crosses
            # as a scalar and must not win over the pooled values
            # (edge_size recorded by trace_module_graph).
            if len(node.preds) > 1:
                data_pred = max(
                    node.preds,
                    key=lambda p: g.edge_size.get((id(p), id(node)), 0))
                ins = [resolve(data_pred)]
            else:
                ins = resolve_preds(node)
            rank_in = 4
            if ins and isinstance(ins[0], _Emit):
                rank_in = ins[0].onnx_rank
            elif ins and ins[0] is _INPUT:
                rank_in = len(np.asarray(example_input).shape)
            src = ins[0] if ins else _INPUT
            from flax import nnx as _nnx
            if isinstance(node.module, (QuantLinear, _nnx.Linear)):
                if rank_in == 4:
                    # the ONNX side still carries (B,C,1,1) (e.g. after GAP)
                    # while the jax side already flattened via an absorbed
                    # reshape — flatten before the matmul, as hand-authored
                    # lists do
                    fl = _Emit("glue", glue=("flatten",), inputs=[src],
                               onnx_rank=2)
                    emits.append(fl)
                    src = fl
                e = _Emit("module", node=node, module=node.module,
                          inputs=[src], onnx_rank=2)
            else:
                e = _Emit("module", node=node, module=node.module,
                          inputs=[src], onnx_rank=rank_in if rank_in else 4)
            src_of[id(node)] = e
            emits.append(e)
            continue

        prim = node.prim
        eqn = node.eqn
        if id(node) in absorbed:
            src_of[id(node)] = absorbed[id(node)]
            continue
        if prim in _TRANSPARENT:
            src_of[id(node)] = resolve_preds(node)[0]
            continue
        if eqn is not None and eqn.outvars and \
                getattr(eqn.outvars[0].aval, "ndim", None) == 0:
            # scalar METADATA computation (e.g. po2 restrict evaluating
            # 2**round(log2 s) on a frozen scale param, restrict.py) — not
            # on the data path; the consuming module's data-input selection
            # already prefers the largest crossing tensor, so just thread
            # the producer through
            src_of[id(node)] = resolve_preds(node)[0]
            continue
        if prim == "broadcast_in_dim":
            in_shape = _shape(eqn.invars[0])
            out_shape = _shape(eqn.outvars[0])
            src = resolve_preds(node)[0]
            if in_shape == out_shape or int(np.prod(in_shape)) == int(
                    np.prod(out_shape)):
                src_of[id(node)] = src
                continue
            if (len(in_shape) == 4 and len(out_shape) == 4
                    and in_shape[1] == in_shape[2] == 1
                    and in_shape[-1] == out_shape[-1]):
                # (B,1,1,C) -> (B,H,W,C): ASPP image-pool broadcast
                e = _Emit("glue", node=node,
                          glue=("expand_hw", out_shape[1], out_shape[2]),
                          inputs=[src], onnx_rank=4)
                src_of[id(node)] = e
                emits.append(e)
                continue
            raise DeriveError(f"unmapped broadcast {in_shape}->{out_shape}")
        if prim == "max":
            if any(lit is not None and np.all(lit == 0.0)
                   for lit in map(_lit, eqn.invars)):
                src = resolve_preds(node)[0]
                e = _Emit("glue", node=node, glue=("relu",), inputs=[src],
                          onnx_rank=src.onnx_rank if isinstance(src, _Emit)
                          else len(np.asarray(example_input).shape))
                src_of[id(node)] = e
                emits.append(e)
                continue
            raise DeriveError("max with non-zero operand")
        if prim == "min":
            # relu6 lowers as max(x, 0) -> min(., 6); fold the clip into the
            # preceding relu emit (exported as a single Clip(0, 6) node)
            lits = [lit for lit in map(_lit, eqn.invars)
                    if lit is not None and lit.size == 1]
            src = resolve_preds(node)[0]
            if (lits and float(lits[0]) == 6.0 and isinstance(src, _Emit)
                    and src.glue == ("relu",)):
                src.glue = ("relu6",)
                src_of[id(node)] = src
                continue
            raise DeriveError("unmapped min")
        if prim in ("mul", "div", "add", "add_any", "sub"):
            # elementwise op against a scalar literal: ("affine", mul, add)
            # glue (e.g. the bnn_pynq input prologue x -> 2x - 1,
            # models/fc.py:101); consecutive affines compose in place
            lits = [_lit(v) for v in eqn.invars]
            scalar = next((float(lv) for lv in lits
                           if lv is not None and lv.size == 1), None)
            if scalar is not None:
                if prim == "mul":
                    m_, a_ = scalar, 0.0
                elif prim == "div":
                    if lits[1] is None:
                        raise DeriveError("scalar / tensor")
                    m_, a_ = 1.0 / scalar, 0.0
                elif prim == "sub":
                    if lits[1] is None:
                        raise DeriveError("scalar - tensor")
                    m_, a_ = 1.0, -scalar
                else:
                    m_, a_ = 1.0, scalar
                src = resolve_preds(node)[0]
                if (isinstance(src, _Emit) and src.glue
                        and src.glue[0] == "affine"):
                    _, pm, pa = src.glue
                    src.glue = ("affine", m_ * pm, m_ * pa + a_)
                    src_of[id(node)] = src
                    continue
                rank = (src.onnx_rank if isinstance(src, _Emit)
                        else len(np.asarray(example_input).shape))
                e = _Emit("glue", node=node, glue=("affine", m_, a_),
                          inputs=[src], onnx_rank=rank)
                src_of[id(node)] = e
                emits.append(e)
                continue
        if prim == "sub":
            raise DeriveError("unmapped sub")
        if prim in ("add", "add_any"):
            shapes = [_shape(v) for v in eqn.invars]
            out_shape = _shape(eqn.outvars[0])
            if len(shapes) == 2 and shapes[0] == shapes[1] == out_shape \
                    and int(np.prod(out_shape)) > 1:
                ins = resolve_preds(node)
                if len(ins) == 1:
                    ins = ins * 2  # same producer on both operands
                e = _Emit("glue", node=node, glue=("residual_add",),
                          inputs=ins, onnx_rank=len(out_shape))
                src_of[id(node)] = e
                emits.append(e)
                continue
            raise DeriveError(f"unmapped add shapes {shapes}")
        if prim == "concatenate":
            dim = eqn.params.get("dimension")
            out_rank = eqn.outvars[0].aval.ndim
            if dim != out_rank - 1:
                raise DeriveError("non-channel concatenate")
            # operand ORDER matters; node.preds is dedup'd in edge order,
            # which matches invar order for distinct producers
            ins = resolve_preds(node)
            if len(ins) != len(eqn.invars):
                raise DeriveError("concat operands share a producer")
            e = _Emit("glue", node=node, glue=("concat_list",), inputs=ins,
                      onnx_rank=out_rank)
            src_of[id(node)] = e
            emits.append(e)
            continue
        if prim == "reshape":
            in_shape = _shape(eqn.invars[0])
            out_shape = _shape(eqn.outvars[0])
            src = resolve_preds(node)[0]
            src_rank = (src.onnx_rank if isinstance(src, _Emit)
                        else len(np.asarray(example_input).shape))
            if in_shape == out_shape:
                src_of[id(node)] = src
                continue
            if len(out_shape) == 2 and len(in_shape) == 4:
                if src_rank == 2:
                    # ONNX side is already flat (e.g. after GAP+flatten)
                    src_of[id(node)] = src
                    continue
                glue = ("flatten",) if in_shape[1] * in_shape[2] == 1 \
                    else ("flatten_hwc",)
                e = _Emit("glue", node=node, glue=glue, inputs=[src],
                          onnx_rank=2)
                src_of[id(node)] = e
                emits.append(e)
                continue
            if len(out_shape) == 4 and out_shape[1] == out_shape[2] == 1 \
                    and int(np.prod(in_shape)) == int(np.prod(out_shape)):
                # (B,C) -> (B,1,1,C): keepdims re-expansion
                if src_rank == 4:
                    src_of[id(node)] = src   # ONNX side is (B,C,1,1) already
                    continue
                e = _Emit("glue", node=node, glue=("unflatten2d",),
                          inputs=[src], onnx_rank=4)
                src_of[id(node)] = e
                emits.append(e)
                continue
            raise DeriveError(f"unmapped reshape {in_shape}->{out_shape}")
        if prim == "reduce_window_max":
            wd = eqn.params["window_dimensions"]
            ws = eqn.params["window_strides"]
            pad = eqn.params.get("padding", ())
            if len(wd) != 4 or wd[0] != 1 or wd[3] != 1:
                raise DeriveError(f"unmapped max window {wd}")
            same = any(p != (0, 0) for p in tuple(pad))
            e = _Emit("glue", node=node,
                      glue=("maxpool", int(wd[1]), int(ws[1]),
                            "SAME" if same else "VALID"),
                      inputs=resolve_preds(node)[:1], onnx_rank=4)
            src_of[id(node)] = e
            emits.append(e)
            continue
        if prim in ("reduce_window_sum", "reduce_window_add"):
            wd = eqn.params["window_dimensions"]
            ws = eqn.params["window_strides"]
            if len(wd) != 4 or wd[0] != 1 or wd[3] != 1:
                raise DeriveError(f"unmapped sum window {wd}")
            e = _Emit("glue", node=node, glue=("avgpool", int(wd[1]),
                                               int(ws[1])),
                      inputs=resolve_preds(node)[:1], onnx_rank=4)
            # the following scalar division (mean) folds into the pool
            _absorb_scalar_div(node, e, absorbed, float(wd[1] * wd[2]))
            src_of[id(node)] = e
            emits.append(e)
            continue
        if prim == "reduce_sum":
            if not spatial_reduce_axes(eqn):
                raise DeriveError("non-spatial reduce_sum")
            in_shape = _shape(eqn.invars[0])
            e = _Emit("glue", node=node, glue=("gap",),
                      inputs=resolve_preds(node)[:1], onnx_rank=4)
            _absorb_scalar_div(node, e, absorbed,
                               float(in_shape[1] * in_shape[2]))
            src_of[id(node)] = e
            emits.append(e)
            continue
        if prim in ("div", "mul"):
            # scalar rescale glue that was NOT a pool mean: unsupported
            raise DeriveError(f"unmapped {prim}")
        raise DeriveError(f"unmapped primitive {prim}")

    if not emits:
        raise DeriveError("traced graph produced no exportable steps")

    # emits are in eqn (execution) order, so emits[-1] produces the model
    # output; reconcile its ONNX rank with the model's true output rank
    if output_rank == 2 and emits[-1].onnx_rank == 4:
        emits.append(_Emit("glue", glue=("flatten",), inputs=[emits[-1]],
                           onnx_rank=2))

    # ---- schedule: sequential walk with save/load/add glue ----------------
    return _schedule(emits)


def _absorb_scalar_div(node, emit, absorbed, count: float):
    """Mark the division completing a windowed mean as part of the pool.

    The division may sit behind shape-only glue (``jnp.mean(keepdims=True)``
    lowers to reduce_sum → broadcast_in_dim → div), so walk through
    element-count-preserving prims to find it."""
    frontier = list(node.succs)
    seen = set()
    while frontier:
        succ = frontier.pop()
        if id(succ) in seen or succ.kind != "prim":
            continue
        seen.add(id(succ))
        if succ.prim in ("div", "mul"):
            lit = None
            for v in succ.eqn.invars:
                lv = _lit(v)
                if lv is not None and lv.size == 1:
                    lit = float(lv)
            if lit is not None:
                ok = (succ.prim == "div" and abs(lit - count) < 1e-4) or \
                     (succ.prim == "mul" and abs(lit * count - 1.0) < 1e-5)
                if ok:
                    absorbed[id(succ)] = emit
                    return
            continue
        if succ.prim in _TRANSPARENT or succ.prim in ("broadcast_in_dim",
                                                      "reshape"):
            in_n = int(np.prod(_shape(succ.eqn.invars[0])))
            out_n = int(np.prod(_shape(succ.eqn.outvars[0])))
            if in_n == out_n:
                frontier.extend(succ.succs)
    raise DeriveError("windowed mean without its scalar division")


def _schedule(emits: List[_Emit]) -> list:
    """Linearize the emit graph into the exporter's item vocabulary."""
    # which outputs must be saved: any value consumed by an emit other than
    # the one scheduled immediately after its producer
    sym: Dict[int, str] = {}

    def name_of(src) -> str:
        if src is _INPUT:
            return "g_input"
        s = sym.get(id(src))
        if s is None:
            s = f"t{len(sym)}"
            sym[id(src)] = s
        return s

    need_save = set()    # ids of emits (or _INPUT) whose output must be saved
    prev = _INPUT
    for e in emits:
        for src in e.inputs:
            if src is not prev or e.inputs.count(src) > 1:
                need_save.add(id(src) if src is not _INPUT else id(_INPUT))
        prev = e

    items: list = []
    if id(_INPUT) in need_save:
        items.append(("save", name_of(_INPUT)))
    prev = _INPUT
    for e in emits:
        main = e.inputs[0] if e.inputs else _INPUT
        if e.kind == "glue" and e.glue[0] == "residual_add":
            a, b = e.inputs
            if prev is b:
                main, other = b, a
            else:
                main, other = a, b
            if main is not prev:
                items.append(("load", name_of(main)))
            items.append(("add_saved", name_of(other)))
        elif e.kind == "glue" and e.glue[0] == "concat_list":
            names = []
            used_at = None
            for k, src in enumerate(e.inputs):
                if src is prev and used_at is None:
                    names.append("@")
                    used_at = k
                else:
                    names.append(name_of(src))
            if used_at is None:
                items.append(("load", names[0]))
                names[0] = "@"
            items.append(("concat", names))
        else:
            if main is not prev:
                items.append(("load", name_of(main)))
            if e.kind == "module":
                items.append(e.module)
            else:
                items.append(e.glue)
        if id(e) in need_save:
            items.append(("save", name_of(e)))
        prev = e
    return items
