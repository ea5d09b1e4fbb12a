"""Automatic module-graph discovery from one traced forward.

Reference: ``src/brevitas/graph/equalize.py:185-234`` (``walk_region`` /
``_extract_regions`` over a torch.fx graph) and the FX tracing that feeds
``MergeBatchNorm.match_node`` (graph/fixed_point.py:89) and
``preprocess_flexml`` (graph/target/flexml.py:381).

The TPU-native mechanism: there is no FX, but ``jax.make_jaxpr`` of one
forward IS the dataflow graph. Every registered leaf module's ``__call__``
is wrapped in a ``jax.named_scope`` tag during tracing, so each jaxpr
equation carries the path of the module that emitted it in its name stack.
Grouping equations by that tag and following the jaxpr's def-use chains
yields a module-level dataflow graph — the exact analogue of the reference's
traced GraphModule — with inline functional glue (``jax.nn.relu``,
``nnx.max_pool``, reshapes, residual adds, concats) visible as primitive
nodes between modules.

On top of that graph, this module reimplements the reference's algorithms:

- :func:`find_bn_pairs` — conv/linear whose (sole) consumer is a BatchNorm.
- :func:`extract_regions` — cross-layer-equalization regions via the
  reference's ``walk_region`` rules (scale-invariant ops pass through,
  residual adds walk both directions, reshapes keep direction).

State safety: tracing runs on a split/merged copy of the model, so stat
mutations during the traced forward never leak tracers into live state.
"""

import contextlib
import contextvars
import itertools
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.extend.core
import jax.numpy as jnp
import numpy as np
from flax import nnx

__all__ = ["trace_module_graph", "find_bn_pairs", "extract_regions",
           "extract_act_equalization_regions", "ModuleGraph", "GraphNode"]

_SCOPE_PREFIX = "btmod"

_REGISTRY: contextvars.ContextVar = contextvars.ContextVar(
    "brevitas_tpu_trace_registry", default=None)


# ---------------------------------------------------------------------------
# module classes that become graph nodes
# ---------------------------------------------------------------------------


def _node_classes():
    from brevitas_tpu.nn.activation import QuantNonLinearActLayer
    from brevitas_tpu.nn.conv import _QuantConvNd
    from brevitas_tpu.nn.linear import QuantLinear
    from brevitas_tpu.nn.misc import FoldedBatchNorm, QuantDropout, QuantScaleBias
    from brevitas_tpu.nn.pool import QuantAvgPool2d, QuantMaxPool2d

    return (nnx.Linear, nnx.Conv, nnx.ConvTranspose, nnx.BatchNorm,
            nnx.LayerNorm, nnx.RMSNorm, nnx.Dropout, QuantLinear,
            _QuantConvNd, QuantNonLinearActLayer, QuantScaleBias,
            FoldedBatchNorm, QuantDropout, QuantAvgPool2d, QuantMaxPool2d)


def _is_supported(mod) -> bool:
    """Equalization source/sink kinds (reference _supported_layers +
    _get_input_axis, equalize.py:23,87-104): linears, non-grouped convs, and
    depthwise convs (groups == out_channels — channel i maps to channel i,
    so equalization scales pass straight through)."""
    from brevitas_tpu.nn.conv import _QuantConvNd
    from brevitas_tpu.nn.linear import QuantLinear

    if isinstance(mod, (nnx.Linear, QuantLinear)):
        return True
    if isinstance(mod, (nnx.Conv, nnx.ConvTranspose, _QuantConvNd)):
        groups = getattr(mod, "groups", None)
        if groups is None:
            groups = getattr(mod, "feature_group_count", 1)
        if groups == 1:
            return True
        w = mod.weight[...] if hasattr(mod, "weight") else mod.kernel[...]
        return groups == w.shape[-1] and w.shape[-2] == 1
    return False


def _is_scale_invariant_module(mod) -> bool:
    """Reference _scale_invariant_layers (equalize.py:31): dropout, ReLU,
    max/avg pools. Quant variants only when their act quant is disabled
    (a quantizer's clamp grid is not scale-invariant)."""
    from brevitas_tpu.nn import QuantReLU
    from brevitas_tpu.nn.misc import FoldedBatchNorm, QuantDropout
    from brevitas_tpu.nn.pool import QuantAvgPool2d, QuantMaxPool2d
    from brevitas_tpu.quant.config import QuantType

    if isinstance(mod, (nnx.Dropout, QuantDropout, FoldedBatchNorm)):
        return True
    if isinstance(mod, (QuantMaxPool2d, QuantAvgPool2d)):
        return True
    if isinstance(mod, QuantReLU):
        return mod.act_quant.quant_type == QuantType.NONE
    return False


def _is_batchnorm(mod) -> bool:
    return isinstance(mod, nnx.BatchNorm)


# ---------------------------------------------------------------------------
# instrumented tracing
# ---------------------------------------------------------------------------


@contextlib.contextmanager
def _patched(classes):
    originals = {}

    def make_wrapper(orig):
        def wrapper(self, *args, **kwargs):
            reg = _REGISTRY.get()
            if reg is None:
                return orig(self, *args, **kwargs)
            tag = reg.get(id(self))
            if tag is None:
                return orig(self, *args, **kwargs)
            if reg.get("__per_call__"):
                counts = reg["__counts__"]
                n = counts.get(tag, 0)
                counts[tag] = n + 1
                tag = f"{tag}c{n}"
            with jax.named_scope(tag):
                return orig(self, *args, **kwargs)

        wrapper.__brevitas_tpu_trace__ = True
        wrapper.__wrapped__ = orig
        return wrapper

    for cls in classes:
        # patch the MRO class that actually defines __call__: concrete
        # layers (QuantConv2d, QuantConv1d, ...) inherit it from a shared
        # base, and patching only cls.__dict__ would miss them entirely
        owner = next((c for c in cls.__mro__ if "__call__" in c.__dict__),
                     None)
        if owner is None or owner in originals:
            continue
        call = owner.__dict__["__call__"]
        if getattr(call, "__brevitas_tpu_trace__", False):
            continue
        originals[owner] = call
        owner.__call__ = make_wrapper(call)
    try:
        yield
    finally:
        for cls, call in originals.items():
            cls.__call__ = call


class GraphNode:
    """One node of the module-level dataflow graph."""

    def __init__(self, kind: str, path: Optional[str] = None,
                 module=None, prim: Optional[str] = None, eqn=None,
                 call_index: int = 0):
        self.kind = kind          # 'module' | 'prim'
        self.path = path
        self.module = module
        self.prim = prim
        self.eqn = eqn
        self.call_index = call_index  # nth call of this module (per_call)
        self.out_shape: Optional[Tuple[int, ...]] = None
        self.preds: List["GraphNode"] = []
        self.succs: List["GraphNode"] = []

    def __repr__(self):
        return (f"GraphNode(module {self.path})" if self.kind == "module"
                else f"GraphNode(prim {self.prim})")


class ModuleGraph:
    def __init__(self, nodes: List[GraphNode],
                 modules: Dict[str, GraphNode],
                 edge_size: Optional[Dict[Tuple[int, int], int]] = None):
        self.nodes = nodes
        self.modules = modules  # path → node
        # (id(src), id(dst)) → max element count crossing that edge; lets
        # consumers distinguish the DATA edge from metadata edges (a
        # QuantTensor's scale flowing from a quantizer through a pool into
        # a conv crosses as a scalar; the pooled values cross as (B,H,W,C))
        self.edge_size = edge_size or {}

    def successors(self, node: GraphNode) -> List[GraphNode]:
        return node.succs

    def predecessors(self, node: GraphNode) -> List[GraphNode]:
        return node.preds


_INNER_JAXPR_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _inner_jaxpr(eqn):
    for key in _INNER_JAXPR_PARAMS:
        inner = eqn.params.get(key)
        if inner is not None:
            return inner.jaxpr if hasattr(inner, "jaxpr") else inner
    return None


_CALL_RE = None  # compiled lazily


def trace_module_graph(model: nnx.Module, sample_input, *,
                       per_call: bool = False,
                       extra_classes: Tuple[type, ...] = (),
                       ) -> ModuleGraph:
    """Trace one forward and return the module-level dataflow graph.

    ``per_call=True`` makes each CALL of a module its own node (the analogue
    of the reference FX graph's call_module nodes — a shared quantizer
    invoked three times yields three nodes) instead of merging all of a
    module's eqns into one node. Required by the export derivation
    (export/derive.py); region/BN discovery uses the merged default."""
    import re

    from brevitas_tpu.graph.base import named_modules

    global _CALL_RE
    if _CALL_RE is None:
        _CALL_RE = re.compile(rf"^({_SCOPE_PREFIX}\d+_)c(\d+)$")

    classes = _node_classes() + tuple(extra_classes)
    # leaf policy: deepest registered module wins — a QuantLinear's inner
    # quantizer modules are not registered classes, so the innermost
    # registered scope on an eqn is the layer itself
    paths: Dict[str, nnx.Module] = {}
    for path, mod in named_modules(model):
        if isinstance(mod, classes) and path:
            paths[path] = mod

    tags = {path: f"{_SCOPE_PREFIX}{i}_" for i, path in enumerate(paths)}
    tag_to_path = {t: p for p, t in tags.items()}

    graphdef, state = nnx.split(model)

    def fwd(state, x):
        merged = nnx.merge(graphdef, state)
        registry = {"__per_call__": per_call, "__counts__": {}}
        for path, mod in named_modules(merged):
            if path in tags:
                registry[id(mod)] = tags[path]
        token = _REGISTRY.set(registry)
        try:
            return merged(x)
        finally:
            _REGISTRY.reset(token)

    with _patched(set(type(m) for m in paths.values())):
        closed = jax.make_jaxpr(fwd)(state, jnp.asarray(sample_input))

    # -- flatten eqns (inlining pjit/custom_jvp/vjp bodies) -----------------
    counter = itertools.count()
    flat = []  # (prim_name, in_ids, out_ids, scope_tag_or_None, eqn)

    def vid(v, env):
        if isinstance(v, jax.extend.core.Literal):
            return None
        key = id(v)
        if key not in env:
            env[key] = next(counter)
        return env[key]

    def scope_of(eqn):
        """Innermost registered scope: the base tag, or (per_call) the
        ``(base_tag, call_index)`` pair parsed from the suffixed tag."""
        stack = str(eqn.source_info.name_stack)
        best = None
        for part in stack.split("/"):
            if per_call:
                m = _CALL_RE.match(part)
                if m and m.group(1) in tag_to_path:
                    best = (m.group(1), int(m.group(2)))
            elif part in tag_to_path:
                best = (part, 0)
        return best

    def walk(jaxpr, env, inherited: Optional[str] = None):
        for eqn in jaxpr.eqns:
            inner = _inner_jaxpr(eqn)
            if inner is not None:
                ienv = dict(env)
                for iv, ov in zip(inner.invars, eqn.invars):
                    if not isinstance(ov, jax.extend.core.Literal):
                        ienv[id(iv)] = vid(ov, env)
                # inner eqns of custom_vjp/pjit bodies may drop the caller's
                # name stack — inherit the call eqn's scope so ops inside a
                # module's custom-VJP conv/matmul stay attributed to it
                walk(inner, ienv, scope_of(eqn) or inherited)
                for outer_ov, inner_ov in zip(eqn.outvars, inner.outvars):
                    env[id(outer_ov)] = vid(inner_ov, ienv)
                continue
            ins = [vid(v, env) for v in eqn.invars]
            outs = [vid(v, env) for v in eqn.outvars]
            flat.append((eqn.primitive.name, ins, outs,
                         scope_of(eqn) or inherited, eqn))

    env: Dict[int, int] = {}
    walk(closed.jaxpr, env)

    # -- group into nodes ---------------------------------------------------
    call_nodes: Dict[Tuple[str, int], GraphNode] = {}
    producer: Dict[int, GraphNode] = {}
    nodes: List[GraphNode] = []

    def module_node(scope: Tuple[str, int]) -> GraphNode:
        tag, idx = scope
        path = tag_to_path[tag]
        node = call_nodes.get((path, idx))
        if node is None:
            node = GraphNode("module", path=path, module=paths[path],
                             call_index=idx)
            call_nodes[(path, idx)] = node
            nodes.append(node)
        return node

    eqn_owner: List[Tuple[GraphNode, List[Optional[int]], List[int]]] = []
    for prim, ins, outs, tag, eqn in flat:
        if tag is not None:
            node = module_node(tag)
        else:
            node = GraphNode("prim", prim=prim, eqn=eqn)
            nodes.append(node)
        if eqn.outvars:
            # a module node's out_shape ends up as its LAST eqn's output —
            # the tensor that leaves the module (used by cost reports)
            node.out_shape = tuple(eqn.outvars[0].aval.shape)
        sizes = [int(np.prod(getattr(v.aval, "shape", ()) or (1,)))
                 for v in eqn.invars]
        eqn_owner.append((node, ins, sizes))
        for o in outs:
            if o is not None:
                producer[o] = node

    seen_edges: Set[Tuple[int, int]] = set()
    edge_size: Dict[Tuple[int, int], int] = {}
    for node, ins, sizes in eqn_owner:
        for i, sz in zip(ins, sizes):
            src = producer.get(i) if i is not None else None
            if src is None or src is node:
                continue
            key = (id(src), id(node))
            edge_size[key] = max(edge_size.get(key, 0), sz)
            if key in seen_edges:
                continue
            seen_edges.add(key)
            src.succs.append(node)
            node.preds.append(src)

    module_nodes = {path: node for (path, idx), node in call_nodes.items()
                    if idx == 0}
    return ModuleGraph(nodes, module_nodes, edge_size)


# ---------------------------------------------------------------------------
# primitive classification (the functional-glue analogue of the reference's
# _scale_invariant_layers / _residual_fns / _is_reshaping_op tables)
# ---------------------------------------------------------------------------

_RESHAPING_PRIMS = {
    "reshape", "squeeze", "expand_dims", "transpose", "convert_element_type",
    "stop_gradient", "copy", "slice",
}

_INVARIANT_PRIMS = {
    # channelwise-linear / monotone spatial ops
    "reduce_window_max", "reduce_window_sum", "pad", "rev",
}


def _literal_value(v):
    if isinstance(v, jax.extend.core.Literal):
        return np.asarray(v.val)
    return None


def _classify_prim(node: GraphNode) -> str:
    """'reshaping' | 'invariant' | 'residual' | 'stop'."""
    prim = node.prim
    eqn = node.eqn
    if prim in _RESHAPING_PRIMS:
        return "reshaping"
    if prim in _INVARIANT_PRIMS:
        return "invariant"
    if prim == "broadcast_in_dim":
        return "reshaping"
    if prim == "max":
        # relu lowers to max(x, 0) — scale-invariant for s > 0; max with any
        # other constant (or two data operands) is not
        for v in eqn.invars:
            lit = _literal_value(v)
            if lit is not None and np.all(lit == 0.0):
                return "invariant"
        return "stop"
    if prim in ("mul", "div"):
        # scaling by a positive scalar constant (avg-pool mean, dropout
        # rescale) is scale-invariant; anything else is not provable here
        for v in eqn.invars:
            lit = _literal_value(v)
            if lit is not None and lit.size == 1 and float(lit) > 0:
                return "invariant"
        return "stop"
    if prim in ("reduce_sum", "reduce_max", "reduce_min"):
        # spatial-only reductions (adaptive pools / mean) keep the channel
        # axis; NHWC channel = last input axis
        axes = eqn.params.get("axes", ())
        last = eqn.invars[0].aval.ndim - 1
        return "invariant" if last not in axes else "stop"
    if prim == "concatenate":
        # spatial concat (adaptive-pool patch assembly) preserves channel
        # scaling; channel-axis concat joins different channel groups — the
        # reference stops there too (torch.cat is not residual/invariant)
        dim = eqn.params.get("dimension")
        out_rank = eqn.outvars[0].aval.ndim
        return "invariant" if dim != out_rank - 1 else "stop"
    if prim in ("add", "add_any", "sub"):
        # residual joins between two data tensors; scalar offsets are not
        shapes = [getattr(v.aval, "shape", ()) for v in eqn.invars]
        if all(int(np.prod(s)) > 1 for s in shapes):
            return "residual"
        return "stop"
    return "stop"


# ---------------------------------------------------------------------------
# BN-pair and region extraction
# ---------------------------------------------------------------------------


def find_bn_pairs(model: nnx.Module, sample_input,
                  graph: Optional[ModuleGraph] = None,
                  ) -> List[Tuple[str, str]]:
    """(layer_path, bn_path) fusion sites discovered from the traced graph:
    a conv/linear whose output — possibly through pure reshaping — is
    consumed ONLY by one BatchNorm (reference MergeBatchNorm.match_node
    semantics over the FX graph)."""
    from brevitas_tpu.nn.conv import _QuantConvNd
    from brevitas_tpu.nn.linear import QuantLinear

    foldable = (nnx.Linear, nnx.Conv, nnx.ConvTranspose, QuantLinear,
                _QuantConvNd)  # grouped/depthwise convs fold fine
    g = graph or trace_module_graph(model, sample_input)
    pairs = []
    for path, node in g.modules.items():
        if not isinstance(node.module, foldable):
            continue
        # follow through reshaping-only prims; require single-consumer so a
        # branched output (residual tap) never folds its BN
        cur = node
        nxt = None
        while True:
            succs = cur.succs
            if len(succs) != 1:
                nxt = None
                break
            nxt = succs[0]
            if nxt.kind == "module":
                break
            if _classify_prim(nxt) == "reshaping":
                cur = nxt
                nxt = None
                continue
            nxt = None
            break
        if nxt is not None and nxt.kind == "module" \
                and _is_batchnorm(nxt.module):
            pairs.append((path, nxt.path))
    return pairs


def extract_regions(model: nnx.Module, sample_input,
                    graph: Optional[ModuleGraph] = None,
                    ) -> List[Tuple[List[str], List[str]]]:
    """Cross-layer-equalization regions ([src_paths], [sink_paths]) from the
    traced graph — the reference's ``_extract_regions`` (equalize.py:217)
    with ``walk_region`` (equalize.py:185) rules mapped onto jaxpr nodes."""
    g = graph or trace_module_graph(model, sample_input)

    def walk(node: GraphNode, history: Set[Tuple[int, int, bool]],
             srcs: Set[str], sinks: Set[str], forward: bool):
        neighbors = node.succs if forward else node.preds
        for nxt in neighbors:
            key = ((id(node), id(nxt)) if forward else (id(nxt), id(node)))
            if key in history:
                continue
            history.add(key)
            if nxt.kind == "module":
                mod = nxt.module
                if _is_supported(mod):
                    if forward:
                        sinks.add(nxt.path)
                    else:
                        srcs.add(nxt.path)
                        walk(nxt, history, srcs, sinks, True)
                elif _is_scale_invariant_module(mod):
                    if forward:
                        walk(nxt, history, srcs, sinks, True)
                    else:
                        walk(nxt, history, srcs, sinks, True)
                        walk(nxt, history, srcs, sinks, False)
                # BatchNorm / acts / other modules: stop this branch
                continue
            cls = _classify_prim(nxt)
            if cls == "reshaping":
                walk(nxt, history, srcs, sinks, forward)
            elif cls == "invariant":
                if forward:
                    walk(nxt, history, srcs, sinks, True)
                else:
                    walk(nxt, history, srcs, sinks, True)
                    walk(nxt, history, srcs, sinks, False)
            elif cls == "residual":
                walk(nxt, history, srcs, sinks, True)
                walk(nxt, history, srcs, sinks, False)
            # else stop

    def sizes_match(srcs: Set[str], sinks: Set[str]) -> bool:
        """Reference _cross_layer_equalization requires every source's
        out-channel count to equal every sink's in-channel count (it raises
        otherwise, equalize.py:132); a spatial flatten between a conv and a
        linear breaks this, so such regions are dropped at extraction."""
        from brevitas_tpu.graph.equalize import _axes, _kernel

        sizes = set()
        for p in srcs:
            mod = g.modules[p].module
            _, out_ax = _axes(mod)
            sizes.add(int(_kernel(mod)[...].shape[out_ax]))
        for p in sinks:
            mod = g.modules[p].module
            in_ax, _ = _axes(mod)
            sizes.add(int(_kernel(mod)[...].shape[in_ax]))
        return len(sizes) == 1

    regions: Set[Tuple[Tuple[str, ...], Tuple[str, ...]]] = set()
    for path, node in g.modules.items():
        if not _is_supported(node.module):
            continue
        srcs: Set[str] = {path}
        sinks: Set[str] = set()
        walk(node, set(), srcs, sinks, True)
        if sinks and not (srcs & sinks) and sizes_match(srcs, sinks):
            regions.add((tuple(sorted(srcs)), tuple(sorted(sinks))))
    ordered = sorted(regions, key=lambda r: r[0][0])
    return [(list(s), list(k)) for s, k in ordered]


def extract_act_equalization_regions(model: nnx.Module, sample_input,
                                     graph: Optional[ModuleGraph] = None,
                                     ) -> List[Tuple[List[str], List[str]]]:
    """SmoothQuant migration sites discovered from the traced graph: each
    LayerNorm/RMSNorm-style elementwise-affine source paired with the
    linear sinks its output feeds directly (through reshaping-only glue) —
    e.g. a transformer block's LN1 → {q,k,v} projections, LN2 → MLP up
    projection. The norm's scale absorbs ``1/s`` exactly
    (``equalize.apply_act_equalization``, arXiv:2211.10438)."""
    from brevitas_tpu.graph.equalize import _is_norm_source

    g = graph or trace_module_graph(model, sample_input)

    def linear_sinks(node: GraphNode) -> Set[str]:
        sinks: Set[str] = set()
        seen: Set[int] = set()

        def walk(n: GraphNode):
            for nxt in n.succs:
                if id(nxt) in seen:
                    continue
                seen.add(id(nxt))
                if nxt.kind == "module":
                    if _is_supported(nxt.module):
                        sinks.add(nxt.path)
                    # any other module (incl. attention internals reached
                    # another way) ends the branch
                    continue
                if _classify_prim(nxt) == "reshaping":
                    walk(nxt)
                # non-reshaping glue (residual adds, elementwise) ends the
                # branch: the migration is only exact straight into a sink

        walk(node)
        return sinks

    regions: List[Tuple[List[str], List[str]]] = []
    for path, node in g.modules.items():
        if not _is_norm_source(node.module):
            continue
        sinks = linear_sinks(node)
        if sinks:
            regions.append(([path], sorted(sinks)))
    regions.sort(key=lambda r: r[0][0])
    return regions
