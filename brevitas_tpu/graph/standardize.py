"""Model standardization passes.

Reference: ``src/brevitas/graph/standardize.py``. Two of its four transforms
exist only because torch.fx graphs contain functional calls
(``TorchFunctionalToModule:80``) and tensor methods
(``MeanMethodToAdaptiveAvgPool2d:46``) — NNX models are module trees already,
so those are N/A by construction. The remaining two have direct analogues:

- ``DuplicateSharedStatelessModule:23`` → :func:`duplicate_shared_stateless_modules`
  (a module object referenced from two places in the tree is cloned so later
  per-site transforms, e.g. inserting distinct act quantizers, don't alias).
- ``DisableLastReturnQuantTensor:110`` → :func:`disable_last_return_quant_tensor`
  (the model's final quant layer returns a plain array instead of a
  QuantTensor).
"""

import copy
from typing import List, Optional

import jax
from flax import nnx

from brevitas_tpu.graph.base import named_modules, set_module


def _is_stateless(module: nnx.Module) -> bool:
    """True when no nnx.Variable or jax array lives anywhere in the subtree —
    the safety condition for cloning (shared *stateful* modules express
    intentional weight sharing and must not be duplicated, matching the
    reference's stateless-only rule)."""
    for _, sub in named_modules(module):
        for value in vars(sub).values():
            if isinstance(value, (nnx.Variable, jax.Array)):
                return False
    return True


def duplicate_shared_stateless_modules(model: nnx.Module) -> int:
    """Clone stateless modules that appear at more than one tree position.

    Returns the number of sites rewritten. The first sighting keeps the
    original object; every later sighting gets an independent deep copy.
    """
    from brevitas_tpu.graph.base import _children

    seen_ids = {id(model)}
    count = 0

    def visit(module: nnx.Module, prefix: str) -> None:
        nonlocal count
        for name, child in _children(module):
            path = f"{prefix}.{name}" if prefix else name
            if id(child) in seen_ids:
                # a shared subtree: clone only if wholly stateless — shared
                # stateful modules express intentional weight sharing, and
                # their internals must not be rewritten through an alias
                if _is_stateless(child):
                    set_module(model, path, copy.deepcopy(child))
                    count += 1
                continue
            seen_ids.add(id(child))
            visit(child, path)

    visit(model, "")
    return count


def disable_last_return_quant_tensor(
        model: nnx.Module, layers: Optional[List[nnx.Module]] = None) -> Optional[str]:
    """Flip ``return_quant_tensor`` off on the model's final quant layer so
    the network returns a plain array (reference
    DisableLastReturnQuantTensor, graph/standardize.py:110).

    Order of "final" is ``model.export_layers()`` when available (the same
    declared-order contract the exporter uses), else tree traversal order;
    pass ``layers`` to override. Returns the changed layer's tree path
    (usable with ``get_module``), or None if none qualifies.
    """
    if layers is None and hasattr(model, "export_layers"):
        layers = [m for m in model.export_layers() if isinstance(m, nnx.Module)]
    if layers is not None:
        for layer in reversed(layers):
            if getattr(layer, "return_quant_tensor", False):
                layer.return_quant_tensor = False
                for path, mod in named_modules(model):
                    if mod is layer:
                        return path
                return type(layer).__name__  # layer not in the tree
        return None
    last_path = None
    for path, mod in named_modules(model):
        if path and getattr(mod, "return_quant_tensor", False):
            last_path = path
    if last_path is not None:
        from brevitas_tpu.graph.base import get_module

        get_module(model, last_path).return_quant_tensor = False
    return last_path
