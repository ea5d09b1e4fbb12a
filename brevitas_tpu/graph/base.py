"""Module-tree surgery utilities.

The reference rewrites torch.fx graphs (``src/brevitas/graph/base.py:35-330``:
ModuleToModuleByClass/ByInstance/ByName, InsertModuleCallAfter...). NNX
modules are plain Python object trees, so the same capability is direct
attribute-tree traversal and replacement — no tracer needed for module-level
transforms.
"""

from typing import Any, Callable, Iterator, List, Optional, Tuple, Type

from flax import nnx


def named_modules(model: nnx.Module, prefix: str = "") -> Iterator[Tuple[str, nnx.Module]]:
    """Yield (dot-path, module) pairs, root included (path '')."""
    yield prefix, model
    for name, child in _children(model):
        path = f"{prefix}.{name}" if prefix else name
        yield from named_modules(child, path)


def _children(module: nnx.Module) -> Iterator[Tuple[str, nnx.Module]]:
    for name, value in vars(module).items():
        name = str(name)  # nnx.List stores children under integer keys
        if name.startswith("_"):
            continue
        if isinstance(value, nnx.Module):
            yield name, value
        elif isinstance(value, (list, tuple)):
            for i, item in enumerate(value):
                if isinstance(item, nnx.Module):
                    yield f"{name}.{i}", item


def get_module(model: nnx.Module, path: str) -> nnx.Module:
    obj: Any = model
    if not path:
        return obj
    for part in path.split("."):
        obj = obj[int(part)] if part.isdigit() else getattr(obj, part)
    return obj


def set_module(model: nnx.Module, path: str, new: nnx.Module) -> None:
    parts = path.split(".")
    parent = get_module(model, ".".join(parts[:-1]))
    last = parts[-1]
    if last.isdigit():
        parent[int(last)] = new
    else:
        setattr(parent, last, new)


def find_modules(model: nnx.Module, cls) -> List[Tuple[str, nnx.Module]]:
    return [(p, m) for p, m in named_modules(model) if isinstance(m, cls)]


def replace_modules_by_class(
    model: nnx.Module, old_cls: Type[nnx.Module],
    factory: Callable[[str, nnx.Module], Optional[nnx.Module]],
) -> int:
    """Replace every instance of ``old_cls`` with ``factory(path, old)``
    (return None from the factory to skip). The NNX analogue of
    ModuleToModuleByClass (reference graph/base.py:218)."""
    count = 0
    for path, mod in find_modules(model, old_cls):
        if type(mod) is not old_cls:
            continue  # exact class only, like the reference
        new = factory(path, mod)
        if new is not None:
            set_module(model, path, new)
            count += 1
    return count
