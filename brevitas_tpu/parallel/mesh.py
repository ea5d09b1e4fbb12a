"""Mesh construction and rule-based model sharding."""

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[Tuple[str, int]],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from (axis_name, size) pairs, e.g.
    [("data", 4), ("model", 2)]."""
    devices = list(devices if devices is not None else jax.devices())
    names = [n for n, _ in axis_sizes]
    sizes = [s for _, s in axis_sizes]
    total = int(np.prod(sizes))
    assert total <= len(devices), f"mesh needs {total} devices, have {len(devices)}"
    dev_array = np.array(devices[:total]).reshape(sizes)
    return Mesh(dev_array, names)


def shard_model_by_rules(model: nnx.Module, mesh: Mesh,
                         rules: Sequence[Tuple[str, P]]):
    """Apply NamedShardings to model state in place.

    ``rules`` is an ordered list of (path_regex, PartitionSpec); the first
    match wins; unmatched leaves replicate. Paths look like
    ``hidden/0/weight`` (nnx state paths joined with '/'). Returns the list
    of paths that received a non-replicated spec, for coverage checks."""

    state = nnx.state(model)
    flat = nnx.to_flat_state(state)
    new_flat = []
    sharded_paths = []
    for path, leaf in flat:
        path_str = "/".join(str(p) for p in path)
        value = leaf.get_value() if hasattr(leaf, "get_value") else leaf
        if hasattr(value, "shape"):
            # first matching rule whose spec FITS this leaf wins (a rank-2
            # linear rule matching a rank-4 conv kernel falls through to the
            # next rule instead of forcing replication)
            spec = P()
            for pattern, candidate in rules:
                if re.search(pattern, path_str):
                    fitted = _fit_spec(candidate, value.shape, mesh)
                    if fitted != P() or candidate == P():
                        spec = fitted
                        break
            if any(axis is not None for axis in spec):
                sharded_paths.append(path_str)
            value = jax.device_put(value, NamedSharding(mesh, spec))
        if hasattr(leaf, "replace"):
            leaf = leaf.replace(value)
        new_flat.append((path, leaf))
    nnx.update(model, nnx.from_flat_state(new_flat))
    return sharded_paths


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Keep a spec only when it names exactly the leaf's rank, every referenced
    mesh axis exists, and each sharded dim divides evenly; otherwise replicate.
    The exact-rank rule stops e.g. a rank-2 linear-kernel rule from grabbing
    the leading spatial axes of a rank-4 conv kernel."""
    if len(spec) != len(shape):
        return P()
    out = []
    for i, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        if any(a not in mesh.shape for a in axes):
            out.append(None)
            continue
        size = int(np.prod([mesh.shape[a] for a in axes]))
        out.append(axis if shape[i] % size == 0 else None)
    return P(*out)


def replicate_model(model: nnx.Module, mesh: Mesh) -> None:
    """Fully replicate all model state across the mesh."""
    shard_model_by_rules(model, mesh, [])
