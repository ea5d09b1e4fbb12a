"""Orbax-based checkpointing with quantizer-state semantics.

Reference behaviours reproduced (SURVEY §5 "checkpoint/resume"):
- the full quantizer state (scales, zero-points, EMA buffers, two-phase
  counters, learned bit-width offsets) lives in the saved pytree — the
  reference needs custom state_dict surgery for this
  (core/scaling/standalone.py:266-298);
- ``restore(..., ignore_missing=True)`` tolerates float→quant retraining
  (BREVITAS_IGNORE_MISSING_KEYS, config.py:17): missing quantizer entries
  keep their freshly-initialized values;
- restoring a checkpoint whose two-phase scaling was mid-collection lands in
  the same phase (the counter round-trips as ordinary state — no load-order
  hooks needed).
"""

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import nnx


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _strip_caches(tree):
    """Drop transient inference caches from a state dict — they are
    recomputable and would break restore into a fresh model."""
    if isinstance(tree, dict):
        return {k: _strip_caches(v) for k, v in tree.items()
                if k != "_cached_quant_weight"}
    return tree


def _intify_keys(tree):
    """Orbax round-trips dict keys as strings; nnx.List children are keyed by
    int. Convert digit keys back so nnx.update can graft the state."""
    if isinstance(tree, dict):
        return {(int(k) if isinstance(k, str) and k.isdigit() else k):
                _intify_keys(v) for k, v in tree.items()}
    return tree


def save(path: str, model: nnx.Module, optimizer: Optional[Any] = None,
         step: int = 0) -> str:
    """Save model (+ optimizer) state with orbax."""
    path = os.path.abspath(path)
    state = {"model": _strip_caches(nnx.state(model).to_pure_dict()),
             "step": np.asarray(step)}
    if optimizer is not None:
        state["optimizer"] = nnx.state(optimizer).to_pure_dict()
    ckptr = _checkpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore(path: str, model: nnx.Module, optimizer: Optional[Any] = None,
            ignore_missing: bool = False) -> int:
    """Restore in place; returns the saved step.

    ``ignore_missing=True`` merges only the entries present in the
    checkpoint (float→quant retraining: layer weights restore, quantizer
    state keeps its init)."""
    ckptr = _checkpointer()
    restored = ckptr.restore(os.path.abspath(path))
    saved_model = _intify_keys(restored["model"])
    if ignore_missing:
        current = nnx.state(model).to_pure_dict()
        _merge_into(current, saved_model)
        nnx.update(model, current)
    else:
        nnx.update(model, saved_model)
    if optimizer is not None and "optimizer" in restored:
        nnx.update(optimizer, _intify_keys(restored["optimizer"]))
    # restored weights invalidate any cached inference quant weights
    from brevitas_tpu.quant.quantizers import _clear_quant_weight_caches

    _clear_quant_weight_caches(model)
    return int(restored.get("step", 0))


def _merge_into(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _merge_into(dst[k], v)
        elif k in dst:
            dst[k] = v
