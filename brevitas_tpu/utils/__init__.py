"""Small shared utilities (reference ``src/brevitas/utils/``)."""

from flax import nnx


def train_mode(model: nnx.Module) -> nnx.Module:
    """Recursively enter training mode: quantizer stats advance, BN uses
    batch statistics, cached inference quant weights invalidate (works on
    any NNX module tree)."""
    from brevitas_tpu.quant.quantizers import _clear_quant_weight_caches

    model.set_attributes(training=True, raise_if_not_found=False)
    model.set_attributes(use_running_average=False, raise_if_not_found=False)
    model.set_attributes(deterministic=False, raise_if_not_found=False)
    _clear_quant_weight_caches(model)
    return model


def eval_mode(model: nnx.Module) -> nnx.Module:
    """Recursively enter eval mode: frozen quantizer state, BN running
    stats, deterministic dropout."""
    model.set_attributes(training=False, raise_if_not_found=False)
    model.set_attributes(use_running_average=True, raise_if_not_found=False)
    model.set_attributes(deterministic=True, raise_if_not_found=False)
    return model
