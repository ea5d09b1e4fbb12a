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


def set_compute_dtype(model: nnx.Module, dtype) -> nnx.Module:
    """Set the MXU operand dtype (usually jnp.bfloat16) on every WBIOL layer
    and attention module.

    Fake-quant math, accumulators, params, and optimizer state all stay f32;
    only the matmul/conv/einsum operands are cast, so the MXU runs at full
    bf16 rate instead of the fp32 multi-pass decomposition. Attention decode
    caches created after this call default to the same dtype (half the
    decode bandwidth of f32). Pass None to restore f32 operands.
    """
    from brevitas_tpu.graph.base import named_modules
    from brevitas_tpu.nn.attention import QuantMultiheadAttention
    from brevitas_tpu.nn.quant_layer import QuantWBIOL
    from brevitas_tpu.nn.rnn import _QuantLSTMLayer, _QuantRNNLayer

    for _path, mod in named_modules(model):
        if isinstance(mod, (QuantWBIOL, QuantMultiheadAttention,
                            _QuantLSTMLayer, _QuantRNNLayer)):
            mod.compute_dtype = dtype
    return model
