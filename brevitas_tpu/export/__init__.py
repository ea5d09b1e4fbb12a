"""Export flows (reference layer 6, ``src/brevitas/export/__init__.py:17-47``).

- :func:`export_onnx_qcdq` — QuantizeLinear/Clip/DequantizeLinear graphs
  (reference StdQCDQONNXManager).
- :func:`export_qonnx` — custom ``Quant``-op graphs for the FINN flow
  (reference QONNXManager; FINN consumes QONNX, so this is also the
  ``export_finn_onnx`` entry point).
- :func:`export_native` — integer serving artifact for this runtime
  (capability the reference delegates to external backends).

No onnx package exists in this image: serialization is the in-repo protobuf
emitter (:mod:`brevitas_tpu.export.onnx_proto`) and validation uses the
in-repo interpreter (:mod:`brevitas_tpu.export.interp`) as the oracle.
"""

from brevitas_tpu.export.interp import run_onnx
from brevitas_tpu.export.validate import OnnxValidationError, validate_onnx
from brevitas_tpu.export.native import export_native, load_native
from brevitas_tpu.export.qcdq import debug_probe_names, export_model


def export_brevitas_onnx(model, example_input, path=None, **kw) -> bytes:
    """Deprecated reference alias for QONNX export
    (reference export/__init__.py:22)."""
    return export_model(model, example_input, path, style="qonnx", **kw)


def export_onnx_qcdq(model, example_input, path=None, **kw) -> bytes:
    return export_model(model, example_input, path, style="qcdq", **kw)


def export_qonnx(model, example_input, path=None, **kw) -> bytes:
    return export_model(model, example_input, path, style="qonnx", **kw)


def export_onnx_qop(model, example_input, path=None, **kw) -> bytes:
    """QOperator-dialect export: WBIOL layers become integer
    QLinearConv/QLinearMatMul nodes with int32 bias (reference
    StdQOpONNXManager, export/onnx/standard/qoperator/manager.py:32);
    non-compute layers keep QCDQ form."""
    return export_model(model, example_input, path, style="qop", **kw)


def export_finn_onnx(model, example_input, path=None, **kw) -> bytes:
    """FINN-dialect export (reference export_finn_onnx → FINNManager,
    export/onnx/finn/manager.py:75): MultiThreshold activations, integer
    MatMul/Conv weights with ``finn_datatype`` quantization annotations,
    QuantAvgPool2d accumulator nodes."""
    from brevitas_tpu.export.finn import export_finn_onnx as fn

    return fn(model, example_input, path, **kw)


def export_torch_qcdq(model, example_input, path=None):
    """TorchScript QCDQ export (reference export_torch_qcdq →
    TorchQCDQManager, export/torch/qcdq/manager.py:22). Lazy torch import."""
    from brevitas_tpu.export.torch_backend import export_torch_qcdq as fn

    return fn(model, example_input, path)


def export_torch_qop(model, example_input, path=None):
    """TorchScript quantized-op export (reference export_torch_qop →
    TorchQOpManager, export/torch/qoperator/manager.py:24)."""
    from brevitas_tpu.export.torch_backend import export_torch_qop as fn

    return fn(model, example_input, path)


__all__ = ["export_onnx_qcdq", "export_onnx_qop", "export_qonnx",
           "export_finn_onnx", "export_torch_qcdq", "export_torch_qop",
           "export_native", "load_native", "run_onnx", "export_model",
           "export_brevitas_onnx", "debug_probe_names",
           "validate_onnx", "OnnxValidationError"]
