"""Writer-independent ONNX proto validation (export/validate.py) — the
in-image analogue of the reference's onnxruntime external oracle
(tests/brevitas_ort/common.py:37): structural wire-format checks that catch
corrupted bytes the interpreter shrugs at."""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from brevitas_tpu.export import (
    export_finn_onnx,
    export_onnx_qcdq,
    export_onnx_qop,
    export_qonnx,
    run_onnx,
)
from brevitas_tpu.export.validate import OnnxValidationError, validate_onnx
from brevitas_tpu.quant import presets
import brevitas_tpu.nn as qnn
from brevitas_tpu.utils import eval_mode


def _lfc_blob(style_fn, bits=4):
    from brevitas_tpu.models import tfc

    model = tfc(bits, bits, bits, dropout=0.0, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 28, 28, 1),
                                                    dtype=np.float32))
    model(x)
    eval_mode(model)
    return style_fn(model, jnp.zeros((1, 784)))


@pytest.mark.parametrize("exporter", [export_onnx_qcdq, export_qonnx,
                                      export_finn_onnx])
def test_exported_models_validate(exporter):
    validate_onnx(_lfc_blob(exporter))


def test_qop_model_validates(rng):
    class Net(nnx.Module):
        def __init__(self):
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.l1 = qnn.QuantLinear(
                16, 8, use_bias=True, input_quant=act,
                output_quant=act.let(),
                weight_quant=presets.Int8WeightPerTensorFloat,
                bias_quant=presets.Int32Bias, rngs=nnx.Rngs(0))

        def export_layers(self):
            return [self.l1]

        def __call__(self, x):
            return self.l1(x)

    m = Net()
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    validate_onnx(export_onnx_qop(m, x))


def _corrupt(blob: bytes, needle: bytes, replacement: bytes) -> bytes:
    idx = blob.find(needle)
    assert idx >= 0, "corruption target not found"
    return blob[:idx] + replacement + blob[idx + len(needle):]


def test_validator_catches_truncation():
    blob = _lfc_blob(export_onnx_qcdq)
    with pytest.raises(OnnxValidationError):
        validate_onnx(blob[:-7])


def test_validator_catches_raw_data_size_mismatch():
    """Shrink one initializer dim so raw_data no longer matches dims×dtype —
    the interpreter reshapes without complaint (or silently mis-executes);
    the validator flags the byte count."""
    from brevitas_tpu.export import onnx_proto as P

    # hand-build a tiny model with a mismatched tensor
    bad_tensor = P.tensor_proto("w", np.zeros((4, 4), np.float32))
    # claim dims (4, 5) while keeping 4x4 floats of raw data
    good_dims = P.f_varint(1, 4) + P.f_varint(1, 4)
    bad_dims = P.f_varint(1, 4) + P.f_varint(1, 5)
    assert good_dims in bad_tensor
    bad_tensor = bad_tensor.replace(good_dims, bad_dims, 1)
    node = P.node("Relu", ["w"], ["y"])
    g = P.graph([node], "g", [P.value_info("x", P.FLOAT, [1])],
                [P.value_info("y", P.FLOAT, [None])], [bad_tensor])
    blob = P.model(g)
    with pytest.raises(OnnxValidationError, match="raw_data"):
        validate_onnx(blob)


def test_validator_catches_dangling_input():
    from brevitas_tpu.export import onnx_proto as P

    node = P.node("Relu", ["ghost"], ["y"])
    g = P.graph([node], "g", [P.value_info("x", P.FLOAT, [1])],
                [P.value_info("y", P.FLOAT, [None])], [])
    with pytest.raises(OnnxValidationError, match="ghost"):
        validate_onnx(P.model(g))


def test_validator_catches_missing_opset():
    from brevitas_tpu.export import onnx_proto as P

    node = P.node("Relu", ["x"], ["y"])
    g = P.graph([node], "g", [P.value_info("x", P.FLOAT, [1])],
                [P.value_info("y", P.FLOAT, [None])], [])
    blob = P.f_varint(1, 8) + P.f_bytes(7, g)  # no opset_import at all
    with pytest.raises(OnnxValidationError, match="opset"):
        validate_onnx(blob)


def test_validator_catches_attribute_without_payload():
    from brevitas_tpu.export import onnx_proto as P

    # attribute claims type INT (3) but carries a float payload field
    attr = P.f_string(1, "axis") + P.f_float(2, 1.0) + P.f_varint(20, 2)
    node_msg = (P.f_string(2, "y") + P.f_string(3, "n") +
                P.f_string(4, "Flatten") + P.f_bytes(5, attr))
    g = P.graph([node_msg], "g", [P.value_info("x", P.FLOAT, [1])],
                [P.value_info("y", P.FLOAT, [None])], [])
    with pytest.raises(OnnxValidationError, match="payload"):
        validate_onnx(P.model(g))


def test_fuzz_bitflips_never_crash_and_usually_fail(rng):
    """Random single-byte corruption must raise OnnxValidationError or (for
    benign bytes like tensor contents) still validate — never crash with an
    unrelated exception. A tiny model keeps the wire mostly structure
    (a large one is >99% weight payload, where corruption is benign)."""
    class Tiny(nnx.Module):
        def __init__(self):
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.l1 = qnn.QuantLinear(
                3, 2, use_bias=True, input_quant=act,
                weight_quant=presets.Int8WeightPerTensorFloat,
                rngs=nnx.Rngs(0))

        def export_layers(self):
            return [self.l1]

        def __call__(self, x):
            return self.l1(x)

    m = Tiny()
    x = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    blob = bytearray(export_onnx_qcdq(m, x))
    outcomes = {"ok": 0, "caught": 0}
    for _ in range(300):
        pos = int(rng.integers(0, len(blob)))
        old = blob[pos]
        new = int(rng.integers(0, 256))
        if new == old:
            continue
        blob[pos] = new
        try:
            validate_onnx(bytes(blob))
            outcomes["ok"] += 1
        except OnnxValidationError:
            outcomes["caught"] += 1
        finally:
            blob[pos] = old
    assert outcomes["caught"] > 60, outcomes
