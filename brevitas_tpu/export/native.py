"""Native integer serving artifact.

What the reference lacks entirely: a serialized integer-domain model for the
SAME runtime that trained it. Stores int weights, scales, zero-points and a
layer manifest in one .npz — loadable for TPU serving without retracing the
training module tree.
"""

import json
from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.graph.base import named_modules
from brevitas_tpu.nn.conv import _QuantConvNd
from brevitas_tpu.nn.linear import QuantLinear
from brevitas_tpu.quant.config import QuantType


def export_native(model: nnx.Module, path: str) -> Dict:
    """Serialize all quantized parameter layers to ``path`` (.npz)."""
    from brevitas_tpu.utils import eval_mode

    eval_mode(model)
    arrays: Dict[str, np.ndarray] = {}
    manifest: List[Dict] = []
    for mod_path, mod in named_modules(model):
        if not isinstance(mod, (QuantLinear, _QuantConvNd)):
            continue
        if mod.weight_quant.quant_type != QuantType.INT:
            continue
        qw = mod.quant_weight()
        bw = float(np.asarray(qw.bit_width))
        key = mod_path.replace(".", "/")
        w_int = np.asarray(qw.int() if bw <= 8 else qw.int(float_datatype=True))
        packed = False
        if bw <= 4 and w_int.shape[-1] % 2 == 0:
            from brevitas_tpu.kernels.int4 import pack_int4_np

            w_int = pack_int4_np(w_int)  # halves int4 artifact size
            packed = True
        arrays[f"{key}/w_int"] = w_int
        arrays[f"{key}/w_scale"] = np.asarray(qw.scale)
        arrays[f"{key}/w_zero_point"] = np.asarray(qw.zero_point)
        if mod.bias is not None:
            arrays[f"{key}/bias"] = np.asarray(mod.bias[...])
        entry = {
            "path": mod_path,
            "kind": "linear" if isinstance(mod, QuantLinear) else "conv",
            "bit_width": bw,
            "signed": bool(qw.signed),
            "int4_packed": packed,
        }
        if isinstance(mod, _QuantConvNd):
            entry.update(stride=list(mod.stride), groups=mod.groups,
                         padding=mod.padding if isinstance(mod.padding, str)
                         else [list(p) for p in mod.padding])
        manifest.append(entry)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    np.savez(path, **arrays)
    return {"layers": len(manifest), "path": path}


def load_native(path: str) -> Dict:
    """Load a native artifact back into {path: {w_int, w_scale, ...}}."""
    data = np.load(path)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    out = {}
    for entry in manifest:
        key = entry["path"].replace(".", "/")
        w_int = data[f"{key}/w_int"]
        if entry.get("int4_packed"):
            from brevitas_tpu.kernels.int4 import unpack_int4_np

            w_int = unpack_int4_np(w_int, signed=entry["signed"])
        out[entry["path"]] = {
            "meta": entry,
            "w_int": w_int,
            "w_scale": data[f"{key}/w_scale"],
            "w_zero_point": data[f"{key}/w_zero_point"],
            "bias": data.get(f"{key}/bias"),
        }
    return out
