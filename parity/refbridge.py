"""Make the reference Brevitas (/root/reference/src) importable in-image.

Two gaps exist in this image:

1. ``pkg_resources`` (setuptools<81 API) is absent — the reference only uses
   it for ``__version__`` discovery (`/root/reference/src/brevitas/__init__.py:9`),
   so a raising ``get_distribution`` suffices.
2. ``dependencies==2.0.1`` is absent — the reference forks its metaclass and
   imports private helpers (`inject/__init__.py:7-19`); ``parity/depshim``
   provides a clean-room stand-in for exactly that surface.

Usage::

    from parity.refbridge import import_reference_brevitas
    brevitas = import_reference_brevitas()
"""

import os
import sys
import types

_REFERENCE_SRC = "/root/reference/src"
_DEPSHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "depshim")


def _install_pkg_resources_shim():
    if "pkg_resources" in sys.modules:
        return
    module = types.ModuleType("pkg_resources")

    class DistributionNotFound(Exception):
        pass

    def get_distribution(name):
        raise DistributionNotFound(name)

    module.DistributionNotFound = DistributionNotFound
    module.get_distribution = get_distribution
    sys.modules["pkg_resources"] = module


def import_reference_brevitas():
    """Import and return the reference ``brevitas`` package."""
    _install_pkg_resources_shim()
    if _DEPSHIM not in sys.path:
        sys.path.insert(0, _DEPSHIM)
    if _REFERENCE_SRC not in sys.path:
        sys.path.insert(0, _REFERENCE_SRC)
    import brevitas  # noqa: PLC0415
    return brevitas


def reference_available():
    """True if the reference tree exists and imports cleanly."""
    if not os.path.isdir(_REFERENCE_SRC):
        return False
    try:
        import_reference_brevitas()
        return True
    except Exception:
        return False


def _install_onnx_shims():
    """Minimal ``onnx``/``onnxoptimizer`` stand-ins so the REFERENCE's own
    ONNX export manager (`/root/reference/src/brevitas/export/onnx/manager.py:75-146`)
    can run in-image. torch's C++ serializer produces the ModelProto BYTES
    itself; the real packages are only used afterwards for (a) torch's
    onnxscript-function scan (no-op for QCDQ graphs) and (b) the reference's
    optimizer passes, which these shims skip — the test consumes the RAW
    torch-serialized bytes, which is the point: an independent producer for
    the repo's wire-format parser/interpreter."""
    if "onnx" in sys.modules and not getattr(
            sys.modules["onnx"], "__brevitas_tpu_shim__", False):
        return  # the real package exists; use it

    class _Graph:
        node = ()

    class _Blob:
        """Opaque byte carrier standing in for onnx.ModelProto."""

        def __init__(self, data: bytes):
            self._bytes = data
            self.graph = _Graph()
            self.functions = []

        def SerializeToString(self):
            return self._bytes

        @staticmethod
        def FromString(data: bytes):
            return _Blob(data)

    import importlib.machinery

    onnx_mod = types.ModuleType("onnx")
    # a bare ModuleType has __spec__ = None, and importlib.util.find_spec
    # RAISES ValueError for an imported module whose spec is None — which
    # made every later reference-parity test in the same process fail once
    # the producer tests had installed the shim (slow-tier order pollution,
    # SLOWTIER.md round-5)
    onnx_mod.__spec__ = importlib.machinery.ModuleSpec("onnx", loader=None)
    onnx_mod.__brevitas_tpu_shim__ = True
    onnx_mod.ModelProto = _Blob
    onnx_mod.load = lambda path: _Blob(open(path, "rb").read())
    onnx_mod.load_model_from_string = _Blob.FromString
    onnx_mod.save = lambda model, path: open(path, "wb").write(
        model.SerializeToString())
    sys.modules["onnx"] = onnx_mod

    opt_mod = types.ModuleType("onnxoptimizer")
    opt_mod.__spec__ = importlib.machinery.ModuleSpec(
        "onnxoptimizer", loader=None)
    opt_mod.__brevitas_tpu_shim__ = True
    opt_mod.optimize = lambda model, passes=None: model
    sys.modules["onnxoptimizer"] = opt_mod


def export_reference_qcdq(module, example_input) -> bytes:
    """Run the REFERENCE's own QCDQ exporter (handler patching +
    ``torch.onnx.export``) and return the raw torch-serialized ONNX bytes —
    the independent-producer oracle for ``export/validate.py`` /
    ``export/interp.py`` (the reference's tier-2 uses onnxruntime the same
    way, `/root/reference/tests/brevitas_ort/common.py:37`)."""
    _install_onnx_shims()
    import_reference_brevitas()
    # the reference reads the active opset from torch.onnx._globals
    # (export/onnx/standard/function.py:73); torch 2.13 moved that module
    if "torch.onnx._globals" not in sys.modules:
        from torch.onnx._internal.torchscript_exporter import (  # noqa
            _globals as _tsg,
        )
        sys.modules["torch.onnx._globals"] = _tsg
    from brevitas.export import export_onnx_qcdq

    # the TorchScript (non-dynamo) exporter serializes the ModelProto in
    # C++ with no onnx-package involvement; the shimmed manager returns the
    # bytes untouched (its optimizer passes are skipped)
    blob = export_onnx_qcdq(module, args=example_input, export_path=None,
                            dynamo=False)
    return blob.SerializeToString()


def _install_speech_shims():
    """Stub the audio-stack imports the reference quartznet package pulls in
    at import time (inflect/librosa/soundfile/...); the head-to-head path
    feeds features directly, so none of their functionality is exercised."""
    import types as _types

    class _Permissive:
        """Attribute sink: import-time calls (inflect.engine(), yaml loaders)
        get inert objects; only REAL runtime use would misbehave, and the
        head-to-head path never exercises the audio stack."""

        def __init__(self, label):
            self._label = label

        def __call__(self, *a, **k):
            return _Permissive(self._label)

        def __getattr__(self, n):
            # dunders must genuinely be absent (inspect/marshmallow walk
            # them; returning a sink breaks their type checks)
            if n.startswith("__") and n.endswith("__"):
                raise AttributeError(n)
            return _Permissive(f"{self._label}.{n}")

    def _stub(name, attrs=()):
        if name in sys.modules:
            return
        import importlib.machinery

        mod = _types.ModuleType(name)
        mod.__brevitas_tpu_shim__ = True
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        mod.__path__ = []   # mark as package so submodule find_spec works

        def _mod_getattr(n, _name=name):
            if n.startswith("__") and n.endswith("__"):
                raise AttributeError(n)   # inspect walks module dunders
            return _Permissive(f"{_name}.{n}")

        mod.__getattr__ = _mod_getattr
        sys.modules[name] = mod

    for name in ("inflect", "librosa", "librosa.core", "librosa.util",
                 "soundfile", "unidecode", "frozendict", "num2words",
                 "kaldi_io", "pandas", "ruamel", "ruamel.yaml", "marshmallow",
                 "wget", "torchaudio", "sox", "torch_stft", "webdataset",
                 "braceexpand", "python_speech_features", "scipy.io.wavfile"):
        _stub(name)


def import_reference_quartznet():
    """Import the reference speech_to_text quartznet package (shimming its
    audio-stack imports) and return the module."""
    import_reference_brevitas()
    _install_speech_shims()
    import importlib

    return importlib.import_module(
        "brevitas_examples.speech_to_text.quartznet.quartznet")
