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
