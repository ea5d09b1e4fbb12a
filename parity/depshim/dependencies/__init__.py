"""Public surface of the ``dependencies`` package, as consumed by the
reference (`/root/reference/src/brevitas/inject/__init__.py:19`):
``value`` decorator and the ``this`` expression root."""

from _dependencies.injector import Injector  # noqa: F401
from _dependencies.this import This

this = This()


def value(function):
    """Mark a function as a lazily-evaluated dependency provider."""
    function.__dependencies_value__ = True
    return function
