"""Base injector machinery.

The reference's forked metaclass (`_ExtendedInjectorType`) subclasses
``_InjectorType`` but overrides both ``__new__`` and ``__getattr__``, so the
base here only needs to exist and be a ``type`` subclass. ``__init__``/``let``/
``injector_doc`` are the module-level callables the fork installs on its own
root injector class.
"""

from .exceptions import DependencyError


class _InjectorType(type):

    def __new__(cls, class_name, bases, namespace):
        return type.__new__(cls, class_name, bases, namespace)

    def __contains__(cls, attrname):
        return attrname in cls.__dependencies__

    def __dir__(cls):
        return list(cls.__dependencies__)


def __init__(self, *args, **kwargs):  # noqa: A001 - name mandated by importer
    raise DependencyError("Do not instantiate Injector")


def let(cls, **kwargs):
    """Produce a subclass of ``cls`` with extra/overridden dependencies."""
    return type(cls.__name__, (cls,), kwargs)


injector_doc = """Injector: a dependency-injection container class."""


class Injector:
    """Plain base used only in inheritance checks by the fork."""
