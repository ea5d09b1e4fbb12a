"""Dependency-spec constructors.

A spec is the 4-tuple ``(marker, attribute, args, have_defaults)`` consumed by
the reference's forked metaclass (`/root/reference/src/brevitas/inject/__init__.py:126`):

- ``marker``: a string; the fork only tests ``'nested' not in marker``.
- ``attribute``: a callable invoked with the resolved ``args`` as kwargs.
- ``args``: names of sibling injector attributes the callable needs.
- ``have_defaults``: 1-based position of the first arg that has a default
  (so ``n < have_defaults`` means arg ``n`` is required). A value larger than
  ``len(args)`` means no defaults.
"""

import inspect

from .exceptions import DependencyError
from .this import This


def _signature_args(callable_obj):
    """Return (args, have_defaults) for a callable's parameters."""
    sig = inspect.signature(callable_obj)
    args = []
    first_default = None
    for param in sig.parameters.values():
        if param.name == "self":
            continue
        if param.kind in (param.VAR_POSITIONAL, param.VAR_KEYWORD):
            continue
        args.append(param.name)
        if param.default is not param.empty and first_default is None:
            first_default = len(args)  # 1-based position
    have_defaults = first_default if first_default is not None else len(args) + 1
    return args, have_defaults


def _make_init_spec(cls):
    """Spec that instantiates ``cls`` with ctor args resolved by name."""
    try:
        args, have_defaults = _signature_args(cls)
    except (ValueError, TypeError):
        args, have_defaults = [], 1
    return ("class", cls, args, have_defaults)


def _make_this_spec(dependency):
    """Spec that evaluates a ``this.<attr>...`` expression lazily."""
    expression = dependency.__expression__
    if not expression:
        raise DependencyError("'this' must be followed by an attribute access")
    # Parent access (``this << n``) would require nested-injector scopes,
    # which the reference never uses (verified: zero `this <<` hits).
    kind, first = expression[0]
    if kind != ".":
        raise DependencyError(
            "unsupported 'this' expression start: %r" % (expression[0],))
    rest = expression[1:]

    def attribute(**kwargs):
        result = kwargs[first]
        for op, operand in rest:
            if op == ".":
                result = getattr(result, operand)
            elif op == "[]":
                result = result[operand]
            else:
                raise DependencyError("unsupported 'this' operation %r" % op)
        return result

    return ("this", attribute, [first], 2)


def _make_nested_injector_spec(dependency):
    return ("nested_injector", lambda: dependency, [], 1)


def _make_value_spec(function):
    args, have_defaults = _signature_args(function)
    return ("value", function, args, have_defaults)


def _make_raw_spec(dependency):
    return ("var", lambda _dep=dependency: _dep, [], 1)


def _make_dependency_spec(name, dependency):
    from .injector import _InjectorType

    if isinstance(dependency, _InjectorType):
        return _make_nested_injector_spec(dependency)
    if isinstance(dependency, This):
        return _make_this_spec(dependency)
    if inspect.isclass(dependency) and not name.endswith("_class"):
        return _make_init_spec(dependency)
    if callable(dependency) and getattr(dependency, "__dependencies_value__",
                                        False):
        return _make_value_spec(dependency)
    return _make_raw_spec(dependency)
