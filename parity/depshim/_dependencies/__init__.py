"""Minimal API-compatible stand-in for the internals of ``dependencies==2.0.1``.

The reference framework (/root/reference/src/brevitas) forks the metaclass of
the ``dependencies`` package (`inject/__init__.py:7-18`) and imports a handful
of its private helpers. That package is not installed in this image and cannot
be fetched (zero egress), so the parity harness vendors just the surface the
fork consumes:

- ``injector``: ``Injector``, ``_InjectorType``, ``__init__``, ``let``,
  ``injector_doc``
- ``spec``: ``_make_init_spec``, ``_make_this_spec``, ``_make_dependency_spec``
  producing ``(marker, attribute, args, have_defaults)`` tuples
- ``this.This``, ``exceptions.DependencyError``, ``attributes._Replace``,
  ``replace._deep_replace_dependency``
- ``checks.*``: validation hooks (no-ops here)

This is a clean-room implementation written from how the fork uses the API;
it contains no code from the ``dependencies`` package.
"""
