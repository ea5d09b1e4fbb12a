def _deep_replace_dependency(injector, current_attr, replace):
    """Replace a dependency spec in response to a ``_Replace`` signal.

    The shim's spec constructors never raise ``_Replace``, so this is never
    reached; implemented defensively for API parity.
    """
    from .spec import _make_dependency_spec

    injector.__dependencies__[current_attr] = _make_dependency_spec(
        current_attr, replace.dependency)
