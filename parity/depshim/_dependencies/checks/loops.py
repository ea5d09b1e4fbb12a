def _check_loops(class_name, dependencies):
    """Self-reference validation: intentionally permissive in the shim (see
    ``circles._check_circles``)."""
