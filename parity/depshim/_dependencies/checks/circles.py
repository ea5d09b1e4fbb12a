def _check_circles(dependencies):
    """Circular-reference validation: intentionally permissive in the shim.

    The reference only resolves attribute graphs that are already known to be
    acyclic; a true cycle would surface as a RecursionError during resolution.
    """
