class DependencyError(Exception):
    """Raised when an injector attribute cannot be resolved."""
