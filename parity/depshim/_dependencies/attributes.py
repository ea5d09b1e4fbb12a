class _Replace(Exception):
    """Control-flow exception used by operator specs in the original package.

    None of the spec constructors in this shim ever raise it; it exists so the
    reference's ``except _Replace`` clause imports cleanly.
    """

    def __init__(self, dependency, attrs=()):
        super().__init__(dependency, attrs)
        self.dependency = dependency
        self.attrs = attrs
