"""``this`` expression objects: lazy references to sibling injector attributes."""


class This:
    def __init__(self, expression=()):
        object.__setattr__(self, "__expression__", tuple(expression))

    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return This(self.__expression__ + ((".", name),))

    def __getitem__(self, key):
        return This(self.__expression__ + (("[]", key),))

    def __lshift__(self, levels):
        return This(self.__expression__ + (("<<", levels),))

    def __repr__(self):
        parts = ["this"]
        for kind, operand in self.__expression__:
            if kind == ".":
                parts.append("." + operand)
            elif kind == "[]":
                parts.append("[%r]" % (operand,))
            else:
                parts.append(" << %r" % (operand,))
        return "".join(parts)
