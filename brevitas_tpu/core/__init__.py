"""Pure-functional quantization core (reference layer 1).

The reference assembles small stateful ScriptModules
(``src/brevitas/core/``: quant/scaling/stats/bit_width/zero_point/restrict_val)
via dependency injection. Here the same numerics are pure functions over
explicit arrays; all state (learned scales, EMA buffers, counters) lives in the
NNX quantizer modules of :mod:`brevitas_tpu.quant`, keeping this layer
jit/vmap/pjit-transparent.
"""

from brevitas_tpu.core import quant, restrict, stats

__all__ = ["quant", "restrict", "stats"]
