"""Global configuration flags.

TPU-native analogue of reference ``src/brevitas/config.py:13-25``. The
reference reads env flags at import (BREVITAS_JIT, BREVITAS_NATIVE_STE_BACKEND,
BREVITAS_IGNORE_MISSING_KEYS, ...). Under JAX everything is jit-compiled by
default, so the JIT flags become kernel-backend selection knobs instead.
"""

import os


def env_to_bool(name: str, default: bool = False) -> bool:
    return os.environ.get(name, str(default).upper()).upper() in ("1", "TRUE", "ON")


# Use Pallas fused kernels for fake-quant where available (vs pure jnp).
USE_PALLAS_KERNELS: bool = env_to_bool("BREVITAS_TPU_PALLAS", True)

# Use the native C++ XLA custom-call backend for STE ops where registered.
NATIVE_STE_BACKEND: bool = env_to_bool("BREVITAS_TPU_NATIVE_STE", False)

# Tolerate missing quantizer state when restoring from a float checkpoint
# (reference: BREVITAS_IGNORE_MISSING_KEYS, src/brevitas/config.py:17).
IGNORE_MISSING_KEYS: bool = env_to_bool("BREVITAS_TPU_IGNORE_MISSING_KEYS", False)

# Verbose logging of quantizer resolution.
VERBOSE: bool = env_to_bool("BREVITAS_TPU_VERBOSE", False)

# Store int4-quantized serving weights packed two-per-byte and unpack in
# VMEM inside the GEMM (kernels/int4.py int4_matmul): halves weight HBM
# footprint; ~1.05x at decode shapes on v5e (PERF.md).
INT4_PACKED_SERVING: bool = env_to_bool("BREVITAS_TPU_INT4_PACKED", True)

# Run the QuantLSTM static-grid fast path's post-GEMM cell through the
# fused Pallas kernel (kernels/lstm_cell.py) on TPU — one VMEM pass for the
# six fake-quant stages + nonlinearities instead of ~6 XLA fusions.
PALLAS_RNN_CELL: bool = env_to_bool("BREVITAS_TPU_PALLAS_RNN_CELL", True)

# Allow Pallas kernels to run in interpret mode on non-TPU backends (slow;
# for tests exercising the kernel paths on CPU).
PALLAS_INTERPRET: bool = env_to_bool("BREVITAS_TPU_PALLAS_INTERPRET", False)

# Wrap the fake-quant chain (core/quant.py::int_quant) in jax.checkpoint so
# its residuals are rematerialized in the backward pass. OFF by default:
# measured 17% SLOWER on the CNV QAT epoch (parity/cnv_qat_ab.py, PERF.md) —
# the checkpoint's optimization barrier breaks the elementwise fusion that
# makes fake-quant nearly free. Read at TRACE time, so flipping it between
# builds pins each compiled graph to its own variant.
REMAT_FAKE_QUANT: bool = env_to_bool("BREVITAS_TPU_REMAT_FAKE_QUANT", False)

# pack the decode KV cache two-positions-per-byte when the K/V quantizers
# are <= 4-bit (2x less cache memory + HBM traffic than int8; exact).
# Policy: "auto" (default) packs only where the int4kv decode kernel
# measured >= int8 decode speed (head_dim >= 128; at head_dim 64 the
# in-VMEM nibble unpack costs ~12%, PERF.md int4-KV section); "1" always
# packs nibble-capable caches (capacity over speed); "0" never packs.
INT4_KV_CACHE: str = os.environ.get("BREVITAS_TPU_INT4_KV", "auto").lower()

# the measured win boundary for the packed int4 KV decode kernel (PERF.md)
INT4_KV_MIN_HEAD_DIM: int = int(
    os.environ.get("BREVITAS_TPU_INT4_KV_MIN_HEAD_DIM", "128"))
