"""Int4 pack/unpack utilities.

The v5e MXU computes int8; int4's win is storage and HBM bandwidth — weights
are stored two nibbles per byte and unpacked to int8 at the VMEM boundary.
Used by the native export artifact (halves int4 checkpoint size) and by
int4 serving GEMMs (unpack fuses into the matmul's weight load under XLA).
"""

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def pack_int4(values: Array) -> Array:
    """Pack int4 values (range [-8, 7], stored in an int8/int32 array whose
    LAST dim is even) into int8 bytes: low nibble = even index, high nibble =
    odd index. Output last dim is halved."""
    v = jnp.asarray(values, jnp.int8)
    assert v.shape[-1] % 2 == 0, "last dim must be even to pack"
    lo = v[..., 0::2] & 0x0F
    hi = (v[..., 1::2] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4(packed: Array, signed: bool = True) -> Array:
    """Inverse of pack_int4 — sign-extends nibbles when ``signed`` (int4 in
    [-8,7]); zero-extends for uint4 values in [0,15]."""
    p = jnp.asarray(packed, jnp.int8)
    if signed:
        lo = (p << 4) >> 4       # arithmetic shifts sign-extend the nibble
        hi = p >> 4
    else:
        lo = p & 0x0F
        hi = (p >> 4) & 0x0F
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*p.shape[:-1], p.shape[-1] * 2)


def pack_int4_np(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.int8)
    lo = v[..., 0::2] & 0x0F
    hi = (v[..., 1::2] & 0x0F) << 4
    return (lo | hi).astype(np.int8)


def unpack_int4_np(packed: np.ndarray, signed: bool = True) -> np.ndarray:
    p = packed.astype(np.int8)
    if signed:
        lo = ((p << 4).astype(np.int8) >> 4)
        hi = p >> 4
    else:
        lo = p & 0x0F
        hi = (p >> 4) & 0x0F
    out = np.stack([lo, hi], axis=-1)
    return out.reshape(*p.shape[:-1], p.shape[-1] * 2)
