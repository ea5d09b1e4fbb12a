"""Native (C++ XLA FFI) STE backend tests — the analogue of the reference's
BREVITAS_JIT=1 CI axis that exercises csrc/autograd_ste_ops.cpp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brevitas_tpu.ops import native as N
from brevitas_tpu.ops import (
    binary_sign,
    dpu_round,
    round_to_zero,
    tensor_clamp,
)

pytestmark = pytest.mark.skipif(
    not N.native_ste_available(), reason="native toolchain unavailable")

UNARY = [
    ("round_ste", np.round),
    ("floor_ste", np.floor),
    ("ceil_ste", np.ceil),
    ("round_to_zero_ste", np.trunc),
    ("abs_binary_sign_grad", np.abs),
    ("ternary_sign_ste", np.sign),
]


@pytest.mark.parametrize("name,ref", UNARY, ids=[u[0] for u in UNARY])
def test_native_unary_matches_numpy(name, ref, rng):
    op = N.make_native_ste(name, None)
    x = jnp.asarray(rng.standard_normal(256).astype(np.float32) * 7)
    np.testing.assert_allclose(op(x), ref(np.asarray(x)))
    # straight-through gradient
    g = jax.grad(lambda v: jnp.sum(op(v)))(x)
    np.testing.assert_allclose(g, np.ones_like(g))


def test_native_binary_sign(rng):
    op = N.make_native_ste("binary_sign_ste", None)
    x = jnp.asarray([1.5, -0.2, 0.0])
    np.testing.assert_allclose(op(x), [1.0, -1.0, 1.0])


def test_native_dpu_round():
    op = N.make_native_ste("dpu_round_ste", None)
    x = jnp.asarray([-1.5, -0.5, 0.5, 1.5])
    np.testing.assert_allclose(op(x), np.asarray(dpu_round(x)))


def test_native_tensor_clamp(rng):
    x = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 3)
    got = N.native_tensor_clamp_ste(x, jnp.asarray(-1.0), jnp.asarray(1.0))
    np.testing.assert_allclose(got, np.clip(np.asarray(x), -1, 1))


def test_native_fake_quant_matches_jnp(rng):
    from brevitas_tpu.core import quant as Q

    x = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    scale, zp = jnp.asarray(0.01), jnp.asarray(0.0)
    got = N.native_fake_quant(x, scale, zp, -128.0, 127.0)
    want = Q.int_quant(x, scale, zp, jnp.asarray(8.0), signed=True,
                       narrow_range=False)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_native_reference_doctest():
    # reference IntQuant doctest through the native path
    y = N.native_fake_quant(jnp.asarray([0.042, -0.053, 0.31, -0.44]),
                            0.01, 0.0, -7.0, 7.0)
    np.testing.assert_allclose(y, [0.04, -0.05, 0.07, -0.07], atol=1e-7)


def test_native_under_jit(rng):
    op = N.make_native_ste("round_ste", None)
    x = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 5)
    y = jax.jit(op)(x)
    np.testing.assert_allclose(y, np.round(np.asarray(x)))
