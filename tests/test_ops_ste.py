"""STE primitive tests: forward math + gradient pass-through.

Mirror of reference tests/brevitas/function/test_ops_ste.py +
test_autograd_ste_ops.py: each op's forward matches its non-STE primitive and
its VJP is identity (or sign, for abs_binary_sign_grad).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brevitas_tpu import ops

UNARY_STE_OPS = [
    (ops.round_ste, np.round),
    (ops.floor_ste, np.floor),
    (ops.ceil_ste, np.ceil),
    (ops.round_to_zero_ste, np.trunc),
    (ops.ternary_sign_ste, np.sign),
]


@pytest.mark.parametrize("ste_op,ref_op", UNARY_STE_OPS,
                         ids=[f[0].__name__ for f in UNARY_STE_OPS])
def test_unary_ste_forward(ste_op, ref_op, rng):
    x = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 10)
    np.testing.assert_allclose(ste_op(x), ref_op(np.asarray(x)), rtol=0, atol=0)


@pytest.mark.parametrize("ste_op,ref_op", UNARY_STE_OPS,
                         ids=[f[0].__name__ for f in UNARY_STE_OPS])
def test_unary_ste_grad_is_identity(ste_op, ref_op, rng):
    x = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 5)
    g = jax.grad(lambda v: jnp.sum(ste_op(v) * 3.0))(x)
    np.testing.assert_allclose(g, 3.0 * np.ones_like(x))


def test_binary_sign_ste():
    x = jnp.asarray([2.1, -0.3, 0.0])
    np.testing.assert_allclose(ops.binary_sign_ste(x), [1.0, -1.0, 1.0])
    g = jax.grad(lambda v: jnp.sum(ops.binary_sign_ste(v)))(x)
    np.testing.assert_allclose(g, np.ones(3))


def test_dpu_round():
    x = jnp.asarray([-1.5, -0.5, 0.5, 1.5])
    # reference doctest: dpu_round([-1.5,-0.5,0.5,1.5]) == [-1,-0,0,2]
    np.testing.assert_allclose(ops.dpu_round(x), [-1.0, 0.0, 0.0, 2.0])
    g = jax.grad(lambda v: jnp.sum(ops.dpu_round_ste(v)))(x)
    np.testing.assert_allclose(g, np.ones(4))


def test_round_to_zero():
    x = jnp.asarray([-1.5, -0.5, 0.5, 1.5])
    np.testing.assert_allclose(ops.round_to_zero(x), [-1.0, 0.0, 0.0, 1.0])


def test_tensor_clamp_forward_and_grad():
    x = jnp.asarray([1.7, -0.5, 0.1])
    lo, hi = jnp.asarray(0.0), jnp.asarray(1.0)
    np.testing.assert_allclose(
        ops.tensor_clamp(x, lo, hi), [1.0, 0.0, 0.1], rtol=1e-6)
    # STE variant: gradient passes through everywhere for x, zero for bounds
    gx, glo, ghi = jax.grad(
        lambda *a: jnp.sum(ops.tensor_clamp_ste(*a)), argnums=(0, 1, 2))(x, lo, hi)
    np.testing.assert_allclose(gx, np.ones(3))
    np.testing.assert_allclose(glo, 0.0)
    np.testing.assert_allclose(ghi, 0.0)
    # non-STE variant: zero gradient outside the range
    gx2 = jax.grad(lambda v: jnp.sum(ops.tensor_clamp(v, lo, hi)))(x)
    np.testing.assert_allclose(gx2, [0.0, 0.0, 1.0])


def test_scalar_clamp_ste_grad():
    x = jnp.asarray([-3.0, 0.5, 3.0])
    y = ops.scalar_clamp_ste(x, -1.0, 1.0)
    np.testing.assert_allclose(y, [-1.0, 0.5, 1.0])
    g = jax.grad(lambda v: jnp.sum(ops.scalar_clamp_ste(v, -1.0, 1.0)))(x)
    np.testing.assert_allclose(g, np.ones(3))
    y2 = ops.scalar_clamp_min_ste(x, 0.0)
    np.testing.assert_allclose(y2, [0.0, 0.5, 3.0])


def test_abs_binary_sign_grad():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    y = ops.abs_binary_sign_grad(x)
    np.testing.assert_allclose(y, [2.0, 0.0, 3.0])
    g = jax.grad(lambda v: jnp.sum(ops.abs_binary_sign_grad(v)))(x)
    # subgradient at 0 is +1, not 0
    np.testing.assert_allclose(g, [-1.0, 1.0, 1.0])


@pytest.mark.parametrize("signed,narrow,expected_max,expected_min", [
    (True, True, 127.0, -127.0),
    (True, False, 127.0, -128.0),
    (False, False, 255.0, 0.0),
    (False, True, 254.0, 0.0),
])
def test_max_min_int(signed, narrow, expected_max, expected_min):
    bw = jnp.asarray(8.0)
    assert float(ops.max_int(signed, narrow, bw)) == expected_max
    assert float(ops.min_int(signed, narrow, bw)) == expected_min


def test_ste_composes_with_jit_and_vmap(rng):
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    f = jax.jit(jax.vmap(lambda v: jax.grad(lambda u: jnp.sum(ops.round_ste(u)))(v)))
    np.testing.assert_allclose(f(x), np.ones_like(x))
