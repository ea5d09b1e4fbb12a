"""Pallas kernel tests vs jnp references — run in interpret mode on CPU
(the TPU path is exercised by bench.py on real hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from brevitas_tpu.kernels import (
    fake_quant,
    fake_quant_reference,
    int8_matmul,
    int8_matmul_reference,
)


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_fake_quant_fwd_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((40, 100)).astype(np.float32))
    s, z = jnp.asarray(0.05), jnp.asarray(3.0)
    got = fake_quant(x, s, z, -128.0, 127.0)
    want = fake_quant_reference(x, s, z, lo=-128.0, hi=127.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fake_quant_grads_match_reference(rng):
    x = jnp.asarray(rng.standard_normal(700).astype(np.float32) * 8)
    s, z = jnp.asarray(0.05), jnp.asarray(0.0)

    def loss_k(x, s, z):
        return jnp.sum(fake_quant(x, s, z, -8.0, 7.0) ** 2)

    def loss_r(x, s, z):
        return jnp.sum(fake_quant_reference(x, s, z, lo=-8.0, hi=7.0) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, s, z)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, s, z)
    for a, b, name in zip(gk, gr, "x s z".split()):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad {name}")


def test_fake_quant_ste_clamp_grad(rng):
    x = jnp.asarray(rng.standard_normal(300).astype(np.float32) * 8)
    s, z = jnp.asarray(0.05), jnp.asarray(0.0)
    gx = jax.grad(lambda v: jnp.sum(
        fake_quant(v, s, z, -8.0, 7.0, True)))(x)
    np.testing.assert_allclose(gx, np.ones_like(gx))


def test_fake_quant_odd_shapes(rng):
    # shapes that don't align to (8, 128) tiles
    for shape in [(3,), (5, 7), (1, 129), (17, 3, 5)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = fake_quant(x, jnp.asarray(0.1), jnp.asarray(0.0), -8.0, 7.0)
        want = fake_quant_reference(x, jnp.asarray(0.1), jnp.asarray(0.0),
                                    lo=-8.0, hi=7.0)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_int8_matmul_matches_reference(rng):
    x = jnp.asarray(rng.integers(-128, 128, (64, 96)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (96, 48)), jnp.int8)
    xs = jnp.asarray(0.02)
    ws = jnp.asarray(rng.random(48).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    got = int8_matmul(x, w, xs, ws, b, act="relu")
    want = int8_matmul_reference(x, w, xs, ws, b, act="relu")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_matmul_no_bias_scalar_scale(rng):
    x = jnp.asarray(rng.integers(-8, 8, (10, 300)), jnp.int8)
    w = jnp.asarray(rng.integers(-8, 8, (300, 5)), jnp.int8)
    got = int8_matmul(x, w, jnp.asarray(0.1), jnp.asarray(0.5))
    want = int8_matmul_reference(x, w, jnp.asarray(0.1), jnp.asarray(0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5)
