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


def test_int8_matmul_kblocked_large_k(rng):
    """K > single-pass threshold exercises the blocked-accumulation path."""
    import brevitas_tpu.kernels.int_matmul as im

    old = im._BK_SINGLE, im._BK
    im._BK_SINGLE, im._BK = 128, 128  # force K-blocking at test scale
    try:
        x = jnp.asarray(rng.integers(-128, 128, (64, 300)), jnp.int8)
        w = jnp.asarray(rng.integers(-128, 128, (300, 48)), jnp.int8)
        ws = jnp.asarray(rng.random(48).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal(48).astype(np.float32))
        got = int8_matmul(x, w, jnp.asarray(0.02), ws, b, act="relu")
        want = int8_matmul_reference(x, w, jnp.asarray(0.02), ws, b, act="relu")
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        im._BK_SINGLE, im._BK = old


def test_int4_pack_roundtrip(rng):
    from brevitas_tpu.kernels.int4 import (
        pack_int4,
        pack_int4_np,
        unpack_int4,
        unpack_int4_np,
    )

    v = rng.integers(-8, 8, (6, 10)).astype(np.int8)
    packed = pack_int4_np(v)
    assert packed.shape == (6, 5)
    np.testing.assert_array_equal(unpack_int4_np(packed), v)
    # jnp twins agree
    np.testing.assert_array_equal(np.asarray(unpack_int4(pack_int4(jnp.asarray(v)))), v)


def test_native_export_int4_packing(tmp_path, rng):
    from flax import nnx

    import brevitas_tpu.nn as qnn
    from brevitas_tpu.export import export_native, load_native
    from brevitas_tpu.quant import presets

    layer = qnn.QuantLinear(8, 6, rngs=nnx.Rngs(0),
                            weight_quant=presets.Int4WeightPerTensorFloat)

    class Holder(nnx.Module):
        def __init__(self, l):
            self.l = l

        def __call__(self, x):
            return self.l(x)

    m = Holder(layer)
    path = str(tmp_path / "m4.npz")
    export_native(m, path)
    loaded = load_native(path)
    entry = loaded["l"]
    assert entry["meta"]["int4_packed"]
    assert entry["w_int"].shape == (8, 6)  # unpacked on load
    qw = layer.quant_weight()
    np.testing.assert_allclose(
        entry["w_int"].astype(np.float32) * entry["w_scale"],
        np.asarray(qw.value), rtol=1e-5, atol=1e-6)


def test_fake_quant_multiblock_grads(rng):
    """Ragged multi-block grids must not fold padding into dscale/dzp."""
    n = 1000 * 128  # rows=1000: >1 block of 512 and not a block multiple
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 4)
    s, z = jnp.asarray(0.05), jnp.asarray(1.0)
    gk = jax.grad(lambda *a: jnp.sum(fake_quant(*a, -8.0, 7.0) ** 2),
                  argnums=(0, 1, 2))(x, s, z)
    gr = jax.grad(lambda *a: jnp.sum(
        fake_quant_reference(*a, lo=-8.0, hi=7.0) ** 2),
        argnums=(0, 1, 2))(x, s, z)
    for a, b, name in zip(gk, gr, "x s z".split()):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=f"grad {name}")


def test_fake_quant_ste_clamp_scale_zp_grads(rng):
    """ste_clamp=True must match the reference's STE-clamp scale/zp grads."""
    x = jnp.asarray(rng.standard_normal(512).astype(np.float32) * 8)
    s, z = jnp.asarray(0.05), jnp.asarray(0.5)
    gk = jax.grad(lambda *a: jnp.sum(fake_quant(*a, -8.0, 7.0, True)),
                  argnums=(0, 1, 2))(x, s, z)
    gr = jax.grad(lambda *a: jnp.sum(
        fake_quant_reference(*a, lo=-8.0, hi=7.0, ste_clamp=True)),
        argnums=(0, 1, 2))(x, s, z)
    for a, b, name in zip(gk, gr, "x s z".split()):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad {name}")
