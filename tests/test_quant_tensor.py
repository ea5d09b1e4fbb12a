"""QuantTensor metadata-propagation tests
(mirror of reference tests/brevitas on quant_tensor semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from brevitas_tpu import QuantTensor
from brevitas_tpu.quant_tensor import cat, pack, unpack


def make_qt(vals, scale=0.1, zp=0.0, bw=8.0, signed=True, training=False):
    ints = jnp.round(jnp.asarray(vals) / scale)
    return QuantTensor(
        value=ints * scale, scale=jnp.asarray(scale), zero_point=jnp.asarray(zp),
        bit_width=jnp.asarray(bw), signed=signed, training=training)


def test_is_pytree():
    qt = make_qt([0.1, 0.2])
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 4  # value, scale, zp, bw
    qt2 = jax.tree_util.tree_map(lambda x: x * 1, qt)
    assert isinstance(qt2, QuantTensor)
    assert qt2.signed is True


def test_jit_through_quant_tensor():
    qt = make_qt([0.1, 0.2, -0.3])

    @jax.jit
    def f(q):
        return (q + q).value

    np.testing.assert_allclose(f(qt), 2 * np.asarray(qt.value), rtol=1e-6)


def test_is_valid_and_int():
    qt = make_qt([0.1, 0.2, -0.3])
    assert qt.is_valid()
    ints = qt.int()
    assert ints.dtype == jnp.int8
    np.testing.assert_allclose(ints, [1, 2, -3])
    bad = QuantTensor(jnp.asarray([0.13]), jnp.asarray(0.1), jnp.asarray(0.0),
                      jnp.asarray(8.0), signed=True)
    assert not bad.is_valid()


def test_add_grows_bit_width():
    a = make_qt([0.1], bw=8.0)
    b = make_qt([0.2], bw=8.0)
    out = a + b
    # range [-256, 254+... ] → 9 bits
    assert float(out.bit_width) == 9.0
    np.testing.assert_allclose(out.value, [0.3], atol=1e-6)
    np.testing.assert_allclose(out.scale, 0.1, rtol=1e-6)


def test_mul_multiplies_scales_adds_bit_widths():
    a = make_qt([0.2], scale=0.1, bw=4.0)
    b = make_qt([0.4], scale=0.2, bw=8.0)
    out = a * b
    assert float(out.bit_width) == 12.0
    np.testing.assert_allclose(out.scale, 0.02, rtol=1e-6)
    assert out.signed


def test_neg_of_unsigned_becomes_signed():
    a = make_qt([0.3], signed=False)
    out = -a
    assert out.signed
    assert float(out.bit_width) == 9.0
    np.testing.assert_allclose(out.value, [-0.3], atol=1e-6)


def test_abs_of_signed_drops_bit():
    a = make_qt([-0.3], signed=True)
    out = abs(a)
    assert not out.signed
    assert float(out.bit_width) == 7.0
    np.testing.assert_allclose(out.value, [0.3], atol=1e-6)


def test_cat_checks_and_averages_metadata():
    a = make_qt([0.1, 0.2])
    b = make_qt([0.3])
    out = cat([a, b], axis=0)
    assert out.value.shape == (3,)
    np.testing.assert_allclose(out.scale, 0.1, rtol=1e-6)
    assert out.signed


def test_cat_mixed_falls_back_to_plain():
    a = make_qt([0.1])
    out = cat([a, jnp.asarray([0.5])], axis=0)
    assert out.scale is None


def test_transpose_moves_matching_rank_metadata():
    val = jnp.ones((2, 3))
    scale = jnp.full((2, 1), 0.5)
    qt = QuantTensor(val, scale, jnp.asarray(0.0), jnp.asarray(8.0), signed=True)
    out = qt.transpose(1, 0)
    assert out.value.shape == (3, 2)
    assert out.scale.shape == (1, 2)  # followed the transpose
    assert out.zero_point.shape == ()  # scalar untouched


def test_pack_unpack():
    x = jnp.ones(3)
    assert unpack(x) is x
    qt = pack(x)
    assert isinstance(qt, QuantTensor)
    assert unpack(qt) is x


def test_cat_rejects_mismatched_bit_width():
    a = make_qt([0.1], bw=4.0)
    b = make_qt([0.2], bw=8.0)
    with np.testing.assert_raises(ValueError):
        cat([a, b], axis=0)


def test_cat_rejects_mismatched_scale():
    a = make_qt([0.1], scale=0.1)
    b = make_qt([0.2], scale=0.2)
    with np.testing.assert_raises(ValueError):
        cat([a, b], axis=0)


def test_mul_rejects_nonzero_zero_point():
    a = make_qt([0.1], zp=3.0)
    with np.testing.assert_raises(ValueError):
        _ = a * a


def test_checks_skipped_under_tracing():
    a = make_qt([0.1], bw=8.0)
    b = make_qt([0.2], bw=8.0)

    @jax.jit
    def f(x, y):
        return cat([x, y], axis=0).value

    out = f(a, b)  # traced metadata → checks degrade gracefully
    assert out.shape == (2,)
