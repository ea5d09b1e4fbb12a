"""Property-based numerics tests (reference tier-1 strategy: Hypothesis over
quant math and STE gradients, tests/brevitas/hyp_helper.py + test_int_quant.py
/ test_ops_ste.py — SURVEY §4).

Profile mirrors the reference: fixed seed, no deadline, modest example
counts (every example dispatches real jax ops).
"""

import hypothesis
import hypothesis.extra.numpy as hnp
import hypothesis.strategies as st
import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings

import brevitas_tpu.core.quant as Qf
import brevitas_tpu.ops.ste as ste
from brevitas_tpu.ops import max_int, min_int

hypothesis.settings.register_profile(
    "brevitas_tpu", deadline=None, max_examples=25, derandomize=True)
hypothesis.settings.load_profile("brevitas_tpu")

floats = hnp.arrays(
    np.float32, hnp.array_shapes(min_dims=1, max_dims=2, max_side=16),
    elements=st.floats(-100, 100, width=32))
pos_floats = st.floats(0.0009765625, 50.0, width=32)  # 2^-10, f32-exact


# -- STE ops ---------------------------------------------------------------


@given(floats)
def test_round_ste_forward_and_grad_passthrough(x):
    x = jnp.asarray(x)
    np.testing.assert_array_equal(np.asarray(ste.round_ste(x)),
                                  np.asarray(jnp.round(x)))
    g = jax.grad(lambda v: jnp.sum(ste.round_ste(v)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(x))


@given(floats)
def test_floor_ceil_ste_grad_passthrough(x):
    x = jnp.asarray(x)
    for fn, ref in ((ste.floor_ste, jnp.floor), (ste.ceil_ste, jnp.ceil)):
        np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(ref(x)))
        g = jax.grad(lambda v: jnp.sum(fn(v)))(x)
        np.testing.assert_array_equal(np.asarray(g), np.ones_like(x))


@given(floats, st.floats(-5, 0, width=32), st.floats(0, 5, width=32))
def test_tensor_clamp_ste_clamps_but_grads_pass(x, lo, hi):
    x, lo, hi = jnp.asarray(x), jnp.float32(lo), jnp.float32(hi)
    y = ste.tensor_clamp_ste(x, jnp.full_like(x, lo), jnp.full_like(x, hi))
    assert float(jnp.min(y)) >= lo - 1e-6 and float(jnp.max(y)) <= hi + 1e-6
    g = jax.grad(lambda v: jnp.sum(
        ste.tensor_clamp_ste(v, jnp.full_like(v, lo),
                             jnp.full_like(v, hi))))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(x))


@given(floats)
def test_binary_sign_ste_is_sign_with_unit_grad(x):
    x = jnp.asarray(x)
    y = ste.binary_sign_ste(x)
    assert set(np.unique(np.asarray(y))) <= {-1.0, 1.0}
    g = jax.grad(lambda v: jnp.sum(ste.binary_sign_ste(v)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(x))


# -- int quant -------------------------------------------------------------


def _quant(x, scale, bw, signed=True, narrow=False):
    return Qf.int_quant(jnp.asarray(x), jnp.float32(scale), jnp.zeros(()),
                        jnp.float32(bw), signed=signed, narrow_range=narrow)


@given(floats, pos_floats, st.sampled_from([2.0, 4.0, 8.0]),
       st.booleans(), st.booleans())
def test_int_quant_on_grid_and_in_range(x, scale, bw, signed, narrow):
    if not signed and narrow:
        return  # unsigned narrow is not a meaningful config
    y = _quant(x, scale, bw, signed, narrow)
    codes = np.asarray(y) / scale
    np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)
    lo = float(min_int(signed, narrow, jnp.float32(bw)))
    hi = float(max_int(signed, narrow, jnp.float32(bw)))
    assert codes.min() >= lo - 1e-4 and codes.max() <= hi + 1e-4


@given(floats, pos_floats, st.sampled_from([2.0, 4.0, 8.0]))
def test_int_quant_idempotent(x, scale, bw):
    y1 = _quant(x, scale, bw)
    y2 = _quant(y1, scale, bw)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


@given(floats, pos_floats, st.sampled_from([4.0, 8.0]))
def test_int_quant_error_bounded_by_half_step(x, scale, bw):
    y = _quant(x, scale, bw)
    hi = float(max_int(True, False, jnp.float32(bw))) * scale
    lo = float(min_int(True, False, jnp.float32(bw))) * scale
    inside = np.clip(np.asarray(x), lo, hi)
    err = np.abs(np.asarray(y) - inside)
    assert err.max() <= scale / 2 + 1e-4


@given(floats, pos_floats)
def test_binary_quant_two_levels(x, scale):
    y, bw = Qf.binary_quant(jnp.asarray(x), jnp.float32(scale))
    vals = set(np.unique(np.asarray(y)))
    assert vals <= {np.float32(-scale), np.float32(scale)}
    assert float(bw) == 1.0


@given(pos_floats, pos_floats, st.sampled_from([2.0, 4.0, 8.0]))
def test_rescaling_scale_monotonic_in_threshold(t1, t2, bw):
    s1 = float(Qf.rescaling_scale(jnp.float32(t1), jnp.float32(bw),
                                  signed=True, narrow_range=False))
    s2 = float(Qf.rescaling_scale(jnp.float32(t2), jnp.float32(bw),
                                  signed=True, narrow_range=False))
    assert (t1 <= t2) == (s1 <= s2) or np.isclose(s1, s2)


# -- stats -----------------------------------------------------------------


@given(floats)
def test_abs_max_dominates(x):
    import brevitas_tpu.core.stats as S

    v = jnp.asarray(x).reshape(1, -1)
    m = float(S.abs_max(v)[0])
    assert m >= np.abs(np.asarray(x)).max() - 1e-6


@given(floats, st.floats(1.0, 99.0))
def test_percentile_within_range(x, q):
    import brevitas_tpu.core.stats as S

    v = jnp.asarray(x).reshape(1, -1)
    p = float(S.abs_percentile(v, q)[0])
    a = np.abs(np.asarray(x))
    assert a.min() - 1e-6 <= p <= a.max() + 1e-6
