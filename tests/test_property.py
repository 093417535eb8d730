"""Hypothesis property tests: the adjointness and scaling oracles must hold
for ARBITRARY shapes, schemes, and regularization configurations — not just
the hand-picked cases."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pytv4d_tpu.core.schemes import num_channels
from pytv4d_tpu.ops import operators as O
from pytv4d_tpu.ops.tv import tv_and_subgrad

schemes = st.sampled_from(["upwind", "downwind", "central", "hybrid"])
dims = st.tuples(
    st.integers(1, 5),   # Nz
    st.integers(1, 4),   # M
    st.integers(3, 9),   # N_row
    st.integers(3, 9),   # N_col
)
regs = st.tuples(
    st.sampled_from([0.0, 0.3, 1.0, 2.5]),   # reg_z_over_reg
    st.sampled_from([0.0, 0.5, 1.5]),        # reg_time
)


@settings(max_examples=30, deadline=None)
@given(scheme=schemes, shape=dims, reg=regs, seed=st.integers(0, 2**16))
def test_adjointness_property(scheme, shape, reg, seed):
    reg_z, reg_t = reg
    rng = np.random.default_rng(seed)
    Nd = num_channels(scheme, shape[0], shape[1], reg_z, reg_t)
    X = rng.standard_normal(shape)
    Y = rng.standard_normal((shape[0], Nd, shape[1], shape[2], shape[3]))
    kw = dict(reg_z_over_reg=reg_z, reg_time=reg_t)
    DX = np.asarray(O.D(X, scheme, xp=np, **kw))
    DTY = np.asarray(O.D_T(Y, scheme, xp=np, **kw))
    lhs = float(np.sum(Y * DX))
    rhs = float(np.sum(DTY * X))
    scale = np.linalg.norm(Y) * np.linalg.norm(DX) + 1e-30
    assert abs(lhs - rhs) / scale < 1e-12


@settings(max_examples=20, deadline=None)
@given(scheme=schemes, shape=dims, seed=st.integers(0, 2**16),
       c=st.sampled_from([0.5, 2.0, 7.0]))
def test_tv_positive_homogeneous(scheme, shape, seed, c):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal(shape)
    tv1, G1 = tv_and_subgrad(img, scheme, reg_time=0.5, xp=np)
    tvc, Gc = tv_and_subgrad(c * img, scheme, reg_time=0.5, xp=np)
    np.testing.assert_allclose(tvc, c * tv1, rtol=1e-10)
    # subgradient is 0-homogeneous away from ties
    np.testing.assert_allclose(Gc, G1, rtol=1e-8, atol=1e-10)


@settings(max_examples=20, deadline=None)
@given(scheme=schemes, shape=dims, seed=st.integers(0, 2**16))
def test_constant_shift_invariance(scheme, shape, seed):
    """TV is invariant to adding a constant (differences kill it)."""
    rng = np.random.default_rng(seed)
    img = rng.standard_normal(shape)
    tv1, _ = tv_and_subgrad(img, scheme, reg_time=0.5, xp=np)
    tv2, _ = tv_and_subgrad(img + 17.3, scheme, reg_time=0.5, xp=np)
    np.testing.assert_allclose(tv2, tv1, rtol=1e-9)
