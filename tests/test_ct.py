"""CT projector + TV-regularized reconstruction tests: projector adjointness
(the same oracle as the TV operators), geometry sanity, and recon quality on
a phantom."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.models.ct import (
    cp_reconstruct,
    estimate_op_norm,
    make_projector,
    radon,
)
from pytv4d_tpu.utils import synthetic_phantom


def test_radon_shapes_and_mass():
    img = np.zeros((1, 1, 32, 32), np.float32)
    img[0, 0, 8:24, 8:24] = 1.0
    angles = jnp.linspace(0, np.pi, 12, endpoint=False)
    sino = radon(img, angles)
    assert sino.shape == (1, 1, 12, 32)
    # each projection integrates the image mass (up to edge interpolation)
    mass = float(img.sum())
    sums = np.asarray(sino.sum(axis=-1))[0, 0]
    np.testing.assert_allclose(sums, mass, rtol=2e-2)


def test_projector_adjointness():
    """<y, A x> == <A_T y, x> to fp precision (jax.linear_transpose)."""
    shape = (2, 2, 24, 24)
    angles = jnp.linspace(0, np.pi, 10, endpoint=False)
    A, A_T = make_projector(shape, angles, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape))
    y = jnp.asarray(rng.random((2, 2, 10, 24)))
    lhs = float(jnp.sum(y * A(x)))
    rhs = float(jnp.sum(A_T(y) * x))
    assert abs(lhs - rhs) / abs(lhs) < 1e-12


def test_per_frame_angles():
    """Dynamic CT: distinct angle sets per time frame (the reference paper's
    setting)."""
    img = np.random.default_rng(1).random((1, 3, 16, 16)).astype(np.float32)
    angles = jnp.stack([jnp.linspace(0, np.pi, 5, endpoint=False) + d
                        for d in (0.0, 0.1, 0.2)])
    sino = radon(img, angles)
    assert sino.shape == (1, 3, 5, 16)
    # frame m must equal projecting frame m with its own angles
    solo = radon(img[:, 1:2], angles[1])
    np.testing.assert_allclose(np.asarray(sino[:, 1:2]), np.asarray(solo),
                               rtol=1e-6)


def test_op_norm_estimate_positive():
    shape = (1, 1, 16, 16)
    angles = jnp.linspace(0, np.pi, 8, endpoint=False)
    A, A_T = make_projector(shape, angles)
    n = float(estimate_op_norm(A, A_T, shape))
    assert n > 1.0  # projector sums N samples per ray


def test_cp_reconstruction_recovers_phantom():
    truth2d = synthetic_phantom(32).astype(np.float32)
    truth = truth2d[None, None] / 255.0
    angles = jnp.linspace(0, np.pi, 40, endpoint=False)
    sino = radon(truth, angles)
    res = cp_reconstruct(sino, angles, truth.shape, n_iter=80, reg=0.02,
                         cfg=TVConfig(scheme="hybrid"))
    loss = np.asarray(res.loss)
    assert loss[-1] < 0.05 * loss[0]
    x = np.asarray(res.x)[0, 0]
    t = np.asarray(truth)[0, 0]
    corr = np.corrcoef(x.ravel(), t.ravel())[0, 1]
    assert corr > 0.95, f"reconstruction correlation {corr:.3f}"


def test_fbp_reconstructs_well_sampled():
    """FBP on densely-sampled data recovers the phantom (classical result),
    and warm-starting the TV solver with it speeds convergence."""
    from pytv4d_tpu.models.ct import fbp

    truth = (synthetic_phantom(48).astype(np.float32) / 255.0)[None, None]
    angles = jnp.linspace(0, np.pi, 90, endpoint=False)
    sino = radon(truth, angles)
    rec = fbp(sino, angles)
    assert rec.shape == truth.shape
    corr = np.corrcoef(np.asarray(rec).ravel(), truth.ravel())[0, 1]
    # ramp-filter ringing on a 48^2 grid caps FBP quality; ~0.89 is expected
    assert corr > 0.85, corr

    cold = cp_reconstruct(sino, angles, truth.shape, n_iter=20, reg=0.01)
    warm = cp_reconstruct(sino, angles, truth.shape, n_iter=20, reg=0.01,
                          x_init=rec)
    assert float(warm.loss[-1]) < float(cold.loss[-1])


def test_fbp_per_frame_angles():
    from pytv4d_tpu.models.ct import fbp

    img = np.random.default_rng(3).random((1, 2, 16, 16)).astype(np.float32)
    angles = jnp.stack([jnp.linspace(0, np.pi, 8, endpoint=False),
                        jnp.linspace(0, np.pi, 8, endpoint=False) + 0.05])
    rec = fbp(radon(img, angles), angles)
    assert rec.shape == img.shape


def test_radon_angle_batching_matches_single_sweep():
    """Chunked-angle radon/backprojection (the production-scale path) must
    equal the single-sweep vmap bit-for-bit-ish."""
    from pytv4d_tpu.models.ct import fbp, radon

    rng = np.random.default_rng(21)
    vol = jnp.asarray(rng.random((2, 2, 24, 24)), jnp.float32)
    angles = jnp.linspace(0.0, np.pi, 13, endpoint=False)

    full = radon(vol, angles, angle_batch=100)
    for B in (1, 4, 5):  # incl. a non-divisor (padding path)
        got = radon(vol, angles, angle_batch=B)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   rtol=1e-5, atol=1e-4)

    # per-frame angle sets through the batched path
    pf = jnp.stack([angles, angles + 0.1])
    full_pf = radon(vol, pf, angle_batch=100)
    got_pf = radon(vol, pf, angle_batch=4)
    np.testing.assert_allclose(np.asarray(got_pf), np.asarray(full_pf),
                               rtol=1e-5, atol=1e-4)

    # fbp auto-batches; tiny sizes take the single-sweep branch — force the
    # chunked one via a small budget
    import pytv4d_tpu.models.ct as ct

    sino = full
    a = np.asarray(fbp(sino, angles))
    old = ct._RADON_GATHER_BUDGET
    try:
        ct._RADON_GATHER_BUDGET = 4096
        b = np.asarray(fbp(sino, angles))
    finally:
        ct._RADON_GATHER_BUDGET = old
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
