"""Fused inverse-solver path (interpreter mode on CPU): the Pallas
TV-dual/primal pass pair inside ``cp_inverse`` must reproduce the jnp
``K=[A; D]`` iteration to f32 round-off — trajectory, duals, loss —
across schemes, norms, fidelities, nonneg and resume.

The jnp inverse run is itself golden-verified (tests/test_solvers.py,
tests/test_fidelity.py), so parity here certifies the fused path."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.solvers.inverse import InverseState, cp_inverse

SHAPE = (4, 3, 16, 128)


def _blur(x):
    """A simple nontrivial linear operator: 3-tap row blur (periodic)."""
    return (x + jnp.roll(x, 1, axis=-1) + jnp.roll(x, -1, axis=-1)) / 3.0


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    truth = jnp.asarray(rng.random(SHAPE), jnp.float32)
    b = _blur(truth) + 0.05 * jnp.asarray(rng.standard_normal(SHAPE),
                                          jnp.float32)
    return b


def _run(b, fused, **kw):
    return cp_inverse(_blur, b, SHAPE, n_iter=8, reg=0.05, op_norm=1.0,
                      fused=fused, **kw)


def _assert_parity(res_f, res_j, rtol=2e-5, atol=3e-6):
    np.testing.assert_allclose(np.asarray(res_f.x), np.asarray(res_j.x),
                               atol=atol, rtol=rtol)
    for name in ("x_bar", "y_A", "y_D"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_f.state, name)),
            np.asarray(getattr(res_j.state, name)), atol=atol, rtol=rtol,
            err_msg=name)
    np.testing.assert_allclose(np.asarray(res_f.loss),
                               np.asarray(res_j.loss), rtol=rtol)


@pytest.mark.parametrize("scheme", ("upwind", "downwind", "central",
                                    "hybrid"))
def test_fused_inverse_matches_jnp_schemes(data, scheme):
    cfg = TVConfig(scheme=scheme, reg_time=0.5)
    _assert_parity(_run(data, True, cfg=cfg), _run(data, False, cfg=cfg))


@pytest.mark.parametrize("norm", ("aniso", "huber"))
def test_fused_inverse_matches_jnp_norms(data, norm):
    cfg = TVConfig(scheme="hybrid", reg_time=0.5, norm=norm)
    _assert_parity(_run(data, True, cfg=cfg), _run(data, False, cfg=cfg))


@pytest.mark.parametrize("fidelity", ("l1", "kl"))
def test_fused_inverse_matches_jnp_fidelities(data, fidelity):
    cfg = TVConfig(scheme="hybrid")
    b = jnp.abs(data) if fidelity == "kl" else data
    kw = dict(cfg=cfg, fidelity=fidelity, nonneg=(fidelity == "kl"))
    _assert_parity(_run(b, True, **kw), _run(b, False, **kw))


def test_fused_inverse_nonneg_and_weight(data):
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    w = jnp.asarray(np.random.default_rng(3).uniform(0.5, 1.5, SHAPE),
                    jnp.float32)
    kw = dict(cfg=cfg, nonneg=True, fidelity_weight=w)
    _assert_parity(_run(data, True, **kw), _run(data, False, **kw))


def test_fused_inverse_resume_matches_one_shot(data):
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    one = _run(data, True, cfg=cfg)
    first = cp_inverse(_blur, data, SHAPE, n_iter=4, reg=0.05, op_norm=1.0,
                       fused=True, cfg=cfg)
    second = cp_inverse(_blur, data, SHAPE, n_iter=4, reg=0.05, op_norm=1.0,
                        fused=True, cfg=cfg, state=first.state)
    np.testing.assert_allclose(np.asarray(second.x), np.asarray(one.x),
                               atol=1e-6, rtol=1e-6)


def test_fused_inverse_resume_interop_with_jnp_state(data):
    """A state produced by the jnp path resumes on the fused path."""
    cfg = TVConfig(scheme="hybrid")
    first = _run(data, False, cfg=cfg)
    resumed = cp_inverse(_blur, data, SHAPE, n_iter=4, reg=0.05,
                         op_norm=1.0, fused=True, cfg=cfg,
                         state=first.state)
    ref = cp_inverse(_blur, data, SHAPE, n_iter=4, reg=0.05, op_norm=1.0,
                     fused=False, cfg=cfg, state=first.state)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(ref.x),
                               atol=3e-6, rtol=2e-5)


def test_fused_inverse_bf16_dual_close(data):
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    ref = _run(data, True, cfg=cfg)
    got = _run(data, True, cfg=cfg, dual_dtype="bfloat16")
    # bf16 dual storage: ~1e-2 relative on the iterate after 8 iterations
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=5e-2, rtol=5e-2)
    assert got.state.y_D.dtype == ref.state.y_D.dtype  # public state f32


def test_fused_guards():
    b = jnp.zeros(SHAPE, jnp.float32)
    with pytest.raises(ValueError, match="precond"):
        cp_inverse(_blur, b, SHAPE, n_iter=1, fused=True, precond=True)
    with pytest.raises(ValueError, match="dual_dtype"):
        cp_inverse(_blur, b, SHAPE, n_iter=1, op_norm=1.0,
                   fused=False, dual_dtype="bfloat16")
    # explicit fused=True on an unfusable problem must fail with the
    # descriptive ValueError, not an opaque Pallas/Mosaic error (ADVICE r3)
    b64 = jnp.zeros(SHAPE, jnp.float64)
    with pytest.raises(ValueError, match="can_fuse"):
        cp_inverse(_blur, b64, SHAPE, n_iter=1, op_norm=1.0, fused=True)
    b3 = jnp.zeros(SHAPE[1:], jnp.float32)

    def blur3(x):
        return x

    with pytest.raises(ValueError, match="can_fuse"):
        cp_inverse(blur3, b3, SHAPE[1:], n_iter=1, op_norm=1.0, fused=True)


def test_f64_stays_on_jnp_path(data):
    """x64 volumes cannot ride the kernels — auto-dispatch must fall back
    (and produce the f64 result), not raise."""
    b = jnp.asarray(np.asarray(data), jnp.float64)
    res = cp_inverse(_blur, b, SHAPE, n_iter=3, reg=0.05, op_norm=1.0)
    assert res.x.dtype == jnp.float64


@pytest.mark.parametrize("fused", (False, True))
def test_loss_every_samples_chunk_ends(data, fused):
    """loss_every=k: same trajectory, loss array = every k-th loss."""
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    full = cp_inverse(_blur, data, SHAPE, n_iter=8, reg=0.05, op_norm=1.0,
                      fused=fused, cfg=cfg)
    sampled = cp_inverse(_blur, data, SHAPE, n_iter=8, reg=0.05,
                         op_norm=1.0, fused=fused, cfg=cfg, loss_every=4)
    np.testing.assert_allclose(np.asarray(sampled.x), np.asarray(full.x),
                               atol=1e-6, rtol=1e-6)
    assert sampled.loss.shape == (2,)
    np.testing.assert_allclose(np.asarray(sampled.loss),
                               np.asarray(full.loss[3::4]), rtol=1e-6)
    with pytest.raises(ValueError, match="loss_every"):
        cp_inverse(_blur, data, SHAPE, n_iter=8, reg=0.05, op_norm=1.0,
                   loss_every=3)


def test_precond_sums_require_precond(data):
    """precond_sums/precond_scale without precond=True must raise on
    EVERY path — including when the fused kernels auto-select (the guard
    used to sit after the fused early-return, silently dropping the
    caller's surrogate sums)."""
    with pytest.raises(ValueError, match="precond_sums requires"):
        cp_inverse(_blur, data, SHAPE, n_iter=2, reg=0.05, op_norm=1.0,
                   precond_sums=(data, data))
    with pytest.raises(ValueError, match="precond_scale requires"):
        cp_inverse(_blur, data, SHAPE, n_iter=2, reg=0.05, op_norm=1.0,
                   precond_scale=1.5)
