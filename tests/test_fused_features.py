"""Fused-kernel feature-surface parity (interpreter mode): static masks,
weight_time planes, anisotropic TV — every combination the public API accepts
on the fused path must match the jnp path to fp32 round-off
(``tv_operators_CPU.py:148-151`` mask semantics, ``README.md:258``
weight-matrix to-do, L1,1 extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.kernels.dispatch import can_fuse, t_plane_multiplier
from pytv4d_tpu.kernels.fused import cp_step_fused, tv_and_subgrad_fused
from pytv4d_tpu.ops.tv import tv_and_subgrad
from pytv4d_tpu.solvers.cp import CPState, cp_step, default_tau, init_state

SCHEMES = ("upwind", "downwind", "central", "hybrid")
SHAPE = (4, 3, 16, 128)


@pytest.fixture(scope="module")
def x0():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.random(SHAPE), jnp.float32)


@pytest.fixture(scope="module")
def mask():
    m = np.zeros((1, 1, SHAPE[2], SHAPE[3]), bool)
    m[0, 0, 4:10, 30:90] = True
    return m


@pytest.fixture(scope="module")
def wt():
    rng = np.random.default_rng(4)
    return jnp.asarray(0.5 + rng.random((1, 1, SHAPE[2], SHAPE[3])),
                       jnp.float32)


def _combos(mask, wt):
    return [(mask, None, "mask"), (None, wt, "wt"), (mask, wt, "mask+wt")]


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("norm", ["iso", "aniso", "huber"])
def test_tv_subgrad_fused_mask_weight(x0, mask, wt, scheme, norm):
    for ms, w_t, label in _combos(mask, wt):
        cfg = TVConfig(scheme=scheme, reg_time=0.7, factor_reg_static=0.3,
                       norm=norm)
        assert can_fuse(SHAPE, cfg, mask_static=ms, weight_time=w_t)
        tm = t_plane_multiplier(SHAPE, cfg, ms, w_t)
        assert tm is not None and tm.shape == SHAPE[2:]
        tv_r, G_r = tv_and_subgrad(
            x0, scheme, reg_time=0.7, factor_reg_static=0.3,
            mask_static=ms if ms is not None else False, weight_time=w_t,
            norm_type=norm)
        tv_g, G_g = tv_and_subgrad_fused(x0, cfg, interpret=True, tmul=tm)
        assert float(tv_g) == pytest.approx(float(tv_r), rel=1e-5), label
        np.testing.assert_allclose(np.asarray(G_g), np.asarray(G_r),
                                   atol=5e-6, rtol=1e-4, err_msg=label)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("norm", ["iso", "aniso", "huber"])
def test_cp_step_fused_mask_weight(x0, mask, wt, scheme, norm):
    rng = np.random.default_rng(5)
    for ms, w_t, label in _combos(mask, wt):
        cfg = TVConfig(scheme=scheme, reg_time=0.7, factor_reg_static=0.3,
                       norm=norm)
        tm = t_plane_multiplier(SHAPE, cfg, ms, w_t)
        tau = default_tau(cfg, SHAPE[0], SHAPE[1])
        st = init_state(x0, cfg)
        st = CPState(st.x, jnp.asarray(rng.random(SHAPE), jnp.float32),
                     jnp.asarray(rng.random(st.y_D.shape), jnp.float32))
        ref, loss_r = cp_step(st, x0, reg=0.5, sigma_D=0.5, sigma_A=1.0,
                              tau=tau, cfg=cfg,
                              mask_static=ms if ms is not None else False,
                              weight_time=w_t)
        got, loss_g = cp_step_fused(st, x0, reg=0.5, sigma_D=0.5,
                                    sigma_A=1.0, tau=tau, cfg=cfg,
                                    interpret=True, tmul=tm)
        np.testing.assert_allclose(np.asarray(got.y_D), np.asarray(ref.y_D),
                                   atol=5e-6, rtol=1e-4, err_msg=label)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   atol=5e-6, rtol=1e-4, err_msg=label)
        assert float(loss_g) == pytest.approx(float(loss_r), rel=2e-5), label


def test_solver_auto_dispatch_with_mask(x0, mask):
    """chambolle_pock / subgradient_descent must take the fused path for a
    plane mask and match the forced-jnp path end to end."""
    from pytv4d_tpu.solvers.cp import chambolle_pock
    from pytv4d_tpu.solvers.gd import subgradient_descent

    cfg = TVConfig(scheme="hybrid", reg_time=0.5, factor_reg_static=0.2)
    a = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, mask_static=mask,
                       fused=False)
    b = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, mask_static=mask,
                       fused=True)
    np.testing.assert_allclose(np.asarray(b.loss), np.asarray(a.loss),
                               rtol=1e-4)
    ga = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                             mask_static=mask, fused=False)
    gb = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                             mask_static=mask, fused=True)
    np.testing.assert_allclose(np.asarray(gb.loss), np.asarray(ga.loss),
                               rtol=1e-4)


def test_gd_fused_aniso_end_to_end(x0):
    """subgradient_descent auto-selects the fused kernels for aniso now."""
    from pytv4d_tpu.solvers.gd import subgradient_descent

    cfg = TVConfig(scheme="hybrid", reg_time=0.5, norm="aniso")
    a = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                            fused=False)
    b = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                            fused=True)
    np.testing.assert_allclose(np.asarray(b.loss), np.asarray(a.loss),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               atol=1e-5, rtol=1e-4)


def test_sharded_fused_with_mask(x0, mask):
    """Plane masks on the sharded fused CP and GD solvers (replicated tmul
    plane over the (z, t) mesh) must track the unsharded jnp path."""
    from pytv4d_tpu.kernels.fused import to_internal_layout
    from pytv4d_tpu.parallel import (
        internal_d_sharding,
        make_sharded_cp_solver_fused,
        make_sharded_gd_solver_fused,
    )
    from pytv4d_tpu.parallel.mesh import make_mesh, shard_volume
    from pytv4d_tpu.solvers.cp import chambolle_pock
    from pytv4d_tpu.solvers.gd import subgradient_descent

    cfg = TVConfig(scheme="hybrid", reg_time=0.5, factor_reg_static=0.2)
    mesh = make_mesh(z=8, t=1)  # all 8 virtual devices along z
    shape = (8,) + SHAPE[1:]
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(rng.random(shape), jnp.float32)

    ref = chambolle_pock(x0, n_iter=12, reg=0.4, cfg=cfg, mask_static=mask,
                         fused=False)
    solve = make_sharded_cp_solver_fused(mesh, cfg, shape, reg=0.4,
                                         n_iter=12, shard_time=False,
                                         mask_static=mask)
    st = init_state(x0, cfg)
    _, _, _, losses = solve(
        shard_volume(x0, mesh, shard_time=False),
        shard_volume(st.x, mesh, shard_time=False),
        shard_volume(st.y_A, mesh, shard_time=False),
        jax.device_put(to_internal_layout(st.y_D),
                       internal_d_sharding(mesh, shard_time=False)),
    )
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref.loss),
                               rtol=1e-5)

    gref = subgradient_descent(x0, n_iter=12, reg=0.4, step_size=1e-2,
                               cfg=cfg, mask_static=mask, fused=False)
    gsolve = make_sharded_gd_solver_fused(mesh, cfg, shape, reg=0.4,
                                          n_iter=12, step_size=1e-2,
                                          shard_time=False, mask_static=mask)
    _, glosses = gsolve(shard_volume(x0, mesh, shard_time=False),
                        shard_volume(x0, mesh, shard_time=False))
    np.testing.assert_allclose(np.asarray(glosses), np.asarray(gref.loss),
                               rtol=1e-5)


def test_bf16_primary_storage(x0):
    """bf16 PRIMARY storage (x, y_A, x0, G in bf16; compute stays f32):
    can_fuse accepts it, trajectories track f32 within bf16 rounding, and
    public dtypes come back bf16."""
    from pytv4d_tpu.solvers.cp import chambolle_pock
    from pytv4d_tpu.solvers.gd import subgradient_descent

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    assert can_fuse(SHAPE, cfg, dtype="bfloat16")
    xb = x0.astype(jnp.bfloat16)

    tv_r, G_r = tv_and_subgrad(x0, "hybrid", reg_time=0.5)
    tv_g, G_g = tv_and_subgrad_fused(xb, cfg, interpret=True)
    assert G_g.dtype == jnp.bfloat16
    assert float(tv_g) == pytest.approx(float(tv_r), rel=2e-2)

    a = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, fused=True)
    b = chambolle_pock(xb, n_iter=20, reg=0.3, cfg=cfg, fused=True)
    assert b.x.dtype == jnp.bfloat16 and b.state.y_D.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(b.loss, np.float32),
                               np.asarray(a.loss), rtol=3e-2)

    ga = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                             fused=True)
    gb = subgradient_descent(xb, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                             fused=True)
    assert gb.x.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gb.loss, np.float32),
                               np.asarray(ga.loss), rtol=3e-2)


def test_bf16_primary_row_tiled(x0, monkeypatch):
    """bf16 primary with row tiling engages the 16-row (xthin) thin blocks."""
    import pytv4d_tpu.kernels.fused as F
    from pytv4d_tpu.solvers.cp import chambolle_pock

    monkeypatch.setattr(F, "_TILE_BYTES_TARGET", 16 * 1024)
    for f in (F.make_cp_dual_kernel, F.make_cp_primal_kernel,
              F.make_tv_norms_kernel, F.make_tv_subgrad_kernel):
        f.cache_clear()
    try:
        rng = np.random.default_rng(11)
        shape = (3, 2, 64, 128)
        xf = jnp.asarray(rng.random(shape), jnp.float32)
        cfg = TVConfig(scheme="hybrid", reg_time=0.5)
        assert F.choose_row_tile(64, 128, 8, 2, min_rows=16) < 64
        a = chambolle_pock(xf, n_iter=10, reg=0.3, cfg=cfg, fused=True)
        b = chambolle_pock(xf.astype(jnp.bfloat16), n_iter=10, reg=0.3,
                           cfg=cfg, fused=True)
        np.testing.assert_allclose(np.asarray(b.loss, np.float32),
                                   np.asarray(a.loss), rtol=3e-2)
    finally:
        for f in (F.make_cp_dual_kernel, F.make_cp_primal_kernel,
                  F.make_tv_norms_kernel, F.make_tv_subgrad_kernel):
            f.cache_clear()


def test_api_tv_fused_wrapper_covers_features(x0, mask, wt):
    """ops.api._tv_fused (the TPU auto-dispatch target) with masks/aniso."""
    from pytv4d_tpu.ops.api import _tv_fused

    got = _tv_fused(x0, mask, wt, "hybrid", 1.0, 0.7, 0.3, "aniso", 1.0,
                    False, True)
    ref = tv_and_subgrad(x0, "hybrid", reg_time=0.7, factor_reg_static=0.3,
                         mask_static=mask, weight_time=wt, norm_type="aniso")
    assert float(got[0]) == pytest.approx(float(ref[0]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=5e-6, rtol=1e-4)

    got = _tv_fused(x0, mask, wt, "hybrid", 1.0, 0.7, 0.3, "huber", 0.3,
                    False, True)
    ref = tv_and_subgrad(x0, "hybrid", reg_time=0.7, factor_reg_static=0.3,
                         mask_static=mask, weight_time=wt, norm_type="huber",
                         huber_delta=0.3)
    assert float(got[0]) == pytest.approx(float(ref[0]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=5e-6, rtol=1e-4)
