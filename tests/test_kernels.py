"""Fused Pallas kernel tests (interpreter mode on CPU): the fused CP step and
tv+subgradient must match the jnp reference path to fp32 round-off across all
schemes/configs, including the boundary masking of z/t channels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.kernels.dispatch import can_fuse
from pytv4d_tpu.kernels.fused import cp_step_fused, tv_and_subgrad_fused
from pytv4d_tpu.ops.tv import tv_and_subgrad
from pytv4d_tpu.solvers.cp import CPState, cp_step, default_tau, init_state
from pytv4d_tpu.solvers.gd import subgradient_descent

SCHEMES = ("upwind", "downwind", "central", "hybrid")
SHAPE = (4, 3, 16, 128)
CONFIGS = [dict(), dict(reg_time=0.5), dict(reg_time=0.7, reg_z_over_reg=0.3),
           dict(reg_z_over_reg=0.0)]


@pytest.fixture(scope="module")
def x0():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random(SHAPE), jnp.float32)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("kw", CONFIGS, ids=["base", "time", "zt", "noz"])
def test_cp_step_fused_matches_jnp(x0, scheme, kw):
    cfg = TVConfig(scheme=scheme, **kw)
    tau = default_tau(cfg, SHAPE[0], SHAPE[1])
    rng = np.random.default_rng(1)
    st = init_state(x0, cfg)
    st = CPState(st.x, jnp.asarray(rng.random(SHAPE), jnp.float32),
                 jnp.asarray(rng.random(st.y_D.shape), jnp.float32))
    ref, loss_ref = cp_step(st, x0, reg=0.5, sigma_D=0.5, sigma_A=1.0,
                            tau=tau, cfg=cfg)
    got, loss_got = cp_step_fused(st, x0, reg=0.5, sigma_D=0.5, sigma_A=1.0,
                                  tau=tau, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.y_A), np.asarray(ref.y_A),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.y_D), np.asarray(ref.y_D),
                               atol=2e-6, rtol=1e-5)
    assert float(loss_got) == pytest.approx(float(loss_ref), rel=1e-5)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("kw", CONFIGS, ids=["base", "time", "zt", "noz"])
def test_tv_subgrad_fused_matches_jnp(x0, scheme, kw):
    cfg = TVConfig(scheme=scheme, **kw)
    tv_ref, G_ref = tv_and_subgrad(x0, scheme, **kw)
    tv_got, G_got = tv_and_subgrad_fused(x0, cfg, interpret=True)
    assert float(tv_got) == pytest.approx(float(tv_ref), rel=1e-6)
    np.testing.assert_allclose(np.asarray(G_got), np.asarray(G_ref),
                               atol=3e-6, rtol=1e-5)


def test_fused_flat_image_inf_convention():
    """Zero-gradient pixels must produce zero G (no NaN/inf leakage)."""
    x = jnp.full(SHAPE, 3.0, jnp.float32)
    cfg = TVConfig(scheme="hybrid", reg_time=1.0)
    tv, G = tv_and_subgrad_fused(x, cfg, interpret=True)
    assert float(tv) == 0.0
    assert bool(jnp.all(G == 0.0))


def test_solver_fused_flag_end_to_end(x0):
    """The fused solver path must track the jnp path over many iterations."""
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    from pytv4d_tpu.solvers.cp import chambolle_pock

    a = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, fused=False)
    b = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, fused=True)
    np.testing.assert_allclose(np.asarray(b.loss), np.asarray(a.loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               atol=1e-4, rtol=1e-4)

    ga = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                             fused=False)
    gb = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                             fused=True)
    np.testing.assert_allclose(np.asarray(gb.loss), np.asarray(ga.loss), rtol=1e-4)


def test_can_fuse_guard():
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    assert can_fuse((8, 4, 256, 256), cfg)
    # row tiling keeps arbitrarily tall planes within VMEM
    assert can_fuse((8, 4, 2048, 2048), cfg)
    assert not can_fuse((8, 4, 256, 256), cfg, dtype="float64")  # f32 only
    # plane-shaped static masks / weight_time ride the fused path ...
    assert can_fuse((8, 4, 256, 256), cfg,
                    mask_static=np.ones((1, 1, 256, 256), bool))
    assert can_fuse((8, 4, 256, 256), cfg,
                    weight_time=np.ones((1, 1, 256, 256)))
    # ... full per-voxel fields do not
    assert not can_fuse((8, 4, 256, 256), cfg,
                        mask_static=np.ones((8, 4, 256, 256), bool))
    assert not can_fuse((8, 4, 256, 256), cfg,
                        weight_time=np.ones((8, 4, 256, 256)))


def test_bf16_dual_storage(x0):
    """dual_dtype='bfloat16' (fused-only): same trajectory within bf16
    tolerance, big HBM traffic cut (measured 1.5x on TPU v5e)."""
    from pytv4d_tpu.solvers.cp import chambolle_pock

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    a = chambolle_pock(x0, n_iter=15, reg=0.3, cfg=cfg, fused=True)
    b = chambolle_pock(x0, n_iter=15, reg=0.3, cfg=cfg, fused=True,
                       dual_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(b.loss), np.asarray(a.loss),
                               rtol=2e-2)
    assert b.state.y_D.dtype == a.state.y_D.dtype  # public state stays f32


def test_resident_solvers_match_jnp(x0):
    """Whole-solve-in-VMEM kernels (kernels/resident.py) are bit-identical
    to the jnp scan path (the kernel body runs the same cp_step/tv code)."""
    from pytv4d_tpu.kernels.resident import (
        make_resident_cp_solver,
        make_resident_gd_solver,
        resident_fits,
    )
    from pytv4d_tpu.solvers.cp import chambolle_pock, default_tau, init_state

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    shape = tuple(x0.shape)
    assert resident_fits(shape, cfg)
    tau = default_tau(cfg, shape[0], shape[1])

    ref = chambolle_pock(x0, n_iter=15, reg=0.4, cfg=cfg, fused=False)
    solve = make_resident_cp_solver(cfg, shape, 15, "float32", reg=0.4,
                                    sigma_D=0.5, sigma_A=1.0, tau=tau,
                                    interpret=True)
    st = init_state(x0, cfg)
    x, yA, yD, losses = jax.jit(solve)(x0, st.x, st.y_A, st.y_D)
    np.testing.assert_array_equal(np.asarray(losses), np.asarray(ref.loss))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(ref.x))

    gref = subgradient_descent(x0, n_iter=15, reg=0.4, step_size=1e-2,
                               cfg=cfg, fused=False)
    gsolve = make_resident_gd_solver(cfg, shape, 15, "float32", reg=0.4,
                                     step_size=1e-2, interpret=True)
    gx, glosses = jax.jit(gsolve)(x0, x0)
    np.testing.assert_array_equal(np.asarray(glosses), np.asarray(gref.loss))

    # guard rejects what cannot fit
    assert not resident_fits((64, 16, 512, 512), cfg)


def test_fused_cp_long_horizon_parity(x0):
    """North-star contract (BASELINE.md): the fused path must track the jnp
    path to <=1e-4 relative loss over a full 300-iteration production run,
    not just a few steps."""
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    from pytv4d_tpu.solvers.cp import chambolle_pock

    a = chambolle_pock(x0, n_iter=300, reg=0.4, cfg=cfg, fused=False)
    b = chambolle_pock(x0, n_iter=300, reg=0.4, cfg=cfg, fused=True)
    rel = np.abs(np.asarray(b.loss) - np.asarray(a.loss)) / np.asarray(a.loss)
    assert float(rel.max()) < 1e-4, float(rel.max())


@pytest.mark.parametrize("scheme", ["hybrid", "central"])
def test_cp_step_fused_huber(x0, scheme):
    """The in-kernel Huber conjugate prox (shrink-then-project) and the
    huber loss partials must match the jnp step to f32 round-off, and the
    fused solver must track the jnp huber solve end-to-end."""
    from pytv4d_tpu.solvers.cp import chambolle_pock

    cfg = TVConfig(scheme=scheme, reg_time=0.5, norm="huber",
                   huber_delta=0.3)
    tau = default_tau(cfg, SHAPE[0], SHAPE[1])
    rng = np.random.default_rng(2)
    st = init_state(x0, cfg)
    st = CPState(st.x, jnp.asarray(rng.random(SHAPE), jnp.float32),
                 jnp.asarray(rng.random(st.y_D.shape), jnp.float32) * 0.1)
    ref, loss_ref = cp_step(st, x0, reg=0.5, sigma_D=0.5, sigma_A=1.0,
                            tau=tau, cfg=cfg)
    got, loss_got = cp_step_fused(st, x0, reg=0.5, sigma_D=0.5, sigma_A=1.0,
                                  tau=tau, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.y_D), np.asarray(ref.y_D),
                               atol=2e-6, rtol=1e-5)
    assert float(loss_got) == pytest.approx(float(loss_ref), rel=1e-5)

    a = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, fused=False)
    b = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, fused=True)
    np.testing.assert_allclose(np.asarray(b.loss), np.asarray(a.loss),
                               rtol=1e-4)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_tv_subgrad_fused_huber(x0, scheme):
    """Huber tv-norms/subgradient kernels: the Huber value, the TRUE smooth
    gradient D^T(D x / max(n, delta)) and the RAW grad_norms (no inf
    convention — ops/tv.py:111-120) must match the jnp path; GD auto-selects
    the fused kernels for huber now."""
    cfg = TVConfig(scheme=scheme, reg_time=0.5, norm="huber",
                   huber_delta=0.3)
    tv_r, G_r, n_r = tv_and_subgrad(x0, scheme, reg_time=0.5,
                                    norm_type="huber", huber_delta=0.3,
                                    return_grad_norms=True)
    tv_g, G_g, n_g = tv_and_subgrad_fused(x0, cfg, interpret=True,
                                          return_grad_norms=True)
    assert float(tv_g) == pytest.approx(float(tv_r), rel=1e-6)
    np.testing.assert_allclose(np.asarray(G_g), np.asarray(G_r),
                               atol=3e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(n_g), np.asarray(n_r),
                               atol=3e-6, rtol=1e-5)

    assert can_fuse(SHAPE, cfg, for_gd=True)
    ga = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                             fused=False)
    gb = subgradient_descent(x0, n_iter=20, reg=0.3, step_size=1e-2, cfg=cfg,
                             fused=True)
    np.testing.assert_allclose(np.asarray(gb.loss), np.asarray(ga.loss),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb.x), np.asarray(ga.x),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("mode", ["2d", "3d", "4d"])
def test_tgv_stream_matches_jnp(mode):
    """The streaming two-pass TGV kernel (kernels/tgv_stream.py, interpreter
    mode) matches the jnp scan to fp round-off for every axes mode —
    single row tile, so no seam logic in play."""
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((3, 2, 16, 16)))
    ref = tgv_denoise(x, n_iter=8, alpha1=2.0, alpha0=4.0, axes=mode,
                      compute_loss=False, fused=False)
    fus = tgv_denoise(x, n_iter=8, alpha1=2.0, alpha0=4.0, axes=mode,
                      compute_loss=False, fused=True)
    np.testing.assert_allclose(np.asarray(fus.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fus.w), np.asarray(ref.w),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("mode", ["2d", "3d", "4d"])
def test_tgv_stream_row_tiled_matches_jnp(mode, monkeypatch):
    """Row tiling (R=2): the cross-tile seam operands (thin row blocks) and
    their gates must keep parity — forced by shrinking the tile budget so
    TR=8 on a 16-row volume."""
    from pytv4d_tpu.kernels import tgv_stream
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    M, Nc = 2, 16
    # budget exactly one TR=8 workset (f64 => bpe 8): TR=16 cannot fit
    target = tgv_stream._workset((3, M, 16, Nc), mode, 8, 8)
    monkeypatch.setattr(tgv_stream, "_TILE_BYTES_TARGET", target)
    tgv_stream.make_tgv_stream_step.cache_clear()
    assert tgv_stream.choose_tile_rows((3, M, 16, Nc), mode, bpe=8) == 8

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.random((3, M, 16, Nc)))
    ref = tgv_denoise(x, n_iter=8, alpha1=2.0, alpha0=4.0, axes=mode,
                      compute_loss=False, fused=False)
    fus = tgv_denoise(x, n_iter=8, alpha1=2.0, alpha0=4.0, axes=mode,
                      compute_loss=False, fused=True)
    tgv_stream.make_tgv_stream_step.cache_clear()
    np.testing.assert_allclose(np.asarray(fus.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fus.w), np.asarray(ref.w),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("mode", ["3d", "4d"])
def test_tgv_stream_bf16_storage(mode):
    """bf16 state storage on the streaming TGV kernel (compute stays f32):
    the trajectory tracks the f32 run within bf16 quantization tolerance
    and the public outputs keep the input dtype."""
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(13)
    x32 = jnp.asarray(rng.random((3, 2, 16, 16)), jnp.float32)
    ref = tgv_denoise(x32, n_iter=10, alpha1=0.2, alpha0=0.4, axes=mode,
                      compute_loss=False, fused=True)
    out = tgv_denoise(x32.astype(jnp.bfloat16), n_iter=10, alpha1=0.2,
                      alpha0=0.4, axes=mode, compute_loss=False, fused=True)
    assert out.x.dtype == jnp.bfloat16
    assert out.w.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out.x, np.float32),
                               np.asarray(ref.x), atol=3e-2, rtol=3e-2)
