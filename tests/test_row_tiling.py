"""Single-device row-tiling (R > 1) parity, interpreter mode.

The fused kernels split tall planes into row tiles and stitch the stencil
across tile seams with thin neighbor blocks (kernels/fused.py: vol_rows /
dvol_chan_rows and the seam-row adjoint).  On real hardware this engages for
>=512^2 planes; here the tile-size target is shrunk so the same seam code
runs in CI on small shapes — the sharded variant of this test exists in
test_sharding.py, but the *unsharded* seam path has its own index maps and
gating and must be covered on its own.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pytv4d_tpu.kernels.fused as F
from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.kernels.fused import cp_step_fused, tv_and_subgrad_fused
from pytv4d_tpu.ops.tv import tv_and_subgrad
from pytv4d_tpu.solvers.cp import CPState, cp_step, default_tau, init_state

SCHEMES = ("upwind", "downwind", "central", "hybrid")
# Nr = 64 -> TR = 16 under the tiny byte target: 4 tiles, 3 interior seams
SHAPE = (3, 2, 64, 128)


@pytest.fixture(autouse=True)
def force_row_tiling(monkeypatch):
    monkeypatch.setattr(F, "_TILE_BYTES_TARGET", 16 * 1024)
    for f in (F.make_cp_dual_kernel, F.make_cp_primal_kernel,
              F.make_tv_norms_kernel, F.make_tv_subgrad_kernel):
        f.cache_clear()
    yield
    for f in (F.make_cp_dual_kernel, F.make_cp_primal_kernel,
              F.make_tv_norms_kernel, F.make_tv_subgrad_kernel):
        f.cache_clear()


def _assert_tiled(cfg, shape=SHAPE):
    """The fixture must actually produce R > 1 or the test is vacuous."""
    from pytv4d_tpu.core.schemes import num_channels

    Nd = num_channels(cfg.scheme, shape[0], shape[1], cfg.reg_z_over_reg,
                      cfg.reg_time)
    assert F.choose_row_tile(shape[2], shape[3], Nd) < shape[2]


@pytest.fixture()
def x0():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.random(SHAPE), jnp.float32)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_cp_step_fused_row_tiled_matches_jnp(x0, scheme):
    cfg = TVConfig(scheme=scheme, reg_time=0.5)
    _assert_tiled(cfg)
    tau = default_tau(cfg, SHAPE[0], SHAPE[1])
    rng = np.random.default_rng(8)
    st = init_state(x0, cfg)
    st = CPState(st.x, jnp.asarray(rng.random(SHAPE), jnp.float32),
                 jnp.asarray(rng.random(st.y_D.shape), jnp.float32))
    ref, loss_ref = cp_step(st, x0, reg=0.5, sigma_D=0.5, sigma_A=1.0,
                            tau=tau, cfg=cfg)
    got, loss_got = cp_step_fused(st, x0, reg=0.5, sigma_D=0.5, sigma_A=1.0,
                                  tau=tau, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got.y_D), np.asarray(ref.y_D),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=2e-6, rtol=1e-5)
    assert float(loss_got) == pytest.approx(float(loss_ref), rel=1e-5)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_tv_subgrad_fused_row_tiled_matches_jnp(x0, scheme):
    """The G kernel's seam-row adjoint (recomputed D at rows -2..TR+1) is the
    most intricate code in the repo; every scheme crosses the seams here."""
    cfg = TVConfig(scheme=scheme, reg_time=0.5)
    _assert_tiled(cfg)
    tv_ref, G_ref = tv_and_subgrad(x0, scheme, reg_time=0.5)
    tv_got, G_got = tv_and_subgrad_fused(x0, cfg, interpret=True)
    assert float(tv_got) == pytest.approx(float(tv_ref), rel=1e-6)
    np.testing.assert_allclose(np.asarray(G_got), np.asarray(G_ref),
                               atol=3e-6, rtol=1e-5)


def test_row_tiled_multi_iteration_trajectory(x0):
    """Seam errors compound over iterations; 25 fused-vs-jnp CP iterations
    with row tiling must stay at fp32 round-off."""
    from pytv4d_tpu.solvers.cp import chambolle_pock

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    _assert_tiled(cfg)
    a = chambolle_pock(x0, n_iter=25, reg=0.4, cfg=cfg, fused=False)
    b = chambolle_pock(x0, n_iter=25, reg=0.4, cfg=cfg, fused=True)
    np.testing.assert_allclose(np.asarray(b.loss), np.asarray(a.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               atol=1e-5, rtol=1e-4)


def test_row_tiled_bf16_dual(x0):
    """bf16 dual storage uses 16-row thin blocks (dthin=16) at the seams."""
    from pytv4d_tpu.solvers.cp import chambolle_pock

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    a = chambolle_pock(x0, n_iter=10, reg=0.4, cfg=cfg, fused=True)
    b = chambolle_pock(x0, n_iter=10, reg=0.4, cfg=cfg, fused=True,
                       dual_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(b.loss), np.asarray(a.loss),
                               rtol=2e-2)
