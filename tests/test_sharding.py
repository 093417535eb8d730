"""Sharded-path tests on the 8-virtual-CPU-device mesh (SURVEY.md section 4
"multi-host tests"): the shard_map halo-exchange operators must be slot-exact
with the single-device path, keep D/D_T adjointness across shard edges
(SURVEY.md section 7 hard part 2), and the sharded CP solver must track the
unsharded solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytv4d_tpu as ptv
from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.ops import operators as ops
from pytv4d_tpu.parallel import (
    make_mesh,
    make_sharded_cp_solver,
    shard_volume,
    sharded_D,
    sharded_D_T,
    sharded_tv_and_subgrad,
)
from pytv4d_tpu.solvers.cp import chambolle_pock, init_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SCHEMES = ("upwind", "downwind", "central", "hybrid")


def _mesh42():
    return make_mesh(z=4, t=2)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_sharded_D_matches_local(scheme):
    rng = np.random.default_rng(31)
    shape = (8, 4, 16, 16)
    img = rng.random(shape)
    cfg = TVConfig(scheme=scheme, reg_time=0.5, reg_z_over_reg=0.7)
    mesh = _mesh42()
    x = shard_volume(jnp.asarray(img), mesh)
    D_sharded = sharded_D(mesh, cfg, shape)(x)
    D_local = ops.D(jnp.asarray(img), scheme, **cfg.kwargs())
    np.testing.assert_allclose(np.asarray(D_sharded), np.asarray(D_local),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_sharded_D_T_matches_local(scheme):
    rng = np.random.default_rng(32)
    shape = (8, 4, 16, 16)
    cfg = TVConfig(scheme=scheme, reg_time=0.5)
    from pytv4d_tpu.core.schemes import num_channels

    Nd = num_channels(scheme, 8, 4, cfg.reg_z_over_reg, cfg.reg_time)
    y = rng.random((8, Nd, 4, 16, 16))
    mesh = _mesh42()
    DT_sharded = sharded_D_T(mesh, cfg, shape)(jnp.asarray(y))
    DT_local = ops.D_T(jnp.asarray(y), scheme, **cfg.kwargs())
    np.testing.assert_allclose(np.asarray(DT_sharded), np.asarray(DT_local),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("scheme", ["hybrid", "central"])
def test_sharded_adjointness(scheme):
    """Oracle 1 on the sharded path: cross-shard-edge scatter contributions
    must keep <Y, D X> == <D^T Y, X> exactly."""
    rng = np.random.default_rng(33)
    shape = (8, 4, 16, 16)
    cfg = TVConfig(scheme=scheme, reg_time=0.8, reg_z_over_reg=0.4)
    from pytv4d_tpu.core.schemes import num_channels

    Nd = num_channels(scheme, 8, 4, cfg.reg_z_over_reg, cfg.reg_time)
    mesh = _mesh42()
    D_fn = sharded_D(mesh, cfg, shape)
    DT_fn = sharded_D_T(mesh, cfg, shape)
    X = jnp.asarray(rng.random(shape))
    Y = jnp.asarray(rng.random((8, Nd, 4, 16, 16)))
    DX = D_fn(X)
    lhs = float(jnp.sum(Y * DX))
    rhs = float(jnp.sum(DT_fn(Y) * X))
    # normalize by the inner-product scale, not |lhs| (which can cancel to ~0)
    scale = float(jnp.linalg.norm(Y.ravel()) * jnp.linalg.norm(DX.ravel()))
    assert abs(lhs - rhs) / scale < 1e-14


def test_sharded_tv_and_subgrad_matches_local():
    rng = np.random.default_rng(34)
    shape = (8, 4, 16, 16)
    img = rng.random(shape)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    mesh = _mesh42()
    tv_s, G_s = sharded_tv_and_subgrad(mesh, cfg, shape)(
        shard_volume(jnp.asarray(img), mesh)
    )
    tv_l, G_l = ptv.ops.tv.tv_and_subgrad(jnp.asarray(img), "hybrid", reg_time=0.5)
    assert float(tv_s) == pytest.approx(float(tv_l), rel=1e-12)
    np.testing.assert_allclose(np.asarray(G_s), np.asarray(G_l), rtol=1e-11,
                               atol=1e-12)


def test_sharded_cp_tracks_unsharded():
    rng = np.random.default_rng(35)
    shape = (8, 4, 16, 16)
    noisy = jnp.asarray(rng.random(shape) + 10.0)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    mesh = _mesh42()

    ref = chambolle_pock(noisy, n_iter=25, reg=0.5, cfg=cfg)

    solve = make_sharded_cp_solver(mesh, cfg, shape, reg=0.5, n_iter=25)
    st = init_state(noisy, cfg)
    x_sh = shard_volume(noisy, mesh)
    x, y_A, y_D, losses = solve(
        x_sh, shard_volume(st.x, mesh),
        shard_volume(st.y_A, mesh),
        jax.device_put(st.y_D, ptv.parallel.d_volume_sharding(mesh)),
    )
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref.loss),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-10,
                               atol=1e-12)


def test_gspmd_auto_sharding_matches():
    """The plain jnp ops under jit with sharded inputs (GSPMD path) must also
    agree — XLA inserts the halo collectives automatically."""
    rng = np.random.default_rng(36)
    shape = (8, 2, 16, 16)
    img = rng.random(shape)
    mesh = make_mesh(z=8, t=1)
    x = shard_volume(jnp.asarray(img), mesh, shard_time=False)
    tv_s, G_s = ptv.tv_and_subgrad(x, "hybrid")
    tv_l, G_l = ptv.tv_and_subgrad(jnp.asarray(img), "hybrid")
    assert float(tv_s) == pytest.approx(float(tv_l), rel=1e-12)
    np.testing.assert_allclose(np.asarray(G_s), np.asarray(G_l), rtol=1e-11)


def test_gspmd_full_solvers_sharded():
    """Whole jitted solvers (scan included) run on sharded inputs — XLA
    partitions the entire iteration loop; results match unsharded."""
    rng = np.random.default_rng(37)
    shape = (8, 2, 16, 16)
    noisy = jnp.asarray(rng.random(shape) + 5.0)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    mesh = make_mesh(z=8, t=1)
    noisy_sh = shard_volume(noisy, mesh, shard_time=False)

    from pytv4d_tpu.solvers import admm, subgradient_descent

    ref_cp = chambolle_pock(noisy, n_iter=15, reg=0.4, cfg=cfg)
    got_cp = chambolle_pock(noisy_sh, n_iter=15, reg=0.4, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got_cp.loss), np.asarray(ref_cp.loss),
                               rtol=1e-10)

    ref_gd = subgradient_descent(noisy, n_iter=15, reg=0.4, step_size=1e-2, cfg=cfg)
    got_gd = subgradient_descent(noisy_sh, n_iter=15, reg=0.4, step_size=1e-2, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got_gd.loss), np.asarray(ref_gd.loss),
                               rtol=1e-10)

    ref_ad = admm(noisy, n_iter=8, reg=0.4, cfg=cfg)
    got_ad = admm(noisy_sh, n_iter=8, reg=0.4, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got_ad.loss), np.asarray(ref_ad.loss),
                               rtol=1e-8)


def test_weak_scaling_harness_runs():
    """The weak-scaling sweep executes on the virtual CPU mesh and reports
    sane efficiencies (no perf assertion on CPU)."""
    from pytv4d_tpu.bench import weak_scaling

    res = weak_scaling(base_shape=(2, 2, 16, 16), n_iter=3, repeats=1,
                       device_counts=[1, 2, 4])
    assert set(res) == {1, 2, 4}
    for n, row in res.items():
        assert row["it_per_s"] > 0 and np.isfinite(row["efficiency"])

    from pytv4d_tpu.bench import weak_scaling_tgv

    res = weak_scaling_tgv(base_shape=(2, 2, 16, 16), n_iter=3, repeats=1,
                           device_counts=[1, 2, 4])
    assert set(res) == {1, 2, 4}
    for n, row in res.items():
        assert row["it_per_s"] > 0 and np.isfinite(row["efficiency"])


@pytest.mark.parametrize("scheme", SCHEMES)
def test_sharded_fused_cp_tracks_unsharded(scheme):
    """Fused Pallas CP under shard_map (ghost-plane halos) must track the
    unsharded jnp solver for every scheme, including central's reflect
    ghosts and 1-plane-per-shard cases."""
    from pytv4d_tpu.kernels.fused import to_internal_layout
    from pytv4d_tpu.parallel import internal_d_sharding, make_sharded_cp_solver_fused

    rng = np.random.default_rng(38)
    shape = (8, 4, 16, 16)
    cfg = TVConfig(scheme=scheme, reg_time=0.5)
    noisy = jnp.asarray(rng.random(shape) + 3.0, jnp.float32)
    mesh = _mesh42()

    ref = chambolle_pock(noisy, n_iter=20, reg=0.4, cfg=cfg, fused=False)
    solve = make_sharded_cp_solver_fused(mesh, cfg, shape, reg=0.4, n_iter=20)
    st = init_state(noisy, cfg)
    x, _, _, losses = solve(
        shard_volume(noisy, mesh),
        shard_volume(st.x, mesh),
        shard_volume(st.y_A, mesh),
        jax.device_put(to_internal_layout(st.y_D), internal_d_sharding(mesh)),
    )
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               atol=1e-5, rtol=1e-4)


def test_sharded_fused_cp_one_plane_shards():
    """z=8 mesh over Nz=8: every shard holds ONE z-plane — all z stencil
    reads cross shards, and central's reflect ghost comes from the halo."""
    from pytv4d_tpu.kernels.fused import to_internal_layout
    from pytv4d_tpu.parallel import internal_d_sharding, make_sharded_cp_solver_fused

    rng = np.random.default_rng(39)
    shape = (8, 2, 16, 16)
    cfg = TVConfig(scheme="central", reg_time=0.5)
    noisy = jnp.asarray(rng.random(shape) + 3.0, jnp.float32)
    mesh = make_mesh(z=8, t=1)

    ref = chambolle_pock(noisy, n_iter=15, reg=0.4, cfg=cfg, fused=False)
    solve = make_sharded_cp_solver_fused(mesh, cfg, shape, reg=0.4, n_iter=15,
                                         shard_time=False)
    st = init_state(noisy, cfg)
    x, _, _, losses = solve(
        shard_volume(noisy, mesh, shard_time=False),
        shard_volume(st.x, mesh, shard_time=False),
        shard_volume(st.y_A, mesh, shard_time=False),
        jax.device_put(to_internal_layout(st.y_D),
                       internal_d_sharding(mesh, shard_time=False)),
    )
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref.loss),
                               rtol=1e-5)


@pytest.mark.parametrize("scheme,mesh_zt,shape", [
    ("hybrid", (4, 2), (8, 4, 16, 16)),
    ("central", (4, 2), (8, 4, 16, 16)),
    ("central", (8, 1), (8, 2, 16, 16)),   # 1-plane shards, reflect ghosts
    ("central", (2, 4), (4, 8, 16, 16)),   # 1-frame time shards
    ("upwind", (8, 1), (8, 2, 16, 16)),
    ("downwind", (4, 2), (8, 4, 16, 16)),
])
def test_sharded_fused_gd_tracks_unsharded(scheme, mesh_zt, shape):
    """Fused norms+subgradient kernels under shard_map (2-deep ghost planes
    for the G pass) must track the unsharded GD solver."""
    from pytv4d_tpu.parallel import make_sharded_gd_solver_fused
    from pytv4d_tpu.solvers.gd import subgradient_descent

    rng = np.random.default_rng(40)
    cfg = TVConfig(scheme=scheme, reg_time=0.5)
    noisy = jnp.asarray(rng.random(shape) + 3.0, jnp.float32)
    st_time = mesh_zt[1] > 1
    mesh = make_mesh(z=mesh_zt[0], t=mesh_zt[1])
    ref = subgradient_descent(noisy, n_iter=15, reg=0.4, step_size=1e-2,
                              cfg=cfg, fused=False)
    solve = make_sharded_gd_solver_fused(
        mesh, cfg, shape, reg=0.4, n_iter=15, step_size=1e-2,
        shard_time=st_time,
    )
    x, losses = solve(shard_volume(noisy, mesh, shard_time=st_time),
                      shard_volume(noisy, mesh, shard_time=st_time))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               atol=1e-5, rtol=1e-4)


def test_sharded_fused_with_row_tiling(monkeypatch):
    """Row tiling (R > 1) combined with shard_map halo mode: tile-seam thin
    blocks must read the halo-extended arrays at the right offsets."""
    import pytv4d_tpu.kernels.fused as F
    from pytv4d_tpu.kernels.fused import to_internal_layout
    from pytv4d_tpu.parallel import (
        internal_d_sharding,
        make_sharded_cp_solver_fused,
        make_sharded_gd_solver_fused,
    )
    from pytv4d_tpu.solvers.gd import subgradient_descent

    monkeypatch.setattr(F, "_TILE_BYTES_TARGET", 64 * 1024)  # force R > 1
    F.make_cp_dual_kernel.cache_clear()
    F.make_cp_primal_kernel.cache_clear()
    F.make_tv_norms_kernel.cache_clear()
    F.make_tv_subgrad_kernel.cache_clear()
    try:
        rng = np.random.default_rng(41)
        shape = (8, 2, 32, 128)   # local rows 32 -> TR 8/16 under tiny target
        cfg = TVConfig(scheme="hybrid", reg_time=0.5)
        noisy = jnp.asarray(rng.random(shape) + 3.0, jnp.float32)
        mesh = make_mesh(z=8, t=1)

        ref = chambolle_pock(noisy, n_iter=10, reg=0.4, cfg=cfg, fused=False)
        solve = make_sharded_cp_solver_fused(mesh, cfg, shape, reg=0.4,
                                             n_iter=10, shard_time=False)
        st = init_state(noisy, cfg)
        x, _, _, losses = solve(
            shard_volume(noisy, mesh, shard_time=False),
            shard_volume(st.x, mesh, shard_time=False),
            shard_volume(st.y_A, mesh, shard_time=False),
            jax.device_put(to_internal_layout(st.y_D),
                           internal_d_sharding(mesh, shard_time=False)),
        )
        np.testing.assert_allclose(np.asarray(losses), np.asarray(ref.loss),
                                   rtol=1e-5)

        gref = subgradient_descent(noisy, n_iter=10, reg=0.4, step_size=1e-2,
                                   cfg=cfg, fused=False)
        gsolve = make_sharded_gd_solver_fused(mesh, cfg, shape, reg=0.4,
                                              n_iter=10, step_size=1e-2,
                                              shard_time=False)
        gx, glosses = gsolve(shard_volume(noisy, mesh, shard_time=False),
                             shard_volume(noisy, mesh, shard_time=False))
        np.testing.assert_allclose(np.asarray(glosses), np.asarray(gref.loss),
                                   rtol=1e-5)
    finally:
        F.make_cp_dual_kernel.cache_clear()
        F.make_cp_primal_kernel.cache_clear()
        F.make_tv_norms_kernel.cache_clear()
        F.make_tv_subgrad_kernel.cache_clear()


def test_sharded_aniso_paths():
    """Anisotropic TV on the sharded jnp paths (tv/G and the CP step) and the
    sharded FUSED CP (aniso prox in pass A) must all track unsharded."""
    from pytv4d_tpu.kernels.fused import to_internal_layout
    from pytv4d_tpu.ops.tv import tv_and_subgrad
    from pytv4d_tpu.parallel import internal_d_sharding, make_sharded_cp_solver_fused

    rng = np.random.default_rng(61)
    shape = (8, 4, 16, 16)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5, norm="aniso")
    img = rng.random(shape)
    mesh = _mesh42()

    tv_s, G_s = sharded_tv_and_subgrad(mesh, cfg, shape)(
        shard_volume(jnp.asarray(img), mesh))
    tv_l, G_l = tv_and_subgrad(jnp.asarray(img), "hybrid", reg_time=0.5,
                               norm_type="aniso")
    assert float(tv_s) == pytest.approx(float(tv_l), rel=1e-12)
    np.testing.assert_allclose(np.asarray(G_s), np.asarray(G_l), rtol=1e-10,
                               atol=1e-12)

    noisy = jnp.asarray(rng.random(shape) + 3.0, jnp.float32)
    ref = chambolle_pock(noisy, n_iter=15, reg=0.4, cfg=cfg, fused=False)

    solve = make_sharded_cp_solver(mesh, cfg, shape, reg=0.4, n_iter=15)
    st = init_state(noisy, cfg)
    _, _, _, losses = solve(
        shard_volume(noisy, mesh), shard_volume(st.x, mesh),
        shard_volume(st.y_A, mesh),
        jax.device_put(st.y_D, ptv.parallel.d_volume_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref.loss),
                               rtol=1e-5)

    solve_f = make_sharded_cp_solver_fused(mesh, cfg, shape, reg=0.4, n_iter=15)
    _, _, _, losses_f = solve_f(
        shard_volume(noisy, mesh), shard_volume(st.x, mesh),
        shard_volume(st.y_A, mesh),
        jax.device_put(to_internal_layout(st.y_D), internal_d_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(losses_f), np.asarray(ref.loss),
                               rtol=1e-5)

    from pytv4d_tpu.parallel import make_sharded_gd_solver_fused
    from pytv4d_tpu.solvers.gd import subgradient_descent

    gref = subgradient_descent(noisy, n_iter=15, reg=0.4, step_size=1e-2,
                               cfg=cfg, fused=False)
    gsolve = make_sharded_gd_solver_fused(mesh, cfg, shape, reg=0.4,
                                          n_iter=15, step_size=1e-2)
    gx, glosses = gsolve(shard_volume(noisy, mesh), shard_volume(noisy, mesh))
    np.testing.assert_allclose(np.asarray(glosses), np.asarray(gref.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gref.x),
                               atol=1e-5, rtol=1e-4)


def test_sharded_cp_overlap_matches_ghost_path():
    """The halo/compute-overlap structure (interior kernels + boundary-fix
    kernels racing the ppermute) must be slot-exact with both the ghost
    path and the unsharded fused solver, across schemes, dtypes, masks and
    row tiling."""
    import pytv4d_tpu.kernels.fused as F
    from pytv4d_tpu.kernels.fused import to_internal_layout
    from pytv4d_tpu.parallel import (
        internal_d_sharding,
        make_sharded_cp_solver_fused,
    )

    rng = np.random.default_rng(50)
    mesh = make_mesh(z=8, t=1)       # z-only: overlap auto-engages
    shape = (32, 3, 16, 128)         # nz_local = 4 >= 3
    mask = np.tri(16, 128, dtype=bool)[None, None]

    cases = [
        ("upwind", dict(), dict()),
        ("downwind", dict(), dict()),
        ("central", dict(), dict()),
        ("hybrid", dict(), dict()),
        ("hybrid", dict(norm="aniso"), dict()),
        ("hybrid", dict(norm="huber", huber_delta=0.3), dict()),
        ("hybrid", dict(), dict(dual_dtype="bfloat16")),
        ("hybrid", dict(factor_reg_static=0.3), dict(mask_static=mask)),
    ]
    for scheme, cfg_kw, extra in cases:
        cfg = TVConfig(scheme=scheme, reg_time=0.5, **cfg_kw)
        noisy = jnp.asarray(rng.random(shape) + 2.0, jnp.float32)
        st = init_state(noisy, cfg)
        yd = to_internal_layout(st.y_D)
        if extra.get("dual_dtype"):
            yd = yd.astype(extra["dual_dtype"])
        args = (
            shard_volume(noisy, mesh, shard_time=False),
            shard_volume(st.x, mesh, shard_time=False),
            shard_volume(st.y_A, mesh, shard_time=False),
            jax.device_put(yd, internal_d_sharding(mesh, shard_time=False)),
        )
        out = {}
        for ov in (False, True):
            solve = make_sharded_cp_solver_fused(
                mesh, cfg, shape, reg=0.4, n_iter=10, shard_time=False,
                overlap=ov, **extra)
            x, _, _, losses = solve(*args)
            out[ov] = (np.asarray(x, np.float32),
                       np.asarray(losses, np.float32))
        # overlap and ghost paths compute the same fp operations
        np.testing.assert_allclose(out[True][1], out[False][1], rtol=1e-6,
                                   err_msg=f"{scheme} {cfg_kw} {extra}")
        np.testing.assert_allclose(out[True][0], out[False][0],
                                   atol=1e-6, rtol=1e-5)
        # and track the jnp reference
        ms = extra.get("mask_static")
        ref = chambolle_pock(noisy, n_iter=10, reg=0.4, cfg=cfg, fused=False,
                             mask_static=ms if ms is not None else None)
        tol = 2e-2 if extra.get("dual_dtype") else 5e-5
        np.testing.assert_allclose(out[True][1], np.asarray(ref.loss),
                                   rtol=tol, err_msg=f"{scheme} {cfg_kw}")


def test_sharded_cp_overlap_row_tiled(monkeypatch):
    """Overlap + row tiling (R > 1): the boundary kernels' thin-seam specs
    must agree with the interior kernels'."""
    import pytv4d_tpu.kernels.fused as F
    from pytv4d_tpu.kernels.fused import to_internal_layout
    from pytv4d_tpu.parallel import (
        internal_d_sharding,
        make_sharded_cp_solver_fused,
    )

    monkeypatch.setattr(F, "_TILE_BYTES_TARGET", 64 * 1024)
    for f in (F.make_cp_dual_kernel, F.make_cp_primal_kernel,
              F.make_cp_dual_boundary_kernel,
              F.make_cp_primal_boundary_kernel):
        f.cache_clear()
    try:
        rng = np.random.default_rng(51)
        mesh = make_mesh(z=8, t=1)
        shape = (24, 2, 32, 128)
        cfg = TVConfig(scheme="hybrid", reg_time=0.5)
        noisy = jnp.asarray(rng.random(shape) + 2.0, jnp.float32)
        ref = chambolle_pock(noisy, n_iter=10, reg=0.4, cfg=cfg, fused=False)
        solve = make_sharded_cp_solver_fused(mesh, cfg, shape, reg=0.4,
                                             n_iter=10, shard_time=False,
                                             overlap=True)
        st = init_state(noisy, cfg)
        x, _, _, losses = solve(
            shard_volume(noisy, mesh, shard_time=False),
            shard_volume(st.x, mesh, shard_time=False),
            shard_volume(st.y_A, mesh, shard_time=False),
            jax.device_put(to_internal_layout(st.y_D),
                           internal_d_sharding(mesh, shard_time=False)))
        np.testing.assert_allclose(np.asarray(losses), np.asarray(ref.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                                   atol=1e-5, rtol=1e-4)
    finally:
        for f in (F.make_cp_dual_kernel, F.make_cp_primal_kernel,
                  F.make_cp_dual_boundary_kernel,
                  F.make_cp_primal_boundary_kernel):
            f.cache_clear()


def test_sharded_fused_cp_bf16_primary():
    """bf16 PRIMARY storage (x / y_A / x0) on the sharded fused CP: both the
    ghost and the overlapped halo path must track the unsharded fused solver
    run at the same storage dtypes (kernels compute f32 everywhere, so the
    paths round the same values; only reduction order differs)."""
    from pytv4d_tpu.kernels.fused import to_internal_layout
    from pytv4d_tpu.parallel import (
        internal_d_sharding,
        make_sharded_cp_solver_fused,
    )

    rng = np.random.default_rng(62)
    mesh = make_mesh(z=8, t=1)
    shape = (32, 3, 16, 32)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    noisy = jnp.asarray(rng.random(shape) + 2.0, jnp.bfloat16)

    ref = chambolle_pock(noisy, n_iter=12, reg=0.4, cfg=cfg)  # fused, bf16
    assert ref.x.dtype == jnp.bfloat16 and ref.state.y_D.dtype == jnp.bfloat16

    st = init_state(noisy, cfg)
    args = (
        shard_volume(noisy, mesh, shard_time=False),
        shard_volume(st.x, mesh, shard_time=False),
        shard_volume(st.y_A, mesh, shard_time=False),
        jax.device_put(to_internal_layout(st.y_D),
                       internal_d_sharding(mesh, shard_time=False)),
    )
    for ov in (False, True):
        solve = make_sharded_cp_solver_fused(
            mesh, cfg, shape, reg=0.4, n_iter=12, shard_time=False,
            dtype="bfloat16", overlap=ov)
        x, y_A, y_D_int, losses = solve(*args)
        assert x.dtype == jnp.bfloat16 and y_D_int.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(losses, np.float32),
                                   np.asarray(ref.loss, np.float32),
                                   rtol=1e-4, err_msg=f"overlap={ov}")
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(ref.x, np.float32),
                                   atol=3e-2, rtol=2e-2)


def test_sharded_huber_gd_paths():
    """Huber on the sharded GD paths: the jnp shard_map tv/G (true smooth
    gradient + Huber value under psum) and the sharded FUSED norms/subgrad
    kernels must both track the unsharded solve."""
    from pytv4d_tpu.ops.tv import tv_and_subgrad
    from pytv4d_tpu.parallel import make_sharded_gd_solver_fused
    from pytv4d_tpu.solvers.gd import subgradient_descent

    rng = np.random.default_rng(64)
    shape = (8, 4, 16, 16)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5, norm="huber",
                   huber_delta=0.3)
    img = rng.random(shape)
    mesh = _mesh42()

    tv_s, G_s = sharded_tv_and_subgrad(mesh, cfg, shape)(
        shard_volume(jnp.asarray(img), mesh))
    tv_l, G_l = tv_and_subgrad(jnp.asarray(img), "hybrid", reg_time=0.5,
                               norm_type="huber", huber_delta=0.3)
    assert float(tv_s) == pytest.approx(float(tv_l), rel=1e-6)
    np.testing.assert_allclose(np.asarray(G_s), np.asarray(G_l),
                               atol=1e-6, rtol=1e-5)

    noisy = jnp.asarray(rng.random(shape) + 2.0, jnp.float32)
    gref = subgradient_descent(noisy, n_iter=15, reg=0.4, step_size=1e-2,
                               cfg=cfg, fused=False)
    gsolve = make_sharded_gd_solver_fused(mesh, cfg, shape, reg=0.4,
                                          n_iter=15, step_size=1e-2)
    gx, glosses = gsolve(shard_volume(noisy, mesh), shard_volume(noisy, mesh))
    np.testing.assert_allclose(np.asarray(glosses), np.asarray(gref.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gref.x),
                               atol=1e-5, rtol=1e-4)


def test_sharded_fused_gd_bf16_primary():
    """bf16 primary storage on the sharded fused GD path vs the unsharded
    fused solver at the same dtype."""
    from pytv4d_tpu.parallel import make_sharded_gd_solver_fused
    from pytv4d_tpu.solvers.gd import subgradient_descent

    rng = np.random.default_rng(63)
    shape = (8, 4, 16, 16)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    noisy = jnp.asarray(rng.random(shape) + 2.0, jnp.bfloat16)
    mesh = _mesh42()

    ref = subgradient_descent(noisy, n_iter=12, reg=0.4, step_size=1e-2,
                              cfg=cfg)  # fused, bf16
    assert ref.x.dtype == jnp.bfloat16
    solve = make_sharded_gd_solver_fused(mesh, cfg, shape, reg=0.4,
                                         n_iter=12, step_size=1e-2,
                                         dtype="bfloat16")
    x, losses = solve(shard_volume(noisy, mesh), shard_volume(noisy, mesh))
    assert x.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(losses, np.float32),
                               np.asarray(ref.loss, np.float32), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(x, np.float32),
                               np.asarray(ref.x, np.float32),
                               atol=3e-2, rtol=2e-2)


def test_sharded_ct_reconstruction():
    """The CT model family under GSPMD on the (z, t) mesh: sinogram and
    volume share z/t shardings, the projector runs with zero communication
    (it vmaps over z/t), the TV stencil halos and loss psum come from the
    partitioner — losses track the unsharded solve."""
    from pytv4d_tpu.models.ct import cp_reconstruct, radon, sinogram_sharding
    from pytv4d_tpu.utils import synthetic_phantom

    truth2d = synthetic_phantom(24).astype(np.float32) / 255.0
    truth = np.stack([np.roll(truth2d, z, axis=0) for z in range(8)])[:, None]
    truth = np.tile(truth, (1, 2, 1, 1))  # (8, 2, 24, 24)
    angles = jnp.linspace(0, np.pi, 16, endpoint=False)
    sino = radon(truth, angles)

    ref = cp_reconstruct(sino, angles, truth.shape, n_iter=30, reg=0.02,
                         op_norm=24.0)

    mesh = _mesh42()
    sino_sh = jax.device_put(jnp.asarray(sino), sinogram_sharding(mesh))
    res = cp_reconstruct(sino_sh, angles, truth.shape, n_iter=30, reg=0.02,
                         op_norm=24.0)
    np.testing.assert_allclose(np.asarray(res.loss), np.asarray(ref.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-5, rtol=1e-4)


def test_tgv_sharded_2d_slot_exact():
    """axes='2d' TGV under shard_map: slices are independent subproblems, so
    the sharded solve matches single-device to fp round-off (1e-12, the
    usual XLA fusion/fma freedom across different compiled shapes) and the
    only collective is the loss psum.  Covers both the jnp scan and the
    slice-resident Pallas kernel (interpreter mode) inside shard_map."""
    from pytv4d_tpu.parallel import tgv_denoise_sharded
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.random((8, 4, 12, 16)))
    ref = tgv_denoise(x, n_iter=15, alpha1=2.0, alpha0=4.0)
    mesh = _mesh42()
    xs = shard_volume(x, mesh)

    for fused in (False, True):
        res = tgv_denoise_sharded(xs, mesh, n_iter=15, alpha1=2.0,
                                  alpha0=4.0, fused=fused)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.loss),
                                   np.asarray(ref.loss), rtol=1e-12)

    lean = tgv_denoise_sharded(xs, mesh, n_iter=15, alpha1=2.0, alpha0=4.0,
                               compute_loss=False)
    np.testing.assert_allclose(np.asarray(lean.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    assert lean.loss.shape == (0,)


@pytest.mark.parametrize("axes", ["3d", "4d"])
def test_tgv_gspmd_3d_4d(axes):
    """Volumetric / space-time TGV on sharded inputs via GSPMD: the z/t
    coupling crosses shard boundaries, and XLA's partitioner inserts the
    halo collective-permutes for the pad/slice stencils automatically."""
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.random((8, 4, 12, 16)))
    ref = tgv_denoise(x, n_iter=15, alpha1=2.0, alpha0=4.0, axes=axes)
    mesh = _mesh42()
    xs = shard_volume(x, mesh)
    res = tgv_denoise(xs, n_iter=15, alpha1=2.0, alpha0=4.0, axes=axes)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.loss), np.asarray(ref.loss),
                               rtol=1e-12)


@pytest.mark.parametrize("axes", ["3d", "4d"])
def test_tgv_stream_sharded(axes):
    """Sharded coupled TGV (streaming kernels + ghost-plane halos +
    global-edge corrections) matches the unsharded stream path AND the jnp
    scan to fp round-off on the virtual mesh — z-sharded (4 shards of 2
    planes), plus the 8-way 1-plane-shard edge case."""
    from pytv4d_tpu.parallel import make_sharded_tgv_stream_solver
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(47)
    x = jnp.asarray(rng.random((8, 2, 16, 16)))
    ref = tgv_denoise(x, n_iter=12, alpha1=2.0, alpha0=4.0, axes=axes,
                      compute_loss=False, fused=False)

    # z=2 (4-plane shards), z=4 (2-plane) and z=8 (1-plane) on the default
    # ghost path; the halo/compute-OVERLAP step is forced below
    for z in (2, 4, 8):
        if z == 4:  # pure-z mesh (no 't' axis) must work too
            from jax.sharding import Mesh
            mesh = Mesh(np.asarray(jax.devices()[:4]), ("z",))
        else:
            mesh = make_mesh(z=z, t=1, devices=jax.devices()[:z])
        solve = make_sharded_tgv_stream_solver(
            mesh, x.shape, axes, alpha1=2.0, alpha0=4.0, n_iter=12,
            dtype="float64")
        res = solve(shard_volume(x, mesh))
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w),
                                   rtol=1e-12, atol=1e-12)

    # both step structures, forced, on the same mesh
    mesh2 = make_mesh(z=2, t=1, devices=jax.devices()[:2])
    for overlap in (True, False):
        solve = make_sharded_tgv_stream_solver(
            mesh2, x.shape, axes, alpha1=2.0, alpha0=4.0, n_iter=12,
            dtype="float64", overlap=overlap)
        res = solve(shard_volume(x, mesh2))
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                                   rtol=1e-12, atol=1e-12)

    # bf16 state storage: the overlap step's window kernels cast at the
    # same tile boundaries as the ghost path's extended kernel, so the two
    # step structures stay bit-identical even in bf16
    x32 = jnp.asarray(np.asarray(x), jnp.float32)
    outs = []
    for overlap in (True, False):
        solve16 = make_sharded_tgv_stream_solver(
            mesh2, x.shape, axes, alpha1=2.0, alpha0=4.0, n_iter=6,
            dtype="bfloat16", overlap=overlap)
        outs.append(np.asarray(solve16(shard_volume(x32, mesh2)).x,
                               np.float32))
    np.testing.assert_array_equal(outs[0], outs[1])

    # overlap needs a nonempty interior (>= 3 local planes)
    mesh4 = make_mesh(z=4, t=1, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="3 local z"):
        make_sharded_tgv_stream_solver(
            mesh4, x.shape, axes, alpha1=2.0, alpha0=4.0, n_iter=2,
            overlap=True)

    if axes == "3d":
        # t is a batch dim in 3d mode: the (z, t) mesh shards it for free
        mesh = _mesh42()
        solve = make_sharded_tgv_stream_solver(
            mesh, x.shape, axes, alpha1=2.0, alpha0=4.0, n_iter=12,
            dtype="float64")
        res = solve(shard_volume(x, mesh))
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                                   rtol=1e-12, atol=1e-12)
    else:
        with pytest.raises(ValueError, match="z-only"):
            make_sharded_tgv_stream_solver(
                _mesh42(), x.shape, axes, alpha1=2.0, alpha0=4.0, n_iter=5)


def test_tgv_sharded_norm_family():
    """aniso / Huber TGV through both sharded paths: the zero-halo 2d
    shard_map and the ghost-plane coupled stream solver match single-device
    to fp round-off."""
    from pytv4d_tpu.parallel import (
        make_sharded_tgv_stream_solver,
        tgv_denoise_sharded,
    )
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(53)
    x = jnp.asarray(rng.random((8, 2, 16, 16)) * 4.0)
    mesh = make_mesh(z=4, t=2)
    xs = shard_volume(x, mesh)
    mesh_z = make_mesh(z=4, t=1, devices=jax.devices()[:4])

    for norm, kw in (("aniso", {}), ("huber", {"huber_delta": 0.1})):
        ref2 = tgv_denoise(x, n_iter=10, alpha1=1.0, alpha0=2.0, norm=norm,
                           **kw)
        res2 = tgv_denoise_sharded(xs, mesh, n_iter=10, alpha1=1.0,
                                   alpha0=2.0, norm=norm, **kw)
        np.testing.assert_allclose(np.asarray(res2.x), np.asarray(ref2.x),
                                   rtol=1e-12, atol=1e-12)

        ref3 = tgv_denoise(x, n_iter=10, alpha1=1.0, alpha0=2.0, axes="3d",
                           norm=norm, compute_loss=False, fused=False, **kw)
        solve = make_sharded_tgv_stream_solver(
            mesh_z, x.shape, "3d", alpha1=1.0, alpha0=2.0, n_iter=10,
            dtype="float64", norm=norm, **kw)
        res3 = solve(shard_volume(x, mesh_z, shard_time=False))
        np.testing.assert_allclose(np.asarray(res3.x), np.asarray(ref3.x),
                                   rtol=1e-12, atol=1e-12)

    with pytest.raises(ValueError, match="norm"):
        make_sharded_tgv_stream_solver(mesh_z, x.shape, "3d", alpha1=1.0,
                                       alpha0=2.0, n_iter=2, norm="l1")


def test_sharded_cone_ct_reconstruction():
    """Cone-beam CT under GSPMD: the cone couples z, but time is a pure
    batch dim of the projector — a t-sharded mesh runs the reconstruction
    SPMD with zero projector communication, tracking the unsharded solve."""
    from pytv4d_tpu.models.ct import (
        ConeBeamGeometry,
        cone_sinogram_sharding,
        cp_reconstruct,
        radon_cone,
    )
    from pytv4d_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(51)
    truth = np.zeros((6, 4, 16, 16), np.float32)
    truth[2:5, :, 5:12, 5:12] = 1.0
    truth += 0.05 * rng.standard_normal(truth.shape).astype(np.float32)
    geom = ConeBeamGeometry(source_dist=40.0, det_dist=20.0)
    angles = jnp.linspace(0, 2 * np.pi, 12, endpoint=False)
    sino = radon_cone(truth, angles, geom, n_det_v=12)

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    ref = cp_reconstruct(sino, angles, truth.shape, n_iter=20, reg=0.01,
                         geom=geom, op_norm=30.0, cfg=cfg)

    mesh = make_mesh(z=1, t=4, devices=jax.devices()[:4])
    sino_sh = jax.device_put(jnp.asarray(sino), cone_sinogram_sharding(mesh))
    res = cp_reconstruct(sino_sh, angles, truth.shape, n_iter=20, reg=0.01,
                         geom=geom, op_norm=30.0, cfg=cfg)
    np.testing.assert_allclose(np.asarray(res.loss), np.asarray(ref.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-5, rtol=1e-4)

    with pytest.raises(ValueError, match="sharded 't' axis"):
        cone_sinogram_sharding(make_mesh(z=4, t=1,
                                         devices=jax.devices()[:4]))


def test_sharded_spectral_cone_ct_reconstruction():
    """The PRODUCTION multi-device cone path: t-sharded
    ``cp_reconstruct(geom=cone, method='spectral')`` (SSRB + slope
    correction, models/ct_spectral.py) must track the unsharded spectral
    solve — M is a pure batch axis of every stage (z-interp matmuls, dense
    spectral radons, rebinning matmuls), so GSPMD shards the whole
    iteration over t with zero projector communication.  VERDICT r4 item 5:
    the gather-cone sharding test above never exercises the spectral cone
    (CPU auto resolves to gather)."""
    from pytv4d_tpu.models.ct import (
        ConeBeamGeometry,
        cone_sinogram_sharding,
        cp_reconstruct,
    )
    from pytv4d_tpu.models.ct_spectral import radon_cone_spectral
    from pytv4d_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(57)
    truth = np.zeros((6, 4, 16, 16), np.float32)
    truth[2:5, :, 5:12, 5:12] = 1.0
    truth += 0.05 * rng.standard_normal(truth.shape).astype(np.float32)
    geom = ConeBeamGeometry(source_dist=40.0, det_dist=20.0)
    angles = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    sino = radon_cone_spectral(jnp.asarray(truth), angles, geom,
                               n_det_v=12)

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    ref = cp_reconstruct(sino, angles, truth.shape, n_iter=20, reg=0.01,
                         geom=geom, op_norm=30.0, cfg=cfg,
                         method="spectral")

    mesh = make_mesh(z=1, t=4, devices=jax.devices()[:4])
    sino_sh = jax.device_put(jnp.asarray(sino), cone_sinogram_sharding(mesh))
    res = cp_reconstruct(sino_sh, angles, truth.shape, n_iter=20, reg=0.01,
                         geom=geom, op_norm=30.0, cfg=cfg,
                         method="spectral")
    np.testing.assert_allclose(np.asarray(res.loss), np.asarray(ref.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-5, rtol=1e-4)
