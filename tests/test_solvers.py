"""Solver tests: loss decrease (oracle 4, ``pytv/tests.py:406-438``), parity
with the measured reference-recipe losses (BASELINE.md), state checkpointing."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.models import TVDenoiser, add_noise, denoise_tv_chambolle
from pytv4d_tpu.solvers import (
    admm,
    chambolle_pock,
    run_checkpointed,
    save_state,
    load_state,
    subgradient_descent,
)
from pytv4d_tpu.utils import cameraman, has_real_cameraman, synthetic_phantom


def test_cameraman_asset_vendored():
    """The package must be self-contained: the vendored asset (not the
    synthetic fallback or an adjacent reference checkout) backs cameraman()."""
    import pytv4d_tpu.utils.images as images

    assert has_real_cameraman()
    vendored = images._SEARCH_PATHS[1]
    assert vendored.endswith("pytv4d_tpu/media/cameraman.npy")
    img = np.load(vendored)
    assert img.shape == (256, 256) and img.dtype == np.int64
    assert img.min() == 7 and img.max() == 253


@pytest.fixture(scope="module")
def noisy_small():
    truth = synthetic_phantom(64).astype(np.float64)[None, None]
    return add_noise(truth, 100.0, seed=0)


def test_gd_loss_decreases(noisy_small):
    res = subgradient_descent(noisy_small, n_iter=50)
    loss = np.asarray(res.loss)
    assert loss[-1] < loss[0]
    assert np.all(np.isfinite(loss))


def test_cp_converges_lower_than_gd(noisy_small):
    """The reference's notebook claim (SURVEY.md 3.3): CP converges lower."""
    gd = subgradient_descent(noisy_small, n_iter=200)
    cp = chambolle_pock(noisy_small, n_iter=200)
    assert float(cp.loss[-1]) < float(gd.loss[-1])


def test_admm_close_to_cp(noisy_small):
    cp = chambolle_pock(noisy_small, n_iter=300)
    ad = admm(noisy_small, n_iter=60)
    assert float(ad.loss[-1]) <= float(cp.loss[-1]) * 1.001


def test_solvers_4d_with_time_reg():
    rng = np.random.default_rng(9)
    vol = rng.random((4, 3, 16, 16))
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    res = chambolle_pock(vol, n_iter=30, reg=0.3, cfg=cfg)
    assert np.all(np.isfinite(np.asarray(res.loss)))
    assert res.x.shape == vol.shape
    res = subgradient_descent(vol, n_iter=30, reg=0.3, step_size=1e-2, cfg=cfg)
    assert float(res.loss[-1]) < float(res.loss[0])


def test_reference_recipe_loss_parity():
    """BASELINE.md measured values for the README recipes (cameraman 256^2,
    noise 100, seed 0, reg 25, 300 it).  GD is a nonsmooth iteration: fp
    round-off flips a tie after ~100 iterations (verified against the
    reference), hence the 1e-5 relative tolerance; CP is smooth and tight."""
    truth = cameraman().reshape((1, 1, 256, 256))
    noisy = add_noise(truth, 100.0, seed=0)
    gd = subgradient_descent(noisy, n_iter=300, reg=25.0, step_size=5e-3)
    assert float(gd.loss[-1]) == pytest.approx(39074939.776927, rel=1e-5)
    cp = chambolle_pock(noisy, n_iter=300, reg=25.0)
    assert float(cp.loss[-1]) == pytest.approx(38575639.481653, rel=1e-9)


def test_models_rank_round_trip(noisy_small):
    model = TVDenoiser(reg=10.0)
    out2d = model.cp(noisy_small[0, 0], n_iter=10)
    assert out2d.x.shape == noisy_small.shape[2:]
    out3d = model.gd(noisy_small[:, 0], n_iter=10)
    assert out3d.x.shape == (1, 64, 64)


def test_denoise_tv_chambolle_smooths():
    rng = np.random.default_rng(13)
    img = np.where(rng.random((32, 32)) > 0.5, 1.0, 0.0) + 10.0
    out = denoise_tv_chambolle(img, weight=5.0, max_num_iter=100)
    assert out.shape == img.shape
    # heavy TV weight must reduce total variation substantially
    def tv2d(a):
        return np.abs(np.diff(a, axis=0)).sum() + np.abs(np.diff(a, axis=1)).sum()
    assert tv2d(out) < 0.2 * tv2d(img)


def test_checkpoint_roundtrip(tmp_path, noisy_small):
    full = chambolle_pock(noisy_small, n_iter=40)
    path = str(tmp_path / "cp_state.npz")
    res = run_checkpointed(
        chambolle_pock, noisy_small, n_iter=40,
        checkpoint_path=path, checkpoint_every=10,
    )
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(full.x), rtol=1e-12, atol=1e-12
    )
    assert len(res.loss) == 40

    # save/load preserves the pytree exactly
    loaded = load_state(path, full.state)
    np.testing.assert_allclose(np.asarray(loaded.x), np.asarray(res.state.x))


def test_orbax_checkpoint_roundtrip(tmp_path, noisy_small):
    from pytv4d_tpu.solvers import load_state_orbax, save_state_orbax

    res = chambolle_pock(noisy_small, n_iter=5)
    path = str(tmp_path / "orbax_ckpt")
    save_state_orbax(path, res.state)
    loaded = load_state_orbax(path, res.state)
    np.testing.assert_allclose(np.asarray(loaded.x), np.asarray(res.state.x))
    np.testing.assert_allclose(np.asarray(loaded.y_D), np.asarray(res.state.y_D))


def test_fista_converges_fast(noisy_small):
    """Dual FISTA (O(1/k^2)) should reach CP's 300-iteration loss in far
    fewer iterations on pure denoising."""
    from pytv4d_tpu.solvers import fista

    cp300 = chambolle_pock(noisy_small, n_iter=300)
    fi = fista(noisy_small, n_iter=100)
    assert np.all(np.isfinite(np.asarray(fi.loss)))
    assert float(fi.loss[-1]) <= float(cp300.loss[-1]) * 1.0005
    # model front-end
    m = TVDenoiser(reg=25.0)
    out = m.fista(noisy_small[0, 0], n_iter=20)
    assert out.x.shape == noisy_small.shape[2:]


def test_fista_4d_with_time():
    from pytv4d_tpu.solvers import fista

    rng = np.random.default_rng(17)
    vol = rng.random((4, 3, 16, 16))
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    res = fista(vol, n_iter=40, reg=0.3, cfg=cfg)
    assert float(res.loss[-1]) < float(res.loss[0])


def test_generic_inverse_deblurring():
    """cp_inverse with a Gaussian-blur forward operator: TV deblurring
    recovers a piecewise-constant image substantially better than the
    blurred observation."""
    from pytv4d_tpu.solvers import cp_inverse, gaussian_blur_operator

    truth = np.zeros((1, 1, 32, 32), np.float32)
    truth[0, 0, 8:24, 10:26] = 1.0
    truth[0, 0, 14:18, 2:8] = 0.7
    A = gaussian_blur_operator(truth.shape, sigma_px=1.5, radius=4)
    b = A(truth)
    res = cp_inverse(A, b, truth.shape, n_iter=400, reg=2e-4, x_init=b)
    err_blur = float(np.mean((np.asarray(b) - truth) ** 2))
    err_rec = float(np.mean((np.asarray(res.x) - truth) ** 2))
    # TV deblurring at sigma=1.5px: >2x MSE reduction is a solid recovery
    assert err_rec < 0.5 * err_blur, (err_rec, err_blur)
    assert float(res.loss[-1]) < float(res.loss[0])


def test_inverse_inpainting():
    """Masking operator: TV inpainting fills the hole."""
    from pytv4d_tpu.solvers import cp_inverse
    import jax.numpy as jnp

    truth = np.ones((1, 1, 16, 16), np.float32) * 2.0
    mask = np.ones_like(truth)
    mask[0, 0, 6:10, 6:10] = 0.0
    mask_j = jnp.asarray(mask)

    def A(x):
        return x * mask_j

    b = A(jnp.asarray(truth))
    res = cp_inverse(A, b, truth.shape, n_iter=600, reg=0.2, x_init=b)
    hole = np.asarray(res.x)[0, 0, 6:10, 6:10]
    np.testing.assert_allclose(hole, 2.0, atol=0.05)


def test_preconditioned_cp(noisy_small):
    """Diagonal preconditioning (Pock-Chambolle 2011): converges without
    operator-norm tuning and at least matches vanilla CP at equal iteration
    count on an anisotropic config."""
    from pytv4d_tpu.solvers import chambolle_pock_precond

    cfg = TVConfig(scheme="hybrid")
    van = chambolle_pock(noisy_small, n_iter=100, reg=25.0, cfg=cfg)
    pre = chambolle_pock_precond(noisy_small, n_iter=100, reg=25.0, cfg=cfg)
    assert np.all(np.isfinite(np.asarray(pre.loss)))
    assert float(pre.loss[-1]) <= float(van.loss[-1]) * 1.001

    # strongly anisotropic 4D config — where preconditioning matters
    rng = np.random.default_rng(23)
    vol = rng.random((4, 3, 16, 16))
    cfg4 = TVConfig(scheme="hybrid", reg_time=4.0, reg_z_over_reg=0.1)
    van4 = chambolle_pock(vol, n_iter=150, reg=0.3, cfg=cfg4)
    pre4 = chambolle_pock_precond(vol, n_iter=150, reg=0.3, cfg=cfg4)
    assert float(pre4.loss[-1]) <= float(van4.loss[-1]) * 1.001


def test_anisotropic_tv_solvers(noisy_small):
    """Anisotropic (L1,1) TV across the solver families: all decrease the
    SAME objective and agree on where they converge."""
    from pytv4d_tpu.ops.operators import D, compute_L11_norm
    from pytv4d_tpu.solvers import admm, fista

    cfg = TVConfig(scheme="hybrid", norm="aniso")
    cp = chambolle_pock(noisy_small, n_iter=300, reg=25.0, cfg=cfg)
    fi = fista(noisy_small, n_iter=150, reg=25.0, cfg=cfg)
    ad = admm(noisy_small, n_iter=60, reg=25.0, cfg=cfg)
    gd = subgradient_descent(noisy_small, n_iter=300, reg=25.0,
                             step_size=5e-3, cfg=cfg)
    losses = [float(r.loss[-1]) for r in (cp, fi, ad)]
    assert max(losses) / min(losses) < 1.001, losses
    assert float(gd.loss[-1]) < float(gd.loss[0])

    # the reported loss really is the aniso objective
    x = jnp.asarray(cp.x)
    manual = 0.5 * float(jnp.sum((x - noisy_small) ** 2)) + 25.0 * float(
        compute_L11_norm(D(x, "hybrid"))
    )
    # cp_step's loss line reuses the pre-update D_x (reference convention),
    # so allow one iteration of staleness in the TV term
    assert manual == pytest.approx(float(cp.loss[-1]), rel=1e-4)


def test_aniso_fused_matches_jnp():
    """The fused CP pass-A aniso branch (box prox + |d| partials) must track
    the jnp path."""
    rng = np.random.default_rng(29)
    x0 = jnp.asarray(rng.random((4, 3, 16, 128)) + 1.0, jnp.float32)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5, norm="aniso")
    a = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, fused=False)
    b = chambolle_pock(x0, n_iter=20, reg=0.3, cfg=cfg, fused=True)
    np.testing.assert_allclose(np.asarray(b.loss), np.asarray(a.loss),
                               rtol=1e-4)


def test_aniso_subgradient_definition():
    """Aniso G is the true subgradient D^T sign(D x) (full weights)."""
    from pytv4d_tpu.ops.operators import D, D_T
    from pytv4d_tpu.ops.tv import tv_and_subgrad

    rng = np.random.default_rng(31)
    img = rng.random((3, 2, 10, 10))
    tv, G = tv_and_subgrad(img, "hybrid", reg_time=0.5, norm_type="aniso",
                           xp=np)
    Dx = np.asarray(D(img, "hybrid", reg_time=0.5, xp=np))
    want = np.asarray(D_T(np.sign(Dx), "hybrid", reg_time=0.5, xp=np))
    np.testing.assert_allclose(G, want, rtol=1e-12)
    assert tv == pytest.approx(np.abs(Dx).sum(), rel=1e-12)


def test_long_run_stability():
    """5000 iterations must stay finite with a flat (converged) tail."""
    rng = np.random.default_rng(51)
    noisy = jnp.asarray(rng.random((2, 2, 24, 24)) * 1e4)
    res = chambolle_pock(noisy, n_iter=5000, reg=100.0)
    loss = np.asarray(res.loss)
    assert np.all(np.isfinite(loss))
    tail = loss[-500:]
    assert (tail.max() - tail.min()) / tail.mean() < 1e-6


def test_extreme_scales():
    """Tiny and huge intensity scales must not produce NaN/inf."""
    from pytv4d_tpu.solvers import fista

    rng = np.random.default_rng(52)
    base = rng.random((2, 1, 16, 16))
    for scale in (1e-8, 1.0, 1e8):
        noisy = jnp.asarray(base * scale)
        res = chambolle_pock(noisy, n_iter=30, reg=0.1 * scale)
        assert np.all(np.isfinite(np.asarray(res.loss))), scale
        rf = fista(noisy, n_iter=30, reg=0.1 * scale)
        assert np.all(np.isfinite(np.asarray(rf.loss))), scale


def test_run_logging(tmp_path, noisy_small):
    from pytv4d_tpu.utils import log_run

    res = chambolle_pock(noisy_small, n_iter=10)
    path = str(tmp_path / "runs.jsonl")
    rec = log_run(path, "cp", TVConfig(scheme="hybrid"), res.loss, wall_s=0.1)
    assert rec["n_iter"] == 10 and rec["config"]["scheme"] == "hybrid"
    import json

    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 1 and lines[0]["loss_last"] == rec["loss_last"]


def test_4d_solver_trajectory_parity():
    """Full 150-iteration GD and CP loss trajectories on a seeded 4D
    time-coupled problem must match the reference implementation's loops
    (fixtures from tools/make_golden_solver.py, run against /root/reference)."""
    import os

    golden = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "golden_solver4d.npz"))
    noisy = golden["noisy"]
    reg = float(golden["reg"])
    cfg = TVConfig(scheme="hybrid", reg_time=float(golden["reg_time"]))

    gd = subgradient_descent(noisy, n_iter=150, reg=reg, step_size=5e-3,
                             cfg=cfg)
    np.testing.assert_allclose(np.asarray(gd.loss), golden["gd_losses"],
                               rtol=1e-9)

    cp = chambolle_pock(noisy, n_iter=150, reg=reg, cfg=cfg,
                        tau=float(golden["tau"]))
    np.testing.assert_allclose(np.asarray(cp.loss), golden["cp_losses"],
                               rtol=1e-9)


def test_progress_callbacks(noisy_small, capsys):
    """progress_every invokes progress_fn(i, loss) from inside the scan on
    both the jnp and fused paths, and the default printer writes stderr."""
    import jax

    seen = []

    def collect(i, loss):
        seen.append((int(i), float(loss)))

    res = subgradient_descent(noisy_small, n_iter=12, reg=1.0,
                              progress_every=5, progress_fn=collect)
    jax.block_until_ready(res.loss)
    jax.effects_barrier()
    assert [i for i, _ in sorted(seen)] == [0, 5, 10]
    for i, loss in seen:
        assert loss == pytest.approx(float(res.loss[i]), rel=1e-6)

    seen.clear()
    res = chambolle_pock(noisy_small, n_iter=7, reg=1.0, progress_every=3,
                         progress_fn=collect)
    jax.block_until_ready(res.loss)
    jax.effects_barrier()
    assert [i for i, _ in sorted(seen)] == [0, 3, 6]

    # default printer -> stderr
    res = chambolle_pock(noisy_small, n_iter=4, reg=1.0, progress_every=2)
    jax.block_until_ready(res.loss)
    jax.effects_barrier()
    err = capsys.readouterr().err
    assert "[pytv4d_tpu] iter" in err


def test_denoise_channel_axis():
    """channel_axis: channels ride one decoupled solve, equal to solving
    each channel separately (2D multichannel and 3D z-stack multichannel)."""
    from pytv4d_tpu.models import denoise_tv_chambolle

    rng = np.random.default_rng(77)
    img = rng.random((12, 12, 3)).astype(np.float32) * 10
    joint = denoise_tv_chambolle(img, weight=0.5, max_num_iter=40,
                                 channel_axis=-1)
    assert joint.shape == img.shape
    for c in range(3):
        solo = denoise_tv_chambolle(img[..., c], weight=0.5, max_num_iter=40)
        np.testing.assert_allclose(joint[..., c], solo, rtol=1e-4, atol=1e-5)

    zstack = rng.random((2, 4, 10, 10)).astype(np.float32) * 10  # C first
    joint3 = denoise_tv_chambolle(zstack, weight=0.5, max_num_iter=30,
                                  channel_axis=0)
    assert joint3.shape == zstack.shape
    for c in range(2):
        solo = denoise_tv_chambolle(zstack[c], weight=0.5, max_num_iter=30)
        np.testing.assert_allclose(joint3[c], solo, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="channel_axis"):
        denoise_tv_chambolle(img[..., 0], weight=0.5, channel_axis=-1)


def test_run_until_converged(noisy_small):
    """Tolerance stopping: CP stops well before max_iter on an easy problem
    (via state resume), GD resumes via x_init, and chunked losses equal one
    continuous run."""
    from pytv4d_tpu.solvers import run_until_converged

    res = run_until_converged(chambolle_pock, noisy_small, tol=1e-5,
                              chunk=25, max_iter=2000, reg=1.0)
    n_run = len(res.loss)
    assert n_run < 2000 and n_run % 25 == 0
    rel = abs(res.loss[-25] - res.loss[-1]) / abs(res.loss[-1])
    assert rel <= 1e-5

    cont = chambolle_pock(noisy_small, n_iter=n_run, reg=1.0)
    np.testing.assert_allclose(res.loss, np.asarray(cont.loss), rtol=1e-6)

    res_gd = run_until_converged(subgradient_descent, noisy_small, tol=1e-4,
                                 chunk=20, max_iter=400, reg=1.0)
    cont_gd = subgradient_descent(noisy_small, n_iter=len(res_gd.loss), reg=1.0)
    np.testing.assert_allclose(res_gd.loss, np.asarray(cont_gd.loss),
                               rtol=1e-6)


def test_inverse_solvers_state_resume(tmp_path):
    """cp_inverse/tgv_inverse resume bit-exactly from result.state (two
    half-runs == one continuous run), survive an npz checkpoint round-trip,
    and compose with run_until_converged via functools.partial."""
    import functools

    from pytv4d_tpu.solvers import (
        cp_inverse,
        load_state,
        run_until_converged,
        save_state,
        tgv_inverse,
    )
    from pytv4d_tpu.solvers.inverse import gaussian_blur_operator

    rng = np.random.default_rng(9)
    shape = (1, 2, 16, 16)
    truth = jnp.asarray(rng.random(shape))
    A = gaussian_blur_operator(shape, sigma_px=1.0, radius=3,
                               dtype=truth.dtype)
    b = A(truth)
    kw = dict(reg=1e-3, op_norm=1.0, fidelity="l1", nonneg=True)

    cont = cp_inverse(A, b, shape, n_iter=30, **kw)
    half = cp_inverse(A, b, shape, n_iter=15, **kw)
    # checkpoint round-trip in the middle
    save_state(str(tmp_path / "inv.npz"), half.state)
    restored = load_state(str(tmp_path / "inv.npz"), half.state)
    resumed = cp_inverse(A, b, shape, n_iter=15, state=restored, **kw)
    assert np.array_equal(np.asarray(resumed.x), np.asarray(cont.x))
    np.testing.assert_array_equal(
        np.concatenate([half.loss, resumed.loss]), np.asarray(cont.loss))

    # PRE-format-change checkpoint compat (ADVICE r3): a state saved
    # without the trailing s_x/s_x_bar leaves must still load against the
    # 6-leaf template — padded with None, which the solver accepts
    from pytv4d_tpu.solvers.inverse import InverseState

    old = InverseState(*half.state[:4])  # 4-leaf pre-linearity state
    save_state(str(tmp_path / "inv_old.npz"), old)
    loaded_old = load_state(str(tmp_path / "inv_old.npz"), half.state)
    assert loaded_old.s_x is None and loaded_old.s_x_bar is None
    resumed_old = cp_inverse(A, b, shape, n_iter=15, state=loaded_old, **kw)
    np.testing.assert_allclose(np.asarray(resumed_old.x),
                               np.asarray(cont.x), rtol=1e-6, atol=1e-9)

    cont_t = tgv_inverse(A, b, shape, n_iter=30, alpha1=0.1, alpha0=0.2,
                         op_norm=1.0)
    half_t = tgv_inverse(A, b, shape, n_iter=15, alpha1=0.1, alpha0=0.2,
                         op_norm=1.0)
    res_t = tgv_inverse(A, b, shape, n_iter=15, alpha1=0.1, alpha0=0.2,
                        op_norm=1.0, state=half_t.state)
    assert np.array_equal(np.asarray(res_t.x), np.asarray(cont_t.x))

    # tolerance loop on the smooth l2 problem (an l1 objective oscillates
    # at the optimum and need not satisfy a tight loss-delta criterion)
    solver = functools.partial(cp_inverse, A, vol_shape=shape, reg=1e-3,
                               op_norm=1.0)
    res = run_until_converged(solver, b, tol=1e-6, chunk=40, max_iter=2000)
    assert len(res.loss) < 2000
    assert abs(res.loss[-40] - res.loss[-1]) <= 1e-6 * abs(res.loss[-1])


def test_reg_discrepancy_principle():
    """Morozov selection: the chosen reg's residual matches the known noise
    norm, and the reconstruction beats the unregularized fit."""
    from pytv4d_tpu.solvers import cp_inverse, reg_discrepancy
    from pytv4d_tpu.solvers.inverse import gaussian_blur_operator

    rng = np.random.default_rng(3)
    shape = (1, 1, 32, 32)
    truth = np.zeros(shape)
    truth[0, 0, 8:24, 8:24] = 1.0
    truth[0, 0, 12:20, 12:20] = 0.4
    A = gaussian_blur_operator(shape, sigma_px=1.0, radius=3,
                               dtype=jnp.float64)
    sigma = 0.05
    noise = sigma * rng.standard_normal(shape)
    b = A(jnp.asarray(truth)) + noise
    noise_norm = float(np.linalg.norm(noise))

    reg, res = reg_discrepancy(A, b, shape, noise_norm, n_iter=120,
                               rtol=0.05)
    resid = float(jnp.sqrt(jnp.sum(jnp.square(A(res.x) - b))))
    assert abs(resid - noise_norm) <= 0.06 * noise_norm
    err_reg = float(np.sqrt(np.mean((np.asarray(res.x) - truth) ** 2)))
    tiny = cp_inverse(A, b, shape, n_iter=400, reg=1e-8, op_norm=1.0)
    err_tiny = float(np.sqrt(np.mean((np.asarray(tiny.x) - truth) ** 2)))
    assert err_reg < err_tiny


@pytest.mark.parametrize("norm", ["iso", "aniso", "huber"])
def test_pd_gap_certifies_convergence(noisy_small, norm):
    """The duality gap is nonnegative at every iterate, shrinks by orders
    of magnitude as CP converges, and certifies near-optimality (gap is an
    upper bound on P(x) - P(x*))."""
    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.solvers import pd_gap

    from pytv4d_tpu.ops.operators import D, tv_norm

    cfg = TVConfig(norm=norm, huber_delta=5.0)

    def primal(x):  # true P(x) — the solver's loss line mixes iterates
        return float(
            0.5 * jnp.sum(jnp.square(x - noisy_small))
            + 1.0 * tv_norm(D(x, cfg.scheme, **cfg.kwargs()), cfg.norm,
                            huber_delta=cfg.huber_delta)
        )

    early = chambolle_pock(noisy_small, n_iter=10, reg=1.0, cfg=cfg)
    late = chambolle_pock(noisy_small, n_iter=2000, reg=1.0, cfg=cfg)
    g_early = float(pd_gap(early.state, noisy_small, reg=1.0, cfg=cfg))
    g_late = float(pd_gap(late.state, noisy_small, reg=1.0, cfg=cfg))
    p_early, p_late = primal(early.x), primal(late.x)
    assert g_early > 0.0 and g_late > -1e-9 * p_late
    assert g_late < 1e-3 * g_early
    # the gap bounds the true suboptimality: P(early) - P(late) <= gap(early)
    assert p_early - p_late <= g_early * (1 + 1e-12)


def test_run_until_converged_gap_criterion(noisy_small):
    """criterion='gap' stops on the certified relative duality gap."""
    from pytv4d_tpu.solvers import pd_gap, run_until_converged

    res = run_until_converged(chambolle_pock, noisy_small, tol=1e-6,
                              chunk=100, max_iter=5000, reg=1.0,
                              criterion="gap")
    assert len(res.loss) < 5000
    gap = float(pd_gap(res.state, noisy_small, reg=1.0))
    assert gap <= 1e-6 * abs(float(res.loss[-1]))

    with pytest.raises(ValueError, match="'loss' or 'gap'"):
        run_until_converged(chambolle_pock, noisy_small, criterion="dx")
    with pytest.raises(ValueError, match="primal-dual state"):
        run_until_converged(subgradient_descent, noisy_small,
                            criterion="gap", reg=1.0)


def test_tgv_denoise_fixes_staircasing():
    """TGV-2: E's exact adjoint (linear_transpose), and the canonical ramp
    experiment — on piecewise-linear content TGV recovers the slope and
    beats first-order TV's staircased RMSE."""
    import jax
    import jax.numpy as jnp

    from pytv4d_tpu.models import TVDenoiser
    from pytv4d_tpu.solvers.tgv import (
        _d_fwd,
        _sym_grad,
        _transpose_of,
        tgv_denoise,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random((2, 2, 3, 16, 16)))
    q = jnp.asarray(rng.random((2, 3, 3, 16, 16)))
    ET = _transpose_of(_sym_grad, w.shape, w.dtype)
    lhs = float(jnp.sum(q * _sym_grad(w)))
    rhs = float(jnp.sum(ET(q) * w))
    assert abs(lhs - rhs) / abs(lhs) < 1e-12

    N = 64
    ramp = np.linspace(0, 100, N)[None, :] * np.ones((N, 1))
    noisy = (ramp + 10 * rng.standard_normal((N, N))).astype(np.float64)
    tv = TVDenoiser(reg=8.0).cp(noisy, n_iter=400)
    tgv = TVDenoiser(reg=8.0).tgv(noisy, n_iter=800)
    err_tv = float(np.sqrt(np.mean((np.asarray(tv.x) - ramp) ** 2)))
    err_tgv = float(np.sqrt(np.mean((np.asarray(tgv.x) - ramp) ** 2)))
    assert err_tgv < err_tv < 10.0, (err_tgv, err_tv)
    assert err_tgv < 2.0

    loss = np.asarray(tgv.loss)
    assert loss[-1] < 0.5 * loss[0]
    assert tgv.x.shape == noisy.shape  # 2D in -> 2D out

    with pytest.raises(ValueError, match="rank-4"):
        tgv_denoise(noisy)


def test_tgv_compute_loss_false_same_iterates():
    """``compute_loss=False`` skips the objective (an extra D+E application
    per step) without changing the iterates; ``loss`` comes back empty."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((3, 2, 12, 12)))
    for axes in ("2d", "3d", "4d"):
        full = tgv_denoise(x, n_iter=25, alpha1=2.0, alpha0=4.0, axes=axes)
        lean = tgv_denoise(x, n_iter=25, alpha1=2.0, alpha0=4.0, axes=axes,
                           compute_loss=False)
        np.testing.assert_array_equal(np.asarray(full.x), np.asarray(lean.x))
        np.testing.assert_array_equal(np.asarray(full.w), np.asarray(lean.w))
        assert lean.loss.shape == (0,)


def test_tgv_fused_resident_parity():
    """The slice-resident Pallas TGV kernel (kernels/tgv_resident.py,
    interpreter mode here) matches the jnp scan to fp round-off — same
    algebra by construction, gridded per (z, t) slice."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((2, 2, 12, 20)))

    ref = tgv_denoise(x, n_iter=20, alpha1=2.0, alpha0=4.0, fused=False)
    fus = tgv_denoise(x, n_iter=20, alpha1=2.0, alpha0=4.0, fused=True)
    np.testing.assert_allclose(np.asarray(fus.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fus.w), np.asarray(ref.w),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fus.loss), np.asarray(ref.loss),
                               rtol=1e-10)

    lean = tgv_denoise(x, n_iter=20, alpha1=2.0, alpha0=4.0, fused=True,
                       compute_loss=False)
    np.testing.assert_allclose(np.asarray(lean.x), np.asarray(fus.x),
                               rtol=1e-12, atol=1e-12)
    assert lean.loss.shape == (0,)

    # fused=True for a coupled mode uses the streaming kernel, which cannot
    # produce the loss history
    with pytest.raises(ValueError, match="compute_loss=False"):
        tgv_denoise(x, n_iter=5, axes="3d", fused=True)


def test_tgv_denoise_3d_axes():
    """Volumetric TGV (``axes='3d'``): the 6-channel symmetrized Jacobian's
    exact adjoint, convergence, and the z-coupling experiment — on a volume
    that is piecewise-linear ALONG z, 3D TGV recovers the z-slope while
    slice-wise 2D TGV (blind to z) cannot."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import (
        _d_fwd3,
        _sym_grad3,
        _transpose_of,
        tgv_denoise,
    )

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.random((6, 3, 2, 12, 12)))
    q = jnp.asarray(rng.random((6, 6, 2, 12, 12)))
    ET = _transpose_of(_sym_grad3, w.shape, w.dtype)
    lhs = float(jnp.sum(q * _sym_grad3(w)))
    rhs = float(jnp.sum(ET(q) * w))
    assert abs(lhs - rhs) / abs(lhs) < 1e-12

    x = jnp.asarray(rng.random((6, 2, 12, 12)))
    p = jnp.asarray(rng.random((6, 3, 2, 12, 12)))
    DT = _transpose_of(_d_fwd3, x.shape, x.dtype)
    lhs = float(jnp.sum(p * _d_fwd3(x)))
    rhs = float(jnp.sum(DT(p) * x))
    assert abs(lhs - rhs) / abs(lhs) < 1e-12

    # z-ramp volume: each (row, col) plane is constant, value linear in z.
    Nz, N = 32, 8
    clean = (np.linspace(0.0, 100.0, Nz)[:, None, None, None]
             * np.ones((Nz, 1, N, N)))
    noisy = clean + 10.0 * rng.standard_normal(clean.shape)
    res3 = tgv_denoise(noisy, n_iter=600, alpha1=8.0, alpha0=16.0,
                       axes="3d")
    res2 = tgv_denoise(noisy, n_iter=600, alpha1=8.0, alpha0=16.0)
    err3 = float(np.sqrt(np.mean((np.asarray(res3.x) - clean) ** 2)))
    err2 = float(np.sqrt(np.mean((np.asarray(res2.x) - clean) ** 2)))
    assert err3 < err2, (err3, err2)
    assert err3 < 2.0

    loss = np.asarray(res3.loss)
    assert loss[-1] < 0.5 * loss[0]
    assert res3.w.shape == (Nz, 3, 1, N, N)

    with pytest.raises(ValueError, match="axes"):
        tgv_denoise(noisy, axes="5d")


def test_tgv_denoise_4d_axes():
    """Space-time TGV (``axes='4d'``): the 10-channel symmetrized Jacobian's
    exact adjoint, and the time-coupling experiment — on a volume linear
    ALONG time, 4D TGV recovers the temporal slope while 3D TGV (blind to
    t) cannot."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import (
        _d_fwd4,
        _sym_grad4,
        _transpose_of,
        tgv_denoise,
    )

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.random((4, 4, 6, 10, 10)))
    q = jnp.asarray(rng.random((4, 10, 6, 10, 10)))
    ET = _transpose_of(_sym_grad4, w.shape, w.dtype)
    lhs = float(jnp.sum(q * _sym_grad4(w)))
    rhs = float(jnp.sum(ET(q) * w))
    assert abs(lhs - rhs) / abs(lhs) < 1e-12

    x = jnp.asarray(rng.random((4, 6, 10, 10)))
    p = jnp.asarray(rng.random((4, 4, 6, 10, 10)))
    DT = _transpose_of(_d_fwd4, x.shape, x.dtype)
    lhs = float(jnp.sum(p * _d_fwd4(x)))
    rhs = float(jnp.sum(DT(p) * x))
    assert abs(lhs - rhs) / abs(lhs) < 1e-12

    # time-ramp volume: constant in (z, row, col), value linear in t.
    Nz, M, N = 2, 32, 8
    clean = (np.linspace(0.0, 100.0, M)[None, :, None, None]
             * np.ones((Nz, M, N, N)))
    noisy = clean + 10.0 * rng.standard_normal(clean.shape)
    res4 = tgv_denoise(noisy, n_iter=600, alpha1=8.0, alpha0=16.0,
                       axes="4d")
    res3 = tgv_denoise(noisy, n_iter=600, alpha1=8.0, alpha0=16.0,
                       axes="3d")
    err4 = float(np.sqrt(np.mean((np.asarray(res4.x) - clean) ** 2)))
    err3 = float(np.sqrt(np.mean((np.asarray(res3.x) - clean) ** 2)))
    assert err4 < err3, (err4, err3)
    assert err4 < 2.5

    loss = np.asarray(res4.loss)
    assert loss[-1] < 0.5 * loss[0]
    assert res4.w.shape == (Nz, 4, M, N, N)


def test_huber_tv_norm_family():
    """Huber-smoothed TV: value matches the closed form, the gradient is the
    TRUE gradient (checked vs jax.grad), delta->0 recovers isotropic TV,
    and CP/GD/ADMM all support it (FISTA and the fused kernels gate)."""
    import jax
    import jax.numpy as jnp

    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.kernels.dispatch import can_fuse
    from pytv4d_tpu.ops.operators import D, compute_huber_norm
    from pytv4d_tpu.ops.tv import tv_and_subgrad
    from pytv4d_tpu.solvers.fista import fista

    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.random((4, 2, 12, 12)) * 5)
    delta = 0.5

    D_img = D(img, "hybrid", reg_time=0.5)
    n = np.sqrt(np.sum(np.asarray(D_img) ** 2, axis=1))
    manual = np.sum(np.where(n <= delta, n**2 / (2 * delta), n - delta / 2))
    got = float(compute_huber_norm(D_img, delta))
    assert got == pytest.approx(manual, rel=1e-12)

    # true gradient: matches autodiff of the smooth primal (no inf-trick)
    tv_h, G_h = tv_and_subgrad(img, "hybrid", reg_time=0.5,
                               norm_type="huber", huber_delta=delta)
    auto = jax.grad(
        lambda x: compute_huber_norm(D(x, "hybrid", reg_time=0.5), delta)
    )(img)
    np.testing.assert_allclose(np.asarray(G_h), np.asarray(auto), rtol=1e-10,
                               atol=1e-12)

    # delta -> 0 recovers the isotropic TV value
    tv_iso, _ = tv_and_subgrad(img, "hybrid", reg_time=0.5)
    tv_small = float(compute_huber_norm(D_img, 1e-6))
    assert tv_small == pytest.approx(float(tv_iso), rel=1e-5)

    noisy = jnp.asarray(rng.random((1, 1, 24, 24)) * 10 + 5)
    cfg = TVConfig(scheme="hybrid", norm="huber", huber_delta=0.3)
    cp_h = chambolle_pock(noisy, n_iter=150, reg=2.0, cfg=cfg)
    assert float(cp_h.loss[-1]) < float(cp_h.loss[0])
    gd_h = subgradient_descent(noisy, n_iter=150, reg=2.0, step_size=1e-2,
                               cfg=cfg)
    assert float(gd_h.loss[-1]) < float(gd_h.loss[0])
    from pytv4d_tpu.solvers.admm import admm
    ad_h = admm(noisy, n_iter=40, reg=2.0, cfg=cfg)
    # all three minimize the same (smooth) objective - agree closely
    assert float(ad_h.loss[-1]) == pytest.approx(float(cp_h.loss[-1]), rel=2e-3)
    assert float(gd_h.loss[-1]) == pytest.approx(float(cp_h.loss[-1]), rel=2e-2)

    # tiny delta tracks the isotropic CP solve
    cfg_t = TVConfig(scheme="hybrid", norm="huber", huber_delta=1e-5)
    cp_iso = chambolle_pock(noisy, n_iter=150, reg=2.0,
                            cfg=TVConfig(scheme="hybrid"), fused=False)
    cp_tiny = chambolle_pock(noisy, n_iter=150, reg=2.0, cfg=cfg_t)
    assert float(cp_tiny.loss[-1]) == pytest.approx(float(cp_iso.loss[-1]),
                                                    rel=1e-4)

    # both kernel families fuse huber: the CP conjugate prox AND the GD
    # norms/G kernels (tests/test_kernels.py::test_tv_subgrad_fused_huber)
    assert can_fuse((4, 2, 16, 16), cfg)
    assert can_fuse((4, 2, 16, 16), cfg, for_gd=True)
    with pytest.raises(ValueError, match="Huber"):
        fista(noisy, cfg=cfg)
    # the sharded fused GD factory accepts huber now (end-to-end parity in
    # tests/test_sharding.py::test_sharded_huber_gd_paths)
    from pytv4d_tpu.parallel import make_sharded_gd_solver_fused
    from pytv4d_tpu.parallel.mesh import make_mesh
    make_sharded_gd_solver_fused(make_mesh(z=1, t=1,
                                           devices=jax.devices()[:1]),
                                 cfg, (4, 2, 16, 16), reg=1.0, n_iter=1)
    with pytest.raises(ValueError, match="huber_delta"):
        TVConfig(norm="huber", huber_delta=0.0)


def test_tgv_loss_every_sampling():
    """``loss_every=k`` samples the objective after every k-th iteration:
    iterates identical to the continuous run, losses equal to every k-th
    entry of the per-iteration series — on the jnp path AND the streaming
    kernel path (the only way that path produces a loss series)."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((3, 2, 16, 16)))

    for axes in ("2d", "3d", "4d"):
        full = tgv_denoise(x, n_iter=20, alpha1=2.0, alpha0=4.0, axes=axes)
        for fused in (False, True):
            res = tgv_denoise(x, n_iter=20, alpha1=2.0, alpha0=4.0,
                              axes=axes, loss_every=5, fused=fused)
            assert res.loss.shape == (4,)
            np.testing.assert_allclose(np.asarray(res.x),
                                       np.asarray(full.x),
                                       rtol=1e-12, atol=1e-12)
            np.testing.assert_allclose(np.asarray(res.loss),
                                       np.asarray(full.loss)[4::5],
                                       rtol=1e-10)

    with pytest.raises(ValueError, match="divisor"):
        tgv_denoise(x, n_iter=20, loss_every=3)


def test_tgv_state_resume_matches_continuous():
    """result.state resumes exactly: two 10-iteration chunks equal one
    20-iteration run on every path (jnp scan; resident first chunk then
    jnp; streaming kernel chunks)."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.random((2, 2, 16, 16)))

    for axes in ("2d", "4d"):
        full = tgv_denoise(x, n_iter=20, alpha1=2.0, alpha0=4.0, axes=axes)
        a = tgv_denoise(x, n_iter=10, alpha1=2.0, alpha0=4.0, axes=axes)
        b = tgv_denoise(x, n_iter=10, alpha1=2.0, alpha0=4.0, axes=axes,
                        state=a.state)
        np.testing.assert_allclose(np.asarray(b.x), np.asarray(full.x),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(
            np.concatenate([a.loss, b.loss]), np.asarray(full.loss),
            rtol=1e-10)

    # resident (interpreter) first chunk -> jnp resume
    a = tgv_denoise(x, n_iter=10, alpha1=2.0, alpha0=4.0, fused=True)
    b = tgv_denoise(x, n_iter=10, alpha1=2.0, alpha0=4.0, state=a.state,
                    fused=False)
    full = tgv_denoise(x, n_iter=20, alpha1=2.0, alpha0=4.0, fused=False)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)

    # streaming-kernel chunks
    full = tgv_denoise(x, n_iter=20, alpha1=2.0, alpha0=4.0, axes="4d",
                       compute_loss=False, fused=True)
    a = tgv_denoise(x, n_iter=10, alpha1=2.0, alpha0=4.0, axes="4d",
                    compute_loss=False, fused=True)
    b = tgv_denoise(x, n_iter=10, alpha1=2.0, alpha0=4.0, axes="4d",
                    compute_loss=False, fused=True, state=a.state)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)


def test_tgv_run_until_converged():
    """run_until_converged drives tgv_denoise through its state kwarg."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers import run_until_converged
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.random((1, 1, 24, 24)) * 10.0)
    res = run_until_converged(tgv_denoise, x, tol=1e-5, chunk=25,
                              max_iter=400, alpha1=1.0, alpha0=2.0)
    cont = tgv_denoise(x, n_iter=len(res.loss), alpha1=1.0, alpha0=2.0)
    np.testing.assert_allclose(np.asarray(res.loss),
                               np.asarray(cont.loss), rtol=1e-8)


def test_tgv_checkpoint_roundtrip(tmp_path):
    """run_checkpointed drives tgv_denoise (state kwarg convention): the
    chunked+checkpointed run equals the continuous one, and a restart
    resumes from the saved TGVState."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers import run_checkpointed
    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.random((1, 1, 16, 16)) * 5.0)
    full = tgv_denoise(x, n_iter=30, alpha1=1.0, alpha0=2.0)
    path = str(tmp_path / "tgv_state.npz")
    res = run_checkpointed(tgv_denoise, x, n_iter=30, checkpoint_path=path,
                           checkpoint_every=10, alpha1=1.0, alpha0=2.0)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)
    assert len(res.loss) == 30

    # simulate a crash after 30 of 50: the saved checkpoint resumes
    res2 = run_checkpointed(tgv_denoise, x, n_iter=50, checkpoint_path=path,
                            checkpoint_every=10, alpha1=1.0, alpha0=2.0)
    cont = tgv_denoise(x, n_iter=50, alpha1=1.0, alpha0=2.0)
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(cont.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res2.loss), np.asarray(cont.loss),
                               rtol=1e-10)


def test_tgv_norm_family():
    """Aniso (L1,1) and Huber-smoothed TGV on every path: kernel parity
    with the jnp scan at fp round-off, monotone-ish loss, and Huber->iso as
    delta->0 on the denoising objective."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.random((2, 2, 16, 16)) * 4.0)

    for norm, kw in (("aniso", {}), ("huber", {"huber_delta": 0.1})):
        ref = tgv_denoise(x, n_iter=20, alpha1=1.0, alpha0=2.0, norm=norm,
                          **kw)
        loss = np.asarray(ref.loss)
        assert loss[-1] < loss[0] and np.all(np.isfinite(loss))
        # resident kernel parity (interpreter)
        fus = tgv_denoise(x, n_iter=20, alpha1=1.0, alpha0=2.0, norm=norm,
                          fused=True, **kw)
        np.testing.assert_allclose(np.asarray(fus.x), np.asarray(ref.x),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(fus.loss), loss, rtol=1e-10)
        # streaming kernel parity (4d coupled)
        r4 = tgv_denoise(x, n_iter=12, alpha1=1.0, alpha0=2.0, axes="4d",
                         norm=norm, compute_loss=False, fused=False, **kw)
        f4 = tgv_denoise(x, n_iter=12, alpha1=1.0, alpha0=2.0, axes="4d",
                         norm=norm, compute_loss=False, fused=True, **kw)
        np.testing.assert_allclose(np.asarray(f4.x), np.asarray(r4.x),
                                   rtol=1e-12, atol=1e-12)

    # tiny delta ~ iso
    iso = tgv_denoise(x, n_iter=60, alpha1=1.0, alpha0=2.0)
    hub = tgv_denoise(x, n_iter=60, alpha1=1.0, alpha0=2.0, norm="huber",
                      huber_delta=1e-6)
    np.testing.assert_allclose(np.asarray(hub.x), np.asarray(iso.x),
                               atol=1e-4)

    with pytest.raises(ValueError, match="norm"):
        tgv_denoise(x, n_iter=5, norm="bogus")


def test_tgv_inverse_norm_family():
    """tgv_inverse with aniso/Huber norms (incl. preconditioned): decreasing
    finite objective."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import tgv_inverse

    rng = np.random.default_rng(30)
    x0 = jnp.asarray(rng.random((1, 1, 16, 16)))
    for norm in ("aniso", "huber"):
        for pc in (False, True):
            res = tgv_inverse(lambda v: v, x0, x0.shape, n_iter=80,
                              alpha1=0.2, alpha0=0.4, norm=norm,
                              huber_delta=0.1, precond=pc)
            loss = np.asarray(res.loss)
            assert loss[-1] < loss[0] and np.all(np.isfinite(loss))


def test_precond_denoiser_resume_fidelity_and_gap(noisy_small):
    """chambolle_pock_precond: bit-exact state resume, the fidelity family,
    and the certified-gap stopping criterion."""
    from pytv4d_tpu.solvers import (
        chambolle_pock_precond,
        pd_gap,
        run_until_converged,
    )

    cont = chambolle_pock_precond(noisy_small, n_iter=40, reg=5.0)
    half = chambolle_pock_precond(noisy_small, n_iter=20, reg=5.0)
    res = chambolle_pock_precond(noisy_small, n_iter=20, reg=5.0,
                                 state=half.state)
    assert np.array_equal(np.asarray(res.x), np.asarray(cont.x))

    l1 = chambolle_pock_precond(noisy_small, n_iter=60, reg=5.0,
                                fidelity="l1", nonneg=True)
    loss = np.asarray(l1.loss)
    assert np.all(np.isfinite(loss)) and loss[-1] < loss[0]
    assert float(l1.x.min()) >= 0.0

    out = run_until_converged(chambolle_pock_precond, noisy_small,
                              tol=1e-6, chunk=100, max_iter=4000, reg=5.0,
                              criterion="gap")
    gap = float(pd_gap(out.state, noisy_small, reg=5.0))
    assert gap <= 1e-6 * abs(float(out.loss[-1]))


def test_denoise_tv_chambolle_eps_stopping():
    """scikit-image's eps tolerance: the solve stops early once the
    relative objective change over a chunk falls below eps, matching the
    fixed-iteration result at the same effective iteration count."""
    rng = np.random.default_rng(23)
    img = np.where(rng.random((32, 32)) > 0.5, 1.0, 0.0) + 10.0
    out_eps = denoise_tv_chambolle(img, weight=5.0, eps=1e-4,
                                   max_num_iter=400)
    out_fix = denoise_tv_chambolle(img, weight=5.0, max_num_iter=400)
    assert out_eps.shape == img.shape
    # eps-stopped result is already converged to the fixed-run answer
    np.testing.assert_allclose(out_eps, out_fix, atol=5e-3)
    # channel path honors eps too
    stack = np.stack([img, img + 1.0], axis=-1)
    out_c = denoise_tv_chambolle(stack, weight=5.0, eps=1e-4,
                                 max_num_iter=400, channel_axis=-1)
    assert out_c.shape == stack.shape
    np.testing.assert_allclose(out_c[..., 0], out_eps, atol=5e-3)


def test_denoise_coupled_channels_vectorial_tv():
    """Vectorial (channel-coupled) TV: with C IDENTICAL channels the joint
    per-pixel norm is sqrt(C) x the per-channel norm, so the coupled solve
    at weight w equals the single-channel solve at w/sqrt(C) exactly (same
    CP constants, channel symmetry preserved by every step)."""
    rng = np.random.default_rng(29)
    img = rng.random((24, 24)) * 4.0
    C = 3
    stack = np.stack([img] * C, axis=-1)
    coupled = denoise_tv_chambolle(stack, weight=1.2, max_num_iter=80,
                                   channel_axis=-1, coupled_channels=True)
    single = denoise_tv_chambolle(img, weight=1.2 / np.sqrt(C),
                                  max_num_iter=80)
    for c in range(C):
        np.testing.assert_allclose(coupled[..., c], single, rtol=1e-6,
                                   atol=1e-8)

    # coupled differs from the independent-channel path on distinct data
    stack2 = np.stack([img, np.roll(img, 5, axis=0)], axis=-1)
    dec = denoise_tv_chambolle(stack2, weight=1.2, max_num_iter=60,
                               channel_axis=-1)
    cpl = denoise_tv_chambolle(stack2, weight=1.2, max_num_iter=60,
                               channel_axis=-1, coupled_channels=True)
    assert not np.allclose(dec, cpl, atol=1e-3)

    # 3D z-stack multichannel round-trips shape
    zstack = rng.random((3, 16, 16, 2))
    out = denoise_tv_chambolle(zstack, weight=0.5, max_num_iter=20,
                               channel_axis=-1, coupled_channels=True)
    assert out.shape == zstack.shape

    with pytest.raises(ValueError, match="requires channel_axis"):
        denoise_tv_chambolle(img, weight=1.0, coupled_channels=True)

    # eps is honored on the coupled path: a loose tolerance stops early
    # (well short of the fixed-run answer at tiny iteration counts would
    # differ; here we just check it converges to the same solution)
    out_eps = denoise_tv_chambolle(stack, weight=1.2, eps=1e-6,
                                   max_num_iter=400, channel_axis=-1,
                                   coupled_channels=True)
    full = denoise_tv_chambolle(stack, weight=1.2, max_num_iter=400,
                                channel_axis=-1, coupled_channels=True)
    np.testing.assert_allclose(out_eps, full, atol=5e-3)


def test_admm_fista_static_mask_weight_time():
    """mask_static / weight_time ride ADMM and FISTA too: all solvers
    minimize the same masked objective, so their converged losses agree."""
    from pytv4d_tpu.solvers import admm, fista

    rng = np.random.default_rng(31)
    vol = jnp.asarray(rng.random((1, 3, 16, 16)) + 2.0)
    mask = np.zeros((1, 1, 16, 16), bool)
    mask[..., 4:10, 4:10] = True
    wt = jnp.asarray(0.5 + 0.5 * rng.random((1, 1, 16, 16)))
    cfg = TVConfig(scheme="upwind", reg_time=1.0, factor_reg_static=0.3)
    kw = dict(reg=0.5, cfg=cfg, mask_static=jnp.asarray(mask),
              weight_time=wt)

    cp = chambolle_pock(vol, n_iter=400, **kw)
    ad = admm(vol, n_iter=80, **kw)
    fi = fista(vol, n_iter=200, **kw)
    ref = float(cp.loss[-1])
    assert float(ad.loss[-1]) == pytest.approx(ref, rel=2e-3)
    assert float(fi.loss[-1]) == pytest.approx(ref, rel=2e-3)


def test_cp_inverse_differentiable_in_reg():
    """The solve is differentiable THROUGH the unrolled iterations w.r.t.
    reg (hyperparameter gradients, cf. Bertrand et al. 2020, one of the
    retrieved technique papers): jax.grad matches finite differences."""
    import jax

    from pytv4d_tpu.solvers import cp_inverse

    rng = np.random.default_rng(41)
    shape = (1, 1, 12, 12)
    truth = np.zeros(shape)
    truth[0, 0, 3:9, 3:9] = 1.0
    b = jnp.asarray(truth + 0.1 * rng.standard_normal(shape))

    def recon_err(reg):
        res = cp_inverse(lambda v: v, b, shape, A_T=lambda v: v, n_iter=40,
                         reg=reg, op_norm=1.0)
        return jnp.sum(jnp.square(res.x - jnp.asarray(truth)))

    g = float(jax.grad(recon_err)(0.15))
    h = 1e-4
    fd = (float(recon_err(0.15 + h)) - float(recon_err(0.15 - h))) / (2 * h)
    assert g == pytest.approx(fd, rel=2e-3)


def test_tgv_inverse_differentiable_in_alpha():
    """tgv_inverse is differentiable through the unrolled iterations w.r.t.
    a traced alpha1 (the safe-sqrt treatment keeps reverse-mode gradients
    finite at the exactly-flat pixels every cold start passes through)."""
    import jax

    from pytv4d_tpu.solvers import tgv_inverse

    rng = np.random.default_rng(2)
    shape = (1, 1, 10, 10)
    b = jnp.asarray(rng.random(shape))

    def f(a1):
        r = tgv_inverse(lambda v: v, b, shape, A_T=lambda v: v, n_iter=20,
                        alpha1=a1, alpha0=0.2, op_norm=1.0)
        return jnp.sum(jnp.square(r.x))

    g = float(jax.grad(f)(0.1))
    h = 1e-5
    fd = (float(f(0.1 + h)) - float(f(0.1 - h))) / (2 * h)
    assert g == pytest.approx(fd, rel=1e-6)


def test_run_until_converged_advice_fixes(noisy_small):
    """ADVICE r2 regressions: (a) criterion='gap' reads reg baked into a
    functools.partial solver instead of silently defaulting; (b) a missing
    reg raises instead of certifying the wrong objective; (c) chunk=1 does
    not trivially report loss convergence via loss[0] == loss[-1]."""
    import functools

    from pytv4d_tpu.solvers import run_until_converged

    # (a) reg baked into the partial: must converge against reg=1.0's gap,
    # matching an explicit-kwarg run exactly.
    part = functools.partial(chambolle_pock, reg=1.0)
    res_p = run_until_converged(part, noisy_small, tol=1e-4,
                                criterion="gap", chunk=25, max_iter=2000)
    res_k = run_until_converged(chambolle_pock, noisy_small, tol=1e-4,
                                criterion="gap", chunk=25, max_iter=2000,
                                reg=1.0)
    assert len(res_p.loss) == len(res_k.loss)
    np.testing.assert_array_equal(res_p.loss, res_k.loss)

    # (b) no reg anywhere -> explicit error, not a silent reg=25 default
    with pytest.raises(ValueError, match="reg"):
        run_until_converged(chambolle_pock, noisy_small, tol=1e-4,
                            criterion="gap", chunk=25, max_iter=50)

    # (c) chunk=1 must run more than one iteration on an unconverged problem
    res1 = run_until_converged(chambolle_pock, noisy_small, tol=1e-5,
                               chunk=1, max_iter=8, reg=1.0)
    assert len(res1.loss) > 1


def test_fidelity_weight_array_rejected(noisy_small):
    """ADVICE r2: an array fidelity_weight on the denoising solvers raises
    a clear ValueError (it is static under jit) instead of an opaque
    unhashable-type error, and points at the inverse solvers."""
    from pytv4d_tpu.solvers import chambolle_pock_precond

    w = jnp.ones_like(noisy_small)
    with pytest.raises(ValueError, match="SCALAR fidelity_weight"):
        chambolle_pock(noisy_small, n_iter=2, fidelity_weight=w)
    with pytest.raises(ValueError, match="SCALAR fidelity_weight"):
        chambolle_pock_precond(noisy_small, n_iter=2, fidelity_weight=w)
    # a 0-d numpy scalar is fine
    r = chambolle_pock(noisy_small, n_iter=2,
                       fidelity_weight=np.float64(1.0))
    assert np.all(np.isfinite(np.asarray(r.loss)))


def test_fidelity_row_precond_relative_floor():
    """ADVICE r2: the zero-row floor in fidelity_row_precond is relative to
    the row-sum scale — a uniformly small-scaled operator keeps its live
    rows' exact reciprocal row sums instead of being capped at 1e3."""
    from pytv4d_tpu.solvers.inverse import fidelity_row_precond

    shape = (1, 1, 8, 8)
    scale = 1e-5
    A = lambda x: scale * x  # noqa: E731 - uniform tiny row sums
    sig = np.asarray(fidelity_row_precond(A, shape, shape, jnp.float64))
    np.testing.assert_allclose(sig, 1.0 / scale, rtol=1e-12)


def test_pd_gap_inverse_bounds_suboptimality():
    """The inverse-problem gap certificate (VERDICT r2 item 4): on a TV-CT
    problem, pd_gap_inverse at n iterations bounds the TRUE suboptimality
    measured against a 10x-iteration reference solve, shrinks with n, and
    both prior-set forms (box / norm ball) are valid."""
    from pytv4d_tpu.models.ct import make_projector, radon
    from pytv4d_tpu.solvers import cp_inverse, pd_gap_inverse

    N = 24
    c0 = (N - 1) / 2.0
    rr, cc = np.meshgrid(np.arange(N) - c0, np.arange(N) - c0,
                         indexing="ij")
    truth = np.exp(-(rr ** 2 + cc ** 2) / (2 * 5.0 ** 2))
    shape = (1, 1, N, N)
    angles = np.linspace(0, np.pi, 16, endpoint=False)
    A, A_T = make_projector(shape, angles, dtype=jnp.float64,
                            method="gather")
    b = A(jnp.asarray(truth[None, None]))
    kw = dict(reg=5e-3, op_norm=None, nonneg=True)

    ref = cp_inverse(A, b, shape, A_T=A_T, n_iter=3000, **kw)
    p_star = float(ref.loss[-1])

    gaps, subopts = [], []
    for n in (100, 300):
        res = cp_inverse(A, b, shape, A_T=A_T, n_iter=n, **kw)
        gap = float(pd_gap_inverse(res.state, A, b, reg=kw["reg"],
                                   x_box=2.0, A_T=A_T))
        subopt = float(res.loss[-1]) - p_star
        assert gap >= subopt - 1e-9, (n, gap, subopt)
        assert gap >= 0.0
        gaps.append(gap)
        subopts.append(subopt)
    assert gaps[1] < gaps[0]  # certificate tightens with iterations

    # norm-ball prior set is valid too, and min(box, ball) is the tighter
    res = cp_inverse(A, b, shape, A_T=A_T, n_iter=300, **kw)
    R = float(jnp.sqrt(jnp.sum(jnp.square(jnp.asarray(truth))))) * 2.0
    g_ball = float(pd_gap_inverse(res.state, A, b, reg=kw["reg"],
                                  norm_bound=R, A_T=A_T))
    g_both = float(pd_gap_inverse(res.state, A, b, reg=kw["reg"],
                                  x_box=2.0, norm_bound=R, A_T=A_T))
    assert g_ball >= float(res.loss[-1]) - p_star - 1e-9
    assert g_both <= min(g_ball, gaps[1]) + 1e-9

    # missing prior set -> explicit error
    with pytest.raises(ValueError, match="x_box"):
        pd_gap_inverse(res.state, A, b, reg=kw["reg"])


def test_run_until_converged_gap_inverse_ct():
    """run_until_converged(criterion='gap') on the TV-CT experiment: the
    operator rides the documented functools.partial composition, the
    stop is certified (gap <= tol * loss), and gap_x_box is consumed
    rather than forwarded to the solver."""
    import functools

    from pytv4d_tpu.models.ct import make_projector
    from pytv4d_tpu.solvers import cp_inverse, pd_gap_inverse
    from pytv4d_tpu.solvers import run_until_converged

    N = 16
    rng = np.random.default_rng(5)
    shape = (1, 1, N, N)
    angles = np.linspace(0, np.pi, 12, endpoint=False)
    A, A_T = make_projector(shape, angles, dtype=jnp.float64,
                            method="gather")
    truth = rng.random((N, N))
    b = A(jnp.asarray(truth[None, None]))

    solver = functools.partial(cp_inverse, A, vol_shape=shape, A_T=A_T,
                               reg=1e-3, nonneg=True)
    # the certified gap decays at CP's O(1/n): rel ~5.5e-2 at 4000 its on
    # this problem (measured) — certify at 6e-2 and verify the stop
    res = run_until_converged(solver, b, tol=6e-2, chunk=250,
                              max_iter=6000, criterion="gap", gap_x_box=2.0)
    n_run = len(res.loss)
    assert n_run < 6000
    gap = float(pd_gap_inverse(res.state, A, b, reg=1e-3, x_box=2.0,
                               A_T=A_T))
    assert gap <= 6e-2 * abs(float(res.loss[-1]))

    # without the partial operator or gap_operator: explicit guidance
    def opaque_solver(b_, n_iter=10, state=None, **kw):
        return cp_inverse(A, b_, shape, A_T=A_T, n_iter=n_iter,
                          state=state, **kw)

    with pytest.raises(ValueError, match="gap_operator"):
        run_until_converged(opaque_solver, b, tol=1e-4, chunk=10,
                            max_iter=20, criterion="gap", reg=1e-3,
                            gap_x_box=2.0)
    # ... and gap_operator= fixes it (tol loose: exercising the path)
    res2 = run_until_converged(opaque_solver, b, tol=5e-2, chunk=100,
                               max_iter=200, criterion="gap", reg=1e-3,
                               gap_operator=A, gap_x_box=2.0)
    assert len(res2.loss) <= 200


def test_tgv_gap_inverse_bounds_suboptimality():
    """tgv_gap_inverse certifies TGV-CT iterates: the gap bounds the true
    suboptimality (vs a 10x-iteration reference), tightens with
    iterations, and run_until_converged(criterion='gap') drives it with
    alphas from the functools.partial composition."""
    import functools

    from pytv4d_tpu.models.ct import make_projector
    from pytv4d_tpu.solvers import (
        run_until_converged,
        tgv_gap_inverse,
        tgv_inverse,
    )

    N = 24
    c0 = (N - 1) / 2.0
    rr, cc = np.meshgrid(np.arange(N) - c0, np.arange(N) - c0,
                         indexing="ij")
    # piecewise-linear truth (TGV's home turf), nonneg, max < 2
    truth = np.clip(1.0 - np.abs(rr) / 16.0, 0.0, None) \
        * (np.abs(cc) < 10)
    shape = (1, 1, N, N)
    angles = np.linspace(0, np.pi, 16, endpoint=False)
    A, A_T = make_projector(shape, angles, dtype=jnp.float64,
                            method="gather")
    b = A(jnp.asarray(truth[None, None]))
    kw = dict(alpha1=2e-3, alpha0=4e-3, op_norm=24.0, nonneg=True)

    ref = tgv_inverse(A, b, shape, A_T=A_T, n_iter=4000, **kw)
    p_star = float(ref.loss[-1])

    gaps = []
    for n in (150, 500):
        res = tgv_inverse(A, b, shape, A_T=A_T, n_iter=n, **kw)
        gap = float(tgv_gap_inverse(res.state, A, b, alpha1=kw["alpha1"],
                                    alpha0=kw["alpha0"], x_box=2.0,
                                    A_T=A_T))
        assert gap >= float(res.loss[-1]) - p_star - 1e-9
        assert gap >= 0.0
        gaps.append(gap)
    assert gaps[1] < gaps[0]

    solver = functools.partial(tgv_inverse, A, vol_shape=shape, A_T=A_T,
                               **kw)
    res = run_until_converged(solver, b, tol=0.5, chunk=200, max_iter=2000,
                              criterion="gap", gap_x_box=2.0)
    assert len(res.loss) <= 2000
    # alphas must be explicit: without them the eager guard fires
    bare = functools.partial(tgv_inverse, A, vol_shape=shape, A_T=A_T,
                             op_norm=24.0)
    with pytest.raises(ValueError, match="alpha1"):
        run_until_converged(bare, b, criterion="gap", gap_x_box=2.0,
                            chunk=10, max_iter=20)
    # ... and the prior set too
    with pytest.raises(ValueError, match="x_box"):
        tgv_gap_inverse(res.state, A, b, alpha1=kw["alpha1"],
                        alpha0=kw["alpha0"])


@pytest.mark.full
def test_production_scale_cp_parity():
    """BASELINE.md's north-star loss-parity bar at the largest
    reference-runnable scale (VERDICT r3 item 5): the reference CPU CP
    recipe was executed in f64 at (16, 4, 512, 512) with time coupling
    (tools/make_golden_solver_production.py, ~12 min of numpy) and its
    50-iteration loss trajectory recorded.  Our jnp path must reproduce
    it to 1e-9 in f64 and 1e-4 relative in f32 (the TPU storage dtype);
    the on-chip fused-path spot check lives in
    tools/bench_golden_production.py (BENCH_LOCAL.jsonl)."""
    import os

    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "golden_solver4d_production.npz"))
    rng = np.random.default_rng(int(g["seed"]))
    noisy = rng.random(tuple(g["shape"])) * 100.0
    cfg = TVConfig(scheme="hybrid", reg_time=float(g["reg_time"]))
    n_it = len(g["losses"])

    res = chambolle_pock(noisy, n_iter=n_it, reg=float(g["reg"]), cfg=cfg,
                         tau=float(g["tau"]))
    np.testing.assert_allclose(np.asarray(res.loss), g["losses"],
                               rtol=1e-9)
    probe = np.asarray(res.x)[::4, :, ::16, ::16]
    np.testing.assert_allclose(probe, g["x_probe"], rtol=1e-9, atol=1e-9)

    # fused=False: on forced-CPU CI the f32 fused path would run the
    # Pallas INTERPRETER at 16.8M voxels; the fused-kernel parity at this
    # scale is asserted on-chip (tools/bench_golden_production.py)
    res32 = chambolle_pock(noisy.astype(np.float32), n_iter=n_it,
                           reg=float(g["reg"]), cfg=cfg,
                           tau=float(g["tau"]), fused=False)
    rel = np.abs(np.asarray(res32.loss, np.float64) - g["losses"]) \
        / g["losses"]
    assert np.max(rel) < 1e-4, np.max(rel)
