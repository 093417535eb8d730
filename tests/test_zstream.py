"""z-streaming pass A (kernels/zstream.py) vs the production pass-A kernel
— identical outputs (same _dual_core body, different traffic schedule),
across schemes, row tiling, fidelities and bf16 duals.  Interpreter mode
(no TPU needed); the on-chip A/B timing lives in tools/bench_zstream.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.core.schemes import num_channels
from pytv4d_tpu.kernels.fused import _sum_parts, make_cp_dual_kernel
from pytv4d_tpu.kernels.zstream import make_cp_dual_kernel_zstream


def _mk_inputs(shape, cfg, seed=0, dual_dtype="float32", dtype="float32"):
    rng = np.random.default_rng(seed)
    Nz, M, Nr, Nc = shape
    Nd = num_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    x = jnp.asarray(rng.random(shape), dtype)
    x0 = jnp.asarray(rng.random(shape), dtype)
    yA = jnp.asarray(0.1 * rng.standard_normal(shape), dtype)
    yD = jnp.asarray(0.1 * rng.standard_normal((Nz, M, Nd, Nr, Nc)),
                     dual_dtype)
    return x, x0, yA, yD


def _compare(shape, cfg, row_tile, dual_dtype="float32", dtype="float32",
             fidelity="l2", fid_weight=1.0, atol=3e-7):
    # atol = f32 round-off: the bodies are the same _dual_core, but the
    # fori_loop-traced graph gives XLA different fusion/fma freedom than
    # the straight-line production kernel (1-ulp dt differences observed)
    kw = dict(sigma_D=0.5, sigma_A=1.0, reg=0.3, interpret=True,
              dual_dtype_name=dual_dtype, fidelity=fidelity,
              fid_weight=fid_weight)
    ref = make_cp_dual_kernel(cfg, shape, dtype, **kw)
    zs = make_cp_dual_kernel_zstream(cfg, shape, dtype, row_tile=row_tile,
                                     **kw)
    x, x0, yA, yD = _mk_inputs(shape, cfg, dual_dtype=dual_dtype,
                               dtype=dtype)
    rA, rD, rdt, rparts = ref(x, x0, yA, yD)
    zA, zD, zdt, zparts = zs(x, x0, yA, yD)
    np.testing.assert_allclose(np.asarray(zA), np.asarray(rA), atol=atol)
    np.testing.assert_allclose(np.asarray(zD, np.float32),
                               np.asarray(rD, np.float32), atol=atol)
    np.testing.assert_allclose(np.asarray(zdt), np.asarray(rdt), atol=atol)
    np.testing.assert_allclose(float(jnp.sum(zparts[..., 0, 0])),
                               float(_sum_parts(rparts)), rtol=2e-6)


@pytest.mark.parametrize("scheme", ["upwind", "downwind", "central",
                                    "hybrid"])
def test_zstream_matches_production_schemes(scheme):
    cfg = TVConfig(scheme=scheme, reg_time=0.5)
    _compare((4, 2, 16, 128), cfg, row_tile=16)


def test_zstream_row_tiled_full_step():
    """Row tiling: dt_local's in-tile/cross-tile split is defined by the
    row tile, so pass A alone is only comparable at the SAME TR — verify
    the seam-row stream through the FULL fused step instead: zstream pass
    A + the production pass B must reproduce the production step.  The
    shape is chosen so the production tiler picks TR=256 -> R=2."""
    from pytv4d_tpu.kernels.fused import (
        _build,
        make_cp_primal_kernel,
    )

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    shape = (4, 2, 512, 128)
    sp, *_ = _build(cfg, shape, "float32")
    assert sp.R >= 2, "shape no longer row-tiles; pick a bigger Nr"
    kw = dict(sigma_D=0.5, sigma_A=1.0, reg=0.3, interpret=True,
              dual_dtype_name="float32")
    ref_dual = make_cp_dual_kernel(cfg, shape, "float32", **kw)
    zs_dual = make_cp_dual_kernel_zstream(cfg, shape, "float32",
                                          row_tile=sp.TR, **kw)
    primal = make_cp_primal_kernel(cfg, shape, "float32", tau=0.1,
                                   interpret=True,
                                   dual_dtype_name="float32")
    x, x0, yA, yD = _mk_inputs(shape, cfg)

    rA, rD, rdt, _ = ref_dual(x, x0, yA, yD)
    rx, _ = primal(x, x0, rA, rD, rdt, None)
    zA, zD, zdt, _ = zs_dual(x, x0, yA, yD)
    zx, _ = primal(x, x0, zA, zD, zdt, None)
    np.testing.assert_allclose(np.asarray(zx), np.asarray(rx), atol=3e-7)


def test_zstream_bf16_dual_and_fidelities():
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    _compare((4, 2, 16, 128), cfg, row_tile=16, dual_dtype="bfloat16")
    _compare((4, 2, 16, 128), cfg, row_tile=16, fidelity="l1",
             fid_weight=0.7)
    _compare((3, 2, 16, 128), cfg, row_tile=16, fidelity="kl",
             fid_weight=1.3)


def test_zstream_norm_families_and_aniso():
    _compare((4, 2, 16, 128), TVConfig(scheme="hybrid", reg_time=0.5,
                                       norm="aniso"), row_tile=16)
    _compare((4, 2, 16, 128), TVConfig(scheme="hybrid", reg_time=0.5,
                                       norm="huber", huber_delta=0.2),
             row_tile=16)


def test_zstream_guards():
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    with pytest.raises(ValueError, match="Nz >= 3"):
        make_cp_dual_kernel_zstream(cfg, (2, 2, 16, 128), "float32",
                                    interpret=True)
    with pytest.raises(ValueError, match="z channels"):
        make_cp_dual_kernel_zstream(
            TVConfig(scheme="hybrid", reg_z_over_reg=0.0),
            (4, 2, 16, 128), "float32", interpret=True)
