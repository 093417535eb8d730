"""VMEM-resident solver kernels: the ENTIRE iterative solve in one Pallas
call for volumes that fit on-chip memory.

For small problems (the reference's own headline benchmark is a single
256x256 image) the per-iteration cost is dominated by kernel dispatch, not
arithmetic: even a fully device-resident ``lax.scan`` issues several XLA
kernels per iteration.  Here the solver state (x, y_A, y_D) never leaves
VMEM: one ``pallas_call`` runs a ``fori_loop`` over ALL iterations, and the
loop body is literally the same jnp ``cp_step`` / ``gd`` algebra as the
reference path (ops/operators.py works unchanged inside a kernel), so
numerics are identical by construction.

Guard: :func:`resident_fits` — total state + temporaries must fit ~half of
VMEM.  This is an EXPLICIT API (call the ``make_resident_*`` builders
directly); the solvers deliberately do NOT auto-dispatch to it — measured
perf-neutral on v5e for the qualifying 256^2 headline case, which is
VPU-compute-bound rather than dispatch- or HBM-bound (docs/performance.md
"VMEM-resident whole-solve kernels").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import TVConfig
from ..core.schemes import num_channels

_VMEM_BUDGET = 12 * 1024 * 1024


def resident_fits(shape, cfg: TVConfig, dtype=jnp.float32) -> bool:
    """Whole-solve-in-VMEM guard: state + the materialized channel stack +
    working temporaries, doubled for safety."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    Nz, M, Nr, Nc = shape
    vol = Nz * M * Nr * Nc * jnp.dtype(dtype).itemsize
    Nd = num_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    # x, x0, y_A, x_new + 3 Nd-channel temporaries (D_x, p, y_D)
    need = 4 * vol + 3 * Nd * vol
    return 2 * need <= _VMEM_BUDGET and Nr * Nc >= 8 * 128


@functools.lru_cache(maxsize=None)
def make_resident_cp_solver(cfg: TVConfig, shape, n_iter: int,
                            dtype_name="float32", reg=1.0, sigma_D=0.5,
                            sigma_A=1.0, tau=0.1, interpret=False):
    """One pallas_call running ``n_iter`` CP iterations with state in VMEM.

    Returns ``solve(x_noisy, x, y_A, y_D) -> (x, y_A, y_D, losses)`` with
    the public (Nz, Nd, M, Nr, Nc) dual layout and the exact ``cp_step``
    semantics (solvers/cp.py — the body calls it verbatim).
    """
    from ..solvers.cp import CPState, cp_step

    Nz, M, Nr, Nc = shape
    dtype = jnp.dtype(dtype_name)
    Nd = num_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    yd_shape = (Nz, Nd, M, Nr, Nc)

    def kernel(x0_ref, x_ref, yA_ref, yD_ref, x_out, yA_out, yD_out,
               loss_out):
        x0 = x0_ref[...]

        def body(i, carry):
            x, y_A, y_D = carry
            st, loss = cp_step(
                CPState(x, y_A, y_D), x0, reg=reg, sigma_D=sigma_D,
                sigma_A=sigma_A, tau=tau, cfg=cfg,
            )
            loss_out[pl.ds(i, 1)] = jnp.full((1, 8, 128), loss, dtype)
            return (st.x, st.y_A, st.y_D)

        x, y_A, y_D = jax.lax.fori_loop(
            0, n_iter, body, (x_ref[...], yA_ref[...], yD_ref[...])
        )
        x_out[...] = x
        yA_out[...] = y_A
        yD_out[...] = y_D

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        in_specs=[vmem, vmem, vmem, vmem],
        out_specs=(vmem, vmem, vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct(yd_shape, dtype),
            jax.ShapeDtypeStruct((n_iter, 8, 128), dtype),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )

    def solve(x_noisy, x, y_A, y_D):
        x, y_A, y_D, loss_tiles = fn(x_noisy, x, y_A, y_D)
        return x, y_A, y_D, loss_tiles[:, 0, 0]

    return solve


@functools.lru_cache(maxsize=None)
def make_resident_gd_solver(cfg: TVConfig, shape, n_iter: int,
                            dtype_name="float32", reg=1.0, step_size=5e-3,
                            interpret=False):
    """One pallas_call running ``n_iter`` subgradient-descent iterations with
    state in VMEM; body reuses the jnp tv_and_subgrad verbatim."""
    from ..ops.tv import tv_and_subgrad

    dtype = jnp.dtype(dtype_name)

    def kernel(x0_ref, x_ref, x_out, loss_out):
        x0 = x0_ref[...]

        def body(i, x):
            tv, G = tv_and_subgrad(x, cfg.scheme, **cfg.kwargs())
            x_new = x - step_size * ((x - x0) + reg * G)
            loss = 0.5 * jnp.sum(jnp.square(x_new - x0)) + reg * tv
            loss_out[pl.ds(i, 1)] = jnp.full((1, 8, 128), loss, dtype)
            return x_new

        x_out[...] = jax.lax.fori_loop(0, n_iter, body, x_ref[...])

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        in_specs=[vmem, vmem],
        out_specs=(vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct((n_iter, 8, 128), dtype),
        ),
        input_output_aliases={1: 0},
        interpret=interpret,
    )

    def solve(x_noisy, x):
        x, loss_tiles = fn(x_noisy, x)
        return x, loss_tiles[:, 0, 0]

    return solve
