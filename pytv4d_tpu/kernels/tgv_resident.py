"""Slice-resident TGV-2 solver kernel: the ENTIRE Chambolle-Pock solve for
``axes='2d'`` TGV in one Pallas call, gridded over (z, t) slices.

The in-plane TGV mode (solvers/tgv.py, default ``axes='2d'``) couples pixels
only within a (N_row, N_col) slice — slices are fully independent subproblems.
That makes it the ideal resident-kernel shape: one grid program per (z, t)
slice keeps the whole 11-plane CP state (x, x_bar, 2-field w, w_bar, duals
p[2], q[3]) in VMEM for ALL iterations, so per-iteration HBM traffic drops
from ~28 plane-reads/writes (the jnp scan) to zero — the kernel streams x0
in and x, w out exactly once for the whole solve.  Unlike the TV fused
kernels (kernels/fused.py) no ghost planes or seam corrections are needed:
there is no z/t coupling by construction.

The loop body reuses the *same* jnp algebra as ``solvers.tgv.tgv_denoise``
(operators imported from there, adjoints via ``jax.linear_transpose``), so
numerics match the scan path to fp round-off by construction; interpreter-
mode parity is enforced by tests/test_solvers.py.

Loss history: each program accumulates its slice's per-iteration objective
into a shared (n_iter, 8, 128) VMEM accumulator (constant output index map;
TPU grids are sequential, so read-modify-write across programs is the
standard revisiting-accumulation pattern).  The objective is separable over
slices, so the accumulated sum equals the global objective.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024

# state (x, xb, x0, w, wb, p, q = 12 planes) + step temporaries (D xb,
# E wb, D^T p, E^T q, projection norms, ...) + the full-state outputs
# (resume support), with headroom for mosaic's own intermediates
_PLANES = 38


def tgv_resident_fits(shape, dtype=jnp.float32, n_iter: int = 0,
                      compute_loss: bool = True) -> bool:
    """Auto-dispatch guard for the compiled slice-resident TGV kernel: one
    slice's whole-solve working set (+ the loss accumulator) must fit VMEM."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    Nz, M, Nr, Nc = shape
    need = _PLANES * Nr * Nc * 4
    if compute_loss:
        need += n_iter * 8 * 128 * 4
    return need <= _VMEM_BUDGET and Nr * Nc >= 8 * 128


@functools.lru_cache(maxsize=None)
def make_resident_tgv_solver(shape, n_iter: int, alpha1: float, alpha0: float,
                             sigma_tau_split: float = 1.0,
                             dtype_name: str = "float32",
                             compute_loss: bool = True,
                             interpret: bool = False,
                             norm: str = "iso", huber_delta: float = 1.0):
    """One pallas_call running the full ``n_iter`` TGV-2 CP solve, one grid
    program per (z, t) slice.  Returns
    ``solve(x0) -> (x, w, xb, wb, p, q, losses)`` — the full final CP state
    in the public layouts (w-like ``(Nz, 2, M, Nr, Nc)``, q
    ``(Nz, 3, M, Nr, Nc)``) for resume support; ``losses`` is ``(n_iter,)``
    (empty ``(0,)`` when ``compute_loss=False``)."""
    from ..solvers.tgv import (
        TGV_NORM_BOUND_SQ,
        _d_fwd,
        _sym_grad,
        _tgv_dual_prox,
        _tgv_norm_val,
    )

    if norm not in ("iso", "aniso", "huber"):
        raise ValueError(f"norm must be 'iso', 'aniso' or 'huber', got "
                         f"{norm!r}")
    Nz, M, Nr, Nc = shape
    dtype = jnp.dtype(dtype_name)
    # exact 2D operator-norm bound (Bredies et al. sec. 6), as in tgv_denoise
    L = math.sqrt(TGV_NORM_BOUND_SQ["2d"])
    # plain Python floats: weak-typed, so they inline into the kernel jaxpr
    # (Pallas rejects captured non-weak constants) and preserve x's dtype
    sigma = float(sigma_tau_split / L)
    tau = float(1.0 / (sigma_tau_split * L))
    a1 = float(alpha1)
    a0 = float(alpha0)

    slice_shape = (1, 1, Nr, Nc)
    w_shape = (1, 2, 1, Nr, Nc)
    q_shape = (1, 3, 1, Nr, Nc)

    # Hand-written adjoints (jax.linear_transpose closes over jaxpr consts,
    # which Pallas kernels cannot capture): the shared one-sided-difference
    # adjoint (kernels/fused.py).  Equality with the linear_transpose path
    # is enforced by the interpreter-mode parity test
    # (tests/test_solvers.py::test_tgv_fused_resident_parity).
    from .fused import _one_sided_adjoint as _adj

    def d_T(p):
        # adjoint of _d_fwd on one slice: p is (1, 2, 1, Nr, Nc)
        return _adj(p[:, 0], 2, False) + _adj(p[:, 1], 3, False)

    def sym_T(q):
        # adjoint of _sym_grad: q is (1, 3, 1, Nr, Nc) = [q_rr, q_cc, q_rc]
        wr = _adj(q[:, 0], 2, True) + 0.5 * _adj(q[:, 2], 3, True)
        wc = _adj(q[:, 1], 3, True) + 0.5 * _adj(q[:, 2], 2, True)
        return jnp.stack([wr, wc], axis=1)

    def kernel(x0_ref, x_out, w_out, xb_out, wb_out, p_out, q_out,
               *loss_refs):
        x0 = x0_ref[...]
        if compute_loss:
            (loss_out,) = loss_refs
            first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

            @pl.when(first)
            def _zero():
                loss_out[...] = jnp.zeros((n_iter, 8, 128), dtype)

        delta = float(huber_delta)

        def body(i, carry):
            x, xb, w, wb, p, q = carry
            p = _tgv_dual_prox(p + sigma * (_d_fwd(xb) - wb), a1, norm,
                               sigma, delta)
            q = _tgv_dual_prox(q + sigma * _sym_grad(wb), a0, norm,
                               sigma, delta)
            x_new = (x - tau * d_T(p) + tau * x0) / (1.0 + tau)
            w_new = w - tau * (-p + sym_T(q))
            xb = 2.0 * x_new - x
            wb = 2.0 * w_new - w
            if compute_loss:
                loss = (0.5 * jnp.sum(jnp.square(x_new - x0))
                        + a1 * _tgv_norm_val(_d_fwd(x_new) - w_new, norm,
                                             delta)
                        + a0 * _tgv_norm_val(_sym_grad(w_new), norm, delta))
                loss_out[pl.ds(i, 1)] = (
                    loss_out[pl.ds(i, 1)] + jnp.full((1, 8, 128), loss, dtype)
                )
            return (x_new, xb, w_new, wb, p, q)

        zero_w = jnp.zeros(w_shape, dtype)
        x, xb, w, wb, pf, qf = jax.lax.fori_loop(
            0, n_iter, body,
            (x0, x0, zero_w, zero_w, zero_w, jnp.zeros(q_shape, dtype)),
        )
        x_out[...] = x
        w_out[...] = w
        xb_out[...] = xb
        wb_out[...] = wb
        p_out[...] = pf
        q_out[...] = qf

    vol_spec = pl.BlockSpec(slice_shape, lambda i, j: (i, j, 0, 0))
    w_spec = pl.BlockSpec(w_shape, lambda i, j: (i, 0, j, 0, 0))
    q_spec = pl.BlockSpec(q_shape, lambda i, j: (i, 0, j, 0, 0))
    out_shape = [
        jax.ShapeDtypeStruct((Nz, M, Nr, Nc), dtype),
        jax.ShapeDtypeStruct((Nz, 2, M, Nr, Nc), dtype),
        jax.ShapeDtypeStruct((Nz, M, Nr, Nc), dtype),       # xb
        jax.ShapeDtypeStruct((Nz, 2, M, Nr, Nc), dtype),    # wb
        jax.ShapeDtypeStruct((Nz, 2, M, Nr, Nc), dtype),    # p
        jax.ShapeDtypeStruct((Nz, 3, M, Nr, Nc), dtype),    # q
    ]
    out_specs = [vol_spec, w_spec, vol_spec, w_spec, w_spec, q_spec]
    if compute_loss:
        out_shape.append(jax.ShapeDtypeStruct((n_iter, 8, 128), dtype))
        out_specs.append(
            pl.BlockSpec((n_iter, 8, 128), lambda i, j: (0, 0, 0))
        )

    fn = pl.pallas_call(
        kernel,
        grid=(Nz, M),
        in_specs=[pl.BlockSpec(slice_shape, lambda i, j: (i, j, 0, 0))],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )

    def solve(x0):
        """-> (x, w, xb, wb, p, q, losses) — the full final CP state
        (public layouts) plus the loss history."""
        outs = fn(x0)
        if compute_loss:
            *st, loss_tiles = outs
            return (*st, loss_tiles[:, 0, 0])
        return (*outs, jnp.zeros((0,), dtype))

    return solve
