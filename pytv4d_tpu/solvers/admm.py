"""ADMM TV denoising — the third solver family the reference claims support
for (``README.md:26``: "operator versions ... that enable the use of ...
proximal algorithms (ADMM, Chambolle-Pock, ...)") but never ships.

Minimizes ``1/2 ||x - x0||^2 + reg * ||D x||_{2,1}`` via the split
``z = D x``:

- x-update: ``(I + rho D^T D) x = x0 + rho D^T (z - u)`` solved matrix-free
  with conjugate gradients (``lax.fori_loop``; D^T D is a fixed stencil, so a
  handful of CG iterations suffice);
- z-update: group soft-threshold (prox of the L2,1 norm) per pixel;
- u-update: scaled dual ascent.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import TVConfig
from ..core.schemes import num_channels
from ..ops.operators import D, D_T, tv_norm


class ADMMState(NamedTuple):
    x: jax.Array   # primal image (Nz, M, N_row, N_col)
    z: jax.Array   # split variable (Nz, Nd, M, N_row, N_col)
    u: jax.Array   # scaled dual (Nz, Nd, M, N_row, N_col)


class ADMMResult(NamedTuple):
    x: jax.Array
    state: ADMMState
    loss: jax.Array


def _cg_solve(apply_A, b, x0, n_iter: int):
    """Matrix-free CG for SPD ``A`` (fixed iteration count, jit-friendly)."""

    def body(_, carry):
        x, r, p, rs = carry
        Ap = apply_A(p)
        alpha = rs / (jnp.sum(p * Ap) + 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / (rs + 1e-30)) * p
        return x, r, p, rs_new

    r0 = b - apply_A(x0)
    carry = (x0, r0, r0, jnp.sum(r0 * r0))
    x, *_ = jax.lax.fori_loop(0, n_iter, body, carry)
    return x


def group_soft_threshold(v, thresh, norm: str = "iso",
                         huber_delta: float = 1.0):
    """Prox of ``thresh * TV-norm``: group (L2,1) shrinkage per pixel for
    isotropic TV, elementwise soft threshold for anisotropic L1,1, and for
    Huber the scale-or-shrink form (``v/(1+thresh/delta)`` inside the
    quadratic region ``|v| <= delta + thresh``, soft shrink outside —
    continuous at the boundary)."""
    if norm == "aniso":
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - thresh, 0.0)
    norms = jnp.sqrt(jnp.sum(jnp.square(v), axis=1, keepdims=True))
    if norm == "huber":
        shrink = 1.0 - thresh / jnp.maximum(norms, 1e-30)
        scale = jnp.where(norms <= huber_delta + thresh,
                          1.0 / (1.0 + thresh / huber_delta), shrink)
        return v * scale
    scale = jnp.maximum(0.0, 1.0 - thresh / jnp.maximum(norms, 1e-30))
    return v * scale


def admm_step(state: ADMMState, x_noisy, *, reg, rho, cg_iter, cfg: TVConfig,
              mask_static=None, weight_time=None):
    kw = dict(mask_static=mask_static, weight_time=weight_time,
              **cfg.kwargs())
    x, z, u = state

    def apply_A(v):
        return v + rho * D_T(D(v, cfg.scheme, **kw), cfg.scheme, **kw)

    b = x_noisy + rho * D_T(z - u, cfg.scheme, **kw)
    x = _cg_solve(apply_A, b, x, cg_iter)
    D_x = D(x, cfg.scheme, **kw)
    z = group_soft_threshold(D_x + u, reg / rho, cfg.norm, cfg.huber_delta)
    u = u + D_x - z
    loss = 0.5 * jnp.sum(jnp.square(x - x_noisy)) + reg * tv_norm(
        D_x, cfg.norm, huber_delta=cfg.huber_delta)
    return ADMMState(x, z, u), loss


def init_state(x_noisy, cfg: TVConfig, x_init=None) -> ADMMState:
    Nz, M = x_noisy.shape[0], x_noisy.shape[1]
    Nd = num_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    shape = (Nz, Nd, M) + x_noisy.shape[2:]
    return ADMMState(
        x=x_noisy if x_init is None else x_init,
        z=jnp.zeros(shape, dtype=x_noisy.dtype),
        u=jnp.zeros(shape, dtype=x_noisy.dtype),
    )


@functools.partial(
    jax.jit, static_argnames=("n_iter", "cfg", "reg", "rho", "cg_iter")
)
def admm(
    x_noisy,
    n_iter: int = 100,
    reg: float = 25.0,
    rho: float = 10.0,
    cg_iter: int = 8,
    cfg: TVConfig = TVConfig(),
    state: ADMMState = None,
    mask_static=None,
    weight_time=None,
) -> ADMMResult:
    """Run ``n_iter`` ADMM iterations on device (state resumable)."""
    if state is None:
        state = init_state(x_noisy, cfg)

    def body(st, _):
        st, loss = admm_step(
            st, x_noisy, reg=reg, rho=rho, cg_iter=cg_iter, cfg=cfg,
            mask_static=mask_static, weight_time=weight_time,
        )
        return st, loss

    final, losses = jax.lax.scan(body, state, length=n_iter)
    return ADMMResult(x=final.x, state=final, loss=losses)
