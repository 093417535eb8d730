"""TV value + subgradient — the reference's ``tv_<scheme>`` entry points.

Parity: ``pytv/tv_CPU.py:47-333`` / ``pytv/tv_GPU.py:47-376``.  The reference
assembles the subgradient G with 12-16 hand-written scatter-add passes; the key
structural fact (verified against every scheme) is that G is exactly the
*unweighted* adjoint scatter of ``D_img / grad_norms`` followed by the scheme
normalization — the per-axis sqrt(reg) weights and the static-mask factor are
deliberately NOT reapplied in G (compare ``tv_CPU.py:104-121``, which scatters
the z/t channels bare, with ``tv_operators_CPU.py:419``, which weights them).
We reproduce that convention exactly via :func:`ops.operators.dt_channel`.

Nonsmooth convention: where a pixel's gradient norm is 0 the TV is
non-differentiable and the subgradient contribution is set to 0 by replacing
the norm with +inf (``tv_CPU.py:85-86``).  This differs from ``jax.grad`` of
``l21 o D`` at nonsmooth points (0/0 -> NaN), which is why :func:`make_tv`
registers this subgradient as a custom VJP instead of relying on autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.schemes import scheme_channels
from .operators import D, D_T, compute_L11_norm, compute_L21_norm, dt_channel, mask_enabled

__all__ = [
    "tv_and_subgrad",
    "tv_upwind",
    "tv_downwind",
    "tv_central",
    "tv_hybrid",
    "make_tv",
]


def _subgrad_from_D(D_img, grad_norms_safe, scheme, Nz, M, reg_z_over_reg, reg_time, *, xp):
    """G = normalization * unweighted-adjoint(D_img / grad_norms).

    Mirrors the scatter algebra of ``tv_CPU.py:92-124`` (hybrid), ``:176-187``
    (downwind), ``:239-250`` (upwind), ``:302-325`` (central, incl. the Nz==2 /
    M==2 upwind-fallback branches which the scheme table already encodes).
    """
    chans, norm = scheme_channels(scheme, Nz, M, reg_z_over_reg, reg_time)
    Y = D_img / grad_norms_safe[:, None]
    G = None
    for i, ch in enumerate(chans):
        contrib = dt_channel(xp, Y[:, i], ch.axis, ch.kind)
        G = contrib if G is None else G + contrib
    if G is None:
        G = xp.zeros_like(grad_norms_safe)
    if norm != 1.0:
        G = G * norm
    return G


def tv_and_subgrad(
    img,
    scheme: str = "hybrid",
    mask=None,
    reg_z_over_reg: float = 1.0,
    reg_time: float = 0.0,
    mask_static=False,
    factor_reg_static: float = 0.0,
    weight_time=None,
    return_grad_norms: bool = False,
    norm_type: str = "iso",
    huber_delta: float = 1.0,
    *,
    xp=jnp,
):
    """Total variation and a subgradient of ``img`` (``(Nz, M, N_row, N_col)``).

    Returns ``(tv, G)`` or ``(tv, G, grad_norms)``; ``grad_norms`` has zeros
    already replaced by +inf, as the reference returns it (``tv_CPU.py:86,127``).

    ``mask`` zeroes masked-out pixels before the TV computation.  (The
    reference's ``mask`` kwarg is unusable with a real array — ``tv_CPU.py:77``
    raises on ndarray input, SURVEY.md section 2.4.2 — implemented correctly
    here as ``img = where(mask, img, 0)``.)

    ``norm_type='aniso'`` computes the anisotropic L1,1 TV (a framework
    extension): ``tv = sum |D x|`` and the TRUE subgradient
    ``G = D^T sign(D x)`` (full weights — unlike the isotropic path, which
    reproduces the reference's unweighted-scatter convention).

    ``norm_type='huber'`` computes the Huber-smoothed isotropic TV and its
    TRUE gradient ``G = D^T(D x / max(|D x|_2, delta))`` (smooth — no
    inf-trick; full weights like the aniso path).
    """
    if mask_enabled(mask):
        img = xp.where(mask, img, xp.zeros_like(img))
    Nz, M = img.shape[0], img.shape[1]

    kw = dict(
        reg_z_over_reg=reg_z_over_reg,
        reg_time=reg_time,
        mask_static=mask_static,
        factor_reg_static=factor_reg_static,
        weight_time=weight_time,
    )
    D_img = D(img, scheme, xp=xp, **kw)
    if norm_type == "aniso":
        tv, abs_sums = compute_L11_norm(D_img, return_array=True, xp=xp)
        G = D_T(xp.sign(D_img), scheme, xp=xp, **kw)
        if return_grad_norms:
            return tv, G, abs_sums
        return tv, G
    if norm_type == "huber":
        from .operators import compute_huber_norm

        tv, n = compute_huber_norm(D_img, huber_delta, return_array=True,
                                   xp=xp)
        G = D_T(D_img / xp.maximum(n, huber_delta)[:, None], scheme, xp=xp,
                **kw)
        if return_grad_norms:
            return tv, G, n
        return tv, G
    tv, grad_norms = compute_L21_norm(D_img, return_array=True, xp=xp)
    grad_norms = xp.where(grad_norms == 0, xp.inf, grad_norms)
    G = _subgrad_from_D(
        D_img, grad_norms, scheme, Nz, M, reg_z_over_reg, reg_time, xp=xp
    )
    if return_grad_norms:
        return tv, G, grad_norms
    return tv, G


def _scheme_partial(scheme):
    fn = functools.partial(tv_and_subgrad, scheme=scheme)
    fn.__name__ = f"tv_{scheme}"
    fn.__qualname__ = fn.__name__
    fn.__doc__ = f"tv_and_subgrad(..., scheme={scheme!r}); see :func:`tv_and_subgrad`."
    return fn


tv_upwind = _scheme_partial("upwind")
tv_downwind = _scheme_partial("downwind")
tv_central = _scheme_partial("central")
tv_hybrid = _scheme_partial("hybrid")


@functools.lru_cache(maxsize=None)
def make_tv(
    scheme: str = "hybrid",
    reg_z_over_reg: float = 1.0,
    reg_time: float = 0.0,
):
    """Build ``tv_fn(img) -> scalar``, differentiable with the reference's
    subgradient convention as its custom VJP (SURVEY.md section 7 "hard parts"
    item 4).  Use with jax.grad / optax optimizers."""

    def _tv_primal(img):
        D_img = D(img, scheme, reg_z_over_reg=reg_z_over_reg, reg_time=reg_time)
        return compute_L21_norm(D_img)

    @jax.custom_vjp
    def tv_fn(img):
        return _tv_primal(img)

    def fwd(img):
        tv, G = tv_and_subgrad(
            img, scheme, reg_z_over_reg=reg_z_over_reg, reg_time=reg_time
        )
        return tv, G

    def bwd(G, ct):
        return (ct * G,)

    tv_fn.defvjp(fwd, bwd)
    tv_fn.__name__ = f"tv_{scheme}_value"
    return tv_fn
