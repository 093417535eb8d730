"""Denoising model front-ends over the solver layer.

Covers the reference's worked examples (``README.md:95-158``,
``examples/a_getting_started.ipynb``) as library API, plus the
``denoise_tv_chambolle`` scikit-image-compatible entry point the reference
lists as a to-do (``README.md:260``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.config import TVConfig
from ..solvers.admm import admm
from ..solvers.cp import chambolle_pock
from ..solvers.fista import fista
from ..solvers.gd import subgradient_descent
from ..solvers.tgv import tgv_denoise


def add_noise(img, noise_level: float = 100.0, seed: int = 0) -> np.ndarray:
    """The README's noise recipe (``README.md:112-115``):
    ``img + noise_level * U[0,1)`` with ``np.random.seed(seed)``."""
    np.random.seed(seed)
    img = np.asarray(img, dtype=np.float64)
    return img + noise_level * np.random.rand(*img.shape)


def _to_volume(image):
    image = jnp.asarray(image)
    if image.ndim == 2:
        return image[None, None], 2
    if image.ndim == 3:  # z-stack
        return image[:, None], 3
    if image.ndim == 4:
        return image, 4
    raise ValueError(f"expected 2D/3D/4D image, got shape {image.shape}")


def _from_volume(x, ndim):
    if ndim == 2:
        return x[0, 0]
    if ndim == 3:
        return x[:, 0]
    return x


@dataclasses.dataclass(frozen=True)
class TVDenoiser:
    """TV denoising model: minimize ``1/2 ||x - x0||^2 + reg * TV(x)``.

    One object, three solvers (``README.md:107-158``'s GD and CP recipes plus
    ADMM).  Accepts 2D ``(N, N)``, 3D ``(Nz, N, N)`` or 4D ``(Nz, M, N, N)``
    inputs and returns the same rank.
    """

    reg: float = 25.0
    cfg: TVConfig = TVConfig()

    def gd(self, noisy, n_iter: int = 300, step_size: float = 5e-3, **kw):
        x, ndim = _to_volume(noisy)
        res = subgradient_descent(
            x, n_iter=n_iter, reg=self.reg, step_size=step_size, cfg=self.cfg, **kw
        )
        return res._replace(x=_from_volume(res.x, ndim))

    def cp(self, noisy, n_iter: int = 300, **kw):
        x, ndim = _to_volume(noisy)
        res = chambolle_pock(x, n_iter=n_iter, reg=self.reg, cfg=self.cfg, **kw)
        return res._replace(x=_from_volume(res.x, ndim))

    def admm(self, noisy, n_iter: int = 100, **kw):
        x, ndim = _to_volume(noisy)
        res = admm(x, n_iter=n_iter, reg=self.reg, cfg=self.cfg, **kw)
        return res._replace(x=_from_volume(res.x, ndim))

    def fista(self, noisy, n_iter: int = 100, **kw):
        x, ndim = _to_volume(noisy)
        res = fista(x, n_iter=n_iter, reg=self.reg, cfg=self.cfg, **kw)
        return res._replace(x=_from_volume(res.x, ndim))

    def tgv(self, noisy, n_iter: int = 300, alpha0: float = None, **kw):
        """Second-order TGV denoising (``solvers.tgv``): ``reg`` plays
        alpha1; ``alpha0`` defaults to ``2 * reg`` (the customary ratio).
        Fixes TV's staircasing on piecewise-linear content."""
        x, ndim = _to_volume(noisy)
        res = tgv_denoise(x, n_iter=n_iter, alpha1=self.reg,
                          alpha0=2.0 * self.reg if alpha0 is None else alpha0,
                          **kw)
        return res._replace(x=_from_volume(res.x, ndim))


def denoise_tv_chambolle(
    image,
    weight: float = 0.1,
    eps: float = None,
    max_num_iter: int = 200,
    scheme: str = "hybrid",
    channel_axis: int = None,
):
    """scikit-image-compatible TV denoising (the reference's to-do item,
    ``README.md:260``): minimizes ``1/2 ||x - x0||^2 + weight * TV(x)`` with
    the Chambolle-Pock solver and returns a numpy array of the input rank.

    ``eps`` (scikit-image's stopping tolerance): when given, the solve runs
    in chunks and stops once the relative objective change over a chunk
    falls below ``eps`` (or at ``max_num_iter``).  Default ``None`` runs
    exactly ``max_num_iter`` iterations — one compiled scan, fastest on
    TPU (scikit-image's own default is ``eps=2e-4``).

    ``channel_axis`` (scikit-image convention) marks an axis of independent
    channels: 2D multichannel ``(H, W, C)``-style or 3D z-stack multichannel.
    Channels ride ONE device-resident solve by mapping them onto a decoupled
    volume axis (z with ``reg_z_over_reg=0`` for 2D, the time axis with
    ``reg_time=0`` for 3D) — mathematically identical to solving each
    channel separately.  Note scikit-image couples channels in the TV norm;
    here channels are independent (per-channel TV), which is the reference
    library's semantics for uncoupled frames.
    """
    def solve(vol, cfg):
        if eps is None:
            return chambolle_pock(jnp.asarray(vol), n_iter=max_num_iter,
                                  reg=weight, cfg=cfg)
        from ..solvers.state import run_until_converged

        return run_until_converged(
            chambolle_pock, jnp.asarray(vol), tol=eps,
            chunk=min(20, max_num_iter), max_iter=max_num_iter,
            reg=weight, cfg=cfg,
        )

    if channel_axis is None:
        vol, ndim = _to_volume(image)
        res = solve(vol, TVConfig(scheme=scheme))
        return np.asarray(_from_volume(res.x, ndim))

    img = np.asarray(image)
    ch_first = np.moveaxis(img, channel_axis, 0)
    if ch_first.ndim == 3:       # 2D multichannel: channels -> decoupled z
        vol = ch_first[:, None]  # (C, 1, H, W)
        res = solve(vol, TVConfig(scheme=scheme, reg_z_over_reg=0.0))
        out = np.asarray(res.x)[:, 0]
    elif ch_first.ndim == 4:     # 3D z-stack multichannel: channels -> t
        vol = np.moveaxis(ch_first, 0, 1)  # (Nz, C, H, W), reg_time=0
        res = solve(vol, TVConfig(scheme=scheme))
        out = np.moveaxis(np.asarray(res.x), 1, 0)
    else:
        raise ValueError(
            f"channel_axis given but image has rank {img.ndim}; expected 3 "
            f"(2D multichannel) or 4 (3D z-stack multichannel)"
        )
    return np.moveaxis(out, 0, channel_axis)
