"""Backend dispatch for the fused kernels: compiled Pallas on TPU, the Pallas
interpreter on CPU (numerics-identical, used by the test suite), jnp fallback
when a plane does not fit VMEM or a feature combination is unsupported.

Feature coverage of the fused path: all four schemes, iso ('iso' L2,1),
aniso ('aniso' L1,1) and Huber-smoothed ('huber') norms — on both the CP
prox kernels and the GD tv-norms/subgradient kernels — bf16 dual storage,
static masks and per-pixel
``weight_time`` planes shaped like the reference's ``(1, 1, N, N)`` contract
(``tv_operators_CPU.py:148-151``, ``README.md:258``).  Full per-voxel
``(Nz, M, N, N)`` weight fields stay on the jnp path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TVConfig
from ..core.schemes import AXIS_T, num_channels, scheme_channels
from ..ops.operators import mask_enabled
from .fused import fits_vmem


def default_interpret() -> bool:
    """Pallas kernels are interpreted off-TPU (tests run them on CPU)."""
    return jax.default_backend() != "tpu"


def _is_plane(arr, shape) -> bool:
    """True when ``arr`` is broadcastable to (1, 1, Nr, Nc) — the reference's
    static-mask contract — i.e. per-pixel but constant over z and t."""
    s = tuple(np.shape(arr))
    if len(s) < 2 or s[-2:] != (shape[-2], shape[-1]):
        return False
    return all(d == 1 for d in s[:-2])


def _has_t_channels(shape, cfg: TVConfig) -> bool:
    chans, _ = scheme_channels(cfg.scheme, shape[0], shape[1],
                               cfg.reg_z_over_reg, cfg.reg_time)
    return any(ch.axis == AXIS_T for ch in chans)


def t_plane_multiplier(shape, cfg: TVConfig, mask_static=None,
                       weight_time=None, dtype=jnp.float32):
    """The (Nr, Nc) per-pixel multiplier the fused kernels apply to time
    channels, or None when no multiplier is needed.

    Composes the reference's static-mask factor (masked pixels' time
    channels x sqrt(factor_reg_static), ``tv_operators_CPU.py:148-151``)
    with a ``weight_time`` plane.  Only valid when both inputs satisfy
    :func:`_is_plane` — enforced by :func:`can_fuse`.
    """
    if not _has_t_channels(shape, cfg):
        return None
    tm = None
    if mask_enabled(mask_static):
        plane = jnp.reshape(jnp.asarray(mask_static),
                            (shape[-2], shape[-1]))
        factor = math.sqrt(cfg.factor_reg_static)
        tm = jnp.where(plane, jnp.asarray(factor, dtype),
                       jnp.asarray(1.0, dtype))
    if weight_time is not None:
        wt = jnp.reshape(jnp.asarray(weight_time, dtype),
                         (shape[-2], shape[-1]))
        tm = wt if tm is None else tm * wt
    return tm


def can_fuse(shape, cfg: TVConfig, mask_static=None, dtype="float32",
             weight_time=None, for_gd: bool = False) -> bool:
    """Whether the fused kernels support this problem instance.

    ``for_gd``: kept for call-site symmetry — both kernel families (CP
    prox and tv-norms/subgradient) now cover iso, aniso and huber."""
    if len(shape) != 4:
        return False
    if cfg.norm not in ("iso", "aniso", "huber"):
        return False
    if mask_enabled(mask_static) and not _is_plane(mask_static, shape):
        return False  # full (Nz, M, N, N) masks stay on the jnp path
    if weight_time is not None and not _is_plane(weight_time, shape):
        return False
    Nd = num_channels(cfg.scheme, shape[0], shape[1],
                      cfg.reg_z_over_reg, cfg.reg_time)
    return fits_vmem(shape, Nd, dtype)
