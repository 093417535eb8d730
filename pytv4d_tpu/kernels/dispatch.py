"""Backend dispatch for the fused kernels: compiled Pallas on TPU, the Pallas
interpreter on CPU (numerics-identical, used by the test suite), jnp fallback
when a plane does not fit VMEM or a feature (static mask) is unsupported."""

from __future__ import annotations

import jax

from ..core.config import TVConfig
from ..core.schemes import num_channels
from .fused import fits_vmem


def default_interpret() -> bool:
    """Pallas kernels are interpreted off-TPU (tests run them on CPU)."""
    return jax.default_backend() != "tpu"


def can_fuse(shape, cfg: TVConfig, mask_static=None, dtype="float32") -> bool:
    """Whether the fused kernels support this problem instance."""
    if mask_static is not None and not isinstance(mask_static, bool):
        return False  # static-mask weighting stays on the jnp path
    if len(shape) != 4:
        return False
    Nd = num_channels(cfg.scheme, shape[0], shape[1],
                      cfg.reg_z_over_reg, cfg.reg_time)
    return fits_vmem(shape, Nd, dtype)
