"""Fused Pallas TPU kernels (the performance layer; SURVEY.md section 7.3).

Importing this package does not require TPU hardware (kernels also run under
the Pallas interpreter on CPU for testing).
"""

from . import dispatch, fused, resident
from .dispatch import can_fuse, default_interpret
from .resident import (
    make_resident_cp_solver,
    make_resident_gd_solver,
    resident_fits,
)
from .fused import (
    cp_step_fused,
    make_cp_dual_kernel,
    make_cp_primal_kernel,
    make_tv_norms_kernel,
    make_tv_subgrad_kernel,
    tv_and_subgrad_fused,
)
