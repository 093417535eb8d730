from . import admm as admm_mod
from . import cp, fista as fista_mod, gd, state
from .admm import ADMMResult, ADMMState, admm, admm_step, group_soft_threshold
from .cp import (
    CPPrecondState,
    CPResult,
    CPState,
    chambolle_pock,
    chambolle_pock_precond,
    cp_step,
    default_tau,
    pd_gap,
)
from .fidelity import (
    fidelity_conjugate,
    fidelity_dual_prox,
    fidelity_loss,
)
from .fista import FISTAResult, fista
from .inverse import (
    InverseResult,
    InverseState,
    cp_inverse,
    exact_transpose,
    gaussian_blur_operator,
    pd_gap_inverse,
    power_iteration,
    reg_discrepancy,
)
from .gd import GDResult, gd_step, subgradient_descent
from .tgv import (
    TGVInverseState,
    TGVResult,
    tgv_denoise,
    tgv_gap_inverse,
    tgv_inverse,
)
from .state import (
    load_state,
    load_state_orbax,
    run_checkpointed,
    run_until_converged,
    save_state,
    save_state_orbax,
)
