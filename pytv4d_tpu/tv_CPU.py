"""Drop-in compat module for ``pytv.tv_CPU`` (``pytv/tv_CPU.py:47-333``).

Pure-NumPy float64 path; returns ``(tv, G)`` (+ ``grad_norms``) as numpy
values.  The reference's broken ``mask`` handling (``tv_CPU.py:77`` raises on
ndarray input, SURVEY.md section 2.4.2) is fixed: any boolean mask array is
applied as ``img = where(mask, img, 0)``.
"""

from __future__ import annotations

import numpy as np

from .ops import tv as _tv

__all__ = ["tv_upwind", "tv_downwind", "tv_central", "tv_hybrid"]


def _make(scheme):
    def fn(
        img,
        mask=[],
        reg_z_over_reg=1.0,
        reg_time=0.0,
        mask_static=False,
        factor_reg_static=0,
        return_grad_norms=False,
    ):
        return _tv.tv_and_subgrad(
            np.asarray(img),
            scheme,
            mask=mask,
            reg_z_over_reg=reg_z_over_reg,
            reg_time=reg_time,
            mask_static=mask_static,
            factor_reg_static=factor_reg_static,
            return_grad_norms=return_grad_norms,
            xp=np,
        )

    fn.__name__ = f"tv_{scheme}"
    fn.__qualname__ = fn.__name__
    fn.__doc__ = f"NumPy-backend tv_{scheme}; reference parity with pytv/tv_CPU.py."
    return fn


tv_upwind = _make("upwind")
tv_downwind = _make("downwind")
tv_central = _make("central")
tv_hybrid = _make("hybrid")
