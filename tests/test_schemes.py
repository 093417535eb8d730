"""Stencil-table unit tests: channel counts/order, gating, normalizations
(reference semantics from SURVEY.md section 2.2)."""

import math

import pytest

from pytv4d_tpu.core.schemes import (
    AXIS_COL,
    AXIS_ROW,
    AXIS_T,
    AXIS_Z,
    BWD,
    CTR,
    FWD,
    num_channels,
    operator_norm_bound_sq,
    scheme_channels,
)


def test_channel_counts_match_reference_nd():
    # [verified] shapes on (20,4,100,100) with reg_time=1: Nd = 4 (up/down/central), 8 (hybrid)
    assert num_channels("upwind", 20, 4, 1.0, 1.0) == 4
    assert num_channels("downwind", 20, 4, 1.0, 1.0) == 4
    assert num_channels("central", 20, 4, 1.0, 1.0) == 4
    assert num_channels("hybrid", 20, 4, 1.0, 1.0) == 8


@pytest.mark.parametrize("scheme,base", [("upwind", 2), ("downwind", 2), ("central", 2), ("hybrid", 4)])
def test_gating(scheme, base):
    zmul = 2 if scheme == "hybrid" else 1
    # no z when Nz == 1 or reg_z <= 0 (tv_operators_CPU.py:111)
    assert num_channels(scheme, 1, 1) == base
    assert num_channels(scheme, 5, 1, reg_z_over_reg=0.0) == base
    assert num_channels(scheme, 5, 1) == base + zmul
    # time opt-in via reg_time > 0 and M > 1 (tv_operators_CPU.py:113)
    assert num_channels(scheme, 1, 4) == base
    assert num_channels(scheme, 1, 4, reg_time=0.5) == base + zmul
    assert num_channels(scheme, 1, 1, reg_time=0.5) == base


def test_nan_reg_z_treated_as_zero():
    # the reference *intends* this (tv_operators_CPU.py:100) but its check never fires
    assert num_channels("upwind", 5, 1, reg_z_over_reg=float("nan")) == 2


def test_channel_order_hybrid():
    chans, norm = scheme_channels("hybrid", 4, 3, 1.0, 1.0)
    kinds = [(c.axis, c.kind) for c in chans]
    assert kinds == [
        (AXIS_ROW, FWD), (AXIS_COL, FWD), (AXIS_ROW, BWD), (AXIS_COL, BWD),
        (AXIS_Z, FWD), (AXIS_Z, BWD), (AXIS_T, FWD), (AXIS_T, BWD),
    ]
    assert norm == pytest.approx(1 / math.sqrt(2))


def test_central_small_axis_fallback():
    # Nz==2 / M==2 -> upwind kind along that axis (tv_operators_CPU.py:339-348);
    # reference CPU crashes at Nz==2 (SURVEY.md 2.4.1) — we must not.
    chans, _ = scheme_channels("central", 2, 2, 1.0, 1.0)
    assert [(c.axis, c.kind) for c in chans] == [
        (AXIS_ROW, CTR), (AXIS_COL, CTR), (AXIS_Z, FWD), (AXIS_T, FWD),
    ]
    chans, _ = scheme_channels("central", 5, 5, 1.0, 1.0)
    assert [(c.axis, c.kind) for c in chans] == [
        (AXIS_ROW, CTR), (AXIS_COL, CTR), (AXIS_Z, CTR), (AXIS_T, CTR),
    ]


def test_operator_norm_bound_matches_readme():
    # hybrid 2D: the README's CP recipe constant 8 (README.md:141-143)
    assert operator_norm_bound_sq("hybrid", 1, 1) == pytest.approx(8.0)
