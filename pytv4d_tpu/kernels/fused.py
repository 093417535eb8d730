"""Fused Pallas TPU kernels for the CP iteration and the tv+subgradient pass.

Why (SURVEY.md sections 3.2/7.3): the reference materializes ``D_img`` at
``Nd x`` image memory and launches separate kernels per operator; one CP
iteration touches ~70 volume-equivalents of HBM traffic.  These kernels fuse
the stencil, the channel reduction and the prox into two passes over the
volume, never materializing ``D_x`` or the prox argument in HBM:

- pass A (:func:`make_cp_dual_kernel`): reads x (+4 neighbor planes), x0,
  y_A, y_D; writes y_A', y_D' and per-plane L21 partials.
- pass B (:func:`make_cp_primal_kernel`): reads x, y_A', y_D' (+ neighbor
  planes of the z/t channels), x0; writes x' and fidelity partials.

~19 + ~14 volume-equivalents total — the stencil math per plane is generated
from the same declarative channel table as the jnp path (core/schemes.py), so
numerics are identical (tested to fp32 round-off).

Layout/grid: one program per (z, t) plane of the canonical (Nz, M, N, N)
volume; whole (N_row, N_col) planes live in VMEM (guarded by
:func:`fits_vmem`; larger planes fall back to the jnp path via
kernels.dispatch).  Neighbor planes arrive through extra input refs with
clamped index maps; global-boundary channel slots are masked with
``pl.program_id`` predicates, reproducing the reference's one-sided zero
boundary (``pytv/tv_operators_CPU.py:115-127``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import TVConfig
from ..core.schemes import (
    AXIS_COL,
    AXIS_ROW,
    AXIS_T,
    AXIS_Z,
    BWD,
    CTR,
    FWD,
    channel_weight,
    scheme_channels,
)

# ---------------------------------------------------------------------------
# in-plane stencil helpers on a (N_row, N_col) block
# ---------------------------------------------------------------------------


def _plane_d(x, axis01: int, kind: str):
    """Difference channel within a full plane (block == global plane, so the
    zero boundary slots are exact with no masking)."""
    if axis01 == 0:
        if kind == FWD:
            return jnp.pad(x[1:, :] - x[:-1, :], ((0, 1), (0, 0)))
        if kind == BWD:
            return jnp.pad(x[1:, :] - x[:-1, :], ((1, 0), (0, 0)))
        return jnp.pad(x[2:, :] - x[:-2, :], ((1, 1), (0, 0)))
    if kind == FWD:
        return jnp.pad(x[:, 1:] - x[:, :-1], ((0, 0), (0, 1)))
    if kind == BWD:
        return jnp.pad(x[:, 1:] - x[:, :-1], ((0, 0), (1, 0)))
    return jnp.pad(x[:, 2:] - x[:, :-2], ((0, 0), (1, 1)))


def _plane_dt(y, axis01: int, kind: str):
    """Adjoint scatter of one in-plane channel (valid-slot reads only)."""
    if axis01 == 0:
        if kind == FWD:
            t = y[:-1, :]
        elif kind == BWD:
            t = y[1:, :]
        else:
            t = y[1:-1, :]
        a, b = (1, 0) if kind != CTR else (2, 0)
        c, d = (0, 1) if kind != CTR else (0, 2)
        return jnp.pad(t, ((a, b), (0, 0))) - jnp.pad(t, ((c, d), (0, 0)))
    if kind == FWD:
        t = y[:, :-1]
    elif kind == BWD:
        t = y[:, 1:]
    else:
        t = y[:, 1:-1]
    a, b = (1, 0) if kind != CTR else (2, 0)
    c, d = (0, 1) if kind != CTR else (0, 2)
    return jnp.pad(t, ((0, 0), (a, b))) - jnp.pad(t, ((0, 0), (c, d)))


def _gate(pred, x):
    """Zero ``x`` where ``pred`` (a scalar bool) holds."""
    return jnp.where(pred, jnp.zeros_like(x), x)


def _cross_d(kind, center, prev_plane, nxt_plane, idx, n):
    """Difference channel along a grid axis (z or t): the channel value at
    plane ``idx``, using clamped neighbor planes + boundary masking."""
    if kind == FWD:
        return _gate(idx == n - 1, nxt_plane - center)
    if kind == BWD:
        return _gate(idx == 0, center - prev_plane)
    d = nxt_plane - prev_plane
    return _gate(jnp.logical_or(idx == 0, idx == n - 1), d)


def _cross_dt(kind, y_center, y_prev, y_nxt, idx, n):
    """Adjoint contribution at plane ``idx`` of a grid-axis channel; reads of
    globally-invalid slots are masked to zero."""
    if kind == FWD:
        t_c = _gate(idx == n - 1, y_center)          # slot n-1 invalid
        t_p = _gate(idx == 0, y_prev)                # no plane before 0
        return t_p - t_c
    if kind == BWD:
        t_c = _gate(idx == 0, y_center)              # slot 0 invalid
        t_n = _gate(idx == n - 1, y_nxt)             # no plane after n-1
        return t_c - t_n
    # CTR: valid slots are [1, n-2]
    t_p = _gate(idx <= 1, y_prev)                    # y[idx-1] invalid if idx-1 < 1
    t_n = _gate(idx >= n - 2, y_nxt)                 # y[idx+1] invalid if idx+1 > n-2
    return t_p - t_n


# ---------------------------------------------------------------------------
# grid / spec plumbing
# ---------------------------------------------------------------------------


def _make_specs(Nz, M, Nr, Nc, Nd):
    def vol(shift_z=0, shift_t=0):
        def index_map(z, m):
            zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
            mi = jnp.clip(m + shift_t, 0, M - 1) if shift_t else m
            return (zi, mi, 0, 0)

        return pl.BlockSpec((1, 1, Nr, Nc), index_map, memory_space=pltpu.VMEM)

    def dvol(shift_z=0, shift_t=0):
        def index_map(z, m):
            zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
            mi = jnp.clip(m + shift_t, 0, M - 1) if shift_t else m
            return (zi, 0, mi, 0, 0)

        return pl.BlockSpec((1, Nd, 1, Nr, Nc), index_map, memory_space=pltpu.VMEM)

    # per-program partial sums: Mosaic requires the last two block dims to be
    # a full (8, 128) tile, so each program owns one tile and writes its sum
    # at [..., 0, 0] (see _sum_parts)
    part = pl.BlockSpec((1, 1, 8, 128), lambda z, m: (z, m, 0, 0),
                        memory_space=pltpu.VMEM)
    return vol, dvol, part


def _part_shape(Nz, M, dtype):
    return jax.ShapeDtypeStruct((Nz, M, 8, 128), dtype)


def _write_part(ref, value, dtype):
    """Write a per-program scalar partial into its (8, 128) tile (broadcast
    fill — .at[].set would lower to an unsupported scatter on TPU)."""
    ref[0, 0] = jnp.full((8, 128), value, dtype)


def _sum_parts(parts):
    return jnp.sum(parts[:, :, 0, 0])


def fits_vmem(shape, Nd, dtype=jnp.float32, limit_bytes=14 * 1024 * 1024):
    """Conservative guard: per-program VMEM footprint of the fused kernels
    (with double buffering) must fit.  Larger planes fall back to jnp."""
    Nr, Nc = shape[-2], shape[-1]
    bpe = jnp.dtype(dtype).itemsize
    plane = Nr * Nc * bpe
    # pass A: 5x x-planes + x0 + yA + yD(Nd) + outs (1 + Nd) -> ~(8 + 2 Nd)
    per_program = (8 + 2 * Nd) * plane
    return 2 * per_program <= limit_bytes and Nr >= 8 and Nc >= 128


# ---------------------------------------------------------------------------
# CP fused step
# ---------------------------------------------------------------------------


def _needs(chans):
    need_z = any(ch.axis == AXIS_Z for ch in chans)
    need_t = any(ch.axis == AXIS_T for ch in chans)
    return need_z, need_t


@functools.lru_cache(maxsize=None)
def make_cp_dual_kernel(cfg: TVConfig, shape, dtype_name="float32",
                        sigma_D=0.5, sigma_A=1.0, reg=1.0, interpret=False):
    """Pass A: (x, x0, y_A, y_D) -> (y_A', y_D', l21_parts).

    Fuses the fidelity dual update, the D stencil, the TV dual prox
    (``README.md:148-151`` with keepdims semantics) and the L21 partial
    reduction of ``D_x`` for the loss line.
    """
    Nz, M, Nr, Nc = shape
    dtype = jnp.dtype(dtype_name)
    chans, norm = scheme_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    Nd = len(chans)
    weights = [channel_weight(ch, cfg.reg_z_over_reg, cfg.reg_time) * norm
               for ch in chans]
    need_z, need_t = _needs(chans)
    vol, dvol, part = _make_specs(Nz, M, Nr, Nc, Nd)

    def kernel(x_ref, x_zm, x_zp, x_tm, x_tp, x0_ref, yA_ref, yD_ref,
               yA_out, yD_out, l21_out):
        z = pl.program_id(0)
        m = pl.program_id(1)
        x = x_ref[0, 0]
        x0 = x0_ref[0, 0]

        # fidelity dual (README.md:148)
        yA_out[0, 0] = (yA_ref[0, 0] + sigma_A * (x - x0)) / (1.0 + sigma_A)

        # D_x channels (never materialized in HBM)
        ds = []
        for ch, w in zip(chans, weights):
            if ch.axis == AXIS_ROW:
                d = _plane_d(x, 0, ch.kind)
            elif ch.axis == AXIS_COL:
                d = _plane_d(x, 1, ch.kind)
            elif ch.axis == AXIS_Z:
                d = _cross_d(ch.kind, x, x_zm[0, 0], x_zp[0, 0], z, Nz)
            else:
                d = _cross_d(ch.kind, x, x_tm[0, 0], x_tp[0, 0], m, M)
            ds.append(d * w)

        # L21 partial of D_x for the loss line (README.md:157)
        norms_sq = ds[0] * ds[0]
        for d in ds[1:]:
            norms_sq = norms_sq + d * d
        _write_part(l21_out, jnp.sum(jnp.sqrt(norms_sq)), dtype)

        # TV dual prox: y_D' = p / max(1, |p|_2 / reg)
        ps = []
        p_sq = None
        for i, d in enumerate(ds):
            p = yD_ref[0, i, 0] + sigma_D * d
            ps.append(p)
            p_sq = p * p if p_sq is None else p_sq + p * p
        inv_scale = 1.0 / jnp.maximum(1.0, jnp.sqrt(p_sq) / reg)
        for i, p in enumerate(ps):
            yD_out[0, i, 0] = p * inv_scale

    fn = pl.pallas_call(
        kernel,
        grid=(Nz, M),
        in_specs=[vol(), vol(-1, 0), vol(1, 0), vol(0, -1), vol(0, 1),
                  vol(), vol(), dvol()],
        out_specs=(vol(), dvol(), part),
        out_shape=(
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct((Nz, Nd, M, Nr, Nc), dtype),
            _part_shape(Nz, M, dtype),
        ),
        interpret=interpret,
    )

    def call(x, x0, y_A, y_D):
        return fn(x, x, x, x, x, x0, y_A, y_D)

    return call


def _neighbor_plan(chans):
    """Which (channel, z-shift, t-shift) single-channel neighbor planes the
    adjoint pass needs: FWD adjoint reads the previous plane, BWD the next,
    CTR both (cf. :func:`_cross_dt`)."""
    plan = []
    for i, ch in enumerate(chans):
        if ch.axis == AXIS_Z:
            if ch.kind in (FWD, CTR):
                plan.append((i, -1, 0))
            if ch.kind in (BWD, CTR):
                plan.append((i, 1, 0))
        elif ch.axis == AXIS_T:
            if ch.kind in (FWD, CTR):
                plan.append((i, 0, -1))
            if ch.kind in (BWD, CTR):
                plan.append((i, 0, 1))
    return tuple(plan)


def _chan_spec(Nz, M, Nr, Nc, chan, shift_z, shift_t):
    """Single-channel (1, 1, 1, Nr, Nc) neighbor-plane spec of a D-volume —
    keeps pass-B VMEM at O(planes), not O(Nd x planes)."""

    def index_map(z, m):
        zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
        mi = jnp.clip(m + shift_t, 0, M - 1) if shift_t else m
        return (zi, chan, mi, 0, 0)

    return pl.BlockSpec((1, 1, 1, Nr, Nc), index_map, memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def make_cp_primal_kernel(cfg: TVConfig, shape, dtype_name="float32",
                          tau=0.1, interpret=False):
    """Pass B: (x, x0, y_A', y_D') -> (x', fid_parts).

    Fuses D^T of the dual with the primal update and the fidelity partial of
    the loss (``README.md:154,157``).  Neighbor reads of y_D' are
    channel-sliced (one plane per grid-axis channel per needed direction).
    """
    Nz, M, Nr, Nc = shape
    dtype = jnp.dtype(dtype_name)
    chans, norm = scheme_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    Nd = len(chans)
    weights = [channel_weight(ch, cfg.reg_z_over_reg, cfg.reg_time) * norm
               for ch in chans]
    vol, dvol, part = _make_specs(Nz, M, Nr, Nc, Nd)
    plan = _neighbor_plan(chans)
    nb_specs = [_chan_spec(Nz, M, Nr, Nc, c, sz, st) for c, sz, st in plan]

    def kernel(x_ref, x0_ref, yA_ref, yD_ref, *rest):
        nb_refs = rest[: len(plan)]
        x_out, fid_out = rest[len(plan):]
        nb = {key: ref for key, ref in zip(plan, nb_refs)}
        z = pl.program_id(0)
        m = pl.program_id(1)

        def nb_plane(i, sz, st):
            ref = nb.get((i, sz, st))
            # unused direction for this kind (gated off in _cross_dt)
            return yD_ref[0, i, 0] if ref is None else ref[0, 0, 0]

        dt = None
        for i, (ch, w) in enumerate(zip(chans, weights)):
            y_c = yD_ref[0, i, 0]
            if ch.axis == AXIS_ROW:
                c = _plane_dt(y_c, 0, ch.kind)
            elif ch.axis == AXIS_COL:
                c = _plane_dt(y_c, 1, ch.kind)
            elif ch.axis == AXIS_Z:
                c = _cross_dt(ch.kind, y_c, nb_plane(i, -1, 0), nb_plane(i, 1, 0),
                              z, Nz)
            else:
                c = _cross_dt(ch.kind, y_c, nb_plane(i, 0, -1), nb_plane(i, 0, 1),
                              m, M)
            c = c * w
            dt = c if dt is None else dt + c

        x_new = x_ref[0, 0] - tau * yA_ref[0, 0] - tau * dt
        x_out[0, 0] = x_new
        diff = x_new - x0_ref[0, 0]
        _write_part(fid_out, 0.5 * jnp.sum(diff * diff), dtype)

    fn = pl.pallas_call(
        kernel,
        grid=(Nz, M),
        in_specs=[vol(), vol(), vol(), dvol()] + nb_specs,
        out_specs=(vol(), part),
        out_shape=(
            jax.ShapeDtypeStruct(shape, dtype),
            _part_shape(Nz, M, dtype),
        ),
        interpret=interpret,
    )

    def call(x, x0, y_A, y_D):
        return fn(x, x0, y_A, y_D, *([y_D] * len(plan)))

    return call


def cp_step_fused(state, x_noisy, *, reg, sigma_D, sigma_A, tau,
                  cfg: TVConfig, interpret=False):
    """Drop-in fused replacement for ``solvers.cp.cp_step`` (identical
    semantics incl. the loss line's pre-update ``D_x``)."""
    x, y_A, y_D = state
    shape = tuple(x.shape)
    dt_name = jnp.dtype(x.dtype).name
    dual = make_cp_dual_kernel(cfg, shape, dt_name, sigma_D, sigma_A, reg,
                               interpret)
    primal = make_cp_primal_kernel(cfg, shape, dt_name, tau, interpret)
    y_A, y_D, l21_parts = dual(x, x_noisy, y_A, y_D)
    x, fid_parts = primal(x, x_noisy, y_A, y_D)
    loss = _sum_parts(fid_parts) + reg * _sum_parts(l21_parts)
    from ..solvers.cp import CPState

    return CPState(x, y_A, y_D), loss


# ---------------------------------------------------------------------------
# fused tv + subgradient (for GD solvers)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def make_tv_norms_kernel(cfg: TVConfig, shape, dtype_name="float32",
                         interpret=False):
    """Pass 1 of the fused tv/subgradient: per-pixel gradient norms (with the
    inf convention baked in) + per-plane tv partials, from x alone."""
    Nz, M, Nr, Nc = shape
    dtype = jnp.dtype(dtype_name)
    chans, norm = scheme_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    Nd = len(chans)
    weights = [channel_weight(ch, cfg.reg_z_over_reg, cfg.reg_time) * norm
               for ch in chans]
    vol, dvol, part = _make_specs(Nz, M, Nr, Nc, Nd)

    def kernel(x_ref, x_zm, x_zp, x_tm, x_tp, norms_out, tv_out):
        z = pl.program_id(0)
        m = pl.program_id(1)
        x = x_ref[0, 0]
        norms_sq = None
        for ch, w in zip(chans, weights):
            if ch.axis == AXIS_ROW:
                d = _plane_d(x, 0, ch.kind)
            elif ch.axis == AXIS_COL:
                d = _plane_d(x, 1, ch.kind)
            elif ch.axis == AXIS_Z:
                d = _cross_d(ch.kind, x, x_zm[0, 0], x_zp[0, 0], z, Nz)
            else:
                d = _cross_d(ch.kind, x, x_tm[0, 0], x_tp[0, 0], m, M)
            d = d * w
            norms_sq = d * d if norms_sq is None else norms_sq + d * d
        norms = jnp.sqrt(norms_sq)
        _write_part(tv_out, jnp.sum(norms), dtype)
        # inf-convention (tv_CPU.py:85-86): zero-norm pixels contribute 0
        norms_out[0, 0] = jnp.where(norms == 0, jnp.inf, norms)

    fn = pl.pallas_call(
        kernel,
        grid=(Nz, M),
        in_specs=[vol(), vol(-1, 0), vol(1, 0), vol(0, -1), vol(0, 1)],
        out_specs=(vol(), part),
        out_shape=(
            jax.ShapeDtypeStruct(shape, dtype),
            _part_shape(Nz, M, dtype),
        ),
        interpret=interpret,
    )

    def call(x):
        return fn(x, x, x, x, x)

    return call


@functools.lru_cache(maxsize=None)
def make_tv_subgrad_kernel(cfg: TVConfig, shape, dtype_name="float32",
                           interpret=False):
    """Pass 2: G from (x + neighbor planes, norms + neighbor planes) — the
    unweighted adjoint of ``D_x / norms`` (``tv_CPU.py:92-124`` algebra),
    recomputing D_x in-registers instead of reading an Nd-channel volume."""
    Nz, M, Nr, Nc = shape
    dtype = jnp.dtype(dtype_name)
    chans, norm = scheme_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    Nd = len(chans)
    weights = [channel_weight(ch, cfg.reg_z_over_reg, cfg.reg_time) * norm
               for ch in chans]
    vol, dvol, part = _make_specs(Nz, M, Nr, Nc, Nd)

    def kernel(x_ref, x_zm, x_zp, x_tm, x_tp, x_zm2, x_zp2, x_tm2, x_tp2,
               n_ref, n_zm, n_zp, n_tm, n_tp, g_out):
        z = pl.program_id(0)
        m = pl.program_id(1)
        inv_n = 1.0 / n_ref[0, 0]

        def d_at(ch, w, x_c, x_p, x_n, idx, n_axis):
            """Weighted channel value at an arbitrary plane given its own
            center/prev/next planes."""
            if ch.axis == AXIS_ROW:
                return _plane_d(x_c, 0, ch.kind) * w
            if ch.axis == AXIS_COL:
                return _plane_d(x_c, 1, ch.kind) * w
            return _cross_d(ch.kind, x_c, x_p, x_n, idx, n_axis) * w

        G = None
        for ch, w in zip(chans, weights):
            if ch.axis in (AXIS_ROW, AXIS_COL):
                y = d_at(ch, w, x_ref[0, 0], None, None, 0, 0) * inv_n
                c = _plane_dt(y, 0 if ch.axis == AXIS_ROW else 1, ch.kind)
            elif ch.axis == AXIS_Z:
                y_c = d_at(ch, w, x_ref[0, 0], x_zm[0, 0], x_zp[0, 0], z, Nz) * inv_n
                y_p = d_at(ch, w, x_zm[0, 0], x_zm2[0, 0], x_ref[0, 0],
                           jnp.maximum(z - 1, 0), Nz) / n_zm[0, 0]
                y_n = d_at(ch, w, x_zp[0, 0], x_ref[0, 0], x_zp2[0, 0],
                           jnp.minimum(z + 1, Nz - 1), Nz) / n_zp[0, 0]
                c = _cross_dt(ch.kind, y_c, y_p, y_n, z, Nz)
            else:
                y_c = d_at(ch, w, x_ref[0, 0], x_tm[0, 0], x_tp[0, 0], m, M) * inv_n
                y_p = d_at(ch, w, x_tm[0, 0], x_tm2[0, 0], x_ref[0, 0],
                           jnp.maximum(m - 1, 0), M) / n_tm[0, 0]
                y_n = d_at(ch, w, x_tp[0, 0], x_ref[0, 0], x_tp2[0, 0],
                           jnp.minimum(m + 1, M - 1), M) / n_tp[0, 0]
                c = _cross_dt(ch.kind, y_c, y_p, y_n, m, M)
            G = c if G is None else G + c
        g_out[0, 0] = G * norm

    fn = pl.pallas_call(
        kernel,
        grid=(Nz, M),
        in_specs=[vol(), vol(-1, 0), vol(1, 0), vol(0, -1), vol(0, 1),
                  vol(-2, 0), vol(2, 0), vol(0, -2), vol(0, 2),
                  vol(), vol(-1, 0), vol(1, 0), vol(0, -1), vol(0, 1)],
        out_specs=vol(),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=interpret,
    )

    def call(x, norms):
        return fn(x, x, x, x, x, x, x, x, x, norms, norms, norms, norms, norms)

    return call


def tv_and_subgrad_fused(x, cfg: TVConfig, interpret=False):
    """Fused (tv, G): two passes, no Nd-channel volume in HBM.  Semantics
    identical to ``ops.tv.tv_and_subgrad`` (tested to fp round-off)."""
    shape = tuple(x.shape)
    dt_name = jnp.dtype(x.dtype).name
    norms_k = make_tv_norms_kernel(cfg, shape, dt_name, interpret)
    sub_k = make_tv_subgrad_kernel(cfg, shape, dt_name, interpret)
    norms, tv_parts = norms_k(x)
    G = sub_k(x, norms)
    return _sum_parts(tv_parts), G
