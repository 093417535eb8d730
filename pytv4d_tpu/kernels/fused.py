"""Fused Pallas TPU kernels for the CP iteration and the tv+subgradient pass.

Why (SURVEY.md sections 3.2/7.3): the reference materializes ``D_img`` at
``Nd x`` image memory and launches separate kernels per operator; one CP
iteration touches ~70 volume-equivalents of HBM traffic.  These kernels fuse
the stencil, the channel reduction and the prox into two passes over the
volume, never materializing ``D_x`` or the prox argument in HBM:

- pass A (:func:`make_cp_dual_kernel`): reads x (+neighbor tiles), x0, y_A,
  y_D; writes y_A', y_D' (in place via input_output_aliases) and per-tile
  L21 partials.
- pass B (:func:`make_cp_primal_kernel`): reads x, x0, y_A', y_D'
  (+ channel-sliced neighbor tiles); writes x' in place + fidelity partials.

Measured on one TPU v5e (hybrid 4D (32,8,256,256) f32): 79 it/s for the
XLA-fused jnp path -> 235 it/s fused (the in-place aliasing alone is 1.5x:
without it XLA copies the Nd-channel dual every scan iteration) -> 324 it/s
with bf16 dual storage; ~69% of the HBM roofline on the f32 traffic model.

Grid/tiling: programs cover row tiles of (z, t) planes — grid
``(Nz, M, R)`` with tiles ``(TR, N_col)`` where ``TR`` is chosen so the
Nd-channel tile stays ~2 MB (:func:`choose_row_tile`); arbitrarily large
in-plane sizes are supported.  Neighbors arrive as extra input refs: full
tiles for z/t planes (clamped index maps + ``pl.program_id`` gating
reproduce the reference's one-sided zero boundary,
``pytv/tv_operators_CPU.py:115-127``), 8-row thin blocks for the row-tile
seams.  ``y_D`` uses the internal channel-contiguous layout
``(Nz, M, Nd, N_row, N_col)`` inside fused solvers (one DMA per tile),
optionally stored in bf16.

Sharded execution (``halo_mode=True``, driven by parallel/fused_halo.py):
the kernels run inside shard_map on ghost-plane-extended local blocks with
z/t gating disabled — the ghosts encode the global boundary, so per-shard
numerics stay slot-exact with the single-device path.

Both TV norms ('iso' L2,1 — the reference's definition — and 'aniso' L1,1)
are supported in the CP pass-A prox.  All stencil math is generated from
the same declarative channel table as the jnp path (core/schemes.py), so
numerics are identical (tested to fp32 round-off, and to 1e-4 relative
loss over full 300-iteration runs).
"""

from __future__ import annotations

import functools

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
# tiling
# ---------------------------------------------------------------------------

_TILE_BYTES_TARGET = 2 * 1024 * 1024


def choose_row_tile(Nr: int, Nc: int, Nd: int, bpe: int = 4,
                    min_rows: int = 8) -> int:
    """Halve the row tile (keeping TR | Nr, TR % min_rows == 0) until the
    Nd-channel tile is ~2 MB; small images keep the full plane.  min_rows is
    the sublane tile of the narrowest dtype in play (8 f32, 16 bf16)."""
    tr = Nr
    while (tr % 2 == 0 and (tr // 2) % min_rows == 0
           and Nd * tr * Nc * bpe > _TILE_BYTES_TARGET):
        tr //= 2
    return tr


def fits_vmem(shape, Nd, dtype=jnp.float32, limit_bytes=14 * 1024 * 1024):
    """Guard: the fused kernels' per-program working set (double-buffered)
    must fit VMEM after row tiling.  Primary storage may be f32 or bf16
    (kernels always COMPUTE in f32; bf16 is a storage/traffic format)."""
    Nr, Nc = shape[-2], shape[-1]
    dt = jnp.dtype(dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    bpe = dt.itemsize
    min_rows = 16 if bpe < 4 else 8
    tr = choose_row_tile(Nr, Nc, Nd, bpe, min_rows=min_rows)
    if tr % min_rows:
        return False
    tile = tr * Nc * 4  # f32 compute copies dominate the VMEM footprint
    # pass A: ~7 x-tiles + x0 + yA + yD(Nd) + outs (1 + Nd)
    per_program = (10 + 2 * Nd) * tile
    return 2 * per_program <= limit_bytes and Nc >= 8


# ---------------------------------------------------------------------------
# in-tile stencil helpers
# ---------------------------------------------------------------------------


def _gate(pred, x):
    """Zero ``x`` where the scalar bool ``pred`` holds."""
    return jnp.where(pred, jnp.zeros_like(x), x)


def _col_d(x, kind: str):
    """Column-axis difference channel; the tile spans all columns, so the
    zero boundary slots are exact with no masking."""
    if kind == FWD:
        return jnp.pad(x[:, 1:] - x[:, :-1], ((0, 0), (0, 1)))
    if kind == BWD:
        return jnp.pad(x[:, 1:] - x[:, :-1], ((0, 0), (1, 0)))
    return jnp.pad(x[:, 2:] - x[:, :-2], ((0, 0), (1, 1)))


def _col_dt(y, kind: str):
    """Adjoint scatter of a column channel (valid-slot reads only)."""
    if kind == FWD:
        t = y[:, :-1]
    elif kind == BWD:
        t = y[:, 1:]
    else:
        t = y[:, 1:-1]
    a, b = (1, 0) if kind != CTR else (2, 0)
    c, d = (0, 1) if kind != CTR else (0, 2)
    return jnp.pad(t, ((0, 0), (a, b))) - jnp.pad(t, ((0, 0), (c, d)))


def _zero_row(x, row: int, pred):
    """Zero the first (row=0) or last (row=-1) row of a tile where ``pred``."""
    keep = jnp.where(pred, jnp.zeros((), x.dtype), jnp.ones((), x.dtype))
    if row == -1:
        return jnp.concatenate([x[:-1], x[-1:] * keep], axis=0)
    return jnp.concatenate([x[:1] * keep, x[1:]], axis=0)


def _row_d(kind, x, up_row, dn_row, r, R):
    """Row-axis difference channel of a (TR, Nc) tile; ``up_row``/``dn_row``
    are the adjacent rows from the neighboring tiles (garbage at the global
    boundary — gated)."""
    if kind == FWD:
        ext = jnp.concatenate([x, dn_row], axis=0)
        d = ext[1:] - ext[:-1]
        return _zero_row(d, -1, r == R - 1)
    if kind == BWD:
        ext = jnp.concatenate([up_row, x], axis=0)
        d = ext[1:] - ext[:-1]
        return _zero_row(d, 0, r == 0)
    ext = jnp.concatenate([up_row, x, dn_row], axis=0)
    d = ext[2:] - ext[:-2]
    d = _zero_row(d, 0, r == 0)
    return _zero_row(d, -1, r == R - 1)


def _row_dt(kind, y, y_up_row, y_dn_row, r, R):
    """Adjoint scatter of a row channel across tile seams.  Valid-slot
    masking happens before the neighbor rows are consumed.  (With TR | Nr the
    neighbor rows are never themselves global-boundary slots except through
    the r==0 / r==R-1 gates.)"""
    if kind == FWD:
        yv = _zero_row(y, -1, r == R - 1)
        up = _gate(r == 0, y_up_row)
        return jnp.concatenate([up, yv], axis=0)[:-1] - yv
    if kind == BWD:
        yv = _zero_row(y, 0, r == 0)
        dn = _gate(r == R - 1, y_dn_row)
        return yv - jnp.concatenate([yv, dn], axis=0)[1:]
    yv = _zero_row(y, 0, r == 0)
    yv = _zero_row(yv, -1, r == R - 1)
    up = _gate(r == 0, y_up_row)
    dn = _gate(r == R - 1, y_dn_row)
    return (
        jnp.concatenate([up, yv], axis=0)[:-1]
        - jnp.concatenate([yv, dn], axis=0)[1:]
    )


def _cross_d(kind, center, prev_tile, nxt_tile, idx, n, gate=True):
    """Difference channel along a grid axis (z or t) at the current tile.
    ``gate=False`` (sharded halo mode): ghost neighbor planes already encode
    the one-sided boundary (edge ghost -> 0 for FWD/BWD, reflect for CTR)."""
    if kind == FWD:
        d = nxt_tile - center
        return _gate(idx == n - 1, d) if gate else d
    if kind == BWD:
        d = center - prev_tile
        return _gate(idx == 0, d) if gate else d
    d = nxt_tile - prev_tile
    if gate:
        return _gate(jnp.logical_or(idx == 0, idx == n - 1), d)
    return d


def _cross_dt(kind, y_center, y_prev, y_nxt, idx, n, gate=True):
    """Adjoint contribution of a grid-axis channel at the current tile.
    ``gate=False`` (sharded halo mode): relies on zero halos plus the
    zero-at-invalid-slot invariant of CP dual variables."""
    if kind == FWD:
        if gate:
            return _gate(idx == 0, y_prev) - _gate(idx == n - 1, y_center)
        return y_prev - y_center
    if kind == BWD:
        if gate:
            return _gate(idx == 0, y_center) - _gate(idx == n - 1, y_nxt)
        return y_center - y_nxt
    if gate:
        return _gate(idx <= 1, y_prev) - _gate(idx >= n - 2, y_nxt)
    return y_prev - y_nxt


# ---------------------------------------------------------------------------
# spec plumbing (grid = (Nz, M, R); tiles (TR, Nc))
# ---------------------------------------------------------------------------


class _Specs:
    def __init__(self, Nz, M, Nr, Nc, Nd, TR, dthin=8, xthin=8):
        self.Nz, self.M, self.Nr, self.Nc, self.Nd, self.TR = Nz, M, Nr, Nc, Nd, TR
        self.R = Nr // TR
        self.dthin = dthin  # thin-block rows for D-volume seams (16 for bf16)
        self.xthin = xthin  # thin-block rows for x-volume seams (16 for bf16)

    def vol(self, shift_z=0, shift_t=0, ext=0):
        """A (TR, Nc) tile of a (Nz, M, Nr, Nc) array, optionally from a
        clamped neighbor plane.  ``ext=k`` (k > 0) reads a halo-extended
        (Nz+2k, M+2k, Nr, Nc) array with unclamped shifted maps (sharded
        halo mode: ghost planes encode the boundary conditions)."""
        Nz, M = self.Nz, self.M
        ext = int(ext)

        if ext:
            def index_map(z, m, r):
                return (z + ext + shift_z, m + ext + shift_t, r, 0)
        else:
            def index_map(z, m, r):
                zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
                mi = jnp.clip(m + shift_t, 0, M - 1) if shift_t else m
                return (zi, mi, r, 0)

        return pl.BlockSpec((1, 1, self.TR, self.Nc), index_map,
                            memory_space=pltpu.VMEM)

    def vol_rows(self, direction: int):
        """xthin-row thin block adjacent to the tile (direction -1: the rows
        just above; +1: just below), clamped at the global boundary (gated
        in-kernel)."""
        thin = self.xthin
        blocks_per_tile = self.TR // thin
        last = self.Nr // thin - 1

        def index_map(z, m, r):
            if direction < 0:
                return (z, m, jnp.maximum(r * blocks_per_tile - 1, 0), 0)
            return (z, m, jnp.minimum((r + 1) * blocks_per_tile, last), 0)

        return pl.BlockSpec((1, 1, thin, self.Nc), index_map,
                            memory_space=pltpu.VMEM)

    def dvol(self):
        """Nd-channel tile of the internal (Nz, M, Nd, Nr, Nc) layout — one
        contiguous DMA per program."""

        def index_map(z, m, r):
            return (z, m, 0, r, 0)

        return pl.BlockSpec((1, 1, self.Nd, self.TR, self.Nc), index_map,
                            memory_space=pltpu.VMEM)

    def dvol_chan(self, chan, shift_z=0, shift_t=0, ext=False):
        """Single-channel neighbor tile of the internal D-volume (``ext``:
        read a zero-halo-extended (Nz+2, M+2, Nd, Nr, Nc) array)."""
        Nz, M = self.Nz, self.M

        if ext:
            def index_map(z, m, r):
                return (z + 1 + shift_z, m + 1 + shift_t, chan, r, 0)
        else:
            def index_map(z, m, r):
                zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
                mi = jnp.clip(m + shift_t, 0, M - 1) if shift_t else m
                return (zi, mi, chan, r, 0)

        return pl.BlockSpec((1, 1, 1, self.TR, self.Nc), index_map,
                            memory_space=pltpu.VMEM)

    def dvol_chan_rows(self, chan, direction: int):
        """Thin block (dthin rows) of one channel adjacent to the tile seam."""
        thin = self.dthin
        blocks_per_tile = self.TR // thin
        last = self.Nr // thin - 1

        def index_map(z, m, r):
            if direction < 0:
                return (z, m, chan, jnp.maximum(r * blocks_per_tile - 1, 0), 0)
            return (z, m, chan, jnp.minimum((r + 1) * blocks_per_tile, last), 0)

        return pl.BlockSpec((1, 1, 1, thin, self.Nc), index_map,
                            memory_space=pltpu.VMEM)

    def tplane(self):
        """(TR, Nc) tile of an (Nr, Nc) per-pixel plane (time-channel
        multiplier: static-mask factor x weight_time) — shared by every
        (z, m) program at the same row tile."""
        return pl.BlockSpec((self.TR, self.Nc), lambda z, m, r: (r, 0),
                            memory_space=pltpu.VMEM)

    def part(self):
        """Per-program scalar partial: one full (8, 128) tile per program
        (Mosaic's minimum f32 tile)."""
        return pl.BlockSpec((1, 1, 1, 8, 128), lambda z, m, r: (z, m, r, 0, 0),
                            memory_space=pltpu.VMEM)

    def part_shape(self, dtype):
        return jax.ShapeDtypeStruct((self.Nz, self.M, self.R, 8, 128), dtype)

    @property
    def grid(self):
        return (self.Nz, self.M, self.R)


def _write_part(ref, value, dtype):
    """Broadcast-fill the partial tile (.at[].set would lower to an
    unsupported scatter on TPU); the consumer reads [..., 0, 0]."""
    ref[0, 0, 0] = jnp.full((8, 128), value, dtype)


def _sum_parts(parts):
    return jnp.sum(parts[..., 0, 0])


def _build(cfg: TVConfig, shape, dtype_name, dual_dtype_name=None,
           table_dims=None):
    """Returns (specs, channels, weights, norm, compute_dtype, store_dtype).

    ``store_dtype`` is the HBM storage format of x/x0/y_A (f32 or bf16);
    kernels always COMPUTE in f32 and cast at the tile boundary."""
    Nz, M, Nr, Nc = shape
    store_dtype = jnp.dtype(dtype_name)
    dtype = jnp.dtype(jnp.float32)
    dual_dtype = jnp.dtype(dual_dtype_name or dtype_name)
    # channel gating/kinds come from the GLOBAL volume dims under sharding
    # (a 2-plane shard of a central-scheme volume must keep CTR channels)
    tNz, tM = table_dims if table_dims is not None else (Nz, M)
    chans, norm = scheme_channels(cfg.scheme, tNz, tM, cfg.reg_z_over_reg,
                                  cfg.reg_time)
    weights = tuple(
        channel_weight(ch, cfg.reg_z_over_reg, cfg.reg_time) * norm
        for ch in chans
    )
    dthin = 16 if dual_dtype.itemsize < 4 else 8
    xthin = 16 if store_dtype.itemsize < 4 else 8
    TR = choose_row_tile(Nr, Nc, len(chans), store_dtype.itemsize,
                         min_rows=max(dthin, xthin))
    sp = _Specs(Nz, M, Nr, Nc, len(chans), TR, dthin=dthin, xthin=xthin)
    return sp, chans, weights, norm, dtype, store_dtype


def _ext_rows(sp, direction: int, ext: int = 1):
    """Thin row block of the halo-extended x array's *center* plane."""
    thin = sp.xthin
    blocks_per_tile = sp.TR // thin
    last = sp.Nr // thin - 1

    def index_map(z, m, r):
        if direction < 0:
            return (z + ext, m + ext,
                    jnp.maximum(r * blocks_per_tile - 1, 0), 0)
        return (z + ext, m + ext,
                jnp.minimum((r + 1) * blocks_per_tile, last), 0)

    return pl.BlockSpec((1, 1, thin, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _seam_rows(sp, x_up_ref, x_dn_ref, view):
    """The single rows adjacent to the tile (from thin blocks, or zeros when
    the plane is a single tile and no thin specs exist)."""
    if sp.R == 1:
        zero = jnp.zeros((1, sp.Nc), view.dtype)
        return zero, zero
    return (x_up_ref[0, 0, -1:].astype(view.dtype),
            x_dn_ref[0, 0, :1].astype(view.dtype))


# ---------------------------------------------------------------------------
# CP fused step
# ---------------------------------------------------------------------------


def _needs(chans):
    """Which grid axes the channel table touches (skip neighbor-tile DMA for
    the others — a 3D volume without time channels saves 2 of pass A's 5
    x-tile reads)."""
    need_z = any(ch.axis == AXIS_Z for ch in chans)
    need_t = any(ch.axis == AXIS_T for ch in chans)
    return need_z, need_t


def _d_channels(chans, weights, x, up_row, dn_row, x_zm, x_zp, x_tm, x_tp,
                z, m, r, sp, gate_zt=True, tmul=None):
    """All weighted D channels of the current tile (VMEM-resident only).

    ``tmul`` (optional (TR, Nc) tile): per-pixel multiplier applied to time
    channels — encodes the reference's static-mask factor
    (``tv_operators_CPU.py:148-151``) and/or a ``weight_time`` plane."""
    ds = []
    for ch, w in zip(chans, weights):
        if ch.axis == AXIS_ROW:
            d = _row_d(ch.kind, x, up_row, dn_row, r, sp.R)
        elif ch.axis == AXIS_COL:
            d = _col_d(x, ch.kind)
        elif ch.axis == AXIS_Z:
            d = _cross_d(ch.kind, x, x_zm, x_zp, z, sp.Nz, gate=gate_zt)
        else:
            d = _cross_d(ch.kind, x, x_tm, x_tp, m, sp.M, gate=gate_zt)
            if tmul is not None:
                d = d * tmul
        ds.append(d * w)
    return ds


@functools.lru_cache(maxsize=None)
def make_cp_dual_kernel(cfg: TVConfig, shape, dtype_name="float32",
                        sigma_D=0.5, sigma_A=1.0, reg=1.0, interpret=False,
                        dual_dtype_name=None, halo_mode=False,
                        table_dims=None, t_plane=False):
    """Pass A: (x, x0, y_A, y_D[, tmul]) -> (y_A', y_D', l21_parts).

    Fuses the fidelity dual update, the D stencil, the TV dual prox
    (``README.md:148-151`` with keepdims semantics) and the L21 partial
    reduction of ``D_x`` for the loss line.

    ``dual_dtype_name='bfloat16'`` stores y_D in bf16 (the dominant HBM
    traffic term; compute stays f32) — a speed/precision trade for long
    production runs.

    ``halo_mode=True`` (sharded execution inside shard_map): ``shape`` is the
    *local* block; x arrives halo-extended to (Nz+2, M+2, Nr, Nc) with ghost
    planes encoding the global boundary (parallel/fused_halo.py), and z/t
    boundary gating is disabled.

    ``t_plane=True``: the call takes an extra (Nr, Nc) plane multiplying the
    time channels of D — the reference's static-mask factor
    (``tv_operators_CPU.py:148-151``) and/or a per-pixel ``weight_time``
    (see kernels.dispatch.t_plane_multiplier).
    """
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 dual_dtype_name, table_dims)
    dual_dtype = jnp.dtype(dual_dtype_name or dtype_name)
    Nd = len(chans)
    need_z, need_t = _needs(chans)

    def kernel(*refs):
        it = iter(refs)

        def ld(ref):
            return ref[0, 0].astype(dtype)

        x_ref = next(it)
        x_zm = next(it) if need_z else None
        x_zp = next(it) if need_z else None
        x_tm = next(it) if need_t else None
        x_tp = next(it) if need_t else None
        if sp.R > 1:
            x_up, x_dn = next(it), next(it)
        else:
            x_up = x_dn = None
        x0_ref, yA_ref, yD_ref = next(it), next(it), next(it)
        tmul = next(it)[...] if t_plane else None
        yA_out, yD_out, l21_out = it
        z, m, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        x = ld(x_ref)
        up_row, dn_row = _seam_rows(sp, x_up, x_dn, x)

        yA_out[0, 0] = ((ld(yA_ref) + sigma_A * (x - ld(x0_ref)))
                        / (1.0 + sigma_A)).astype(store)

        ds = _d_channels(chans, weights, x, up_row, dn_row,
                         ld(x_zm) if need_z else None,
                         ld(x_zp) if need_z else None,
                         ld(x_tm) if need_t else None,
                         ld(x_tp) if need_t else None,
                         z, m, r, sp, gate_zt=not halo_mode, tmul=tmul)

        if cfg.norm == "aniso":
            # L1,1 TV: sum |d| and a box-projection prox (solvers.cp.dual_prox)
            tv_part = jnp.abs(ds[0])
            for d in ds[1:]:
                tv_part = tv_part + jnp.abs(d)
            _write_part(l21_out, jnp.sum(tv_part), dtype)
            for i, d in enumerate(ds):
                p = yD_ref[0, 0, i].astype(dtype) + sigma_D * d
                yD_out[0, 0, i] = jnp.clip(p, -reg, reg).astype(dual_dtype)
            return

        norms_sq = ds[0] * ds[0]
        for d in ds[1:]:
            norms_sq = norms_sq + d * d
        _write_part(l21_out, jnp.sum(jnp.sqrt(norms_sq)), dtype)

        ps = []
        p_sq = None
        for i, d in enumerate(ds):
            p = yD_ref[0, 0, i].astype(dtype) + sigma_D * d
            ps.append(p)
            p_sq = p * p if p_sq is None else p_sq + p * p
        inv_scale = 1.0 / jnp.maximum(1.0, jnp.sqrt(p_sq) / reg)
        for i, p in enumerate(ps):
            yD_out[0, 0, i] = (p * inv_scale).astype(dual_dtype)

    ext = halo_mode
    in_specs = [sp.vol(ext=ext)]
    if need_z:
        in_specs += [sp.vol(-1, 0, ext=ext), sp.vol(1, 0, ext=ext)]
    if need_t:
        in_specs += [sp.vol(0, -1, ext=ext), sp.vol(0, 1, ext=ext)]
    if sp.R > 1:
        # thin row blocks always read the unextended rows of the center plane
        in_specs += [_ext_rows(sp, -1) if ext else sp.vol_rows(-1),
                     _ext_rows(sp, 1) if ext else sp.vol_rows(1)]
    in_specs += [sp.vol(), sp.vol(), sp.dvol()]
    if t_plane:
        in_specs += [sp.tplane()]

    # y_A / y_D update in place (no neighbor reads; block-aligned writes):
    # halves the transient HBM footprint so pod-scale volumes fit one chip
    n_x = (1 + 2 * need_z + 2 * need_t) + (2 if sp.R > 1 else 0)
    aliases = {n_x + 1: 0, n_x + 2: 1}  # y_A and y_D (same dtype in/out)

    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        input_output_aliases=aliases,
        in_specs=in_specs,
        out_specs=(sp.vol(), sp.dvol(), sp.part()),
        out_shape=(
            jax.ShapeDtypeStruct(shape, store),
            jax.ShapeDtypeStruct((sp.Nz, sp.M, Nd, sp.Nr, sp.Nc), dual_dtype),
            sp.part_shape(dtype),
        ),
        interpret=interpret,
    )

    def call(x, x0, y_A, y_D, tmul=None):
        args = [x] * n_x + [x0, y_A, y_D]
        if t_plane:
            args.append(tmul)
        return fn(*args)

    return call


def _neighbor_plan(chans, sp):
    """Neighbor operands the adjoint pass needs, per channel: FWD reads the
    previous plane/row, BWD the next, CTR both (cf. _cross_dt / _row_dt)."""
    plan = []
    for i, ch in enumerate(chans):
        if ch.axis == AXIS_Z:
            if ch.kind in (FWD, CTR):
                plan.append((i, "z", -1))
            if ch.kind in (BWD, CTR):
                plan.append((i, "z", 1))
        elif ch.axis == AXIS_T:
            if ch.kind in (FWD, CTR):
                plan.append((i, "t", -1))
            if ch.kind in (BWD, CTR):
                plan.append((i, "t", 1))
        elif ch.axis == AXIS_ROW and sp.R > 1:
            if ch.kind in (FWD, CTR):
                plan.append((i, "r", -1))
            if ch.kind in (BWD, CTR):
                plan.append((i, "r", 1))
    return tuple(plan)


def _plan_spec(sp, key, ext=False):
    i, axis, d = key
    if axis == "z":
        return sp.dvol_chan(i, shift_z=d, ext=ext)
    if axis == "t":
        return sp.dvol_chan(i, shift_t=d, ext=ext)
    # row-seam thin blocks always read the (unextended) local y_D
    return sp.dvol_chan_rows(i, d)


@functools.lru_cache(maxsize=None)
def make_cp_primal_kernel(cfg: TVConfig, shape, dtype_name="float32",
                          tau=0.1, interpret=False, dual_dtype_name=None,
                          halo_mode=False, table_dims=None, t_plane=False):
    """Pass B: (x, x0, y_A', y_D'[, tmul]) -> (x', fid_parts).

    Fuses D^T of the dual with the primal update and the fidelity partial of
    the loss (``README.md:154,157``).  Neighbor reads of y_D' are
    channel-sliced: full tiles for z/t channels, thin row blocks for row-tile
    seams.

    ``t_plane``: (Nr, Nc) multiplier on the adjoint's time-channel
    contribution.  The reference applies ``weight_time`` pre-scatter and the
    static-mask factor post-scatter (``tv_operators_CPU.py:430-446``); both
    depend only on (row, col) and the time scatter preserves (row, col), so
    one per-pixel multiply of the accumulated time contribution is the exact
    composition of the two.
    """
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 dual_dtype_name, table_dims)
    plan = _neighbor_plan(chans, sp)
    nb_specs = [_plan_spec(sp, key, ext=halo_mode) for key in plan]

    def kernel(*refs):
        x_ref, x0_ref, yA_ref, yD_ref = refs[:4]
        nb_refs = dict(zip(plan, refs[4:4 + len(plan)]))
        rest = refs[4 + len(plan):]
        if t_plane:
            tmul = rest[0][...]
            rest = rest[1:]
        x_out, fid_out = rest
        z, m, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        def nb_tile(i, axis, d):
            ref = nb_refs.get((i, axis, d))
            out = yD_ref[0, 0, i] if ref is None else ref[0, 0, 0]
            return out.astype(dtype)

        def nb_row(i, d):
            ref = nb_refs.get((i, "r", d))
            if ref is None:  # R == 1: gated off in _row_dt
                return jnp.zeros((1, sp.Nc), dtype)
            block = ref[0, 0, 0].astype(dtype)
            return block[-1:] if d < 0 else block[:1]

        dt = None
        dt_time = None
        for i, (ch, w) in enumerate(zip(chans, weights)):
            y_c = yD_ref[0, 0, i].astype(dtype)
            if ch.axis == AXIS_ROW:
                c = _row_dt(ch.kind, y_c, nb_row(i, -1), nb_row(i, 1), r, sp.R)
            elif ch.axis == AXIS_COL:
                c = _col_dt(y_c, ch.kind)
            elif ch.axis == AXIS_Z:
                c = _cross_dt(ch.kind, y_c, nb_tile(i, "z", -1),
                              nb_tile(i, "z", 1), z, sp.Nz,
                              gate=not halo_mode)
            else:
                c = _cross_dt(ch.kind, y_c, nb_tile(i, "t", -1),
                              nb_tile(i, "t", 1), m, sp.M,
                              gate=not halo_mode)
            c = c * w
            if t_plane and ch.axis == AXIS_T:
                dt_time = c if dt_time is None else dt_time + c
            else:
                dt = c if dt is None else dt + c
        if dt_time is not None:
            dt = dt_time * tmul if dt is None else dt + dt_time * tmul

        x_new = (x_ref[0, 0].astype(dtype) - tau * yA_ref[0, 0].astype(dtype)
                 - tau * dt)
        x_out[0, 0] = x_new.astype(store)
        diff = x_new - x0_ref[0, 0].astype(dtype)
        _write_part(fid_out, 0.5 * jnp.sum(diff * diff), dtype)

    in_specs = [sp.vol(), sp.vol(), sp.vol(), sp.dvol()] + nb_specs
    if t_plane:
        in_specs += [sp.tplane()]

    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        input_output_aliases={0: 0},  # x updates in place (center-only read)
        in_specs=in_specs,
        out_specs=(sp.vol(), sp.part()),
        out_shape=(
            jax.ShapeDtypeStruct(shape, store),
            sp.part_shape(dtype),
        ),
        interpret=interpret,
    )

    if halo_mode:
        def call(x, x0, y_A, y_D, y_D_ext, tmul=None):
            args = [y_D_ext if axis in ("z", "t") else y_D
                    for (_, axis, _d) in plan]
            if t_plane:
                args.append(tmul)
            return fn(x, x0, y_A, y_D, *args)
    else:
        def call(x, x0, y_A, y_D, tmul=None):
            args = [y_D] * len(plan)
            if t_plane:
                args.append(tmul)
            return fn(x, x0, y_A, y_D, *args)

    return call


def to_internal_layout(y_D):
    """Public (Nz, Nd, M, Nr, Nc) -> internal fused (Nz, M, Nd, Nr, Nc)."""
    return jnp.transpose(y_D, (0, 2, 1, 3, 4))


def from_internal_layout(y_D_int):
    return jnp.transpose(y_D_int, (0, 2, 1, 3, 4))


def cp_step_fused_internal(x, y_A, y_D_int, x_noisy, *, reg, sigma_D, sigma_A,
                           tau, cfg: TVConfig, interpret=False, tmul=None):
    """One fused CP iteration with y_D in the internal channel-contiguous
    layout (any supported dual dtype); use inside scans (transpose once
    outside).  ``tmul``: optional (Nr, Nc) time-channel multiplier plane
    (kernels.dispatch.t_plane_multiplier)."""
    shape = tuple(x.shape)
    dt_name = jnp.dtype(x.dtype).name
    dual_name = jnp.dtype(y_D_int.dtype).name
    t_plane = tmul is not None
    dual = make_cp_dual_kernel(cfg, shape, dt_name, sigma_D, sigma_A, reg,
                               interpret, dual_dtype_name=dual_name,
                               t_plane=t_plane)
    primal = make_cp_primal_kernel(cfg, shape, dt_name, tau, interpret,
                                   dual_dtype_name=dual_name, t_plane=t_plane)
    y_A, y_D_int, l21_parts = dual(x, x_noisy, y_A, y_D_int, tmul)
    x, fid_parts = primal(x, x_noisy, y_A, y_D_int, tmul)
    loss = _sum_parts(fid_parts) + reg * _sum_parts(l21_parts)
    return x, y_A, y_D_int, loss


def cp_step_fused(state, x_noisy, *, reg, sigma_D, sigma_A, tau,
                  cfg: TVConfig, interpret=False, tmul=None):
    """Drop-in fused replacement for ``solvers.cp.cp_step`` (identical
    semantics incl. the loss line's pre-update ``D_x``); converts y_D layout
    per call — inside scans prefer :func:`cp_step_fused_internal`."""
    x, y_A, y_D = state
    x, y_A, y_D_int, loss = cp_step_fused_internal(
        x, y_A, to_internal_layout(y_D), x_noisy, reg=reg, sigma_D=sigma_D,
        sigma_A=sigma_A, tau=tau, cfg=cfg, interpret=interpret, tmul=tmul,
    )
    from ..solvers.cp import CPState

    return CPState(x, y_A, from_internal_layout(y_D_int)), loss


# ---------------------------------------------------------------------------
# fused tv + subgradient (for GD solvers)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def make_tv_norms_kernel(cfg: TVConfig, shape, dtype_name="float32",
                         interpret=False, halo_mode=False, table_dims=None,
                         t_plane=False):
    """Pass 1 of the fused tv/subgradient: per-pixel gradient norms (with the
    inf convention baked in) + per-tile tv partials, from x alone.

    ``cfg.norm='aniso'``: the per-pixel array is the sum of |channels| (no
    inf convention — the L1,1 subgradient never divides by it) and the tv
    partial is the L1,1 sum, matching ``ops.tv.tv_and_subgrad``'s aniso
    return.

    ``halo_mode``: sharded execution — x arrives extended by 1 ghost plane
    per side along z and t; z/t gating is disabled (the ghosts encode the
    boundary; parallel/fused_halo.py)."""
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 table_dims=table_dims)
    need_z, need_t = _needs(chans)

    def kernel(*refs):
        it = iter(refs)

        def ld(ref):
            return ref[0, 0].astype(dtype)

        x_ref = next(it)
        x_zm = next(it) if need_z else None
        x_zp = next(it) if need_z else None
        x_tm = next(it) if need_t else None
        x_tp = next(it) if need_t else None
        if sp.R > 1:
            x_up, x_dn = next(it), next(it)
        else:
            x_up = x_dn = None
        tmul = next(it)[...] if t_plane else None
        norms_out, tv_out = it
        z, m, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        x = ld(x_ref)
        up_row, dn_row = _seam_rows(sp, x_up, x_dn, x)
        ds = _d_channels(chans, weights, x, up_row, dn_row,
                         ld(x_zm) if need_z else None,
                         ld(x_zp) if need_z else None,
                         ld(x_tm) if need_t else None,
                         ld(x_tp) if need_t else None,
                         z, m, r, sp, gate_zt=not halo_mode, tmul=tmul)
        if cfg.norm == "aniso":
            abs_sum = jnp.abs(ds[0])
            for d in ds[1:]:
                abs_sum = abs_sum + jnp.abs(d)
            _write_part(tv_out, jnp.sum(abs_sum), dtype)
            norms_out[0, 0] = abs_sum
            return
        norms_sq = ds[0] * ds[0]
        for d in ds[1:]:
            norms_sq = norms_sq + d * d
        norms = jnp.sqrt(norms_sq)
        _write_part(tv_out, jnp.sum(norms), dtype)
        # inf convention (tv_CPU.py:85-86): zero-norm pixels contribute 0
        norms_out[0, 0] = jnp.where(norms == 0, jnp.inf, norms)

    e = 1 if halo_mode else 0
    in_specs = [sp.vol(ext=e)]
    if need_z:
        in_specs += [sp.vol(-1, 0, ext=e), sp.vol(1, 0, ext=e)]
    if need_t:
        in_specs += [sp.vol(0, -1, ext=e), sp.vol(0, 1, ext=e)]
    if sp.R > 1:
        in_specs += [_ext_rows(sp, -1, 1) if halo_mode else sp.vol_rows(-1),
                     _ext_rows(sp, 1, 1) if halo_mode else sp.vol_rows(1)]
    n_x = (1 + 2 * need_z + 2 * need_t) + (2 if sp.R > 1 else 0)
    if t_plane:
        in_specs += [sp.tplane()]

    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        in_specs=in_specs,
        out_specs=(sp.vol(), sp.part()),
        out_shape=(
            jax.ShapeDtypeStruct(shape, dtype),
            sp.part_shape(dtype),
        ),
        interpret=interpret,
    )

    def call(x, tmul=None):
        args = [x] * n_x
        if t_plane:
            args.append(tmul)
        return fn(*args)

    return call


@functools.lru_cache(maxsize=None)
def make_tv_subgrad_kernel(cfg: TVConfig, shape, dtype_name="float32",
                           interpret=False, halo_mode=False, table_dims=None,
                           t_plane=False):
    """Pass 2: G from (x, norms) — the unweighted adjoint of ``D_x / norms``
    (``tv_CPU.py:92-124`` algebra), recomputing D_x in-registers instead of
    reading an Nd-channel volume from HBM.

    Needs x and norms at +-1 z/t tiles (and +-2 for the recomputed neighbor
    channels), plus 8-row thin blocks across row-tile seams.

    ``cfg.norm='aniso'``: G = D_T(sign(D x)) with FULL weights (the true
    L1,1 subgradient, matching ``ops.tv.tv_and_subgrad`` aniso) — no norms
    operands at all in that mode (``call(x, None)`` is accepted).

    ``t_plane``: (Nr, Nc) multiplier on the time channels of D (static-mask
    factor x weight_time).  The iso G scatters it as part of ``D_x / norms``
    (the reference does not re-apply weights in G); the aniso G additionally
    re-applies it in the adjoint, like D_T.

    ``halo_mode``: sharded execution — x arrives extended by TWO ghost
    planes per side along z/t (clamp padding, or the central scheme's
    zero-difference mirror), norms by ONE (safe-divisor ghosts); all z/t
    gating is disabled (parallel/fused_halo.py).
    """
    sp, chans, weights, norm, dtype, store = _build(cfg, shape, dtype_name,
                                                    table_dims=table_dims)
    gate = not halo_mode
    need_z, need_t = _needs(chans)
    aniso = cfg.norm == "aniso"

    n_xs = 1 + 4 * need_z + 4 * need_t
    n_ns = 0 if aniso else 1 + 2 * need_z + 2 * need_t

    def kernel(*refs):
        it = iter(refs)

        def take(cond):
            return it.__next__()[0, 0].astype(dtype) if cond else None

        x_c = take(True)
        x_zm, x_zp = take(need_z), take(need_z)
        x_tm, x_tp = take(need_t), take(need_t)
        x_zm2, x_zp2 = take(need_z), take(need_z)
        x_tm2, x_tp2 = take(need_t), take(need_t)
        if sp.R > 1:
            x_up, x_dn = next(it), next(it)
        else:
            x_up = x_dn = None
        n_c = take(not aniso)
        n_zm, n_zp = take(need_z and not aniso), take(need_z and not aniso)
        n_tm, n_tp = take(need_t and not aniso), take(need_t and not aniso)
        if sp.R > 1 and not aniso:
            n_up, n_dn = next(it), next(it)
        else:
            n_up = n_dn = None
        tmul = next(it)[...] if t_plane else None
        g_out = next(it)

        z, m, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        inv_n = None if aniso else 1.0 / n_c

        zero_row = jnp.zeros((1, sp.Nc), dtype)
        if sp.R > 1:
            xu = x_up[0, 0].astype(dtype)   # xthin rows just above the tile
            xd = x_dn[0, 0].astype(dtype)   # xthin rows just below
            if not aniso:
                nu_row = n_up[0, 0][-1:]
                nd_row = n_dn[0, 0][:1]
        else:
            xu = xd = None
            nu_row = nd_row = None

        def row_of(offset):
            """Row at tile-relative ``offset`` (-1/-2 above the tile,
            TR/TR+1 below), pulled from the thin blocks; zeros when the
            plane is a single tile (R == 1, always gated)."""
            if offset < 0:
                return (zero_row if xu is None
                        else xu[offset + sp.xthin:offset + sp.xthin + 1])
            return zero_row if xd is None else xd[offset - sp.TR:offset - sp.TR + 1]

        G = None
        for ch, w in zip(chans, weights):
            # tm: per-pixel D multiplier for this channel (time channels only)
            tm = tmul if (tmul is not None and ch.axis == AXIS_T) else None

            def y_val(d_raw, div):
                """The 'dual-like' value the adjoint scatters: D_chan/norms
                for iso (weights NOT re-applied in the scatter, reference
                convention), sign(D_chan) for aniso (weights re-applied
                after, like D_T)."""
                v = d_raw * tm if tm is not None else d_raw
                if aniso:
                    return jnp.sign(v)
                return v * w * div if div is not None else v * w

            def inv(arr):  # reciprocal divisor for neighbor-plane norms
                return None if aniso else 1.0 / arr

            if ch.axis == AXIS_COL:
                y = y_val(_col_d(x_c, ch.kind), inv_n)
                c = _col_dt(y, ch.kind)
            elif ch.axis == AXIS_ROW:
                up_row = row_of(-1)
                dn_row = row_of(sp.TR)
                y_c = y_val(_row_d(ch.kind, x_c, up_row, dn_row, r, sp.R),
                            inv_n)
                # channel value at the seam rows themselves (for the adjoint):
                # D at row -1 needs rows -2..0; at row TR needs TR-1..TR+1
                if sp.R > 1:
                    up2 = row_of(-2)
                    ext_u = jnp.concatenate([up2, up_row, x_c[:1]], axis=0)
                    dn2 = row_of(sp.TR + 1)
                    ext_d = jnp.concatenate([x_c[-1:], dn_row, dn2], axis=0)
                    if ch.kind == FWD:
                        d_up = (ext_u[2] - ext_u[1])[None]
                        d_dn = (ext_d[2] - ext_d[1])[None]
                        # FWD slot at row -1 valid unless it's the global last
                        # row (impossible for r > 0); slot TR valid unless
                        # global last (r == R-1, gated in _row_dt)
                    elif ch.kind == BWD:
                        d_up = (ext_u[1] - ext_u[0])[None]
                        d_dn = (ext_d[1] - ext_d[0])[None]
                    else:
                        d_up = (ext_u[2] - ext_u[0])[None]
                        d_dn = (ext_d[2] - ext_d[0])[None]
                    y_up = y_val(d_up, None if aniso else 1.0 / nu_row)
                    y_dn = y_val(d_dn, None if aniso else 1.0 / nd_row)
                else:
                    y_up = y_dn = zero_row
                c = _row_dt(ch.kind, y_c, y_up, y_dn, r, sp.R)
            elif ch.axis == AXIS_Z:
                y_c = y_val(_cross_d(ch.kind, x_c, x_zm, x_zp, z, sp.Nz,
                                     gate=gate), inv_n)
                y_p = y_val(_cross_d(ch.kind, x_zm, x_zm2, x_c,
                                     jnp.maximum(z - 1, 0), sp.Nz,
                                     gate=gate), inv(n_zm))
                y_n = y_val(_cross_d(ch.kind, x_zp, x_c, x_zp2,
                                     jnp.minimum(z + 1, sp.Nz - 1), sp.Nz,
                                     gate=gate), inv(n_zp))
                c = _cross_dt(ch.kind, y_c, y_p, y_n, z, sp.Nz, gate=gate)
            else:
                y_c = y_val(_cross_d(ch.kind, x_c, x_tm, x_tp, m, sp.M,
                                     gate=gate), inv_n)
                y_p = y_val(_cross_d(ch.kind, x_tm, x_tm2, x_c,
                                     jnp.maximum(m - 1, 0), sp.M,
                                     gate=gate), inv(n_tm))
                y_n = y_val(_cross_d(ch.kind, x_tp, x_c, x_tp2,
                                     jnp.minimum(m + 1, sp.M - 1), sp.M,
                                     gate=gate), inv(n_tp))
                c = _cross_dt(ch.kind, y_c, y_p, y_n, m, sp.M, gate=gate)
            if aniso:
                # re-apply the full weight (and the per-pixel time
                # multiplier) in the adjoint, exactly like D_T
                c = c * w
                if tm is not None:
                    c = c * tm
            G = c if G is None else G + c
        # iso: G = norm * unweighted-adjoint(D/norms) and the y values above
        # already carry one norm factor inside w -> total norm^2, matching
        # the reference's double application (tv_CPU.py:124,328).  aniso: the
        # per-channel w (= channel_weight * norm) is applied above and D_T's
        # trailing norm is folded into it via this final multiply.
        g_out[0, 0] = (G * norm if not aniso else G).astype(store)

    ex = 2 if halo_mode else 0   # x extended by 2 ghost planes per side
    en = 1 if halo_mode else 0   # norms extended by 1
    in_specs = [sp.vol(ext=ex)]
    if need_z:
        in_specs += [sp.vol(-1, 0, ext=ex), sp.vol(1, 0, ext=ex)]
    if need_t:
        in_specs += [sp.vol(0, -1, ext=ex), sp.vol(0, 1, ext=ex)]
    if need_z:
        in_specs += [sp.vol(-2, 0, ext=ex), sp.vol(2, 0, ext=ex)]
    if need_t:
        in_specs += [sp.vol(0, -2, ext=ex), sp.vol(0, 2, ext=ex)]
    if sp.R > 1:
        in_specs += [_ext_rows(sp, -1, 2) if halo_mode else sp.vol_rows(-1),
                     _ext_rows(sp, 1, 2) if halo_mode else sp.vol_rows(1)]
    if not aniso:
        in_specs += [sp.vol(ext=en)]
        if need_z:
            in_specs += [sp.vol(-1, 0, ext=en), sp.vol(1, 0, ext=en)]
        if need_t:
            in_specs += [sp.vol(0, -1, ext=en), sp.vol(0, 1, ext=en)]
        if sp.R > 1:
            in_specs += [_ext_rows(sp, -1, 1) if halo_mode
                         else sp.vol_rows(-1),
                         _ext_rows(sp, 1, 1) if halo_mode
                         else sp.vol_rows(1)]
    if t_plane:
        in_specs += [sp.tplane()]

    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        in_specs=in_specs,
        out_specs=sp.vol(),
        out_shape=jax.ShapeDtypeStruct(shape, store),
        interpret=interpret,
    )

    thin = 2 if sp.R > 1 else 0

    def call(x, norms, tmul=None):
        args = [x] * (n_xs + thin)
        if not aniso:
            args += [norms] * (n_ns + thin)
        if t_plane:
            args.append(tmul)
        return fn(*args)

    return call


def tv_and_subgrad_fused(x, cfg: TVConfig, interpret=False,
                         return_grad_norms=False, tmul=None):
    """Fused (tv, G[, grad_norms]): two passes, no Nd-channel volume in HBM.
    Semantics identical to ``ops.tv.tv_and_subgrad`` (tested to fp round-off);
    grad_norms comes back with the inf convention applied, like the reference
    (``tv_CPU.py:86,127``) — for aniso it is the per-pixel |channel| sum.
    ``tmul``: optional (Nr, Nc) time-channel multiplier
    (kernels.dispatch.t_plane_multiplier)."""
    shape = tuple(x.shape)
    dt_name = jnp.dtype(x.dtype).name
    t_plane = tmul is not None
    norms_k = make_tv_norms_kernel(cfg, shape, dt_name, interpret,
                                   t_plane=t_plane)
    sub_k = make_tv_subgrad_kernel(cfg, shape, dt_name, interpret,
                                   t_plane=t_plane)
    norms, tv_parts = norms_k(x, tmul)
    G = sub_k(x, norms, tmul)
    if return_grad_norms:
        return _sum_parts(tv_parts), G, norms
    return _sum_parts(tv_parts), G
