"""Fused Pallas TPU kernels for the CP iteration and the tv+subgradient pass.

Why (SURVEY.md sections 3.2/7.3): the reference materializes ``D_img`` at
``Nd x`` image memory and launches separate kernels per operator; one CP
iteration touches ~70 volume-equivalents of HBM traffic.  These kernels fuse
the stencil, the channel reduction and the prox into two passes over the
volume, never materializing ``D_x`` or the prox argument in HBM:

- pass A (:func:`make_cp_dual_kernel`): reads x (+z-neighbor tiles), x0,
  y_A, y_D; writes y_A', y_D' (in place via input_output_aliases), the
  LOCALLY COMPUTABLE part of ``D^T y_D'`` (``dt_local``) and per-tile L21
  partials.
- pass B (:func:`make_cp_primal_kernel`): reads x, x0, y_A', dt_local and
  only the cross-tile corrections of the adjoint (z-shifted channel planes,
  row-seam thin blocks); writes x' in place + fidelity partials.

The split-adjoint structure exploits two facts: (1) the time axis rides
INSIDE the tile (blocks span the full M extent — M is small, "usually <10"
per the reference, ``tv_operators_GPU.py:227``), so column, time and the
in-tile part of row/z adjoints are exact local computations on the y'
values still in registers; (2) CP dual variables are zero at globally
invalid stencil slots (zero init + ``prox(0 + sigma*0) = 0``), so the
ungated adjoint sums are exact — garbage-tolerant gating is still applied
on every term whose slot validity cannot be proven locally, which keeps the
ad-hoc :func:`cp_step_fused` entry safe for arbitrary user states.

Measured on one TPU v5e (hybrid 4D (32,8,256,256)): the two-pass
pre-split structure ran 229 it/s f32 / 402 it/s bf16; the split-adjoint
rework cuts per-iteration HBM bytes ~18% (40 -> ~33 volume-equivalents
f32).  In-place aliasing alone is worth 1.5x (without it XLA copies the
Nd-channel dual every scan iteration).

Grid/tiling: programs cover (z, row-tile) pairs — grid ``(Nz, R)`` with
tiles ``(M, TR, N_col)`` where ``TR`` keeps the per-program working set
inside VMEM (:func:`choose_row_tile`); arbitrarily large in-plane sizes are
supported.  z neighbors arrive as extra input refs (clamped index maps +
``pl.program_id`` gating reproduce the reference's one-sided zero boundary,
``pytv/tv_operators_CPU.py:115-127``); row-tile seams use thin blocks.
``y_D`` uses the internal channel-contiguous layout
``(Nz, M, Nd, N_row, N_col)`` inside fused solvers, optionally stored bf16;
x/y_A/x0 may be stored bf16 too (kernels always COMPUTE in f32).

Sharded execution (``halo_mode=True``, driven by parallel/fused_halo.py):
the kernels run inside shard_map on ghost-plane-extended local blocks with
z/t gating disabled — the ghosts encode the global boundary, so per-shard
numerics stay slot-exact with the single-device path.  When the mesh
shards time (``t_sharded=True``) the time-channel adjoint moves from
dt_local to pass B (reading the halo-extended dual), because y' at the
neighbor shard's edge cannot be recomputed locally (the prox couples all
channels).

Both TV norms ('iso' L2,1 — the reference's definition — and 'aniso' L1,1)
are supported, as are static-mask / weight_time planes (the ``tmul``
operand).  All stencil math is generated from the same declarative channel
table as the jnp path (core/schemes.py), so numerics are identical (tested
to fp32 round-off, and to 1e-4 relative loss over full 300-iteration runs).
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

# Per-program working-set target (all operand tiles of the heaviest pass,
# single-buffered); Mosaic double-buffers, so 2x this must stay inside the
# ~16 MB scoped VMEM budget.
_TILE_BYTES_TARGET = 7 * 1024 * 1024


_VMEM_CEILING = 100 * 1024 * 1024  # Mosaic accepts raised scoped budgets


def _workset_per_row(M: int, Nd: int, Nc: int, bpe: int, dual_bpe: int) -> int:
    # pass A per TR-row: the larger of the operand tiles (~8 x-like tiles:
    # x center + 2 z neighbors + x0 + y_A + y_A' + dt_local + slack, plus
    # y_D in and out) and the in-kernel f32 compute temporaries (~2 Nd
    # channel tiles live at the prox peak) — Mosaic allocates the latter on
    # the kernel stack, inside the same scoped-VMEM budget.  Calibrated:
    # Mosaic's true footprint runs ~1.8x this (double buffering + stack
    # overlap), see _vmem_limit.
    buffers = 8 * bpe + 2 * Nd * dual_bpe
    stack = 4 * (2 * Nd + 6)
    return M * Nc * max(buffers, stack)


def _vmem_limit(sp, Nd, bpe, dual_bpe):
    """Scoped-VMEM budget override: None inside Mosaic's 16 MB default
    (its scheduling heuristics are best left alone then — measured), else a
    raised cap so large (M, Nc) tiles still compile."""
    ws = sp.TR * _workset_per_row(sp.M, Nd, sp.Nc, bpe, dual_bpe)
    need = ws + ws  # ~2x model-to-footprint calibration margin
    if need <= 15 * 1024 * 1024:
        return None
    return min(_VMEM_CEILING, need + need // 2)


def choose_row_tile(Nr: int, Nc: int, Nd: int, bpe: int = 4,
                    min_rows: int = 8, M: int = 1,
                    dual_bpe: int = None) -> int:
    """Halve the row tile (keeping TR | Nr, TR % min_rows == 0) until the
    per-program working set fits the VMEM target; small images keep the
    full plane.  min_rows is the sublane tile of the narrowest dtype in
    play (8 f32, 16 bf16)."""
    per_row = _workset_per_row(M, Nd, Nc, bpe, dual_bpe or bpe)
    tr = Nr
    while (tr % 2 == 0 and (tr // 2) % min_rows == 0
           and tr * per_row > _TILE_BYTES_TARGET):
        tr //= 2
    return tr


def fits_vmem(shape, Nd, dtype=jnp.float32, limit_bytes=14 * 1024 * 1024):
    """Guard: the fused kernels' per-program working set (double-buffered)
    must fit VMEM after row tiling.  Primary storage may be f32 or bf16
    (kernels always COMPUTE in f32; bf16 is a storage/traffic format)."""
    M, Nr, Nc = shape[-3], shape[-2], shape[-1]
    dt = jnp.dtype(dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    bpe = dt.itemsize
    min_rows = 16 if bpe < 4 else 8
    tr = choose_row_tile(Nr, Nc, Nd, bpe, min_rows=min_rows, M=M)
    if tr % min_rows:
        return False
    # f32 compute copies dominate the in-kernel footprint
    per_program = tr * _workset_per_row(M, Nd, Nc, 4, 4)
    return 2 * per_program <= 2 * limit_bytes and Nc >= 8


# ---------------------------------------------------------------------------
# in-tile stencil helpers (tiles are (M_eff, TR, Nc); axis 0 = time)
# ---------------------------------------------------------------------------


def _gate(pred, x):
    """Zero ``x`` where the scalar bool ``pred`` holds."""
    return jnp.where(pred, jnp.zeros_like(x), x)


def _sl3(axis: int, a, b):
    s = [slice(None)] * 3
    s[axis] = slice(a, b)
    return tuple(s)


def _pad3(x, axis: int, before: int, after: int):
    pads = [(0, 0)] * 3
    pads[axis] = (before, after)
    return jnp.pad(x, pads)


def _ax_d(x, axis: int, kind: str):
    """Zero-slot difference along a COMPLETE in-tile axis (col, or time when
    the tile spans the whole axis): the reference's one-sided boundary is a
    static pad, no program gating needed."""
    if kind == CTR:
        d = x[_sl3(axis, 2, None)] - x[_sl3(axis, None, -2)]
        return _pad3(d, axis, 1, 1)
    d = x[_sl3(axis, 1, None)] - x[_sl3(axis, None, -1)]
    if kind == FWD:
        return _pad3(d, axis, 0, 1)
    return _pad3(d, axis, 1, 0)


def _ax_d_ext(xe, axis: int, kind: str, e: int, out_lo: int = 0,
              out_n: int = None):
    """Difference along an in-tile axis whose tile is halo-EXTENDED by ``e``
    ghost slots per side (sharded halo mode: ghosts encode the boundary, no
    gating).  Returns the difference at slots [out_lo, out_lo + out_n) in
    center coordinates (default: the full center range)."""
    n = xe.shape[axis] - 2 * e
    if out_n is None:
        out_n = n
    lo = e + out_lo
    if kind == FWD:
        return (xe[_sl3(axis, lo + 1, lo + 1 + out_n)]
                - xe[_sl3(axis, lo, lo + out_n)])
    if kind == BWD:
        return (xe[_sl3(axis, lo, lo + out_n)]
                - xe[_sl3(axis, lo - 1, lo - 1 + out_n)])
    return (xe[_sl3(axis, lo + 1, lo + 1 + out_n)]
            - xe[_sl3(axis, lo - 1, lo - 1 + out_n)])


def _ax_dt(y, axis: int, kind: str):
    """Exact adjoint scatter of a complete in-tile axis channel (valid-slot
    reads only — garbage parked at invalid slots never leaks,
    ``tv_operators_CPU.py:555-556`` semantics)."""
    if kind == FWD:
        t = y[_sl3(axis, None, -1)]
    elif kind == BWD:
        t = y[_sl3(axis, 1, None)]
    else:
        t = y[_sl3(axis, 1, -1)]
    a = 2 if kind == CTR else 1
    return _pad3(t, axis, a, 0) - _pad3(t, axis, 0, a)


def _one_sided_adjoint(y, axis: int, drop_first: bool):
    """Adjoint of a one-sided difference along a COMPLETE axis (any rank).
    Forward diff (zero far boundary, ``drop_first=False``): coefficient
    p[k-1] - p[k] on slot k, with p's LAST slot never read; backward diff
    (zero near boundary, ``drop_first=True``): q[k] - q[k+1], FIRST slot
    never read.  Both are pad(core, lo) - pad(core, hi) of the
    unread-slot-dropped core.  Shared by the TGV kernels
    (kernels/tgv_resident.py, kernels/tgv_stream.py)."""
    sl = [slice(None)] * y.ndim
    sl[axis] = slice(1, None) if drop_first else slice(0, -1)
    core = y[tuple(sl)]
    lo = [(0, 0)] * y.ndim
    hi = [(0, 0)] * y.ndim
    lo[axis] = (1, 0)
    hi[axis] = (0, 1)
    return jnp.pad(core, lo) - jnp.pad(core, hi)


def _shift_down(y, axis: int):
    """y[i-1] with zero shifted in at slot 0."""
    return _pad3(y[_sl3(axis, None, -1)], axis, 1, 0)


def _shift_up(y, axis: int):
    """y[i+1] with zero shifted in at the last slot."""
    return _pad3(y[_sl3(axis, 1, None)], axis, 0, 1)


def _zero_row(x, row: int, pred):
    """Zero the first (row=0) or last (row=-1) row (axis 1) of a (M, TR, Nc)
    tile where ``pred``."""
    keep = jnp.where(pred, jnp.zeros((), x.dtype), jnp.ones((), x.dtype))
    if row == -1:
        return jnp.concatenate([x[:, :-1], x[:, -1:] * keep], axis=1)
    return jnp.concatenate([x[:, :1] * keep, x[:, 1:]], axis=1)


def _row_d(kind, x, up_row, dn_row, r, R):
    """Row-axis difference channel of a (M, TR, Nc) tile; ``up_row`` /
    ``dn_row`` are (M, 1, Nc) rows from the adjacent tiles (garbage at the
    global boundary — gated)."""
    if kind == FWD:
        ext = jnp.concatenate([x, dn_row], axis=1)
        d = ext[:, 1:] - ext[:, :-1]
        return _zero_row(d, -1, r == R - 1)
    if kind == BWD:
        ext = jnp.concatenate([up_row, x], axis=1)
        d = ext[:, 1:] - ext[:, :-1]
        return _zero_row(d, 0, r == 0)
    ext = jnp.concatenate([up_row, x, dn_row], axis=1)
    d = ext[:, 2:] - ext[:, :-2]
    d = _zero_row(d, 0, r == 0)
    return _zero_row(d, -1, r == R - 1)


def _row_dt_local(kind, y, r, R):
    """In-tile part of the row-channel adjoint: the full ungated sum with
    the tile's own globally-invalid edge slot zeroed (it may hold garbage
    in ad-hoc states).  Cross-tile seam terms are added in pass B."""
    if kind == FWD:
        yv = _zero_row(y, -1, r == R - 1)
        return _shift_down(yv, 1) - yv
    if kind == BWD:
        yv = _zero_row(y, 0, r == 0)
        return yv - _shift_up(yv, 1)
    yv = _zero_row(_zero_row(y, 0, r == 0), -1, r == R - 1)
    return _shift_down(yv, 1) - _shift_up(yv, 1)


def _cross_d(kind, center, prev_tile, nxt_tile, idx, n, gate=True):
    """Difference channel along the z grid axis at the current tile.
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


# ---------------------------------------------------------------------------
# spec plumbing (grid = (Nz, R); tiles (M_eff, TR, Nc))
# ---------------------------------------------------------------------------


class _Specs:
    def __init__(self, Nz, M, Nr, Nc, Nd, TR, dthin=8, xthin=8, z_off=0):
        self.Nz, self.M, self.Nr, self.Nc, self.Nd, self.TR = Nz, M, Nr, Nc, Nd, TR
        self.R = Nr // TR
        self.dthin = dthin  # thin-block rows for D-volume seams (16 for bf16)
        self.xthin = xthin  # thin-block rows for x-volume seams (16 for bf16)
        # z_off=1: interior mode — the grid covers z planes [1, Nz-1) and
        # every z index map shifts by 1; neighbor reads are always valid so
        # shifts go unclamped (overlapped sharded execution: the boundary
        # planes are fixed up by the boundary kernels while the halo
        # exchange is in flight)
        self.z_off = z_off

    def vol(self, shift_z=0, ext=0):
        """A (M_eff, TR, Nc) tile of a (Nz, M, Nr, Nc) array, optionally
        from a clamped z-neighbor plane.  ``ext=k`` (k > 0) reads a
        halo-extended (Nz+2k, M+2k, Nr, Nc) array: the z index shifts by k
        (unclamped), and the block spans the full extended time axis (the
        kernel slices the interior) — sharded halo mode, where ghost planes
        encode the boundary conditions."""
        Nz = self.Nz
        ext = int(ext)
        off = self.z_off

        if ext or off:
            def index_map(z, r):
                return (z + ext + off + shift_z, 0, r, 0)
        else:
            def index_map(z, r):
                zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
                return (zi, 0, r, 0)

        return pl.BlockSpec((1, self.M + 2 * ext, self.TR, self.Nc),
                            index_map, memory_space=pltpu.VMEM)

    def vol_rows(self, direction: int, ext=0):
        """xthin-row thin block adjacent to the tile (direction -1: the rows
        just above; +1: just below), clamped at the global boundary (gated
        in-kernel).  ``ext``: read the halo-extended array's center z."""
        thin = self.xthin
        blocks_per_tile = self.TR // thin
        last = self.Nr // thin - 1
        ext = int(ext)
        off = self.z_off

        def index_map(z, r):
            zi = z + ext + off
            if direction < 0:
                return (zi, 0, jnp.maximum(r * blocks_per_tile - 1, 0), 0)
            return (zi, 0, jnp.minimum((r + 1) * blocks_per_tile, last), 0)

        return pl.BlockSpec((1, self.M + 2 * ext, thin, self.Nc), index_map,
                            memory_space=pltpu.VMEM)

    def dvol(self):
        """All-channel tile of the internal (Nz, M, Nd, Nr, Nc) layout — one
        contiguous DMA per program."""
        off = self.z_off

        def index_map(z, r):
            return (z + off, 0, 0, r, 0)

        return pl.BlockSpec((1, self.M, self.Nd, self.TR, self.Nc),
                            index_map, memory_space=pltpu.VMEM)

    def dvol_chan(self, chan, shift_z=0, ext=False):
        """Single-channel tile of the internal D-volume (``ext``: read a
        zero-halo-extended (Nz+2, M+2, Nd, Nr, Nc) array; the block spans
        the extended time axis and the kernel slices)."""
        Nz = self.Nz
        off = self.z_off

        if ext:
            def index_map(z, r):
                return (z + 1 + shift_z, 0, chan, r, 0)
            m_eff = self.M + 2
        elif off:
            def index_map(z, r):
                return (z + off + shift_z, 0, chan, r, 0)
            m_eff = self.M
        else:
            def index_map(z, r):
                zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
                return (zi, 0, chan, r, 0)
            m_eff = self.M

        return pl.BlockSpec((1, m_eff, 1, self.TR, self.Nc), index_map,
                            memory_space=pltpu.VMEM)

    def dvol_chan_rows(self, chan, direction: int):
        """Thin block (dthin rows) of one channel adjacent to the tile seam
        (always the unextended local dual — rows are never sharded)."""
        thin = self.dthin
        blocks_per_tile = self.TR // thin
        last = self.Nr // thin - 1
        off = self.z_off

        def index_map(z, r):
            zi = z + off
            if direction < 0:
                return (zi, 0, chan, jnp.maximum(r * blocks_per_tile - 1, 0), 0)
            return (zi, 0, chan, jnp.minimum((r + 1) * blocks_per_tile, last), 0)

        return pl.BlockSpec((1, self.M, 1, thin, self.Nc), index_map,
                            memory_space=pltpu.VMEM)

    def tplane(self):
        """(TR, Nc) tile of an (Nr, Nc) per-pixel plane (time-channel
        multiplier: static-mask factor x weight_time)."""
        return pl.BlockSpec((self.TR, self.Nc), lambda z, r: (r, 0),
                            memory_space=pltpu.VMEM)

    def part(self):
        """Per-program scalar partial: one full (8, 128) tile per program
        (Mosaic's minimum f32 tile)."""
        off = self.z_off
        return pl.BlockSpec((1, 1, 8, 128),
                            lambda z, r: (z + off, r, 0, 0),
                            memory_space=pltpu.VMEM)

    def part_shape(self, dtype):
        return jax.ShapeDtypeStruct((self.Nz, self.R, 8, 128), dtype)

    @property
    def grid(self):
        if self.z_off:
            return (self.Nz - 2, self.R)
        return (self.Nz, self.R)


def _write_part(ref, value, dtype):
    """Broadcast-fill the partial tile (.at[].set would lower to an
    unsupported scatter on TPU); the consumer reads [..., 0, 0]."""
    ref[0, 0] = jnp.full((8, 128), value, dtype)


def _sum_parts(parts):
    return jnp.sum(parts[..., 0, 0])


def _build(cfg: TVConfig, shape, dtype_name, dual_dtype_name=None,
           table_dims=None, z_off=0):
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
                         min_rows=max(dthin, xthin), M=M,
                         dual_bpe=dual_dtype.itemsize)
    sp = _Specs(Nz, M, Nr, Nc, len(chans), TR, dthin=dthin, xthin=xthin,
                z_off=z_off)
    return sp, chans, weights, norm, dtype, store_dtype


def _needs_z(chans) -> bool:
    return any(ch.axis == AXIS_Z for ch in chans)


def _center_t(arr, e):
    """Slice the time-interior of an (M_eff, ...) tile view."""
    return arr[e:-e] if e else arr


def _seam_rows(sp, x_up_ref, x_dn_ref, dtype, e=0):
    """The single (M, 1, Nc) rows adjacent to the tile, time-center-sliced
    (or zeros when the plane is a single tile and no thin specs exist)."""
    if sp.R == 1:
        zero = jnp.zeros((sp.M, 1, sp.Nc), dtype)
        return zero, zero
    up = _center_t(x_up_ref[0].astype(dtype), e)
    dn = _center_t(x_dn_ref[0].astype(dtype), e)
    return up[:, -1:], dn[:, :1]


# ---------------------------------------------------------------------------
# CP fused step (split adjoint)
# ---------------------------------------------------------------------------


def _d_channels(chans, weights, x, up_row, dn_row, x_zm, x_zp, xt, z, r, sp,
                gate_z=True, tmul=None, e=0):
    """All weighted D channels of the current tile (VMEM-resident only).

    ``x`` is the (M, TR, Nc) time-center view; ``xt`` the (M_eff, TR, Nc)
    raw tile (time ghosts included in halo mode, ``e`` per side).  ``tmul``
    (optional (TR, Nc)): per-pixel multiplier on time channels — the
    reference's static-mask factor (``tv_operators_CPU.py:148-151``) and/or
    a ``weight_time`` plane."""
    ds = []
    for ch, w in zip(chans, weights):
        if ch.axis == AXIS_ROW:
            d = _row_d(ch.kind, x, up_row, dn_row, r, sp.R)
        elif ch.axis == AXIS_COL:
            d = _ax_d(x, 2, ch.kind)
        elif ch.axis == AXIS_Z:
            d = _cross_d(ch.kind, x, x_zm, x_zp, z, sp.Nz, gate=gate_z)
        else:
            d = _ax_d_ext(xt, 0, ch.kind, e) if e else _ax_d(x, 0, ch.kind)
            if tmul is not None:
                d = d * tmul
        ds.append(d * w)
    return ds


def _fid_dual(yA, x, x0, sigma_A, fidelity, fw):
    """In-kernel data-fidelity conjugate prox — the denoising (A = I)
    specialization of ``solvers.fidelity.fidelity_dual_prox``; ``fidelity``
    and ``fw`` (scalar weight) are trace-time constants."""
    if fidelity == "l1":
        return jnp.clip(yA + sigma_A * (x - x0), -fw, fw)
    if fidelity == "kl":
        q = yA + sigma_A * x
        s = q - fw
        return 0.5 * (q + fw - jnp.sqrt(s * s + 4.0 * sigma_A * fw * x0))
    return (yA + sigma_A * (x - x0)) / (1.0 + sigma_A / fw)


def _fid_part(x_new, x0, fidelity, fw):
    """In-kernel fidelity loss partial (``solvers.fidelity.fidelity_loss``
    over the tile)."""
    if fidelity == "l1":
        return fw * jnp.sum(jnp.abs(x_new - x0))
    if fidelity == "kl":
        ax = jnp.maximum(x_new, 1e-30)
        ent = jnp.where(x0 > 0.0,
                        x0 * jnp.log(jnp.maximum(x0, 1e-30) / ax), 0.0)
        return fw * jnp.sum(x_new - x0 + ent)
    diff = x_new - x0
    return 0.5 * fw * jnp.sum(diff * diff)


def _dual_core(cfg, sp, chans, weights, sigma_D, sigma_A, reg,
               dtype, store, dual_dtype, gate_z, t_in_dt, tmul,
               x, up_row, dn_row, x_zm, x_zp, xt, e, z, r,
               x0_ref, yA_ref, yD_ref, yA_out, yD_out, dt_out, l21_out,
               fidelity="l2", fw=1.0):
    """Shared pass-A body: fidelity dual update, D stencil, TV dual prox,
    L21 partial, and the locally computable part of ``D^T y'`` — used by
    the main/interior kernel and the boundary-fix kernel.

    ``yA_out=None`` (with ``x0_ref``/``yA_ref`` None too) skips the
    denoising fidelity dual entirely — the inverse-problem mode, where the
    fidelity dual lives in the measurement space and is handled outside
    the kernel (``make_tv_dual_kernel``)."""
    if yA_out is not None:
        x0 = x0_ref[0].astype(dtype)
        yA = yA_ref[0].astype(dtype)
        yA_out[0] = _fid_dual(yA, x, x0, sigma_A, fidelity, fw).astype(store)

    ds = _d_channels(chans, weights, x, up_row, dn_row, x_zm, x_zp,
                     xt, z, r, sp, gate_z=gate_z, tmul=tmul, e=e)

    if cfg.norm == "aniso":
        # L1,1 TV: sum |d| and a box-projection prox (solvers.cp.dual_prox)
        tv_part = jnp.abs(ds[0])
        for d in ds[1:]:
            tv_part = tv_part + jnp.abs(d)
        _write_part(l21_out, jnp.sum(tv_part), dtype)
        ys = []
        for i, d in enumerate(ds):
            p = yD_ref[0, :, i].astype(dtype) + sigma_D * d
            y = jnp.clip(p, -reg, reg)
            ys.append(y)
            yD_out[0, :, i] = y.astype(dual_dtype)
    else:
        norms_sq = ds[0] * ds[0]
        for d in ds[1:]:
            norms_sq = norms_sq + d * d
        n = jnp.sqrt(norms_sq)
        if cfg.norm == "huber":
            dlt = cfg.huber_delta
            _write_part(l21_out, jnp.sum(
                jnp.where(n <= dlt, norms_sq / (2.0 * dlt), n - dlt / 2.0)),
                dtype)
        else:
            _write_part(l21_out, jnp.sum(n), dtype)

        # huber conjugate prox = shrink by 1 + sigma*delta/reg, then the
        # same ball projection (solvers.cp.dual_prox)
        shrink = (1.0 / (1.0 + sigma_D * cfg.huber_delta / reg)
                  if cfg.norm == "huber" else 1.0)
        ps = []
        p_sq = None
        for i, d in enumerate(ds):
            p = (yD_ref[0, :, i].astype(dtype) + sigma_D * d) * shrink
            ps.append(p)
            p_sq = p * p if p_sq is None else p_sq + p * p
        inv_scale = 1.0 / jnp.maximum(1.0, jnp.sqrt(p_sq) / reg)
        ys = []
        for i, p in enumerate(ps):
            y = p * inv_scale
            ys.append(y)
            yD_out[0, :, i] = y.astype(dual_dtype)

    # locally computable part of D^T y' (y' values still in registers).
    # Gates drop the tile's own globally-invalid slots, so arbitrary
    # (non-solver) dual states cannot leak garbage; in halo/interior/
    # boundary modes the gating moves to the ghost construction + the
    # dual's zero-at-invalid-slot invariant.
    dt = None
    for ch, w, y in zip(chans, weights, ys):
        if ch.axis == AXIS_COL:
            c = _ax_dt(y, 2, ch.kind) * w
        elif ch.axis == AXIS_ROW:
            c = _row_dt_local(ch.kind, y, r, sp.R) * w
        elif ch.axis == AXIS_Z:
            if ch.kind == FWD:
                yv = _gate(z == sp.Nz - 1, y) if gate_z else y
                c = -yv * w
            elif ch.kind == BWD:
                yv = _gate(z == 0, y) if gate_z else y
                c = yv * w
            else:
                continue  # CTR has no local term
        else:  # AXIS_T
            if not t_in_dt:
                continue
            c = _ax_dt(y, 0, ch.kind) * w
            if tmul is not None:
                c = c * tmul
        dt = c if dt is None else dt + c
    if dt is None:
        dt = jnp.zeros((sp.M, sp.TR, sp.Nc), dtype)
    dt_out[0] = dt.astype(store)


@functools.lru_cache(maxsize=None)
def make_cp_dual_kernel(cfg: TVConfig, shape, dtype_name="float32",
                        sigma_D=0.5, sigma_A=1.0, reg=1.0, interpret=False,
                        dual_dtype_name=None, halo_mode=False,
                        table_dims=None, t_plane=False, t_sharded=False,
                        interior=False, fidelity="l2", fid_weight=1.0):
    """Pass A: (x, x0, y_A, y_D[, tmul]) -> (y_A', y_D', dt_local, l21_parts).

    Fuses the fidelity dual update, the D stencil, the TV dual prox
    (``README.md:148-151`` with keepdims semantics), the L21 partial
    reduction of ``D_x`` for the loss line, AND the locally computable part
    of ``D^T y_D'`` (column + time channels fully; row/z channels' in-tile
    terms) — pass B only adds the cross-tile corrections, so it never
    re-reads the full Nd-channel dual.

    ``halo_mode=True`` (sharded execution inside shard_map): ``shape`` is
    the *local* block; x arrives halo-extended to (Nz+2, M+2, Nr, Nc) with
    ghost planes encoding the global boundary (parallel/fused_halo.py), and
    z/t boundary gating is disabled.  ``t_sharded=True`` additionally moves
    the time-channel adjoint to pass B (the neighbor shard's y' cannot be
    recomputed locally).

    ``interior=True`` (overlapped sharded execution): the grid covers only
    the z planes [1, Nz-1) — no halos needed, so the kernel runs while the
    boundary-plane exchange is in flight; boundary planes of every output
    (incl. the aliased y_A/y_D, which keep their PRE-update values there)
    are fixed up afterwards by :func:`make_cp_dual_boundary_kernel`.
    """
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 dual_dtype_name, table_dims,
                                                 z_off=1 if interior else 0)
    dual_dtype = jnp.dtype(dual_dtype_name or dtype_name)
    Nd = len(chans)
    need_z = _needs_z(chans)
    e = 1 if halo_mode else 0
    t_in_dt = not (halo_mode and t_sharded)
    gate_z = not (halo_mode or interior)

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        x_zm = next(it) if need_z else None
        x_zp = next(it) if need_z else None
        if sp.R > 1:
            x_up, x_dn = next(it), next(it)
        else:
            x_up = x_dn = None
        x0_ref, yA_ref, yD_ref = next(it), next(it), next(it)
        tmul = next(it)[...] if t_plane else None
        yA_out, yD_out, dt_out, l21_out = it
        z, r = pl.program_id(0), pl.program_id(1)

        xt = x_ref[0].astype(dtype)          # (M_eff, TR, Nc)
        x = _center_t(xt, e)                 # (M, TR, Nc)
        up_row, dn_row = _seam_rows(sp, x_up, x_dn, dtype, e)
        _dual_core(cfg, sp, chans, weights, sigma_D, sigma_A, reg,
                   dtype, store, dual_dtype, gate_z, t_in_dt, tmul,
                   x, up_row, dn_row,
                   _center_t(x_zm[0].astype(dtype), e) if need_z else None,
                   _center_t(x_zp[0].astype(dtype), e) if need_z else None,
                   xt, e, z, r, x0_ref, yA_ref, yD_ref,
                   yA_out, yD_out, dt_out, l21_out,
                   fidelity=fidelity, fw=fid_weight)

    in_specs = [sp.vol(ext=e)]
    if need_z:
        in_specs += [sp.vol(-1, ext=e), sp.vol(1, ext=e)]
    if sp.R > 1:
        in_specs += [sp.vol_rows(-1, ext=e), sp.vol_rows(1, ext=e)]
    in_specs += [sp.vol(), sp.vol(), sp.dvol()]
    if t_plane:
        in_specs += [sp.tplane()]

    # y_A / y_D update in place (no neighbor reads; block-aligned writes):
    # halves the transient HBM footprint so pod-scale volumes fit one chip
    n_x = 1 + 2 * need_z + (2 if sp.R > 1 else 0)
    aliases = {n_x + 1: 0, n_x + 2: 1}  # y_A and y_D (same dtype in/out)

    cp_kw = dict(dimension_semantics=("parallel", "parallel"))
    limit = _vmem_limit(sp, Nd, store.itemsize, dual_dtype.itemsize)
    if limit:
        cp_kw["vmem_limit_bytes"] = limit
    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        compiler_params=pltpu.CompilerParams(**cp_kw),
        input_output_aliases=aliases,
        in_specs=in_specs,
        out_specs=(sp.vol(), sp.dvol(), sp.vol(), sp.part()),
        out_shape=(
            jax.ShapeDtypeStruct(shape, store),
            jax.ShapeDtypeStruct((sp.Nz, sp.M, Nd, sp.Nr, sp.Nc), dual_dtype),
            jax.ShapeDtypeStruct(shape, store),
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


@functools.lru_cache(maxsize=None)
def make_tv_dual_kernel(cfg: TVConfig, shape, dtype_name="float32",
                        sigma_D=0.5, reg=1.0, interpret=False,
                        dual_dtype_name=None):
    """Pass A for INVERSE problems (``K = [A; D]`` solvers):
    ``(x_bar, y_D) -> (y_D', dt_local, l21_parts)``.

    The TV dual prox ``y_D' = proj(y_D + sigma_D * D x_bar)`` fused with
    the D stencil and the locally computable part of ``D^T y_D'`` —
    identical math to :func:`make_cp_dual_kernel` minus the denoising
    fidelity dual, which lives in the MEASUREMENT space for inverse
    problems and is applied outside the kernel (``solvers/inverse.py``).
    Pass B (:func:`make_cp_primal_kernel`) then completes the adjoint and
    applies the primal update with ``A^T y_A`` riding its ``y_A`` slot.
    Unsharded mode only (the sharded inverse paths stay on the GSPMD jnp
    step)."""
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 dual_dtype_name)
    dual_dtype = jnp.dtype(dual_dtype_name or dtype_name)
    Nd = len(chans)
    need_z = _needs_z(chans)

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        x_zm = next(it) if need_z else None
        x_zp = next(it) if need_z else None
        if sp.R > 1:
            x_up, x_dn = next(it), next(it)
        else:
            x_up = x_dn = None
        yD_ref = next(it)
        yD_out, dt_out, l21_out = it
        z, r = pl.program_id(0), pl.program_id(1)

        xt = x_ref[0].astype(dtype)
        up_row, dn_row = _seam_rows(sp, x_up, x_dn, dtype, 0)
        _dual_core(cfg, sp, chans, weights, sigma_D, 1.0, reg,
                   dtype, store, dual_dtype, True, True, None,
                   xt, up_row, dn_row,
                   x_zm[0].astype(dtype) if need_z else None,
                   x_zp[0].astype(dtype) if need_z else None,
                   xt, 0, z, r, None, None, yD_ref,
                   None, yD_out, dt_out, l21_out)

    in_specs = [sp.vol()]
    if need_z:
        in_specs += [sp.vol(-1), sp.vol(1)]
    if sp.R > 1:
        in_specs += [sp.vol_rows(-1), sp.vol_rows(1)]
    in_specs += [sp.dvol()]
    n_x = 1 + 2 * need_z + (2 if sp.R > 1 else 0)

    cp_kw = dict(dimension_semantics=("parallel", "parallel"))
    limit = _vmem_limit(sp, Nd, store.itemsize, dual_dtype.itemsize)
    if limit:
        cp_kw["vmem_limit_bytes"] = limit
    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        compiler_params=pltpu.CompilerParams(**cp_kw),
        input_output_aliases={n_x: 0},  # y_D updates in place
        in_specs=in_specs,
        out_specs=(sp.dvol(), sp.vol(), sp.part()),
        out_shape=(
            jax.ShapeDtypeStruct((sp.Nz, sp.M, Nd, sp.Nr, sp.Nc), dual_dtype),
            jax.ShapeDtypeStruct(shape, store),
            sp.part_shape(dtype),
        ),
        interpret=interpret,
    )

    def call(x_bar, y_D):
        return fn(*([x_bar] * n_x + [y_D]))

    return call


def _neighbor_plan(chans, sp, t_in_dt=True):
    """Cross-tile adjoint terms pass B must add, per channel: row-seam thin
    blocks (FWD needs the seam above, BWD below, CTR both — only when the
    plane is row-tiled), z-shifted channel planes, and (t-sharded halo only)
    one t-extended read per time channel."""
    plan = []
    for i, ch in enumerate(chans):
        if ch.axis == AXIS_Z:
            if ch.kind in (FWD, CTR):
                plan.append((i, "z", -1))
            if ch.kind in (BWD, CTR):
                plan.append((i, "z", 1))
        elif ch.axis == AXIS_ROW and sp.R > 1:
            if ch.kind in (FWD, CTR):
                plan.append((i, "r", -1))
            if ch.kind in (BWD, CTR):
                plan.append((i, "r", 1))
        elif ch.axis == AXIS_T and not t_in_dt:
            plan.append((i, "t", 0))
    return tuple(plan)


@functools.lru_cache(maxsize=None)
def make_cp_primal_kernel(cfg: TVConfig, shape, dtype_name="float32",
                          tau=0.1, interpret=False, dual_dtype_name=None,
                          halo_mode=False, table_dims=None, t_plane=False,
                          t_sharded=False, interior=False,
                          fidelity="l2", fid_weight=1.0, nonneg=False):
    """Pass B: (x, x0, y_A', y_D', dt_local[, tmul]) -> (x', fid_parts).

    Adds the cross-tile corrections of ``D^T y_D'`` to pass A's dt_local
    (z-shifted channel planes, row-seam rows, t-ext channels when the time
    axis is sharded), then applies the primal update and the fidelity
    partial of the loss (``README.md:154,157``).  The bulk of the adjoint
    was already folded into dt_local, so this pass never reads the full
    Nd-channel dual.
    """
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 dual_dtype_name, table_dims,
                                                 z_off=1 if interior else 0)
    t_in_dt = not (halo_mode and t_sharded)
    gate_z = not (halo_mode or interior)
    plan = _neighbor_plan(chans, sp, t_in_dt)
    has_t_plan = any(axis == "t" for (_, axis, _d) in plan)
    use_tmul = t_plane and has_t_plan
    M, TR, Nc = sp.M, sp.TR, sp.Nc

    def _spec(key):
        i, axis, d = key
        if axis == "z":
            return sp.dvol_chan(i, shift_z=d, ext=halo_mode)
        if axis == "t":
            return sp.dvol_chan(i, ext=True)  # halo-only: t-extended read
        return sp.dvol_chan_rows(i, d)

    nb_specs = [_spec(key) for key in plan]

    def kernel(*refs):
        x_ref, x0_ref, yA_ref, dt_ref = refs[:4]
        nb_refs = dict(zip(plan, refs[4:4 + len(plan)]))
        rest = refs[4 + len(plan):]
        if use_tmul:
            tmul = rest[0][...]
            rest = rest[1:]
        x_out, fid_out = rest
        z, r = pl.program_id(0), pl.program_id(1)

        corr = dt_ref[0].astype(dtype)
        for (i, axis, d), ref in nb_refs.items():
            ch, w = chans[i], weights[i]
            if axis == "z":
                y = ref[0, :, 0].astype(dtype)
                if halo_mode:
                    y = y[1:-1]  # t interior of the extended dual
                    c = y if d < 0 else -y
                elif not gate_z:  # interior: neighbors always valid
                    c = y if d < 0 else -y
                elif d < 0:
                    gate = (z == 0) if ch.kind == FWD else (z <= 1)
                    c = _gate(gate, y)
                else:
                    gate = ((z == sp.Nz - 1) if ch.kind == BWD
                            else (z >= sp.Nz - 2))
                    c = -_gate(gate, y)
                corr = corr + c * w
            elif axis == "r":
                thin = ref[0, :, 0].astype(dtype)  # (M, dthin, Nc)
                if d < 0:
                    seam = _gate(r == 0, thin[:, -1:]) * w
                    corr = corr + _pad3(seam, 1, 0, TR - 1)
                else:
                    seam = _gate(r == sp.R - 1, thin[:, :1]) * w
                    corr = corr - _pad3(seam, 1, TR - 1, 0)
            else:  # "t": full adjoint from the t-extended channel (halo)
                ye = ref[0, :, 0].astype(dtype)  # (M+2, TR, Nc)
                if ch.kind == FWD:
                    c = ye[0:M] - ye[1:M + 1]
                elif ch.kind == BWD:
                    c = ye[1:M + 1] - ye[2:M + 2]
                else:
                    c = ye[0:M] - ye[2:M + 2]
                c = c * w
                if use_tmul:
                    c = c * tmul
                corr = corr + c

        x_new = (x_ref[0].astype(dtype) - tau * yA_ref[0].astype(dtype)
                 - tau * corr)
        if nonneg:
            x_new = jnp.maximum(x_new, 0.0)
        x_out[0] = x_new.astype(store)
        _write_part(fid_out,
                    _fid_part(x_new, x0_ref[0].astype(dtype), fidelity,
                              fid_weight), dtype)

    in_specs = [sp.vol(), sp.vol(), sp.vol(), sp.vol()] + nb_specs
    if use_tmul:
        in_specs += [sp.tplane()]

    cp_kw = dict(dimension_semantics=("parallel", "parallel"))
    limit = _vmem_limit(sp, sp.Nd, store.itemsize,
                        jnp.dtype(dual_dtype_name or dtype_name).itemsize)
    if limit:
        cp_kw["vmem_limit_bytes"] = limit
    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        compiler_params=pltpu.CompilerParams(**cp_kw),
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
        def call(x, x0, y_A, y_D, y_ext, dt, tmul=None):
            args = [y_D if axis == "r" else y_ext
                    for (_, axis, _d) in plan]
            if use_tmul:
                args.append(tmul)
            return fn(x, x0, y_A, dt, *args)
    else:
        def call(x, x0, y_A, y_D, dt, tmul=None):
            args = [y_D] * len(plan)
            if use_tmul:
                args.append(tmul)
            return fn(x, x0, y_A, dt, *args)

    return call


# ---------------------------------------------------------------------------
# boundary-fix kernels (overlapped sharded execution)
#
# The overlapped sharded step runs the `interior=True` main kernels on z
# planes [1, Nz-1) — which need no halos and therefore overlap with the
# async `lax.ppermute` of the boundary planes — and then these tiny
# (grid (2, R)) kernels recompute the two edge planes with the exchanged
# halos, writing IN PLACE into the main kernels' outputs via
# input_output_aliases (no dynamic-update-slice copies).  Halo planes
# arrive as a (2, ...) stack: slot 0 = plane from the left neighbor (or
# the boundary ghost), slot 1 = from the right.  Both kernels assume the
# solver-internal dual invariant (zero at globally invalid slots) like the
# ghost-based halo path (module docstring).
# ---------------------------------------------------------------------------


def _bnd_z(sp):
    """Plane index of boundary program b: 0 or Nz-1."""
    return lambda b: b * (sp.Nz - 1)


def _volb(sp, shift=0):
    zb = _bnd_z(sp)

    def index_map(b, r):
        return (jnp.clip(zb(b) + shift, 0, sp.Nz - 1), 0, r, 0)

    return pl.BlockSpec((1, sp.M, sp.TR, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _vol_rowsb(sp, direction):
    thin = sp.xthin
    bpt = sp.TR // thin
    last = sp.Nr // thin - 1
    zb = _bnd_z(sp)

    def index_map(b, r):
        if direction < 0:
            return (zb(b), 0, jnp.maximum(r * bpt - 1, 0), 0)
        return (zb(b), 0, jnp.minimum((r + 1) * bpt, last), 0)

    return pl.BlockSpec((1, sp.M, thin, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _halo_xb(sp):
    """(M, TR, Nc) block of the (2, M, Nr, Nc) exchanged-plane stack."""
    return pl.BlockSpec((1, sp.M, sp.TR, sp.Nc),
                        lambda b, r: (b, 0, r, 0), memory_space=pltpu.VMEM)


def _dvolb(sp):
    zb = _bnd_z(sp)
    return pl.BlockSpec((1, sp.M, sp.Nd, sp.TR, sp.Nc),
                        lambda b, r: (zb(b), 0, 0, r, 0),
                        memory_space=pltpu.VMEM)


def _dvol_chanb(sp, chan, shift=0):
    zb = _bnd_z(sp)

    def index_map(b, r):
        return (jnp.clip(zb(b) + shift, 0, sp.Nz - 1), 0, chan, r, 0)

    return pl.BlockSpec((1, sp.M, 1, sp.TR, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _dvol_chan_rowsb(sp, chan, direction):
    thin = sp.dthin
    bpt = sp.TR // thin
    last = sp.Nr // thin - 1
    zb = _bnd_z(sp)

    def index_map(b, r):
        if direction < 0:
            return (zb(b), 0, chan, jnp.maximum(r * bpt - 1, 0), 0)
        return (zb(b), 0, chan, jnp.minimum((r + 1) * bpt, last), 0)

    return pl.BlockSpec((1, sp.M, 1, thin, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _halo_chanb(sp, chan):
    return pl.BlockSpec((1, sp.M, 1, sp.TR, sp.Nc),
                        lambda b, r: (b, 0, chan, r, 0),
                        memory_space=pltpu.VMEM)


def _partb(sp):
    zb = _bnd_z(sp)
    return pl.BlockSpec((1, 1, 8, 128), lambda b, r: (zb(b), r, 0, 0),
                        memory_space=pltpu.VMEM)


def _tplaneb(sp):
    return pl.BlockSpec((sp.TR, sp.Nc), lambda b, r: (r, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def make_cp_dual_boundary_kernel(cfg: TVConfig, shape, dtype_name="float32",
                                 sigma_D=0.5, sigma_A=1.0, reg=1.0,
                                 interpret=False, dual_dtype_name=None,
                                 table_dims=None, t_plane=False,
                                 fidelity="l2", fid_weight=1.0):
    """Boundary fix for pass A: recompute z planes {0, Nz-1} with the
    exchanged halo planes (ghost-substituted at global edges), writing into
    the interior kernel's outputs in place.  The time axis must be
    unsharded (the overlapped path requires it)."""
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 dual_dtype_name, table_dims)
    dual_dtype = jnp.dtype(dual_dtype_name or dtype_name)
    need_z = _needs_z(chans)

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        x_prev = next(it) if need_z else None
        x_next = next(it) if need_z else None
        halo = next(it) if need_z else None
        if sp.R > 1:
            x_up, x_dn = next(it), next(it)
        else:
            x_up = x_dn = None
        x0_ref, yA_ref, yD_ref = next(it), next(it), next(it)
        next(it), next(it)  # dt_in, l21_in: pure alias carriers
        tmul = next(it)[...] if t_plane else None
        yA_out, yD_out, dt_out, l21_out = it
        b, r = pl.program_id(0), pl.program_id(1)

        x = x_ref[0].astype(dtype)
        up_row, dn_row = _seam_rows(sp, x_up, x_dn, dtype)
        if need_z:
            h = halo[0].astype(dtype)
            x_zm = jnp.where(b == 0, h, x_prev[0].astype(dtype))
            x_zp = jnp.where(b == 1, h, x_next[0].astype(dtype))
        else:
            x_zm = x_zp = None

        _dual_core(cfg, sp, chans, weights, sigma_D, sigma_A, reg,
                   dtype, store, dual_dtype, False, True, tmul,
                   x, up_row, dn_row, x_zm, x_zp, x, 0, 0, r,
                   x0_ref, yA_ref, yD_ref, yA_out, yD_out, dt_out, l21_out,
                   fidelity=fidelity, fw=fid_weight)

    in_specs = [_volb(sp)]
    if need_z:
        in_specs += [_volb(sp, -1), _volb(sp, 1), _halo_xb(sp)]
    if sp.R > 1:
        in_specs += [_vol_rowsb(sp, -1), _vol_rowsb(sp, 1)]
    in_specs += [_volb(sp), _volb(sp), _dvolb(sp), _volb(sp), _partb(sp)]
    if t_plane:
        in_specs += [_tplaneb(sp)]

    n_x = 1 + 3 * need_z + (2 if sp.R > 1 else 0)
    # aliases: yA, yD, dt_in, l21_in -> the four outputs
    aliases = {n_x + 1: 0, n_x + 2: 1, n_x + 3: 2, n_x + 4: 3}

    cp_kw = dict(dimension_semantics=("parallel", "parallel"))
    limit = _vmem_limit(sp, sp.Nd, store.itemsize, dual_dtype.itemsize)
    if limit:
        cp_kw["vmem_limit_bytes"] = limit
    fn = pl.pallas_call(
        kernel,
        grid=(2, sp.R),
        compiler_params=pltpu.CompilerParams(**cp_kw),
        input_output_aliases=aliases,
        in_specs=in_specs,
        out_specs=(_volb(sp), _dvolb(sp), _volb(sp), _partb(sp)),
        out_shape=(
            jax.ShapeDtypeStruct(shape, store),
            jax.ShapeDtypeStruct((sp.Nz, sp.M, sp.Nd, sp.Nr, sp.Nc),
                                 dual_dtype),
            jax.ShapeDtypeStruct(shape, store),
            sp.part_shape(dtype),
        ),
        interpret=interpret,
    )

    def call(x, x_halo, x0, y_A, y_D, dt_local, l21_parts, tmul=None):
        args = [x]
        if need_z:
            args += [x, x, x_halo]
        if sp.R > 1:
            args += [x, x]
        args += [x0, y_A, y_D, dt_local, l21_parts]
        if t_plane:
            args.append(tmul)
        return fn(*args)

    return call


@functools.lru_cache(maxsize=None)
def make_cp_primal_boundary_kernel(cfg: TVConfig, shape,
                                   dtype_name="float32", tau=0.1,
                                   interpret=False, dual_dtype_name=None,
                                   table_dims=None, t_plane=False,
                                   fidelity="l2", fid_weight=1.0,
                                   nonneg=False):
    """Boundary fix for pass B: the primal update at z planes {0, Nz-1},
    reading z-channel corrections from the exchanged y' halo stack (zeros
    at global edges) and writing into the interior kernel's outputs in
    place."""
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 dual_dtype_name, table_dims)
    plan = _neighbor_plan(chans, sp, True)
    M, TR = sp.M, sp.TR

    def _spec(key):
        i, axis, d = key
        if axis == "z":
            return _dvol_chanb(sp, i, d)
        return _dvol_chan_rowsb(sp, i, d)

    nb_specs = []
    for key in plan:
        nb_specs.append(_spec(key))
        if key[1] == "z":
            nb_specs.append(_halo_chanb(sp, key[0]))

    def kernel(*refs):
        it = iter(refs)
        x_ref, x0_ref, yA_ref, dt_ref = (next(it) for _ in range(4))
        nb = {}
        for key in plan:
            local = next(it)
            halo = next(it) if key[1] == "z" else None
            nb[key] = (local, halo)
        next(it)  # fid_in: alias carrier
        tmul = next(it)[...] if t_plane else None
        x_out, fid_out = it
        b, r = pl.program_id(0), pl.program_id(1)

        corr = dt_ref[0].astype(dtype)
        for (i, axis, d), (local, halo) in nb.items():
            ch, w = chans[i], weights[i]
            if axis == "z":
                yl = local[0, :, 0].astype(dtype)
                yh = halo[0, :, 0].astype(dtype)
                # d < 0 reads z-1: the halo covers it at the low edge
                # (b == 0); d > 0 reads z+1: halo at the high edge (b == 1)
                y = jnp.where(b == (0 if d < 0 else 1), yh, yl)
                corr = corr + (y if d < 0 else -y) * w
            else:
                thin = local[0, :, 0].astype(dtype)
                if d < 0:
                    seam = _gate(r == 0, thin[:, -1:]) * w
                    corr = corr + _pad3(seam, 1, 0, TR - 1)
                else:
                    seam = _gate(r == sp.R - 1, thin[:, :1]) * w
                    corr = corr - _pad3(seam, 1, TR - 1, 0)

        x_new = (x_ref[0].astype(dtype) - tau * yA_ref[0].astype(dtype)
                 - tau * corr)
        if nonneg:
            x_new = jnp.maximum(x_new, 0.0)
        x_out[0] = x_new.astype(store)
        _write_part(fid_out,
                    _fid_part(x_new, x0_ref[0].astype(dtype), fidelity,
                              fid_weight), dtype)

    in_specs = ([_volb(sp), _volb(sp), _volb(sp), _volb(sp)] + nb_specs
                + [_partb(sp)])
    if t_plane:
        in_specs += [_tplaneb(sp)]
    fid_idx = 4 + len(nb_specs)

    cp_kw = dict(dimension_semantics=("parallel", "parallel"))
    limit = _vmem_limit(sp, sp.Nd, store.itemsize,
                        jnp.dtype(dual_dtype_name or dtype_name).itemsize)
    if limit:
        cp_kw["vmem_limit_bytes"] = limit
    fn = pl.pallas_call(
        kernel,
        grid=(2, sp.R),
        compiler_params=pltpu.CompilerParams(**cp_kw),
        input_output_aliases={0: 0, fid_idx: 1},
        in_specs=in_specs,
        out_specs=(_volb(sp), _partb(sp)),
        out_shape=(
            jax.ShapeDtypeStruct(shape, store),
            sp.part_shape(dtype),
        ),
        interpret=interpret,
    )

    def call(x, x0, y_A, y_D, y_halo, dt, fid_parts, tmul=None):
        args = []
        for key in plan:
            args.append(y_D)
            if key[1] == "z":
                args.append(y_halo)
        args.append(fid_parts)
        if t_plane:
            args.append(tmul)
        return fn(x, x0, y_A, dt, *args)

    return call


def to_internal_layout(y_D):
    """Public (Nz, Nd, M, Nr, Nc) -> internal fused (Nz, M, Nd, Nr, Nc)."""
    return jnp.transpose(y_D, (0, 2, 1, 3, 4))


def from_internal_layout(y_D_int):
    return jnp.transpose(y_D_int, (0, 2, 1, 3, 4))


def cp_step_fused_internal(x, y_A, y_D_int, x_noisy, *, reg, sigma_D, sigma_A,
                           tau, cfg: TVConfig, interpret=False, tmul=None,
                           fidelity="l2", fid_weight=1.0, nonneg=False):
    """One fused CP iteration with y_D in the internal channel-contiguous
    layout (any supported dual dtype); use inside scans (transpose once
    outside).  ``tmul``: optional (Nr, Nc) time-channel multiplier plane
    (kernels.dispatch.t_plane_multiplier)."""
    shape = tuple(x.shape)
    dt_name = jnp.dtype(x.dtype).name
    dual_name = jnp.dtype(y_D_int.dtype).name
    t_plane = tmul is not None
    fid_kw = dict(fidelity=fidelity, fid_weight=float(fid_weight))
    # Pass A stays on the shifted-BlockSpec kernel: the z-streaming
    # experiment (kernels/zstream.py) wins its isolated pass-A microbench
    # (+6.5-8 % f32) but the COMPOSED solver's marginal per-iteration cost
    # is unchanged to <0.3 % (4x interleaved A/B, BENCH_LOCAL.jsonl
    # zstream_passA_ab + docs/performance.md) — not promoted.
    dual = make_cp_dual_kernel(cfg, shape, dt_name, sigma_D, sigma_A, reg,
                               interpret, dual_dtype_name=dual_name,
                               t_plane=t_plane, **fid_kw)
    primal = make_cp_primal_kernel(cfg, shape, dt_name, tau, interpret,
                                   dual_dtype_name=dual_name, t_plane=t_plane,
                                   nonneg=nonneg, **fid_kw)
    y_A, y_D_int, dt_local, l21_parts = dual(x, x_noisy, y_A, y_D_int, tmul)
    x, fid_parts = primal(x, x_noisy, y_A, y_D_int, dt_local, tmul)
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

    ``cfg.norm='huber'``: the tv partial is the Huber-smoothed value and
    the per-pixel array stays the RAW magnitude (no inf convention — the
    gradient divides by ``max(n, delta) >= delta > 0``), matching the jnp
    path's ``return_grad_norms`` contract (``ops/tv.py:111-120``).

    ``halo_mode``: sharded execution — x arrives extended by 1 ghost plane
    per side along z and t (the time ghosts ride inside the tile); z/t
    gating is disabled (parallel/fused_halo.py)."""
    sp, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                 table_dims=table_dims)
    need_z = _needs_z(chans)
    e = 1 if halo_mode else 0

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        x_zm = next(it) if need_z else None
        x_zp = next(it) if need_z else None
        if sp.R > 1:
            x_up, x_dn = next(it), next(it)
        else:
            x_up = x_dn = None
        tmul = next(it)[...] if t_plane else None
        norms_out, tv_out = it
        z, r = pl.program_id(0), pl.program_id(1)
        xt = x_ref[0].astype(dtype)
        x = _center_t(xt, e)
        up_row, dn_row = _seam_rows(sp, x_up, x_dn, dtype, e)
        ds = _d_channels(chans, weights, x, up_row, dn_row,
                         _center_t(x_zm[0].astype(dtype), e) if need_z else None,
                         _center_t(x_zp[0].astype(dtype), e) if need_z else None,
                         xt, z, r, sp, gate_z=not halo_mode, tmul=tmul, e=e)
        if cfg.norm == "aniso":
            abs_sum = jnp.abs(ds[0])
            for d in ds[1:]:
                abs_sum = abs_sum + jnp.abs(d)
            _write_part(tv_out, jnp.sum(abs_sum), dtype)
            norms_out[0] = abs_sum
            return
        norms_sq = ds[0] * ds[0]
        for d in ds[1:]:
            norms_sq = norms_sq + d * d
        norms = jnp.sqrt(norms_sq)
        if cfg.norm == "huber":
            dlt = cfg.huber_delta
            _write_part(tv_out, jnp.sum(
                jnp.where(norms <= dlt, norms_sq / (2.0 * dlt),
                          norms - dlt / 2.0)), dtype)
            norms_out[0] = norms
            return
        _write_part(tv_out, jnp.sum(norms), dtype)
        # inf convention (tv_CPU.py:85-86): zero-norm pixels contribute 0
        norms_out[0] = jnp.where(norms == 0, jnp.inf, norms)

    in_specs = [sp.vol(ext=e)]
    if need_z:
        in_specs += [sp.vol(-1, ext=e), sp.vol(1, ext=e)]
    if sp.R > 1:
        in_specs += [sp.vol_rows(-1, ext=e), sp.vol_rows(1, ext=e)]
    n_x = 1 + 2 * need_z + (2 if sp.R > 1 else 0)
    if t_plane:
        in_specs += [sp.tplane()]

    cp_kw = {}
    limit = _vmem_limit(sp, sp.Nd, store.itemsize, store.itemsize)
    if limit:
        cp_kw["vmem_limit_bytes"] = limit
    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        compiler_params=pltpu.CompilerParams(**cp_kw),
        in_specs=in_specs,
        out_specs=(sp.vol(), sp.part()),
        out_shape=(
            jax.ShapeDtypeStruct(shape, dtype),  # norms stay f32
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


def _row_dt(kind, y, y_up_row, y_dn_row, r, R):
    """Full row-channel adjoint of a (M, TR, Nc) tile with (M, 1, Nc) seam
    values from the neighbor tiles (gated at the global boundary).
    Valid-slot masking happens before the neighbor rows are consumed."""
    if kind == FWD:
        yv = _zero_row(y, -1, r == R - 1)
        up = _gate(r == 0, y_up_row)
        return jnp.concatenate([up, yv], axis=1)[:, :-1] - yv
    if kind == BWD:
        yv = _zero_row(y, 0, r == 0)
        dn = _gate(r == R - 1, y_dn_row)
        return yv - jnp.concatenate([yv, dn], axis=1)[:, 1:]
    yv = _zero_row(_zero_row(y, 0, r == 0), -1, r == R - 1)
    up = _gate(r == 0, y_up_row)
    dn = _gate(r == R - 1, y_dn_row)
    return (jnp.concatenate([up, yv], axis=1)[:, :-1]
            - jnp.concatenate([yv, dn], axis=1)[:, 1:])


@functools.lru_cache(maxsize=None)
def make_tv_subgrad_kernel(cfg: TVConfig, shape, dtype_name="float32",
                           interpret=False, halo_mode=False, table_dims=None,
                           t_plane=False):
    """Pass 2: G from (x, norms) — the unweighted adjoint of ``D_x / norms``
    (``tv_CPU.py:92-124`` algebra), recomputing D_x in-registers instead of
    reading an Nd-channel volume from HBM.

    Time channels are fully in-tile (the tile spans the whole local time
    axis, halo-extended by 2 ghost planes per side in sharded mode — even a
    time-sharded mesh needs no extra operands, because unlike CP's prox the
    subgradient's per-channel values depend only on exchanged x/norms).
    z channels need x and norms at +-1 tiles and x at +-2 (recomputed
    neighbor channels); row-tile seams use thin blocks.

    ``cfg.norm='aniso'``: G = D_T(sign(D x)) with FULL weights (the true
    L1,1 subgradient) — no norms operands at all (``call(x, None)``).

    ``cfg.norm='huber'``: G = D_T(D x / max(n, delta)) with FULL weights
    (the TRUE smooth gradient, ``ops/tv.py:111-120``) — iso's dataflow
    (norms operands, per-pixel division) with aniso's weighting (weights
    re-applied in the adjoint, no trailing norm factor); the divisor is
    clamped at ``huber_delta`` in-kernel, so pass 1's raw magnitudes are
    consumed directly and no inf convention is involved.

    ``t_plane``: (Nr, Nc) multiplier on the time channels of D; the iso G
    scatters it as part of ``D_x / norms`` (the reference does not re-apply
    weights in G); the aniso G additionally re-applies it, like D_T.
    """
    sp, chans, weights, norm, dtype, store = _build(cfg, shape, dtype_name,
                                                    table_dims=table_dims)
    gate = not halo_mode
    need_z = _needs_z(chans)
    aniso = cfg.norm == "aniso"
    huber = cfg.norm == "huber"
    dlt = cfg.huber_delta
    e2 = 2 if halo_mode else 0   # x extended by 2 ghost planes per side
    en = 1 if halo_mode else 0   # norms extended by 1
    M, TR, Nc = sp.M, sp.TR, sp.Nc

    def kernel(*refs):
        it = iter(refs)

        def take(cond, e):
            if not cond:
                return None
            return _center_t(it.__next__()[0].astype(dtype), e)

        xt_raw = it.__next__()[0].astype(dtype)   # (M + 2*e2, TR, Nc)
        x_c = _center_t(xt_raw, e2)
        x_zm, x_zp = take(need_z, e2), take(need_z, e2)
        x_zm2, x_zp2 = take(need_z, e2), take(need_z, e2)
        if sp.R > 1:
            xu = _center_t(it.__next__()[0].astype(dtype), e2)
            xd = _center_t(it.__next__()[0].astype(dtype), e2)
        else:
            xu = xd = None
        if aniso:
            nt_raw = n_c = n_zm = n_zp = None
            nu_row = nd_row = None
        else:
            nt_raw = it.__next__()[0].astype(dtype)  # (M + 2*en, TR, Nc)
            n_c = _center_t(nt_raw, en)
            n_zm, n_zp = take(need_z, en), take(need_z, en)
            if sp.R > 1:
                nu_row = _center_t(it.__next__()[0].astype(dtype), en)[:, -1:]
                nd_row = _center_t(it.__next__()[0].astype(dtype), en)[:, :1]
            else:
                nu_row = nd_row = None
        tmul = next(it)[...] if t_plane else None
        g_out = next(it)

        z, r = pl.program_id(0), pl.program_id(1)
        # huber divides by max(n, delta) — raw pass-1 magnitudes, no inf
        safe = (lambda a: jnp.maximum(a, dlt)) if huber else (lambda a: a)
        inv_n = None if aniso else 1.0 / safe(n_c)
        zero_row = jnp.zeros((M, 1, Nc), dtype)

        def row_of(offset):
            """Row at tile-relative ``offset`` (-1/-2 above the tile,
            TR/TR+1 below), pulled from the thin blocks; zeros when the
            plane is a single tile (R == 1, always gated)."""
            if offset < 0:
                return (zero_row if xu is None
                        else xu[:, offset + sp.xthin:offset + sp.xthin + 1])
            return (zero_row if xd is None
                    else xd[:, offset - TR:offset - TR + 1])

        G = None
        for ch, w in zip(chans, weights):
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

            def inv(arr):
                return None if aniso else 1.0 / safe(arr)

            if ch.axis == AXIS_COL:
                y = y_val(_ax_d(x_c, 2, ch.kind), inv_n)
                c = _ax_dt(y, 2, ch.kind)
            elif ch.axis == AXIS_ROW:
                up_row = row_of(-1)
                dn_row = row_of(TR)
                y_c = y_val(_row_d(ch.kind, x_c, up_row, dn_row, r, sp.R),
                            inv_n)
                # channel value at the seam rows themselves (for the adjoint):
                # D at row -1 needs rows -2..0; at row TR needs TR-1..TR+1
                if sp.R > 1:
                    up2 = row_of(-2)
                    ext_u = jnp.concatenate([up2, up_row, x_c[:, :1]], axis=1)
                    dn2 = row_of(TR + 1)
                    ext_d = jnp.concatenate([x_c[:, -1:], dn_row, dn2], axis=1)
                    if ch.kind == FWD:
                        d_up = ext_u[:, 2:3] - ext_u[:, 1:2]
                        d_dn = ext_d[:, 2:3] - ext_d[:, 1:2]
                        # FWD slot at row -1 valid unless it's the global
                        # last row (impossible for r > 0); slot TR valid
                        # unless global last (r == R-1, gated in _row_dt)
                    elif ch.kind == BWD:
                        d_up = ext_u[:, 1:2] - ext_u[:, 0:1]
                        d_dn = ext_d[:, 1:2] - ext_d[:, 0:1]
                    else:
                        d_up = ext_u[:, 2:3] - ext_u[:, 0:1]
                        d_dn = ext_d[:, 2:3] - ext_d[:, 0:1]
                    y_up = y_val(d_up, None if aniso else 1.0 / safe(nu_row))
                    y_dn = y_val(d_dn, None if aniso else 1.0 / safe(nd_row))
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
                if ch.kind == FWD:
                    if gate:
                        c = (_gate(z == 0, y_p)
                             - _gate(z == sp.Nz - 1, y_c))
                    else:
                        c = y_p - y_c
                elif ch.kind == BWD:
                    if gate:
                        c = (_gate(z == 0, y_c)
                             - _gate(z == sp.Nz - 1, y_n))
                    else:
                        c = y_c - y_n
                else:
                    if gate:
                        c = (_gate(z <= 1, y_p)
                             - _gate(z >= sp.Nz - 2, y_n))
                    else:
                        c = y_p - y_n
            else:  # AXIS_T — fully in-tile
                if halo_mode:
                    # Y at slots [-1, M+1): d from the 2-ghost-extended x,
                    # divisors from the 1-ghost-extended norms (safe ghosts)
                    d_ext = _ax_d_ext(xt_raw, 0, ch.kind, e2,
                                      out_lo=-1, out_n=M + 2)
                    if tm is not None:
                        d_ext = d_ext * tm
                    if aniso:
                        Ye = jnp.sign(d_ext)
                    else:
                        Ye = d_ext * w / safe(nt_raw)
                    if ch.kind == FWD:
                        c = Ye[0:M] - Ye[1:M + 1]
                    elif ch.kind == BWD:
                        c = Ye[1:M + 1] - Ye[2:M + 2]
                    else:
                        c = Ye[0:M] - Ye[2:M + 2]
                else:
                    Y = y_val(_ax_d(x_c, 0, ch.kind), inv_n)
                    c = _ax_dt(Y, 0, ch.kind)
            if aniso or huber:
                # re-apply the full weight (and the per-pixel time
                # multiplier) in the adjoint, exactly like D_T
                c = c * w
                if tm is not None:
                    c = c * tm
            G = c if G is None else G + c
        # iso: G = norm * unweighted-adjoint(D/norms) and the y values above
        # already carry one norm factor inside w -> total norm^2, matching
        # the reference's double application (tv_CPU.py:124,328).  aniso/
        # huber: the per-channel w (= channel_weight * norm) applied above
        # already folds D_T's trailing norm.
        g_out[0] = (G * norm if not (aniso or huber) else G).astype(store)

    n_xs = 1 + 4 * need_z
    n_ns = 0 if aniso else 1 + 2 * need_z
    in_specs = [sp.vol(ext=e2)]
    if need_z:
        in_specs += [sp.vol(-1, ext=e2), sp.vol(1, ext=e2),
                     sp.vol(-2, ext=e2), sp.vol(2, ext=e2)]
    if sp.R > 1:
        in_specs += [sp.vol_rows(-1, ext=e2), sp.vol_rows(1, ext=e2)]
    if not aniso:
        in_specs += [sp.vol(ext=en)]
        if need_z:
            in_specs += [sp.vol(-1, ext=en), sp.vol(1, ext=en)]
        if sp.R > 1:
            in_specs += [sp.vol_rows(-1, ext=en), sp.vol_rows(1, ext=en)]
    if t_plane:
        in_specs += [sp.tplane()]

    cp_kw = {}
    limit = _vmem_limit(sp, sp.Nd, store.itemsize, store.itemsize)
    if limit:
        cp_kw["vmem_limit_bytes"] = limit
    fn = pl.pallas_call(
        kernel,
        grid=sp.grid,
        compiler_params=pltpu.CompilerParams(**cp_kw),
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
