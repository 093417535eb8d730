"""Streaming fused TGV-2 step: two Pallas passes per Chambolle-Pock
iteration for the COUPLED TGV modes (``axes='3d'``/``'4d'``) and for 2D
slices too large for the slice-resident kernel (kernels/tgv_resident.py).

The jnp scan materializes every difference stack and temporary through HBM
at XLA's elementwise-loop bandwidth (~170 GB/s on v5e, docs/performance.md)
— measured 23 it/s for the 4D mode at (32, 8, 256, 256).  Here one
iteration is two kernels over (z, row-tile) grid programs with the full
time axis in-tile (the layout trick of kernels/fused.py):

- pass PQ (dual): reads xb/wb (+ z/row neighbor operands), p, q; computes
  all D and E difference channels in VMEM and writes the projected duals
  in place.  Nothing else touches HBM.
- pass XW (primal): reads the new p/q (+ the neighbor channels their
  adjoints scatter from), x, w, x0; writes x', xb', w', wb'.

Neighbor plumbing: time and column differences are complete in-tile; z
neighbors are clamped z-shifted block operands gated at the global
boundary; row seams are 8-row thin blocks from the adjacent tile (the
``vol_rows`` pattern of kernels/fused.py).  No split-adjoint/seam
corrections are needed — the primal pass reads the dual's neighbors
directly because the duals are already committed to HBM by pass PQ.

The loss history is NOT fused (it would need a third pass over the new
iterate's differences): the streaming path requires ``compute_loss=False``
or the sampled ``loss_every=k`` mode — tgv_denoise falls back to the jnp
scan otherwise.  State may be stored bf16 (kernels COMPUTE in f32, casting
at the tile boundary — the fused.py convention) for ~half the HBM traffic.

Numerics match the jnp scan to fp round-off (interpreter-mode parity:
tests/test_kernels.py::test_tgv_stream_matches_jnp) — the channel order
and one-sided zero boundaries are exactly solvers/tgv.py's
``_d_fwd{,3,4}`` / ``_sym_grad{,3,4}``.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.schemes import BWD, FWD
from .fused import (
    _ax_d,
    _cross_d,
    _gate,
    _one_sided_adjoint as _adj_in,
    _row_d,
    _zero_row,
)

_MODE_AXES = {
    "2d": ("row", "col"),
    "3d": ("z", "row", "col"),
    "4d": ("z", "t", "row", "col"),
}
_THIN = 8
_TILE_BYTES_TARGET = 6 * 1024 * 1024
# Mosaic accepts raised scoped-VMEM budgets (see kernels/fused.py); the
# TR=8 floor engages for large (M, Nc) with the limit raised accordingly
_WORKSET_MAX = 12 * 1024 * 1024
_VMEM_CEILING = 100 * 1024 * 1024


def _q_pairs(n: int):
    """Symmetrized-Jacobian channel order: diagonals then (i, j) with i<j —
    exactly solvers/tgv.py's ``_sym_grad{,3,4}``."""
    return [(i, i) for i in range(n)] + [
        (i, j) for i in range(n) for j in range(i + 1, n)
    ]


class _SP(NamedTuple):
    Nz: int
    M: int
    Nr: int
    Nc: int
    TR: int
    R: int


def _vol_spec(sp: _SP, shift_z: int = 0):
    Nz = sp.Nz

    def index_map(z, r):
        zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
        return (zi, 0, r, 0)

    return pl.BlockSpec((1, sp.M, sp.TR, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _vol_rows_spec(sp: _SP, direction: int):
    per_tile = sp.TR // _THIN
    last = sp.Nr // _THIN - 1

    def index_map(z, r):
        if direction < 0:
            return (z, 0, jnp.maximum(r * per_tile - 1, 0), 0)
        return (z, 0, jnp.minimum((r + 1) * per_tile, last), 0)

    return pl.BlockSpec((1, sp.M, _THIN, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _dvol_spec(sp: _SP, n: int, shift_z: int = 0):
    Nz = sp.Nz

    def index_map(z, r):
        zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
        return (zi, 0, 0, r, 0)

    return pl.BlockSpec((1, sp.M, n, sp.TR, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _dvol_chan_spec(sp: _SP, chan: int, shift_z: int = 0):
    Nz = sp.Nz

    def index_map(z, r):
        zi = jnp.clip(z + shift_z, 0, Nz - 1) if shift_z else z
        return (zi, 0, chan, r, 0)

    return pl.BlockSpec((1, sp.M, 1, sp.TR, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _dvol_chan_rows_spec(sp: _SP, chan: int, direction: int):
    per_tile = sp.TR // _THIN
    last = sp.Nr // _THIN - 1

    def index_map(z, r):
        if direction < 0:
            return (z, 0, chan, jnp.maximum(r * per_tile - 1, 0), 0)
        return (z, 0, chan, jnp.minimum((r + 1) * per_tile, last), 0)

    return pl.BlockSpec((1, sp.M, 1, _THIN, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)


def _plane_count(mode: str) -> int:
    """Worst-pass VMEM block count (in (M, TR, Nc)-plane units) for tile
    sizing — pass XW dominates."""
    n = len(_MODE_AXES[mode])
    n_q = n + n * (n - 1) // 2
    has_z = "z" in _MODE_AXES[mode]
    nz_q = sum(1 for (i, j) in _q_pairs(n)
               if has_z and (_MODE_AXES[mode][i] == "z"
                             or _MODE_AXES[mode][j] == "z"))
    # x, x0, p(+zm chan), w, q(+z chans), outs x/xb/w/wb (+ thin ~0)
    return 2 + n + 1 + n + n_q + nz_q + 2 + 2 * n + 1


def _workset(shape, mode: str, TR: int, bpe: int) -> int:
    return _plane_count(mode) * shape[1] * TR * shape[3] * bpe


def choose_tile_rows(shape, mode: str, bpe: int = 4):
    """Largest TR (multiple of 8, dividing Nr) whose nominal worst-pass
    workset fits the target; floors at TR=8 (with a raised Mosaic scoped
    budget, see _vmem_limit) for large (M, Nc); None only when even TR=8
    exceeds _WORKSET_MAX or the rows cannot tile."""
    Nz, M, Nr, Nc = shape
    if Nr % _THIN:
        return None
    best = None
    for TR in range(_THIN, Nr + 1, _THIN):
        if Nr % TR:
            continue
        if _workset(shape, mode, TR, bpe) <= _TILE_BYTES_TARGET:
            best = TR
    if best is None and _workset(shape, mode, _THIN, bpe) <= _WORKSET_MAX:
        best = _THIN
    return best


def _vmem_limit(shape, mode: str, TR: int, bpe: int):
    """Scoped-VMEM override: None inside Mosaic's default; else a raised
    cap so large tiles still compile (the kernels/fused.py calibration:
    true footprint ~2x the nominal workset)."""
    need = 2 * _workset(shape, mode, TR, bpe)
    if need <= 15 * 1024 * 1024:
        return None
    return min(_VMEM_CEILING, need + need // 2)


def stream_fits(shape, mode: str, dtype="float32") -> bool:
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    Nz, M, Nr, Nc = shape
    if Nc % 128 or Nr % _THIN:
        return False
    return choose_tile_rows(shape, mode) is not None


def to_internal(a):
    """public (Nz, n, M, Nr, Nc) -> internal channel-after-time
    (Nz, M, n, Nr, Nc)."""
    return jnp.swapaxes(a, 1, 2)


def from_internal(a):
    return jnp.swapaxes(a, 1, 2)


@functools.lru_cache(maxsize=None)
def make_tgv_stream_step(shape, mode: str, alpha1: float, alpha0: float,
                         sigma_tau_split: float = 1.0,
                         dtype_name: str = "float32",
                         interpret: bool = False, tile_rows: int = None,
                         norm: str = "iso", huber_delta: float = 1.0,
                         _traffic_probe: bool = False):
    """Build ``step(x, xb, w, wb, p, q, x0) -> (x, xb, w, wb, p, q)`` —
    one TGV CP iteration as two pallas_calls.  w/wb/p/q use the INTERNAL
    (Nz, M, n, Nr, Nc) layout (``to_internal``/``from_internal``)."""
    from ..solvers.tgv import TGV_NORM_BOUND_SQ

    if norm not in ("iso", "aniso", "huber"):
        raise ValueError(f"norm must be 'iso', 'aniso' or 'huber', got "
                         f"{norm!r}")
    ax_list = _MODE_AXES[mode]
    n = len(ax_list)
    pairs = _q_pairs(n)
    n_q = len(pairs)
    has_z = "z" in ax_list
    z_chan = ax_list.index("z") if has_z else None
    row_chan = ax_list.index("row")
    q_z_chans = [c for c, (i, j) in enumerate(pairs)
                 if has_z and (ax_list[i] == "z" or ax_list[j] == "z")]
    q_row_chans = [c for c, (i, j) in enumerate(pairs)
                   if ax_list[i] == "row" or ax_list[j] == "row"]

    Nz, M, Nr, Nc = shape
    store = jnp.dtype(dtype_name)
    # bf16 is a storage/traffic format only — kernels COMPUTE in f32 and
    # cast at the tile boundary (the fused.py convention); f64 stays f64
    # (interpreter-mode tests)
    compute = jnp.dtype(jnp.float32) if store == jnp.bfloat16 else store
    # in-kernel f32 compute temporaries dominate the VMEM footprint
    bpe = max(store.itemsize, 4)
    TR = tile_rows or choose_tile_rows(shape, mode, bpe)
    if TR is None:
        raise ValueError(
            f"tgv stream kernel cannot tile shape {shape} (Nr must be a "
            f"multiple of {_THIN} with a tile fitting VMEM)"
        )
    sp = _SP(Nz, M, Nr, Nc, TR, Nr // TR)

    L = math.sqrt(TGV_NORM_BOUND_SQ[mode])
    sigma = float(sigma_tau_split / L)
    tau = float(1.0 / (sigma_tau_split * L))
    a1 = float(alpha1)
    a0 = float(alpha0)
    # Huber conjugate prox = shrink-then-project; the shrink factors are
    # trace-time constants (cp.dual_prox convention)
    shr1 = float(1.0 / (1.0 + sigma * huber_delta / a1))
    shr0 = float(1.0 / (1.0 + sigma * huber_delta / a0))

    def project(chans, radius, shrink):
        if norm == "aniso":
            return [jnp.clip(c, -radius, radius) for c in chans]
        if norm == "huber":
            chans = [c * shrink for c in chans]
        nrm = jnp.sqrt(sum(c * c for c in chans))
        scale = 1.0 / jnp.maximum(1.0, nrm / radius)
        return [c * scale for c in chans]

    # ---- pass PQ: dual updates --------------------------------------------
    def pq_kernel(*refs):
        it = iter(refs)
        ld = lambda: next(it)[0].astype(compute)
        xb = ld()
        xb_zp = ld() if has_z and not _traffic_probe else None
        xb_dn = ld()
        wb = ld()
        wb_zm = ld() if has_z and not _traffic_probe else None
        wb_up = ld()
        if _traffic_probe and has_z:
            xb_zp, wb_zm = xb, wb
        p_in = ld()
        q_in = ld()
        p_out = next(it)
        q_out = next(it)
        z, r = pl.program_id(0), pl.program_id(1)

        def fwd_d(a):
            if a == "z":
                return _cross_d(FWD, xb, None, xb_zp, z, Nz)
            if a == "t":
                return _ax_d(xb, 0, FWD)
            if a == "row":
                return _row_d(FWD, xb, None, xb_dn[:, :1], r, sp.R)
            return _ax_d(xb, 2, FWD)

        def bwd_d(f, a):
            tile = wb[:, f]
            if a == "z":
                return _cross_d(BWD, tile, wb_zm[:, f], None, z, Nz)
            if a == "t":
                return _ax_d(tile, 0, BWD)
            if a == "row":
                return _row_d(BWD, tile, wb_up[:, f, -1:], None, r, sp.R)
            return _ax_d(tile, 2, BWD)

        pc = [p_in[:, i] + sigma * (fwd_d(ax_list[i]) - wb[:, i])
              for i in range(n)]
        p_out[0] = jnp.stack(project(pc, a1, shr1), axis=1).astype(store)

        qc = []
        for (i, j) in pairs:
            if i == j:
                qc.append(q_in[:, len(qc)]
                          + sigma * bwd_d(i, ax_list[i]))
            else:
                qc.append(q_in[:, len(qc)] + sigma * 0.5
                          * (bwd_d(i, ax_list[j]) + bwd_d(j, ax_list[i])))
        q_out[0] = jnp.stack(project(qc, a0, shr0), axis=1).astype(store)

    pq_in_specs = [_vol_spec(sp)]
    if has_z and not _traffic_probe:
        pq_in_specs.append(_vol_spec(sp, +1))
    pq_in_specs.append(_vol_rows_spec(sp, +1))
    pq_in_specs.append(_dvol_spec(sp, n))
    if has_z and not _traffic_probe:
        pq_in_specs.append(_dvol_spec(sp, n, -1))
    pq_in_specs.append(_dvol_rows_spec_all(sp, n, -1))
    p_idx = len(pq_in_specs)
    pq_in_specs.append(_dvol_spec(sp, n))
    q_idx = len(pq_in_specs)
    pq_in_specs.append(_dvol_spec(sp, n_q))

    w_shape = (Nz, M, n, Nr, Nc)
    q_shape = (Nz, M, n_q, Nr, Nc)
    cp_kw = dict(dimension_semantics=("parallel", "parallel"))
    limit = _vmem_limit(shape, mode, TR, bpe)
    if limit is not None:
        cp_kw["vmem_limit_bytes"] = limit
    pq_call = pl.pallas_call(
        pq_kernel,
        grid=(Nz, sp.R),
        in_specs=pq_in_specs,
        out_specs=(_dvol_spec(sp, n), _dvol_spec(sp, n_q)),
        out_shape=(jax.ShapeDtypeStruct(w_shape, store),
                   jax.ShapeDtypeStruct(q_shape, store)),
        input_output_aliases={p_idx: 0, q_idx: 1},
        compiler_params=pltpu.CompilerParams(**cp_kw),
        interpret=interpret,
    )

    # ---- pass XW: primal updates + extrapolation --------------------------
    def xw_kernel(*refs):
        it = iter(refs)
        ld = lambda: next(it)[0].astype(compute)
        x = ld()
        x0 = ld()
        p = ld()
        p_zm = ld()[:, 0] if has_z and not _traffic_probe else None
        p_up = ld()[:, 0]
        w = ld()
        q = ld()
        if _traffic_probe:
            q_zp = {c: q[:, c] for c in q_z_chans}
            if has_z:
                p_zm = p[:, z_chan]
        else:
            q_zp = {c: ld()[:, 0] for c in q_z_chans}
        q_dn = {c: ld()[:, 0] for c in q_row_chans}
        x_out = next(it)
        xb_out = next(it)
        w_out = next(it)
        wb_out = next(it)
        z, r = pl.program_id(0), pl.program_id(1)

        def adj_fwd(c, a):
            tile = p[:, c]
            if a == "z":
                return _gate(z == 0, p_zm) - _gate(z == Nz - 1, tile)
            if a == "t":
                return _adj_in(tile, 0, False)
            if a == "row":
                t1 = jnp.concatenate(
                    [_gate(r == 0, p_up[:, -1:]), tile], axis=1)[:, :-1]
                return t1 - _zero_row(tile, -1, r == sp.R - 1)
            return _adj_in(tile, 2, False)

        def adj_bwd(c, a):
            tile = q[:, c]
            if a == "z":
                return _gate(z == 0, tile) - _gate(z == Nz - 1, q_zp[c])
            if a == "t":
                return _adj_in(tile, 0, True)
            if a == "row":
                t2 = jnp.concatenate(
                    [tile, _gate(r == sp.R - 1, q_dn[c][:, :1])],
                    axis=1)[:, 1:]
                return _zero_row(tile, 0, r == 0) - t2
            return _adj_in(tile, 2, True)

        dtp = sum(adj_fwd(i, ax_list[i]) for i in range(n))
        x_new = (x - tau * dtp + tau * x0) / (1.0 + tau)
        x_out[0] = x_new.astype(store)
        xb_out[0] = (2.0 * x_new - x).astype(store)

        etq = [jnp.zeros_like(x) for _ in range(n)]
        for c, (i, j) in enumerate(pairs):
            if i == j:
                etq[i] = etq[i] + adj_bwd(c, ax_list[i])
            else:
                etq[i] = etq[i] + 0.5 * adj_bwd(c, ax_list[j])
                etq[j] = etq[j] + 0.5 * adj_bwd(c, ax_list[i])
        w_new = [w[:, i] - tau * (-p[:, i] + etq[i]) for i in range(n)]
        w_out[0] = jnp.stack(w_new, axis=1).astype(store)
        wb_out[0] = jnp.stack(
            [2.0 * w_new[i] - w[:, i] for i in range(n)],
            axis=1).astype(store)

    xw_in_specs = [_vol_spec(sp), _vol_spec(sp), _dvol_spec(sp, n)]
    if has_z and not _traffic_probe:
        xw_in_specs.append(_dvol_chan_spec(sp, z_chan, -1))
    xw_in_specs.append(_dvol_chan_rows_spec(sp, row_chan, -1))
    w_in_idx = len(xw_in_specs)
    xw_in_specs.append(_dvol_spec(sp, n))
    xw_in_specs.append(_dvol_spec(sp, n_q))
    if not _traffic_probe:
        xw_in_specs += [_dvol_chan_spec(sp, c, +1) for c in q_z_chans]
    xw_in_specs += [_dvol_chan_rows_spec(sp, c, +1) for c in q_row_chans]

    vol_shape = (Nz, M, Nr, Nc)
    xw_call = pl.pallas_call(
        xw_kernel,
        grid=(Nz, sp.R),
        in_specs=xw_in_specs,
        out_specs=(_vol_spec(sp), _vol_spec(sp),
                   _dvol_spec(sp, n), _dvol_spec(sp, n)),
        out_shape=(jax.ShapeDtypeStruct(vol_shape, store),
                   jax.ShapeDtypeStruct(vol_shape, store),
                   jax.ShapeDtypeStruct(w_shape, store),
                   jax.ShapeDtypeStruct(w_shape, store)),
        input_output_aliases={0: 0, w_in_idx: 2},
        compiler_params=pltpu.CompilerParams(**cp_kw),
        interpret=interpret,
    )

    def pq(xb, wb, p, q):
        if has_z and not _traffic_probe:
            return pq_call(xb, xb, xb, wb, wb, wb, p, q)
        return pq_call(xb, xb, wb, wb, p, q)

    def xw(x, x0, p, w, q):
        xw_ins = [x, x0, p]
        if has_z and not _traffic_probe:
            xw_ins.append(p)
        xw_ins += [p, w, q]
        if not _traffic_probe:
            xw_ins += [q] * len(q_z_chans)
        xw_ins += [q] * len(q_row_chans)
        return xw_call(*xw_ins)

    def step(x, xb, w, wb, p, q, x0):
        p, q = pq(xb, wb, p, q)
        x, xb, w, wb = xw(x, x0, p, w, q)
        return x, xb, w, wb, p, q

    # exposed for the sharded ghost-plane wrapper (parallel/tgv_sharded.py),
    # which must re-exchange dual halos BETWEEN the two passes
    step.pq = pq
    step.xw = xw
    step.sigma = sigma
    step.tau = tau
    return step


def _dvol_rows_spec_all(sp: _SP, n: int, direction: int):
    """All-channel thin row block of the internal dual layout."""
    per_tile = sp.TR // _THIN
    last = sp.Nr // _THIN - 1

    def index_map(z, r):
        if direction < 0:
            return (z, 0, 0, jnp.maximum(r * per_tile - 1, 0), 0)
        return (z, 0, 0, jnp.minimum((r + 1) * per_tile, last), 0)

    return pl.BlockSpec((1, sp.M, n, _THIN, sp.Nc), index_map,
                        memory_space=pltpu.VMEM)
