"""Sharded fused CP: the Pallas kernels running inside shard_map over the
(z, t) mesh — multi-chip execution with single-chip kernel efficiency.

Halo strategy ("ghost planes"): before each fused pass, one boundary plane
per direction is exchanged with ``lax.ppermute``; shards at the *global*
boundary substitute a ghost plane chosen so that the ungated stencil
reproduces the reference's one-sided zero boundary exactly:

- FWD/BWD channels (upwind/downwind/hybrid): ghost = edge plane
  (``d = ghost - edge = 0`` at the invalid slot);
- CTR channels (central): ghost = reflected plane (``d = x[1] - ghost = 0``).

The kernels then run with z/t gating disabled (``halo_mode=True`` in
kernels/fused.py) and shifted index maps into the extended array.  The
adjoint pass uses zero halos and relies on the CP invariant that dual
variables are zero at globally-invalid slots (maintained by the forward pass
and the zero initialization) — this module is a *solver* internal, not a
general sharded D_T (use ``parallel.halo`` for that).

Verified slot-exact against the unsharded fused path and the jnp solver on
the virtual CPU mesh (tests/test_sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import TVConfig
from ..core.schemes import AXIS_T, AXIS_Z, CTR, scheme_channels
from ..kernels.fused import (
    _sum_parts,
    make_cp_dual_kernel,
    make_cp_primal_kernel,
)
from ..ops.operators import _sl
from .halo import _ShardCtx, _mesh_axes, _plane_from_left, _plane_from_right
from .mesh import T_AXIS, Z_AXIS


def _axis_ghost_kind(chans, axis):
    """'reflect' when the axis carries a CTR channel, else 'edge' (the
    central scheme's small-axis fallback makes this per-axis uniform)."""
    kinds = {ch.kind for ch in chans if ch.axis == axis}
    if not kinds:
        return "edge"
    return "reflect" if CTR in kinds else "edge"


def _extend_axis(x, axis, axis_name, n, ghost_kind):
    """Concatenate one halo plane per side along ``axis``; boundary shards
    substitute the ghost plane.  ``ghost_kind='zero'`` keeps the ppermute
    zeros (used for dual-variable halos)."""
    nd = x.ndim
    if axis_name is None or n == 1:
        lo = jnp.zeros_like(x[_sl(nd, axis, 0, 1)])
        hi = jnp.zeros_like(lo)
        is_first = is_last = True
    else:
        lo = _plane_from_left(x, axis, axis_name, n)
        hi = _plane_from_right(x, axis, axis_name, n)
        is_first = lax.axis_index(axis_name) == 0
        is_last = lax.axis_index(axis_name) == n - 1

    if ghost_kind != "zero":
        L = x.shape[axis]
        if ghost_kind == "edge":
            g_lo = x[_sl(nd, axis, 0, 1)]
            g_hi = x[_sl(nd, axis, -1, None)]
        else:  # reflect: globally x[1] / x[L-2]; with a 1-plane shard those
            # live on the neighbor — which is exactly the exchanged halo
            g_lo = x[_sl(nd, axis, 1, 2)] if L > 1 else hi
            g_hi = x[_sl(nd, axis, -2, -1)] if L > 1 else lo
        if isinstance(is_first, bool):
            lo, hi = g_lo, g_hi
        else:
            lo = jnp.where(is_first, g_lo, lo)
            hi = jnp.where(is_last, g_hi, hi)
    return jnp.concatenate([lo, x, hi], axis=axis)


def _kind_range(chans, want_axis, kinds):
    """Static [lo, hi) channel range of ``want_axis`` channels whose kind
    is in ``kinds`` (scheme tables keep them contiguous; asserted)."""
    idx = [i for i, ch in enumerate(chans)
           if ch.axis == want_axis and ch.kind in kinds]
    if not idx:
        return 0, 0
    lo, hi = idx[0], idx[-1] + 1
    assert idx == list(range(lo, hi)), idx
    return lo, hi


def _sparse_channel_halo(y, axis, axis_name, n, chans, want_axis):
    """Dual-variable halo along ``axis`` exchanging ONLY the channels the
    primal pass's D^T stencil actually reads from each neighbor
    (VERDICT r4 item 8): a channel crosses an edge only if it
    DIFFERENTIATES along that axis, and then only in ONE direction —
    ``fwd`` kinds (D^T at z needs y[z-1]) come from the LEFT neighbor,
    ``bwd`` kinds (needs y[z+1]) from the RIGHT, ``ctr`` from both.
    In-plane channels never leave their plane.  At the north-star hybrid
    shape (Nd=8: 1 fwd + 1 bwd z channel) this cuts the y halo from
    134 MB to 17 MB per chip per iteration (docs/performance.md).  Each
    exchanged block is re-embedded in a zero-filled full-channel plane,
    so the kernels' halo interface is unchanged; returns the two planes
    concatenated along ``axis`` ([left, right] — `_halo_planes` order).
    Ghost kind is always 'zero' for duals, so global-boundary handling
    is the ppermute zeros."""
    Nd = y.shape[2]

    def embed(block, lo, hi):
        parts = []
        if lo:
            shape = list(block.shape)
            shape[2] = lo
            parts.append(jnp.zeros(tuple(shape), y.dtype))
        parts.append(block)
        if hi < Nd:
            shape = list(block.shape)
            shape[2] = Nd - hi
            parts.append(jnp.zeros(tuple(shape), y.dtype))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=2)

    def zero_plane():
        shape = list(y.shape)
        shape[axis] = 1
        return jnp.zeros(tuple(shape), y.dtype)

    lo_f, hi_f = _kind_range(chans, want_axis, ("fwd", "ctr"))
    lo_b, hi_b = _kind_range(chans, want_axis, ("bwd", "ctr"))
    dead = axis_name is None or n == 1
    if hi_f > lo_f and not dead:
        sub = lax.slice_in_dim(y, lo_f, hi_f, axis=2)
        left = embed(_plane_from_left(sub, axis, axis_name, n), lo_f,
                     hi_f)
    else:
        left = zero_plane()
    if hi_b > lo_b and not dead:
        sub = lax.slice_in_dim(y, lo_b, hi_b, axis=2)
        right = embed(_plane_from_right(sub, axis, axis_name, n), lo_b,
                      hi_b)
    else:
        right = zero_plane()
    return jnp.concatenate([left, right], axis=axis)


def _halo_planes(x, axis, axis_name, n, ghost_kind):
    """The two exchanged boundary planes of ``x`` along ``axis``, stacked on
    a fresh leading slot: slot 0 = plane from the LEFT neighbor (used as the
    z-1 value at the shard's low edge), slot 1 = from the RIGHT.  Global
    boundary shards substitute the ghost plane (same kinds as
    :func:`_extend_axis`); ``ghost_kind='zero'`` keeps the ppermute zeros
    (dual-variable halos).  The overlapped sharded step issues this BEFORE
    the interior kernel so the collective rides under the compute."""
    nd = x.ndim
    if axis_name is None or n == 1:
        lo = jnp.zeros_like(x[_sl(nd, axis, 0, 1)])
        hi = jnp.zeros_like(lo)
        is_first = is_last = True
    else:
        lo = _plane_from_left(x, axis, axis_name, n)
        hi = _plane_from_right(x, axis, axis_name, n)
        is_first = lax.axis_index(axis_name) == 0
        is_last = lax.axis_index(axis_name) == n - 1

    if ghost_kind != "zero":
        L = x.shape[axis]
        if ghost_kind == "edge":
            g_lo = x[_sl(nd, axis, 0, 1)]
            g_hi = x[_sl(nd, axis, -1, None)]
        else:  # reflect (central scheme): globally x[1] / x[L-2]
            g_lo = x[_sl(nd, axis, 1, 2)] if L > 1 else hi
            g_hi = x[_sl(nd, axis, -2, -1)] if L > 1 else lo
        if isinstance(is_first, bool):
            lo, hi = g_lo, g_hi
        else:
            lo = jnp.where(is_first, g_lo, lo)
            hi = jnp.where(is_last, g_hi, hi)
    return jnp.concatenate([lo, hi], axis=axis)


def make_sharded_cp_solver_fused(
    mesh: Mesh,
    cfg: TVConfig,
    global_shape,
    *,
    reg,
    n_iter,
    sigma_D=0.5,
    sigma_A=1.0,
    tau=None,
    shard_time: bool = True,
    dual_dtype=None,
    dtype="float32",
    interpret: bool = None,
    mask_static=None,
    weight_time=None,
    overlap: bool = None,
    fidelity: str = "l2",
    fidelity_weight: float = 1.0,
    nonneg: bool = False,
):
    """jit(lax.scan(fused CP step under shard_map)).

    Same call convention as ``parallel.halo.make_sharded_cp_solver`` but the
    per-shard compute runs the fused Pallas kernels; y_D is carried in the
    kernel-internal channel-contiguous layout and optionally bf16.
    Channel gating uses the GLOBAL Nz/M (the kernels are built for the local
    block shape but the channel table must not change per shard).

    ``dtype``: HBM storage dtype of x / y_A / x_noisy ('float32' or
    'bfloat16' — kernels always COMPUTE in f32, as on the unsharded path);
    the caller passes state arrays already in this dtype.  ``dual_dtype``
    defaults to ``dtype``.

    ``mask_static`` / ``weight_time``: plane-shaped ``(1, 1, N, N)`` per the
    reference contract; the (N_row, N_col) multiplier plane is replicated
    across the (z, t) mesh (the mesh shards z/t only, never rows/cols).

    ``fidelity``/``fidelity_weight`` (scalar)/``nonneg``: the data-term
    family of ``solvers.chambolle_pock`` — 'l1' (TV-L1) and 'kl' (Poisson,
    x_noisy >= 0) ride the sharded kernels too (the fidelity update and
    loss are pointwise, so sharding is unaffected).
    """
    from ..kernels.dispatch import default_interpret, t_plane_multiplier
    from ..solvers.cp import default_tau
    from ..solvers.fidelity import validate_fidelity

    validate_fidelity(fidelity, jnp.zeros(()), fidelity_weight)
    fid_kw = dict(fidelity=fidelity, fid_weight=float(fidelity_weight))

    if tau is None:
        tau = default_tau(cfg, global_shape[0], global_shape[1], sigma_A)
    if interpret is None:
        interpret = default_interpret()
    dt_name = jnp.dtype(dtype).name
    if dt_name not in ("float32", "bfloat16"):
        raise ValueError(f"dtype must be float32 or bfloat16, got {dt_name}")
    tmul = t_plane_multiplier(tuple(global_shape), cfg, mask_static,
                              weight_time, dtype=dt_name)
    t_plane = tmul is not None

    ctx = _ShardCtx(mesh, shard_time)
    Nz_g, M_g = global_shape[0], global_shape[1]
    if Nz_g % ctx.nz or M_g % ctx.nt:
        raise ValueError(
            f"global shape {global_shape} not divisible by mesh "
            f"(z={ctx.nz}, t={ctx.nt})"
        )
    local_shape = (Nz_g // ctx.nz, M_g // ctx.nt) + tuple(global_shape[2:])

    # channel table from GLOBAL dims; the kernels get a cfg whose gating
    # reproduces it on the local block (reg flags are global properties)
    chans, _ = scheme_channels(cfg.scheme, Nz_g, M_g, cfg.reg_z_over_reg,
                               cfg.reg_time)
    dual_name = dual_dtype or dt_name
    table_dims = (Nz_g, M_g)
    t_sharded = ctx.nt > 1
    need_z = any(ch.axis == AXIS_Z for ch in chans)

    ghost_z = _axis_ghost_kind(chans, AXIS_Z)
    ghost_t = _axis_ghost_kind(chans, AXIS_T)
    z_name = Z_AXIS if ctx.nz > 1 else None
    t_name = T_AXIS if ctx.nt > 1 else None
    axes = _mesh_axes(ctx)

    t_spec = T_AXIS if ctx.nt > 1 else None
    vol = P(Z_AXIS if ctx.nz > 1 else None, t_spec, None, None)
    dvol_int = P(Z_AXIS if ctx.nz > 1 else None, t_spec, None, None, None)

    # halo/compute overlap (SURVEY.md section 7 hard part 5): eligible when
    # only z is sharded and each shard has interior planes to compute while
    # the boundary-plane ppermute is in flight
    if overlap is None:
        overlap = (ctx.nz > 1 and not t_sharded and local_shape[0] >= 3
                   and need_z)

    if overlap:
        if t_sharded or local_shape[0] < 3 or not need_z:
            raise ValueError(
                "overlap=True requires a z-sharded mesh (t unsharded), z "
                "channels, and >= 3 local z planes"
            )
        from ..kernels.fused import (
            make_cp_dual_boundary_kernel,
            make_cp_primal_boundary_kernel,
        )

        kw = dict(dual_dtype_name=dual_name, table_dims=table_dims,
                  t_plane=t_plane, **fid_kw)
        dual_int = make_cp_dual_kernel(cfg, local_shape, dt_name, sigma_D,
                                       sigma_A, reg, interpret,
                                       interior=True, **kw)
        dual_bnd = make_cp_dual_boundary_kernel(cfg, local_shape, dt_name,
                                                sigma_D, sigma_A, reg,
                                                interpret, **kw)
        primal_int = make_cp_primal_kernel(cfg, local_shape, dt_name, tau,
                                           interpret, interior=True,
                                           nonneg=nonneg, **kw)
        primal_bnd = make_cp_primal_boundary_kernel(cfg, local_shape,
                                                    dt_name, tau, interpret,
                                                    nonneg=nonneg, **kw)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(vol, vol, dvol_int, vol, P(None, None)),
            out_specs=(vol, vol, dvol_int, P()),
            check_vma=False,
        )
        def step(x, y_A, y_D_int, x_noisy, tm):
            # issue the boundary-plane exchange FIRST; the interior kernel
            # has no data dependence on it, so XLA's async collective
            # scheduling can overlap the ppermute with the compute
            x_halo = _halo_planes(x, 0, z_name, ctx.nz, ghost_z)
            y_A, y_D_int, dt_l, l21 = dual_int(x, x_noisy, y_A, y_D_int, tm)
            y_A, y_D_int, dt_l, l21 = dual_bnd(x, x_halo, x_noisy, y_A,
                                               y_D_int, dt_l, l21, tm)
            # same pattern for pass B: the y' exchange overlaps with the
            # interior primal update; only the z-differentiating channels
            # cross z edges, and only toward the side whose D^T stencil
            # reads them (VERDICT r4 item 8 — y halo 134 -> 17 MB at the
            # north star), re-embedded in zero slots for the kernel
            y_halo = _sparse_channel_halo(y_D_int, 0, z_name, ctx.nz,
                                          chans, AXIS_Z)
            x, fid = primal_int(x, x_noisy, y_A, y_D_int, dt_l, tm)
            x, fid = primal_bnd(x, x_noisy, y_A, y_D_int, y_halo, dt_l,
                                fid, tm)
            loss_local = _sum_parts(fid) + reg * _sum_parts(l21)
            loss = lax.psum(loss_local, axes) if axes else loss_local
            return x, y_A, y_D_int, loss
    else:
        dual = make_cp_dual_kernel(cfg, local_shape, dt_name, sigma_D,
                                   sigma_A, reg, interpret,
                                   dual_dtype_name=dual_name, halo_mode=True,
                                   table_dims=table_dims, t_plane=t_plane,
                                   t_sharded=t_sharded, **fid_kw)
        primal = make_cp_primal_kernel(cfg, local_shape, dt_name, tau,
                                       interpret, dual_dtype_name=dual_name,
                                       halo_mode=True, table_dims=table_dims,
                                       t_plane=t_plane, t_sharded=t_sharded,
                                       nonneg=nonneg, **fid_kw)

        def _extend_x(x):
            x = _extend_axis(x, 0, z_name, ctx.nz, ghost_z)
            return _extend_axis(x, 1, t_name, ctx.nt, ghost_t)

        def _extend_y(y):  # (nz, m, Nd, Nr, Nc): zero halos, and only
            # the channels that DIFFERENTIATE along each axis ride the
            # wire (z channels across z, t channels across t — VERDICT
            # r4 item 8); the zero re-embedding keeps the kernel's
            # extended-layout interface unchanged
            hz = _sparse_channel_halo(y, 0, z_name, ctx.nz, chans, AXIS_Z)
            y = jnp.concatenate([hz[0:1], y, hz[1:2]], axis=0)
            ht = _sparse_channel_halo(y, 1, t_name, ctx.nt, chans, AXIS_T)
            return jnp.concatenate([ht[:, 0:1], y, ht[:, 1:2]], axis=1)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(vol, vol, dvol_int, vol, P(None, None)),
            out_specs=(vol, vol, dvol_int, P()),
            check_vma=False,
        )
        def step(x, y_A, y_D_int, x_noisy, tm):
            x_ext = _extend_x(x)
            y_A, y_D_int, dt_local, l21_parts = dual(x_ext, x_noisy, y_A,
                                                     y_D_int, tm)
            y_ext = _extend_y(y_D_int)
            x, fid_parts = primal(x, x_noisy, y_A, y_D_int, y_ext, dt_local,
                                  tm)
            loss_local = _sum_parts(fid_parts) + reg * _sum_parts(l21_parts)
            loss = lax.psum(loss_local, axes) if axes else loss_local
            return x, y_A, y_D_int, loss

    if not t_plane:
        # keep a 2-arg replicated dummy so the shard_map signature is static
        tmul = jnp.zeros((1, 1), jnp.float32)

    @jax.jit
    def solve(x_noisy, x, y_A, y_D_int):
        def body(carry, _):
            x, y_A, y_D_int = carry
            x, y_A, y_D_int, loss = step(x, y_A, y_D_int, x_noisy, tmul)
            return (x, y_A, y_D_int), loss

        (x, y_A, y_D_int), losses = lax.scan(
            body, (x, y_A, y_D_int), length=n_iter
        )
        return x, y_A, y_D_int, losses

    return solve


def internal_d_sharding(mesh: Mesh, shard_time: bool = True):
    """NamedSharding for the internal-layout (Nz, M, Nd, Nr, Nc) dual."""
    from jax.sharding import NamedSharding

    t_spec = T_AXIS if (shard_time and mesh.shape[T_AXIS] > 1) else None
    return NamedSharding(
        mesh, P(Z_AXIS if mesh.shape[Z_AXIS] > 1 else None, t_spec,
                None, None, None)
    )


def _extend_axis2(x, axis, axis_name, n, ghost_kind):
    """Two-plane halo + ghosts along ``axis`` (for the G pass, which
    recomputes D channels at +-1 neighbor planes and therefore reads x at
    +-2).  Ghosts are chosen so every D channel at a globally-invalid slot
    evaluates to exactly zero:

    - 'edge' (fwd/bwd schemes): clamp padding — ghost(-1)=ghost(-2)=x[0];
    - 'reflect' (central): ghost(-1)=x[1], ghost(-2)=x[0] (and mirrored on
      the high side), the unique choice with d_ctr(-1)=d_ctr(0)=0.

    Handles 1-plane shards (the second halo comes from two ring hops, and
    mirror ghosts from the opposite-direction halo).
    """
    nd = x.ndim
    L = x.shape[axis]

    def first(arr):
        return arr[_sl(nd, axis, 0, 1)]

    def last(arr):
        return arr[_sl(nd, axis, -1, None)]

    if axis_name is None or n == 1:
        if ghost_kind == "edge" or L == 1:
            lo1 = lo2 = first(x)
            hi1 = hi2 = last(x)
        else:
            lo1 = x[_sl(nd, axis, 1, 2)]
            lo2 = first(x)
            hi1 = x[_sl(nd, axis, -2, -1)]
            hi2 = last(x)
        return jnp.concatenate([lo2, lo1, x, hi1, hi2], axis=axis)

    idx = lax.axis_index(axis_name)
    h1l = _plane_from_left(x, axis, axis_name, n)
    h1r = _plane_from_right(x, axis, axis_name, n)
    if L >= 2:
        h2l = lax.ppermute(x[_sl(nd, axis, -2, -1)], axis_name,
                           [(i, i + 1) for i in range(n - 1)])
        h2r = lax.ppermute(x[_sl(nd, axis, 1, 2)], axis_name,
                           [(i + 1, i) for i in range(n - 1)])
    else:
        h2l = _plane_from_left(h1l, axis, axis_name, n)
        h2r = _plane_from_right(h1r, axis, axis_name, n)

    if ghost_kind == "edge":
        g_lo1, g_hi1 = first(x), last(x)
        g_lo2_first, g_hi2_last = first(x), last(x)
        g_lo2_second, g_hi2_secondlast = h1l, h1r  # = global edge plane
    else:  # reflect
        g_lo1 = x[_sl(nd, axis, 1, 2)] if L >= 2 else h1r
        g_hi1 = x[_sl(nd, axis, -2, -1)] if L >= 2 else h1l
        g_lo2_first, g_hi2_last = first(x), last(x)
        # the shard whose 2-back plane is global -1 needs mirror(-1) =
        # x_global[1], which with a 1-plane shard is its OWN plane
        g_lo2_second, g_hi2_secondlast = first(x), last(x)

    lo1 = jnp.where(idx == 0, g_lo1, h1l)
    hi1 = jnp.where(idx == n - 1, g_hi1, h1r)
    if L == 1:
        lo2 = jnp.where(idx == 0, g_lo2_first,
                        jnp.where(idx == 1, g_lo2_second, h2l))
        hi2 = jnp.where(idx == n - 1, g_hi2_last,
                        jnp.where(idx == n - 2, g_hi2_secondlast, h2r))
    else:
        lo2 = jnp.where(idx == 0, g_lo2_first, h2l)
        hi2 = jnp.where(idx == n - 1, g_hi2_last, h2r)
    return jnp.concatenate([lo2, lo1, x, hi1, hi2], axis=axis)


def make_sharded_gd_solver_fused(
    mesh: Mesh,
    cfg: TVConfig,
    global_shape,
    *,
    reg,
    n_iter,
    step_size=5e-3,
    shard_time: bool = True,
    dtype="float32",
    interpret: bool = None,
    mask_static=None,
    weight_time=None,
):
    """jit(lax.scan(fused subgradient-descent step under shard_map)): the
    fused tv-norms and subgradient kernels per shard, ghost-plane halos
    (1-deep for the norms pass, 2-deep for the G pass), psum for the loss.
    Supports all three TV norms (iso L2,1, aniso L1,1 and Huber-smoothed)
    and plane-shaped static masks / weight_time, like the unsharded fused
    path, and bf16 primary storage (``dtype='bfloat16'``; compute stays
    f32 in-kernel).
    ``solve(x_noisy, x) -> (x, losses)``; inputs sharded with
    ``parallel.mesh.shard_volume``, in ``dtype``."""
    from ..kernels.dispatch import default_interpret, t_plane_multiplier
    from ..kernels.fused import make_tv_norms_kernel, make_tv_subgrad_kernel

    if interpret is None:
        interpret = default_interpret()
    if cfg.norm not in ("iso", "aniso", "huber"):
        raise ValueError(
            f"the fused kernels support norm='iso'/'aniso'/'huber', got "
            f"{cfg.norm!r}"
        )
    dt_name = jnp.dtype(dtype).name
    if dt_name not in ("float32", "bfloat16"):
        raise ValueError(f"dtype must be float32 or bfloat16, got {dt_name}")
    aniso = cfg.norm == "aniso"
    tmul = t_plane_multiplier(tuple(global_shape), cfg, mask_static,
                              weight_time, dtype=dt_name)
    t_plane = tmul is not None

    ctx = _ShardCtx(mesh, shard_time)
    Nz_g, M_g = global_shape[0], global_shape[1]
    if Nz_g % ctx.nz or M_g % ctx.nt:
        raise ValueError(
            f"global shape {global_shape} not divisible by mesh "
            f"(z={ctx.nz}, t={ctx.nt})"
        )
    local_shape = (Nz_g // ctx.nz, M_g // ctx.nt) + tuple(global_shape[2:])
    table_dims = (Nz_g, M_g)
    chans, _ = scheme_channels(cfg.scheme, Nz_g, M_g, cfg.reg_z_over_reg,
                               cfg.reg_time)

    norms_k = make_tv_norms_kernel(cfg, local_shape, dt_name, interpret,
                                   halo_mode=True, table_dims=table_dims,
                                   t_plane=t_plane)
    sub_k = make_tv_subgrad_kernel(cfg, local_shape, dt_name, interpret,
                                   halo_mode=True, table_dims=table_dims,
                                   t_plane=t_plane)

    ghost_z = _axis_ghost_kind(chans, AXIS_Z)
    ghost_t = _axis_ghost_kind(chans, AXIS_T)
    z_name = Z_AXIS if ctx.nz > 1 else None
    t_name = T_AXIS if ctx.nt > 1 else None
    axes = _mesh_axes(ctx)
    t_spec = T_AXIS if ctx.nt > 1 else None
    vol = P(Z_AXIS if ctx.nz > 1 else None, t_spec, None, None)

    def _ext1_x(x):
        x1 = _extend_axis(x, 0, z_name, ctx.nz, ghost_z)
        return _extend_axis(x1, 1, t_name, ctx.nt, ghost_t)

    def _ext2_x(x):
        x2 = _extend_axis2(x, 0, z_name, ctx.nz, ghost_z)
        return _extend_axis2(x2, 1, t_name, ctx.nt, ghost_t)

    def _ext1_norms(norms):
        # safe-divisor ghosts: the numerators at ghost planes are zero by
        # x-ghost construction, so any finite nonzero divisor works
        n1 = _extend_axis(norms, 0, z_name, ctx.nz, "zero")
        n1 = n1.at[_sl(4, 0, 0, 1)].set(
            jnp.where(n1[_sl(4, 0, 0, 1)] == 0, 1.0, n1[_sl(4, 0, 0, 1)]))
        n1 = n1.at[_sl(4, 0, -1, None)].set(
            jnp.where(n1[_sl(4, 0, -1, None)] == 0, 1.0,
                      n1[_sl(4, 0, -1, None)]))
        n1 = _extend_axis(n1, 1, t_name, ctx.nt, "zero")
        n1 = n1.at[_sl(4, 1, 0, 1)].set(
            jnp.where(n1[_sl(4, 1, 0, 1)] == 0, 1.0, n1[_sl(4, 1, 0, 1)]))
        n1 = n1.at[_sl(4, 1, -1, None)].set(
            jnp.where(n1[_sl(4, 1, -1, None)] == 0, 1.0,
                      n1[_sl(4, 1, -1, None)]))
        return n1

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(vol, vol, P(None, None)),
        out_specs=(vol, P()), check_vma=False,
    )
    def step(x, x_noisy, tm):
        norms, tv_parts = norms_k(_ext1_x(x), tm)
        tv = _sum_parts(tv_parts)
        if axes:
            tv = lax.psum(tv, axes)
        # aniso G never divides by norms (sign-based subgradient)
        G = sub_k(_ext2_x(x), None if aniso else _ext1_norms(norms), tm)
        x_new = x - step_size * ((x - x_noisy) + reg * G)
        fid = 0.5 * jnp.sum(jnp.square(x_new - x_noisy))
        if axes:
            fid = lax.psum(fid, axes)
        return x_new, fid + reg * tv

    if not t_plane:
        tmul = jnp.zeros((1, 1), jnp.float32)  # static-signature dummy

    @jax.jit
    def solve(x_noisy, x):
        def body(x, _):
            x, loss = step(x, x_noisy, tmul)
            return x, loss

        x, losses = lax.scan(body, x, length=n_iter)
        return x, losses

    return solve
