"""Gather-free parallel-beam projector: the Fourier-slice theorem on a
linogram frequency grid, evaluated with FFTs and complex MATMULS only.

Why this exists: the bilinear-sampling :func:`..models.ct.radon` builds
giant ``map_coordinates`` gather programs whose HLO reproducibly CRASHED
the TPU worker at production sizes ((16,4,512,512) x 96 angles; even
(8,4,256,256) x 64 once wedged the compile service — see CLAUDE.md).  The
reference library exists to regularize iterative CT at exactly those sizes
(``/root/reference/README.md:2,235-250``), so the production path must not
contain a single gather.  This projector's HLO is FFT + elementwise
transcendentals + batched complex matmuls — the three op classes the TPU
is built for — and ``tests/test_ct_spectral.py`` asserts the lowered module
contains NO gather/scatter at all (forward and adjoint).

Math.  Treat the volume slice as point masses at pixel centers,
``f = sum_{r,c} img[r,c] delta(x - x_r, y - y_c)`` with centered
coordinates ``x_r = r - c0``, ``y_c = c - c0``, ``c0 = (N-1)/2``.  A
detector cell at coordinate ``s`` integrates f along the line
``(c0 + s cos t + u sin t, c0 - s sin t + u cos t)`` — the same
parametrization as the gather radon (``models/ct.py::_slice_radon``), so a
mass at (r, c) projects to ``s_rc = x_r cos t - y_c sin t`` and the
projection's Fourier transform is the image transform along a line
(Fourier-slice): ``p_hat(w) = f_hat(w cos t, -w sin t)``.

The linogram trick makes this exact and matmul-shaped: put ONE frequency
component on the padded DFT grid and evaluate the other by a non-uniform
DFT over the remaining axis — a dense contraction:

- near-vertical rays (|sin t| >= |cos t|): column FFT once (all angles),
  then ``G[t,k] = sum_r F_c[r,k] * exp(+2i pi k cot(t) x_r / Np)`` — a
  per-angle (r x k) matmul;
- near-horizontal rays: row FFT once, then the mirrored contraction over
  columns.

Both are EXACT evaluations of ``f_hat`` at the slice frequencies (the
padded FFT is exact at its grid points; the NUDFT sum is finite and
exact), so the only discretization is the detector synthesis
``p[s_j] = dw/(2 pi) sum_k G[t,k] e^{i w_k s_j}`` (another matmul), which
periodizes p with period ``Np * max(|sin t|, |cos t|) >= sqrt(2) N`` —
no wrap-around for objects inside the inscribed disk with ``Np = 2N``.
Accuracy is spectral (trig interpolation) rather than the gather radon's
bilinear O(h^2): against analytic Gaussian line integrals this projector
is ~100x closer than the gather path at N=128 (test_ct_spectral).

Notes:
- ``angles`` must be CONCRETE (host values): the regime split and phase
  tables are built at trace time.  All solver flows satisfy this (the
  geometry is fixed per reconstruction).
- The adjoint (``jax.vjp`` of a linear map == exact transpose) is FFT +
  matmuls too — no scatter.
- Spectral splat kernels ring slightly (Gibbs) so individual operator
  coefficients CAN be negative, but for ``n_det ~ N`` the dips land
  outside the detector extent and ``A(ones)`` stays strictly positive —
  ``precond=True`` passes its nonnegative-row gate and converges
  (test_spectral_precond_reconstruction).  Detectors much wider than the
  projection support may expose the ringing and trip the gate; fall back
  to the power-method/``op_norm`` step rule there.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_SPECTRAL_TABLE_BUDGET = 256 * 1024 * 1024  # bytes of in-flight phase table
# make_spectral_projector precomputes the full NUDFT tables once (device-
# resident constants) when they fit this budget: rebuilding them costs
# ~60 M complex exps PER APPLICATION at production scale, and XLA does not
# reliably hoist the rebuild out of a solver's lax.scan once the program
# is under memory pressure (measured: the (16,4,512,512)x96 cp_reconstruct
# iteration spent ~85 % of its time in table transcendentals)
_SPECTRAL_EAGER_TABLE_BUDGET = 512 * 1024 * 1024


def _concrete_angles(angles):
    try:
        return np.asarray(angles, dtype=np.float64)
    except Exception as e:  # jax tracer, etc.
        raise ValueError(
            "radon_spectral needs concrete (host) angle values — the "
            "regime split and NUDFT phase tables are built at trace time. "
            "Close over the angles (make_projector does) instead of "
            "passing them as a traced argument"
        ) from e


_DFT_MODE = "auto"
# how _bucket_projection computes the padded half-spectrum F:
#   "fft"    — jnp.fft.rfft.  Exact, but XLA's TPU FFT is SLOW: measured
#              ~4 ms marginal per (64, 512)-batch 1024-point rfft on one
#              v5e — 4 rffts per A/A^T pair made the FFT ~16 ms of the
#              ~24 ms production pair (the matmul stages are <1 ms each).
#   "matmul" — one planar dot with an exact-phase DFT table
#              (phase = -2*pi*((c*k) mod Np)/Np computed in INTEGER
#              arithmetic, so table entries are exact to one rounding of
#              cos/sin) — the MXU-native form; agrees with the rfft to
#              f32 round-off (measured 5.7e-8 rel at precision='highest').
#   "auto"   — "matmul" on accelerator backends, "fft" on CPU (where the
#              FFT is asymptotically faster and the f64 golden paths live).


def _dft_mode() -> str:
    if _DFT_MODE != "auto":
        return _DFT_MODE
    return "fft" if jax.default_backend() == "cpu" else "matmul"


def _dft_tables(N: int, Np: int, real_dt):
    """Planar rfft-equivalent DFT tables ``(Wr, Wi)`` of shape ``(N, K)``,
    ``K = Np//2 + 1``: ``F[..., x, k] = sum_c img[..., x, c] W[c, k]``
    with ``W = exp(-2i pi c k / Np)``.  The phase is reduced mod ``Np`` in
    integer arithmetic first, so the table is exact to one cos/sin
    rounding even where ``c*k`` reaches ~2.6e5 (f32 of the raw product
    would carry ~1e-2 rad of error there)."""
    c = jnp.arange(N, dtype=jnp.int32)
    k = jnp.arange(Np // 2 + 1, dtype=jnp.int32)
    m = (c[:, None] * k[None, :]) % Np
    ph = (-2.0 * jnp.pi / Np) * m.astype(real_dt)
    return jnp.cos(ph), jnp.sin(ph)


def _planar_dft(vol, vertical: bool, Np: int, precision):
    """Half-spectrum of the zero-padded DFT along the contraction axis
    (columns when ``vertical`` else rows) as a STACKED planar pair
    ``Fs[(re, im), ..., x, k]`` — a single MXU dot per component instead
    of XLA's slow TPU FFT (see ``_DFT_MODE``)."""
    real_dt = vol.dtype
    Wr, Wi = _dft_tables(vol.shape[-1], Np, real_dt)
    if vertical:
        # F[..., r, k] = sum_c img[..., r, c] W[c, k]
        Fr = jnp.einsum("...rc,ck->...rk", vol, Wr, precision=precision)
        Fi = jnp.einsum("...rc,ck->...rk", vol, Wi, precision=precision)
    else:
        # F[..., c, k] = sum_r img[..., r, c] W[r, k]
        Fr = jnp.einsum("...rc,rk->...ck", vol, Wr, precision=precision)
        Fi = jnp.einsum("...rc,rk->...ck", vol, Wi, precision=precision)
    return jnp.stack([Fr, Fi])


def _chunk_tables(ang, vertical: bool, N: int, Np: int, n_det: int,
                  real_dt, det_spacing: float = 1.0):
    """NUDFT phase tables for one angle set, stored PLANAR as real/imag
    pairs ``(Pr, Pi, Er, Ei)``: ``P[a, r, k]`` is the slice NUDFT,
    ``E[a, k, s]`` the detector synthesis with the regime scale AND the
    FFT centering phase ``e^{+2i pi k c0 / Np}`` folded in (both are
    k-separable, so folding them here removes a full-F-sized complex
    elementwise pass per application).  Pure functions of the geometry —
    input-independent, so they can be built once per projector
    (``make_spectral_projector``) instead of per application.  Planar
    storage is what the MXU wants (real f32 matmuls, see
    ``_planar_apply``) and is also what the tunneled host<->device
    boundary requires (complex arrays cannot cross it)."""
    c0 = (N - 1) / 2.0
    k = jnp.arange(Np // 2 + 1, dtype=real_dt)
    wk = jnp.where((k == 0) | (k == Np // 2), 1.0, 2.0).astype(real_dt)
    s_j = (jnp.arange(n_det, dtype=real_dt) - (n_det - 1) / 2.0) \
        * jnp.asarray(det_spacing, real_dt)
    x = jnp.arange(N, dtype=real_dt) - c0
    th = jnp.asarray(ang).astype(real_dt)
    sin, cos = jnp.sin(th), jnp.cos(th)
    if vertical:
        # slice frequency v_k = 2 pi k / Np on the grid,
        # u_k = -2 pi k cot(t) / Np via the row NUDFT;
        # w_k = -2 pi k / (Np sin t)
        slope, denom, det_sign = cos / sin, sin, -1.0
    else:
        # u_k on the grid, v_k = -2 pi k tan(t)/Np via the col NUDFT
        # (e^{-i v_k y_c} = e^{+2i pi k tan(t) y_c / Np});
        # w_k = +2 pi k / (Np cos t)
        slope, denom, det_sign = sin / cos, cos, 1.0
    # P[a, r, k] = e^{-i u_k x_r} (vertical) / e^{-i v_k y_c} (horiz.)
    phase = ((2.0 * jnp.pi / Np) * slope[:, None, None]
             * x[None, :, None] * k[None, None, :]).astype(real_dt)
    Pr, Pi = jnp.cos(phase), jnp.sin(phase)
    # detector synthesis p[s_j] = 1/(Np |denom|) sum_k G e^{i w_k s_j},
    # plus the centering phase e^{+2i pi k c0 / Np} of the padded FFT
    dphase = ((det_sign * 2.0 * jnp.pi / Np)
              * (k[None, :, None] / denom[:, None, None])
              * s_j[None, None, :]
              + (2.0 * jnp.pi * c0 / Np) * k[None, :, None]).astype(real_dt)
    scale = (wk[None, :, None] / (Np * jnp.abs(denom))[:, None, None]
             ).astype(real_dt)
    return Pr, Pi, jnp.cos(dphase) * scale, jnp.sin(dphase) * scale


def _planar_apply(Fs, tables, out_dt, precision):
    """Apply one regime bucket's NUDFT pair to the STACKED planar padded
    spectrum ``Fs[(re, im), ..., r, k]`` as REAL f32/f64 matmuls only —
    the MXU-native layout (a complex64 einsum lowers to four float32
    dot_generals with interleaved-layout transposes; planar data skips
    that and lets the second stage exploit that only the REAL part of the
    synthesis is needed).

    Stage 1 computes all four cross products ``{Fr,Fi} x {Pr,Pi}`` in ONE
    k-batched dot_general by stacking the re/im planes into the matmul's M
    and N dimensions (M doubles to 2*B4 — a full 128-row MXU tile at
    production batch 64): ``prod[i,j,...,a,k] = sum_r Fs[i,...,r,k]
    Ps[j,a,r,k]``.  Stage 2 takes the real part of the detector synthesis
    as a single matmul contracting over the stacked (re/im, k) axis:
    ``Re(G E) = Gr Er - Gi Ei = [Gr, Gi] . [Er; -Ei]``."""
    Pr, Pi, Er, Ei = tables
    Ps = jnp.stack([Pr, Pi])                          # (2, a, r, k)
    prod = jnp.einsum("i...rk,jark->ij...ak", Fs, Ps,
                      precision=precision)
    Gs = jnp.stack([prod[0, 0] - prod[1, 1],          # Gr
                    prod[0, 1] + prod[1, 0]], axis=-2)  # Gi -> (...,a,2,k)
    Es = jnp.stack([Er, -Ei], axis=1)                 # (a, 2, k, s)
    out = jnp.einsum("...ajk,ajks->...as", Gs, Es, precision=precision)
    return out.astype(out_dt)


def _bucket_projection(vol, ang_b, vertical: bool, n_det: int, Np: int,
                       angle_chunk: int, det_spacing: float = 1.0,
                       tables=None, precision=None):
    """Project one regime bucket.  ``vol`` is (B4.., N, N) real; ``ang_b``
    a 1-D CONCRETE angle array, all satisfying |sin| >= |cos| when
    ``vertical`` else |cos| > |sin|.  Returns (..., len(ang_b), n_det).
    ``tables``: optional precomputed planar ``(Pr, Pi, Er, Ei)`` for the
    WHOLE bucket (skips the per-chunk table rebuild and the chunk loop)."""
    N = vol.shape[-1]
    # compute in f32 minimum: phases reach ~1e3 radians at production N,
    # where bf16's 8e-3 relative eps would be whole radians of error —
    # low-precision STORAGE volumes still get full-precision projections
    real_dt = (jnp.float64 if vol.dtype == jnp.float64
               else jnp.float32)
    out_dt = vol.dtype
    if jnp.dtype(vol.dtype).itemsize < 4:
        vol = vol.astype(real_dt)
    # HALF spectrum: the volume is real, so G(-k) = conj(G(k)) and the
    # (real) detector synthesis folds to k = 0..Np/2 with weight 2 on the
    # interior bins — both NUDFT matmuls and the phase tables halve.
    if _dft_mode() == "matmul":
        # planar DFT matmul (MXU): XLA's TPU FFT measured ~4 ms marginal
        # per production-batch rfft vs <0.5 ms for this dot (_DFT_MODE)
        Fs = _planar_dft(vol, vertical, Np, precision)
    elif vertical:
        # column FFT once: F[..., r, k] = sum_c img[..,r,c] e^{-2i pi kc/Np}
        F = jnp.fft.rfft(vol, n=Np, axis=-1)
        Fs = jnp.stack([jnp.real(F), jnp.imag(F)])
    else:
        # row FFT once; move the k axis last: F[..., c, k]
        F = jnp.moveaxis(jnp.fft.rfft(vol, n=Np, axis=-2), -2, -1)
        Fs = jnp.stack([jnp.real(F), jnp.imag(F)])
    # (the centering phase e^{+2i pi k c0 / Np} is folded into the E
    # tables — k-separable, so it commutes with the r-contraction)

    if tables is not None:
        return _planar_apply(Fs, tables, out_dt, precision)

    def chunk_fn(ang):
        t = _chunk_tables(ang, vertical, N, Np, n_det, real_dt,
                          det_spacing)
        return _planar_apply(Fs, t, out_dt, precision)

    A = ang_b.shape[0]
    B = min(angle_chunk, A)
    ang_j = jnp.asarray(ang_b, real_dt)
    if B >= A:
        return chunk_fn(ang_j)
    pad = (-A) % B
    if pad:
        ang_j = jnp.concatenate([ang_j, ang_j[:pad]])
    chunks = ang_j.reshape(-1, B)
    out = jax.lax.map(chunk_fn, chunks)          # (C, ..., B, n_det)
    out = jnp.moveaxis(out, 0, -3)               # (..., C, B, n_det)
    out = out.reshape(out.shape[:-3] + (-1, n_det))
    return out[..., :A, :]


def _auto_chunk(N: int, Np: int, n_det: int, itemsize: int) -> int:
    per_angle = (N * Np + Np * n_det) * itemsize  # P + E tables (half-k)
    return max(1, _SPECTRAL_TABLE_BUDGET // max(per_angle, 1))


def _regime_split(ang: np.ndarray):
    """Static vertical/horizontal regime split of a concrete angle set."""
    vert = np.abs(np.sin(ang)) >= np.abs(np.cos(ang))
    return np.nonzero(vert)[0], np.nonzero(~vert)[0]


def _spectral_tables_shared(ang: np.ndarray, N: int, n_det: int, real_dt,
                            det_spacing: float = 1.0):
    """Precomputed per-regime NUDFT tables for one concrete angle set:
    ``{True: (Pr, Pi, Er, Ei) | None, False: ...}`` keyed by the regime,
    aligned with :func:`_regime_split` exactly as
    ``_radon_spectral_shared`` consumes them.  Stored as real/imag float
    pairs (see ``_chunk_tables``); call under jit — eager transcendental
    table builds are slow on some TPU backends."""
    Np = 2 * N
    idx_v, idx_h = _regime_split(ang)

    def split(vertical, idx):
        if not idx.size:
            return None
        return _chunk_tables(ang[idx], vertical, N, Np, n_det, real_dt,
                             det_spacing)

    return {True: split(True, idx_v), False: split(False, idx_h)}


def _radon_spectral_shared(vol, ang: np.ndarray, n_det: int,
                           angle_chunk: Optional[int],
                           det_spacing: float = 1.0, tables=None,
                           precision=None):
    """Shared-angle path: ``vol`` (..., N, N), ``ang`` concrete (A,).
    ``tables``: optional precomputed per-regime tables
    (:func:`_spectral_tables_shared`)."""
    N = vol.shape[-1]
    Np = 2 * N
    precision = precision or _DEFAULT_PRECISION
    if angle_chunk is None:
        angle_chunk = _auto_chunk(N, Np, n_det,
                                  jnp.dtype(vol.dtype).itemsize * 2)
    idx_v, idx_h = _regime_split(ang)
    parts = []
    if idx_v.size:
        parts.append(_bucket_projection(
            vol, ang[idx_v], True, n_det, Np, angle_chunk, det_spacing,
            tables=tables[True] if tables else None, precision=precision))
    if idx_h.size:
        parts.append(_bucket_projection(
            vol, ang[idx_h], False, n_det, Np, angle_chunk, det_spacing,
            tables=tables[False] if tables else None, precision=precision))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-2)
    order = np.concatenate([idx_v, idx_h])
    if not np.array_equal(order, np.arange(ang.shape[0])):
        # static un-permutation as a concat of unit slices — jnp.take here
        # would reintroduce a gather into the otherwise gather-free program
        inv = np.argsort(order)
        out = jnp.concatenate(
            [out[..., int(i):int(i) + 1, :] for i in inv], axis=-2)
    return out


_DEFAULT_PRECISION = "high"
# matmul precision of the DFT + NUDFT contractions, measured on one v5e at
# production scale (16,4,512,512) x 96 with the matmul DFT:
#   "default"  A+A^T pair  5.0 ms — single-pass bf16 MXU, ~1e-3 relative
#              (the same error ORDER as the gather path's bilinear
#              interpolation; fine for reconstruction)
#   "high"     pair  9.9 ms — 3-pass bf16 emulation, ~5e-6 relative:
#              keeps the spectral path's ~100x accuracy edge over the
#              gather projector at 2/3 the "highest" cost — the default
#   "highest"  pair 13.7 ms — 6-pass, ~1e-7 relative (parity-grade)
# Pass precision= to radon_spectral/make_spectral_projector to override.


def radon_spectral(vol, angles, n_det: Optional[int] = None,
                   angle_chunk: Optional[int] = None, _tables=None,
                   precision: Optional[str] = None):
    """Gather-free forward projection of a ``(Nz, M, N, N)`` volume.

    Drop-in for :func:`..models.ct.radon` (same layouts: ``angles`` is
    ``(n_angles,)`` shared or ``(M, n_angles)`` per-frame, returns
    ``(Nz, M, n_angles, n_det)``) with spectral accuracy instead of
    bilinear O(h^2) and no gather in the compiled program.  ``angles``
    must be concrete host values; ``angle_chunk`` bounds the in-flight
    NUDFT table (default: auto for ~256 MB).

    Differences from the gather radon (both are discretizations of the
    same continuous transform; they agree to the gather path's O(h^2)
    interpolation error on smooth objects inside the inscribed disk):

    - integrates FULL lines — the gather radon truncates each ray to N
      samples around its closest approach, clipping corner mass at
      oblique angles;
    - spectral splat kernels ring slightly (Gibbs), so projections of a
      nonnegative image can dip slightly negative just outside the
      object's support (harmless for the primal-dual solvers; for
      ``n_det ~ N`` the ``precond=True`` nonnegative-row gate still
      passes because the dips land outside the detector).
    """
    vol = jnp.asarray(vol)
    if vol.ndim != 4:
        raise ValueError(
            f"radon_spectral expects a rank-4 (Nz, M, N, N) volume, got "
            f"shape {tuple(vol.shape)}"
        )
    N = vol.shape[-1]
    if vol.shape[-2] != N:
        raise ValueError(
            f"radon_spectral supports square in-plane volumes, got "
            f"{vol.shape[-2]} x {N}"
        )
    n_det = n_det or N
    ang = _concrete_angles(angles)
    precision = precision or _DEFAULT_PRECISION
    if ang.ndim == 1:
        return _radon_spectral_shared(vol, ang, n_det, angle_chunk,
                                      tables=_tables, precision=precision)
    if ang.ndim != 2 or ang.shape[0] != vol.shape[1]:
        raise ValueError(
            f"angles must be (n_angles,) shared or (M={vol.shape[1]}, "
            f"n_angles) per-frame, got shape {ang.shape}"
        )
    # per-frame angle sets: each frame has its own (static) regime split
    frames = [
        _radon_spectral_shared(
            vol[:, m], ang[m], n_det, angle_chunk,
            tables=_tables[m] if _tables else None, precision=precision)
        for m in range(ang.shape[0])
    ]
    return jnp.stack(frames, axis=1)


def make_spectral_projector(vol_shape, angles, n_det: Optional[int] = None,
                            dtype=jnp.float32,
                            angle_chunk: Optional[int] = None,
                            precompute_tables: Optional[bool] = None,
                            precision: Optional[str] = None):
    """``(A, A_T)`` for a fixed parallel-beam geometry on the spectral
    path; ``A_T`` is the exact transpose (vjp of the linear map — FFTs and
    matmuls only, no scatter), same adjointness contract as
    :func:`..models.ct.make_projector`.

    ``precompute_tables`` (default: auto when they fit
    ``_SPECTRAL_EAGER_TABLE_BUDGET``): attach a ``prepare()/apply(consts,
    x)`` protocol to ``A`` that lets solvers build the NUDFT phase tables
    ONCE per solve and thread them through the iteration as traced,
    loop-invariant arguments — inside a solver's ``lax.scan`` the lazy
    rebuild (~60 M complex exps per application at production scale)
    otherwise dominates the iteration, because XLA declines to hoist it
    under memory pressure.  The plain ``A(x)`` call always stays lazy
    (safe to jit: embedded tables blow the remote-compile payload limit).
    Set ``False`` to disable the protocol entirely."""
    ang = _concrete_angles(angles)
    n_det = n_det or vol_shape[-1]
    N = vol_shape[-1]
    real_dt = (jnp.float64 if jnp.dtype(dtype) == jnp.float64
               else jnp.float32)
    K = N + 1  # Np // 2 + 1 with Np = 2N
    table_bytes = ang.size * (N * K + K * n_det) * (
        16 if real_dt == jnp.float64 else 8)
    if precompute_tables is None:
        precompute_tables = table_bytes <= _SPECTRAL_EAGER_TABLE_BUDGET
    def A(x):
        # the PLAIN closure stays lazy (tables rebuilt in-trace): safe to
        # jit anywhere — embedding precomputed tables as HLO constants
        # blows the remote-compile payload limit at production scale
        # (measured: HTTP 413 at ~400 MB of tables)
        return radon_spectral(x, ang, n_det=n_det, angle_chunk=angle_chunk,
                              precision=precision)

    def A_T(y):
        _, vjp = jax.vjp(A, jnp.zeros(tuple(vol_shape), dtype))
        (x_bar,) = vjp(y)
        return x_bar

    if precompute_tables:
        # prepare()/apply(consts, x) protocol: solvers thread the tables
        # as TRACED runtime arguments — built once per solve, hoisted out
        # of the iteration scan by construction (XLA's own loop-invariant
        # motion declines under memory pressure: measured 1.9 it/s with
        # the per-application rebuild vs the projector's isolated 46 ms).
        # prepare() runs under jit (eager complex exp is UNIMPLEMENTED on
        # some TPU backends) and returns real/imag f32 pairs (complex
        # cannot cross the tunnel's host<->device boundary).
        if ang.ndim == 1:
            build = jax.jit(lambda: _spectral_tables_shared(
                ang, N, n_det, real_dt))
        else:
            build = jax.jit(lambda: [
                _spectral_tables_shared(ang[m], N, n_det, real_dt)
                for m in range(ang.shape[0])])

        cache = []

        def prepare():
            # memoized: repeated solves with the same projector reuse the
            # device-resident tables (they live as long as this A does)
            if not cache:
                cache.append(build())
            return cache[0]

        def apply(consts, x):
            return radon_spectral(x, ang, n_det=n_det,
                                  angle_chunk=angle_chunk, _tables=consts,
                                  precision=precision)

        A.prepare, A.apply = prepare, apply

    return A, A_T


def radon_fan_spectral(vol, angles, geom, n_det: Optional[int] = None,
                       angle_chunk: Optional[int] = None,
                       oversample: float = 2.0,
                       precision: Optional[str] = None):
    """Fan-beam forward projection via fan-to-parallel REBINNING on the
    spectral projector: a fan ray (source angle ``beta``, flat-detector
    coordinate ``u``) IS the parallel ray at

        theta = beta + gamma,   s = D_so sin(gamma),
        gamma = atan(u / (D_so + D_od)),

    so we evaluate a dense parallel sinogram spectrally (gather-free) and
    bilinearly resample it at the fan coordinates — the only gather in
    the program acts on the SINOGRAM (A x n_s elements, ~100x smaller
    than the volume-sized bilinear gathers that crashed TPU workers; the
    classical rebinning construction, e.g. Kak & Slaney 1988 ch. 3.4.2).

    Drop-in for :func:`..ct.radon_fan` on the same ``FanBeamGeometry``
    (values agree to the combined rebinning-interpolation + gather-path
    O(h^2) error on smooth objects, ~1e-3 relative); exact adjoint via
    ``jax.vjp`` as usual.  ``angles`` must be concrete; ``(n_angles,)``
    shared or ``(M, n_angles)`` per-frame.  ``oversample`` controls the
    dense grid density in BOTH theta (relative to the fan's angular step)
    and s (relative to unit pitch).
    """
    vol = jnp.asarray(vol)
    if vol.ndim != 4 or vol.shape[-2] != vol.shape[-1]:
        raise ValueError(
            f"radon_fan_spectral expects a square-plane rank-4 volume, got "
            f"{tuple(vol.shape)}"
        )
    N = vol.shape[-1]
    n_det = n_det or N
    ang = _concrete_angles(angles)
    if ang.ndim == 2:
        if ang.shape[0] != vol.shape[1]:
            raise ValueError(
                f"per-frame angles must be (M={vol.shape[1]}, n_angles), "
                f"got {ang.shape}"
            )
        frames = [
            radon_fan_spectral(vol[:, m:m + 1], ang[m], geom, n_det=n_det,
                               angle_chunk=angle_chunk,
                               oversample=oversample,
                               precision=precision)[:, 0]
            for m in range(ang.shape[0])
        ]
        return jnp.stack(frames, axis=1)

    D_so = float(geom.source_dist)
    L = D_so + float(geom.det_dist)
    pitch = float(geom.spacing())
    u = (np.arange(n_det) - (n_det - 1) / 2.0) * pitch
    gamma = np.arctan2(u, L)                      # (n_det,)
    theta_q = ang[:, None] + gamma[None, :]       # (A, n_det)
    s_q = D_so * np.sin(gamma)                    # (n_det,)
    s_q = np.broadcast_to(s_q, theta_q.shape)

    # dense parallel grid: theta covers the swept range at ~the fan's own
    # angular resolution; s at 1/oversample-pixel pitch over the object
    # support (|s| > 0.75 N projects to zero for in-disk objects)
    d_beta = np.pi / ang.shape[0] if ang.shape[0] < 2 else float(
        np.min(np.diff(np.sort(ang))) or np.pi / ang.shape[0])
    d_theta = max(d_beta, 1e-3) / oversample
    th0 = float(theta_q.min())
    n_theta = int(np.ceil((theta_q.max() - th0) / d_theta)) + 2
    thetas = th0 + np.arange(n_theta) * d_theta
    ds = 1.0 / oversample
    s_max = min(float(np.abs(s_q).max()) + 2.0, 0.75 * N)
    n_s = 2 * int(np.ceil(s_max / ds)) + 1        # odd: s=0 on the grid
    dense = _radon_spectral_shared(vol, thetas, n_s, angle_chunk,
                                   det_spacing=ds,
                                   precision=precision)
    # dense: (Nz, M, n_theta, n_s)

    ti = jnp.asarray((theta_q - th0) / d_theta, vol.dtype)
    si = jnp.asarray((np.clip(s_q, -s_max, s_max) + (n_s - 1) / 2.0 * ds)
                     / ds, vol.dtype)

    def resample(p2d):                             # (n_theta, n_s)
        return jax.scipy.ndimage.map_coordinates(
            p2d, [ti, si], order=1, mode="constant", cval=0.0)

    return jax.vmap(jax.vmap(resample))(dense)     # (Nz, M, A, n_det)


def make_fan_spectral_projector(vol_shape, angles, geom,
                                n_det: Optional[int] = None,
                                dtype=jnp.float32,
                                angle_chunk: Optional[int] = None,
                                precision: Optional[str] = None):
    """``(A, A_T)`` for a fixed fan-beam geometry on the rebinned spectral
    path; ``A_T`` is the exact transpose (vjp of the linear map)."""
    ang = _concrete_angles(angles)
    n_det = n_det or vol_shape[-1]

    def A(x):
        return radon_fan_spectral(x, ang, geom, n_det=n_det,
                                  angle_chunk=angle_chunk,
                                  precision=precision)

    def A_T(y):
        _, vjp = jax.vjp(A, jnp.zeros(tuple(vol_shape), dtype))
        (x_bar,) = vjp(y)
        return x_bar

    return A, A_T
