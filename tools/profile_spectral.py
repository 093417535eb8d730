"""On-chip profile of the spectral CT projector apply path at production
scale ((16,4,512,512) x 96 angles) — VERDICT r3 item 1.

Timing discipline per CLAUDE.md: every number comes from a jitted
``lax.scan`` of >= 20 applications with ONE forced scalar host read;
single-call timings through the tunnel are artifacts.

Usage:  python tools/profile_spectral.py <experiment> [precision]
  pair      — scanned A + A^T normal-operator pair (tables threaded)
  fwd       — scanned forward only
  stages    — fft / stage1 / stage2 breakdown (fixed inputs, scaled by
              the scan carry so XLA cannot hoist the work)
experiments print ms per application to stderr and one JSON line to
stdout.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

VOL_SHAPE = (16, 4, 512, 512)
N_ANGLES = 96
N_SCAN = 20
REPEATS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(fn, *args):
    out = fn(*args)
    # one forced scalar read is the sync (CLAUDE.md)
    float(jnp.sum(out if out.ndim == 0 else out.ravel()[:1]))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out if out.ndim == 0 else out.ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    return best


def _setup(precision):
    from pytv4d_tpu.models.ct_spectral import make_spectral_projector

    angles = np.linspace(0.0, np.pi, N_ANGLES, endpoint=False)
    A, A_T = make_spectral_projector(VOL_SHAPE, angles,
                                     precision=precision)
    consts = A.prepare()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(VOL_SHAPE), jnp.float32)
    return A, consts, x


def bench_pair(precision):
    A, consts, x = _setup(precision)

    @jax.jit
    def scan(x0, consts):
        def apply(v):
            return A.apply(consts, v)

        _, vjp = jax.vjp(apply, x0)   # linear: input-independent

        def body(c, _):
            (g,) = vjp(apply(c))
            return c + 1e-9 * g, None

        out, _ = jax.lax.scan(body, x0, length=N_SCAN)
        return jnp.sum(out)

    best = _timed(scan, x, consts)
    ms = best / N_SCAN * 1e3
    log(f"pair[{precision}]: {ms:.2f} ms per A+A^T application "
        f"({N_SCAN / best:.1f} it/s)")
    return {"experiment": "pair", "precision": precision,
            "ms_per_pair": round(ms, 3)}


def bench_fwd(precision):
    A, consts, x = _setup(precision)

    @jax.jit
    def scan(x0, consts):
        def body(c, _):
            y = A.apply(consts, c)
            return c * (1.0 + 1e-12 * jnp.mean(y)), None

        out, _ = jax.lax.scan(body, x0, length=N_SCAN)
        return jnp.sum(out)

    best = _timed(scan, x, consts)
    ms = best / N_SCAN * 1e3
    log(f"fwd[{precision}]: {ms:.2f} ms per forward")
    return {"experiment": "fwd", "precision": precision,
            "ms_per_fwd": round(ms, 3)}


def bench_stages(precision):
    from pytv4d_tpu.models import ct_spectral as cs

    A, consts, x = _setup(precision)
    Np = 2 * VOL_SHAPE[-1]
    tabs = consts[True]            # vertical bucket (48 angles)
    Pr, Pi, Er, Ei = tabs
    Ps = jnp.stack([Pr, Pi])
    Es = jnp.stack([Er, -Ei], axis=1)

    F = jnp.fft.rfft(x, n=Np, axis=-1)
    Fs = jnp.stack([jnp.real(F), jnp.imag(F)])
    prod0 = jnp.einsum("i...rk,jark->ij...ak", Fs, Ps,
                       precision=precision)
    Gs0 = jnp.stack([prod0[0, 0] - prod0[1, 1],
                     prod0[0, 1] + prod0[1, 0]], axis=-2)

    @jax.jit
    def fft_scan(x0):
        def body(c, _):
            F = jnp.fft.rfft(c, n=Np, axis=-1)
            return c * (1.0 + 1e-12 * jnp.mean(jnp.real(F))), None

        out, _ = jax.lax.scan(body, x0, length=N_SCAN)
        return jnp.sum(out)

    @jax.jit
    def stage1_scan(s0, Fs, Ps):
        def body(s, _):
            prod = jnp.einsum("i...rk,jark->ij...ak", Fs * (1.0 + s), Ps,
                              precision=precision)
            return 1e-12 * jnp.mean(prod), None

        out, _ = jax.lax.scan(body, s0, length=N_SCAN)
        return out

    @jax.jit
    def stage2_scan(s0, Gs, Es):
        def body(s, _):
            o = jnp.einsum("...ajk,ajks->...as", Gs * (1.0 + s), Es,
                           precision=precision)
            return 1e-12 * jnp.mean(o), None

        out, _ = jax.lax.scan(body, s0, length=N_SCAN)
        return out

    res = {}
    res["fft_ms"] = round(_timed(fft_scan, x) / N_SCAN * 1e3, 3)
    log(f"fft: {res['fft_ms']} ms")
    z = jnp.asarray(0.0, jnp.float32)
    res["stage1_ms"] = round(
        _timed(stage1_scan, z, Fs, Ps) / N_SCAN * 1e3, 3)
    log(f"stage1 (one bucket, x2 per fwd): {res['stage1_ms']} ms")
    res["stage2_ms"] = round(
        _timed(stage2_scan, z, Gs0, Es) / N_SCAN * 1e3, 3)
    log(f"stage2 (one bucket, x2 per fwd): {res['stage2_ms']} ms")
    return {"experiment": "stages", "precision": precision, **res}


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "pair"
    precision = sys.argv[2] if len(sys.argv) > 2 else "highest"
    log(f"devices: {jax.devices()}")
    fn = {"pair": bench_pair, "fwd": bench_fwd, "stages": bench_stages}[what]
    rec = fn(precision)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
