"""On-chip breakdown of the spectral cone forward at production scale:
dense batched radon vs the fan_resample gather vs the hat-matmul tail.

Usage: python tools/profile_cone.py [precision]
Prints one JSON line to stdout, diagnostics to stderr.  Timing per
CLAUDE.md: jitted lax.scan of >= 10 applications, one forced scalar read.
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
N_SCAN = 10
REPEATS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "high"
    from pytv4d_tpu.models.ct import ConeBeamGeometry, FanBeamGeometry
    from pytv4d_tpu.models import ct_spectral as cs

    Nz, M, N = VOL_SHAPE[0], VOL_SHAPE[1], VOL_SHAPE[-1]
    geom = ConeBeamGeometry(source_dist=2.0 * N, det_dist=1.0 * N)
    ang = np.linspace(0.0, 2 * np.pi, N_ANGLES, endpoint=False)
    cc = cs._cone_host_consts(geom, ang, Nz, Nz, N, N, 2.0)
    grid = cc["grid"]
    log(f"dense grid: thetas={cc['thetas'].shape} n_s={cc['n_s']} "
        f"pad={cc['pad']} ti/si={grid.ti.shape}")

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(VOL_SHAPE), jnp.float32)
    rr = jnp.asarray(np.arange(N) - (N - 1) / 2.0, jnp.float32)
    stacked = jnp.concatenate(
        [vol, vol * rr[:, None], vol * rr[None, :]], axis=1)

    tables = jax.jit(lambda: cs._spectral_tables_shared(
        cc["thetas"], N, cc["n_s"], jnp.float32,
        det_spacing=cc["ds"]))()
    ti = jnp.asarray(grid.ti, jnp.float32)
    si = jnp.asarray(grid.si, jnp.float32)

    def dense_radon(v):
        d = cs._radon_spectral_shared(v, cc["thetas"], cc["n_s"], None,
                                      det_spacing=cc["ds"], tables=tables,
                                      precision=precision)
        return cs._fold_pad(d, cc["pad"])

    def fan_resample(dense):
        def one(p2d):
            return jax.scipy.ndimage.map_coordinates(
                p2d, [ti, si], order=1, mode="constant", cval=0.0)
        return jax.vmap(jax.vmap(one))(dense)

    # tables ride as jit ARGUMENTS — closure-capturing ~400 MB of
    # tables embeds them as HLO constants and the remote compile dies
    # with HTTP 413 (the payload trap)
    @jax.jit
    def radon_scan(x0, tables):
        def dense_radon_t(v):
            d = cs._radon_spectral_shared(v, cc["thetas"], cc["n_s"], None,
                                          det_spacing=cc["ds"],
                                          tables=tables,
                                          precision=precision)
            return cs._fold_pad(d, cc["pad"])

        def body(c, _):
            d = dense_radon_t(c)
            return c * (1.0 + 1e-12 * jnp.mean(d)), None
        out, _ = jax.lax.scan(body, x0, length=N_SCAN)
        return jnp.sum(out)

    dense0 = jax.jit(lambda v, t: cs._fold_pad(cs._radon_spectral_shared(v, cc['thetas'], cc['n_s'], None, det_spacing=cc['ds'], tables=t, precision=precision), cc['pad']))(stacked, tables)

    @jax.jit
    def resample_scan(s0, dense):
        def body(s, _):
            o = fan_resample(dense * (1.0 + s))
            return 1e-12 * jnp.mean(o), None
        out, _ = jax.lax.scan(body, s0, length=N_SCAN)
        return out

    res = {"precision": precision,
           "dense_shape": list(map(int, dense0.shape))}
    t = _timed(radon_scan, stacked, tables) / N_SCAN * 1e3
    res["dense_radon_ms"] = round(t, 3)
    log(f"dense radon (3x batch): {t:.2f} ms")
    z = jnp.asarray(0.0, jnp.float32)
    t = _timed(resample_scan, z, dense0) / N_SCAN * 1e3
    res["fan_resample_ms"] = round(t, 3)
    log(f"fan_resample gather: {t:.2f} ms")
    print(json.dumps({k: (v if not isinstance(v, list) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
