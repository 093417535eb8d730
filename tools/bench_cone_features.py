"""On-chip production-scale measurements for the round-5 cone features:
``fdk(method='spectral')``, ``sart(geom=cone, method='spectral')`` and
``cp_reconstruct(geom=cone, precond=True)`` at (16,4,512,512) x 96.

Usage: python tools/bench_cone_features.py <stage>
  stage in {fdk, sart, precond, warm}
One stage per process (each compiles its own programs; a fresh process
keeps a tunnel hiccup from wedging the rest).  Prints one JSON line to
stdout, diagnostics to stderr.  Timing per CLAUDE.md: warm once, then
best-of-repeats with ONE forced scalar read as the sync.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

VOL_SHAPE = (16, 4, 512, 512)
N_ANGLES = 96


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup():
    from pytv4d_tpu.models.ct import ConeBeamGeometry
    from pytv4d_tpu.models.ct_spectral import radon_cone_spectral

    Nz, M, N = VOL_SHAPE[0], VOL_SHAPE[1], VOL_SHAPE[-1]
    geom = ConeBeamGeometry(source_dist=2.0 * N, det_dist=1.0 * N)
    ang = np.linspace(0.0, 2 * np.pi, N_ANGLES, endpoint=False)
    z, r, c = np.mgrid[:Nz, :N, :N]
    ph = np.zeros((Nz, N, N), np.float32)
    rng = np.random.default_rng(0)
    for _ in range(6):
        z0 = rng.uniform(3, Nz - 3)
        r0, c0 = rng.uniform(128, N - 128), rng.uniform(128, N - 128)
        s = rng.uniform(20, 60)
        ph += np.exp(-(((z - z0) / 3.0) ** 2 + ((r - r0) / s) ** 2
                       + ((c - c0) / s) ** 2)).astype(np.float32)
    vol = jnp.asarray(np.stack([ph * (1 - 0.1 * m) for m in range(M)],
                               axis=1))
    t0 = time.time()
    sino = radon_cone_spectral(vol, ang, geom)
    float(jnp.sum(sino))
    log(f"forward sinogram {tuple(sino.shape)} in {time.time()-t0:.0f}s")
    return vol, sino, ang, geom


def stage_fdk():
    from pytv4d_tpu.models.ct import fdk

    vol, sino, ang, geom = setup()
    t0 = time.time()
    x0 = fdk(sino, ang, geom, VOL_SHAPE)   # auto -> spectral on TPU
    float(jnp.sum(x0))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        x0 = fdk(sino, ang, geom, VOL_SHAPE)
        float(jnp.sum(x0))
        best = min(best, time.time() - t0)
    rel = float(jnp.linalg.norm(x0 - vol) / jnp.linalg.norm(vol))
    return {"metric": "cone_fdk_spectral_production", "fdk_s": round(best, 3),
            "compile_s": round(compile_s, 1), "rel_err_vs_truth": round(rel, 4)}


def stage_sart(n_epochs=10):
    from pytv4d_tpu.models.ct import sart

    vol, sino, ang, geom = setup()
    t0 = time.time()
    res = sart(sino, ang, VOL_SHAPE, n_iter=n_epochs, n_subsets=8,
               method="spectral", geom=geom)
    float(jnp.sum(res.x))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = sart(sino, ang, VOL_SHAPE, n_iter=n_epochs, n_subsets=8,
                   method="spectral", geom=geom)
        float(jnp.sum(res.x))
        best = min(best, time.time() - t0)
    r0, r1 = float(res.residual[0]), float(res.residual[-1])
    rel = float(jnp.linalg.norm(res.x - vol) / jnp.linalg.norm(vol))
    return {"metric": "cone_sart_spectral_production",
            "epochs_per_s": round(n_epochs / best, 2),
            "residual_drop": round(r0 / max(r1, 1e-30), 1),
            "rel_err_vs_truth": round(rel, 4),
            "compile_s": round(compile_s, 1)}


def stage_precond(n_iter=100):
    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.models.ct import cp_reconstruct
    from pytv4d_tpu.models.ct import _select_projector, estimate_op_norm

    vol, sino, ang, geom = setup()
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    kw = dict(reg=0.5, cfg=cfg, geom=geom, method="spectral",
              loss_every=n_iter // 10)
    t0 = time.time()
    rp = cp_reconstruct(sino, ang, VOL_SHAPE, n_iter=n_iter, precond=True,
                        **kw)
    float(jnp.sum(rp.x))
    setup_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        rp = cp_reconstruct(sino, ang, VOL_SHAPE, n_iter=n_iter,
                            precond=True, **kw)
        float(jnp.sum(rp.x))
        best = min(best, time.time() - t0)
    A, A_T = _select_projector(sino, ang, VOL_SHAPE, None, geom,
                               method="spectral")
    on = float(estimate_op_norm(A, A_T, VOL_SHAPE))
    ro = cp_reconstruct(sino, ang, VOL_SHAPE, n_iter=n_iter, op_norm=on,
                        **kw)
    float(jnp.sum(ro.x))
    lp = [float(v) for v in rp.loss]
    lo = [float(v) for v in ro.loss]
    return {"metric": "cone_precond_production",
            "precond_it_s": round(n_iter / best, 1),
            "first_setup_s": round(setup_s, 1),
            "precond_loss": lp, "op_norm_loss": lo,
            "precond_final": lp[-1], "op_norm_final": lo[-1]}


def stage_warm(n_iter=60):
    """FDK-warm and SART-warm vs cold cp_reconstruct at a fixed budget."""
    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.models.ct import (
        _select_projector,
        cp_reconstruct,
        estimate_op_norm,
        fdk,
        sart,
    )

    vol, sino, ang, geom = setup()
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    A, A_T = _select_projector(sino, ang, VOL_SHAPE, None, geom,
                               method="spectral")
    on = float(estimate_op_norm(A, A_T, VOL_SHAPE))
    kw = dict(reg=0.5, cfg=cfg, geom=geom, op_norm=on, method="spectral",
              loss_every=n_iter)

    def rel(x):
        return float(jnp.linalg.norm(x - vol) / jnp.linalg.norm(vol))

    out = {"metric": "cone_warm_start_production", "n_iter": n_iter}
    cold = cp_reconstruct(sino, ang, VOL_SHAPE, n_iter=n_iter, **kw)
    out["cold_rel"] = round(rel(cold.x), 4)
    x_fdk = fdk(sino, ang, geom, VOL_SHAPE)
    out["fdk_rel"] = round(rel(x_fdk), 4)
    warm_f = cp_reconstruct(sino, ang, VOL_SHAPE, n_iter=n_iter,
                            x_init=x_fdk, **kw)
    out["fdk_warm_rel"] = round(rel(warm_f.x), 4)
    res_s = sart(sino, ang, VOL_SHAPE, n_iter=5, n_subsets=8,
                 method="spectral", geom=geom)
    out["sart5_rel"] = round(rel(res_s.x), 4)
    warm_s = cp_reconstruct(sino, ang, VOL_SHAPE, n_iter=n_iter,
                            x_init=res_s.x, **kw)
    out["sart_warm_rel"] = round(rel(warm_s.x), 4)
    return out


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "fdk"
    fn = {"fdk": stage_fdk, "sart": stage_sart, "precond": stage_precond,
          "warm": stage_warm}[stage]
    res = fn()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
