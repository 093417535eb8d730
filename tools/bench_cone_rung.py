"""One rung of the cone-beam on-chip envelope ladder (VERDICT r3 item 2).

Runs ONE (Nz, M, N, n_angles) configuration of the gather cone projector
on the ambient platform (the real TPU): forward, exact adjoint, a scanned
normal-operator rate (amortizes the ~20-60 ms tunnel dispatch — CLAUDE.md
timing discipline), FDK, and a short ``cp_reconstruct(geom=cone)``.
One JSON line to stdout, rc 0 on success.

One rung per PROCESS on purpose: large gather programs have crashed the
TPU worker before (CLAUDE.md DANGER — the parallel gather at
(16,4,512,512)x96; (8,4,256,256)x64 once drew a remote-compile HTTP 500),
and a wedged tunnel can hang for hours.  The ladder driver steps rungs
under ``timeout`` and stops climbing on the first failure, leaving the
largest PROVEN-safe scale recorded.

Usage: python tools/bench_cone_rung.py Nz M N n_angles [--recon N_ITER]
           [--dump-sino PATH] [--angle-batch B]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dims", nargs=4, type=int, metavar=("Nz", "M", "N", "A"))
    p.add_argument("--recon", type=int, default=30)
    p.add_argument("--dump-sino", default=None,
                   help="save the forward sinogram (parity check input)")
    p.add_argument("--angle-batch", type=int, default=None)
    args = p.parse_args()
    Nz, M, N, A = args.dims

    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.models.ct import (
        ConeBeamGeometry, cp_reconstruct, fdk, make_cone_projector)

    log("devices:", jax.devices())
    geom = ConeBeamGeometry(source_dist=2.0 * N, det_dist=1.0 * N)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((Nz, M, N, N)), jnp.float32)
    angles = jnp.asarray(
        np.linspace(0.0, 2 * np.pi, A, endpoint=False), jnp.float32)

    Afn, ATfn = make_cone_projector((Nz, M, N, N), angles, geom,
                                    angle_batch=args.angle_batch)
    A_j, AT_j = jax.jit(Afn), jax.jit(ATfn)

    t0 = time.perf_counter()
    sino = A_j(vol)
    s0 = float(jnp.sum(sino))          # forced scalar read = sync
    t_fwd_cold = time.perf_counter() - t0
    log(f"forward cold (incl compile): {t_fwd_cold:.1f}s, sum {s0:.3e}")

    def timed(fn, *a, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_fwd = timed(A_j, vol)
    bp = AT_j(sino)
    t_adj = timed(AT_j, sino)
    log(f"forward {t_fwd*1e3:.1f} ms, adjoint {t_adj*1e3:.1f} ms "
        f"(single-call, embeds one tunnel dispatch)")

    # scanned normal operator: the honest per-application rate
    n_scan = 10

    @jax.jit
    def normal_scan(x0):
        def body(x, _):
            return x + 1e-6 * ATfn(Afn(x)), None
        out, _ = jax.lax.scan(body, x0, length=n_scan)
        return out

    float(jnp.sum(normal_scan(vol)))   # compile
    t_pair = timed(normal_scan, vol) / n_scan
    log(f"normal-op pair (A+A^T, scanned x{n_scan}): {t_pair*1e3:.1f} ms")

    x_fdk = fdk(sino, angles, geom, (Nz, M, N, N))
    t_fdk = timed(lambda s: fdk(s, angles, geom, (Nz, M, N, N)), sino)
    fdk_err = float(jnp.linalg.norm(x_fdk - vol) / jnp.linalg.norm(vol))
    log(f"FDK {t_fdk*1e3:.1f} ms (rel err vs noise-free phantom "
        f"{fdk_err:.3f} — random volume, not FDK's regime)")

    out = {
        "metric": "cone_gather_envelope_rung",
        "vol_shape": [Nz, M, N, N], "n_angles": A,
        "geom": {"source_dist": geom.source_dist,
                 "det_dist": geom.det_dist},
        "fwd_ms": round(t_fwd * 1e3, 2),
        "adjoint_ms": round(t_adj * 1e3, 2),
        "normal_pair_ms": round(t_pair * 1e3, 2),
        "fdk_ms": round(t_fdk * 1e3, 2),
    }

    if args.recon:
        t0 = time.perf_counter()
        res = cp_reconstruct(
            sino, angles, (Nz, M, N, N), n_iter=args.recon, reg=0.5,
            cfg=TVConfig(scheme="hybrid", reg_time=0.5),
            geom=geom, precond=True)
        float(jnp.sum(res.x))
        t_cold = time.perf_counter() - t0
        t_recon = timed(
            lambda: cp_reconstruct(
                sino, angles, (Nz, M, N, N), n_iter=args.recon, reg=0.5,
                cfg=TVConfig(scheme="hybrid", reg_time=0.5),
                geom=geom, precond=True).x, reps=2)
        out["recon_it_s"] = round(args.recon / t_recon, 2)
        out["recon_n_iter"] = args.recon
        log(f"cp_reconstruct(geom=cone, {args.recon} it): "
            f"{out['recon_it_s']} it/s (cold {t_cold:.1f}s)")

    if args.dump_sino:
        np.savez_compressed(args.dump_sino, sino=np.asarray(sino),
                            Nz=Nz, M=M, N=N, A=A,
                            source_dist=geom.source_dist,
                            det_dist=geom.det_dist)
        log("dumped sinogram to", args.dump_sino)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
