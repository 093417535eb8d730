"""On-chip production-scale spectral SART (VERDICT r3 item 4 'done' bar):
SART epochs/s at (16,4,512,512) x 96, and a SART-warm-started
cp_reconstruct end-to-end.  One JSON line to stdout."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.models.ct import cp_reconstruct, make_projector, sart
from pytv4d_tpu.solvers.inverse import power_iteration


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VOL = (16, 4, 512, 512)
ANG = np.linspace(0.0, np.pi, 96, endpoint=False)


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    # smooth-ish in-disk phantom stack (SART converges meaningfully)
    N = VOL[-1]
    yy, xx = np.meshgrid(np.arange(N) - (N - 1) / 2,
                         np.arange(N) - (N - 1) / 2, indexing="ij")
    base = np.exp(-(xx ** 2 + yy ** 2) / (0.12 * N * N))
    vol = np.broadcast_to(base, VOL) * (
        0.8 + 0.4 * rng.random((VOL[0], VOL[1], 1, 1)))
    vol = jnp.asarray(vol, jnp.float32)

    A, A_T = make_projector(VOL, ANG, method="spectral")
    sino = jax.jit(A)(vol)
    float(jnp.sum(sino))
    log("sinogram ready")

    n_epochs = 10
    t0 = time.perf_counter()
    res = sart(sino, ANG, VOL, n_iter=n_epochs, n_subsets=8,
               method="spectral")
    float(jnp.sum(res.x))
    compile_s = time.perf_counter() - t0
    log(f"sart compile+first: {compile_s:.1f}s, residuals "
        f"{np.asarray(res.residual)[:3]} ... {float(res.residual[-1]):.3g}")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = sart(sino, ANG, VOL, n_iter=n_epochs, n_subsets=8,
                   method="spectral")
        float(jnp.sum(res.x))
        best = min(best, time.perf_counter() - t0)
    ep_s = n_epochs / best
    log(f"sart: {ep_s:.2f} epochs/s ({best / n_epochs * 1e3:.1f} ms/epoch)")

    # warm-started TV reconstruction end-to-end
    op_norm = float(power_iteration(A, A_T, VOL))
    t0 = time.perf_counter()
    rec = cp_reconstruct(sino, ANG, VOL, n_iter=100, reg=0.3,
                         cfg=TVConfig(scheme="hybrid", reg_time=0.5),
                         op_norm=op_norm, method="spectral",
                         x_init=res.x, loss_every=100)
    float(jnp.sum(rec.x))
    warm_s = time.perf_counter() - t0
    err = float(jnp.linalg.norm(rec.x - vol) / jnp.linalg.norm(vol))
    log(f"warm cp_reconstruct 100 it: {warm_s:.1f}s (incl compile), "
        f"rel err vs truth {err:.4f}")

    rec_res = float(res.residual[-1] / res.residual[0])
    print(json.dumps({
        "metric": "sart_production_epochs_s", "value": round(ep_s, 2),
        "unit": "epochs/s",
        "note": f"(16,4,512,512)x96 spectral OS-SART S=8; residual drop "
                f"x{1 / max(rec_res, 1e-9):.0f} over {n_epochs} epochs; "
                f"warm cp_reconstruct rel err {err:.4f}",
    }))


if __name__ == "__main__":
    main()
