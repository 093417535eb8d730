"""On-chip spot check of the production-scale reference-parity golden
(VERDICT r3 item 5): replay the recorded reference CP trajectory
(tests/golden/golden_solver4d_production.npz, (16,4,512,512) f64 numpy)
on the real TPU's fused f32 and bf16-dual paths and report the max
relative loss deviation.  One JSON line to stdout."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pytv4d_tpu.core.config import TVConfig
from pytv4d_tpu.solvers.cp import chambolle_pock


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices:", jax.devices())
    g = np.load(os.path.join(os.path.dirname(__file__), "..", "tests",
                             "golden", "golden_solver4d_production.npz"))
    rng = np.random.default_rng(int(g["seed"]))
    noisy = (rng.random(tuple(g["shape"])) * 100.0).astype(np.float32)
    cfg = TVConfig(scheme="hybrid", reg_time=float(g["reg_time"]))
    n_it = len(g["losses"])
    kw = dict(n_iter=n_it, reg=float(g["reg"]), cfg=cfg,
              tau=float(g["tau"]))

    out = {}
    for tag, extra in (("fused_f32", {}),
                       ("bf16_dual", {"dual_dtype": "bfloat16"})):
        t0 = time.time()
        res = chambolle_pock(jnp.asarray(noisy), **kw, **extra)
        losses = np.asarray(res.loss, np.float64)
        rel = float(np.max(np.abs(losses - g["losses"]) / g["losses"]))
        out[tag] = rel
        log(f"{tag}: max rel loss dev {rel:.3e} "
            f"({time.time() - t0:.1f}s incl compile)")

    ok = out["fused_f32"] < 1e-4
    print(json.dumps({
        "metric": "production_golden_rel_dev",
        "value": out["fused_f32"], "unit": "rel",
        "note": f"(16,4,512,512) 50-it CP loss vs reference f64 golden: "
                f"fused f32 {out['fused_f32']:.2e} "
                f"(BASELINE bar 1e-4: {'PASS' if ok else 'FAIL'}), "
                f"bf16-dual {out['bf16_dual']:.2e}",
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
