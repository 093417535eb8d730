"""On-chip A/B for the z-streaming pass A (kernels/zstream.py) vs the
production pass-A kernel — ROADMAP item 2 / VERDICT r2 item 5.

Times a jitted ``lax.scan`` of pass A alone (the quantity the experiment
changes) and the full fused step (what the user feels), with the tunnel
timing discipline from CLAUDE.md: >= 30 scanned iterations, sync via ONE
forced scalar read, best of >= 5 repeats.  Run on the TPU:

    python tools/bench_zstream.py [--shape 32,8,256,256] [--dual bf16]

Appends one JSON line per configuration to BENCH_LOCAL.jsonl via
bench._record_local and prints the A/B table to stderr.  Record the
verdict (win or loss) in docs/performance.md either way.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_scan(step, init, n_iter, repeats):
    @jax.jit
    def run(carry):
        out, _ = jax.lax.scan(lambda c, _: (step(c), None), carry,
                              length=n_iter)
        return out

    carry = run(init)  # compile + warm
    float(jnp.sum(carry[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(init)
        float(jnp.sum(out[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return n_iter / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="32,8,256,256")
    ap.add_argument("--dual", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--primary", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--n-iter", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))

    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.core.schemes import num_channels
    from pytv4d_tpu.kernels.fused import make_cp_dual_kernel
    from pytv4d_tpu.kernels.zstream import make_cp_dual_kernel_zstream

    cfg = TVConfig(scheme="hybrid", reg_time=0.5)
    kw = dict(sigma_D=0.5, sigma_A=1.0, reg=1.0,
              dual_dtype_name=args.dual)
    prod = make_cp_dual_kernel(cfg, shape, args.primary, **kw)
    zs = make_cp_dual_kernel_zstream(cfg, shape, args.primary, **kw)
    log(f"zstream row tile: {zs.row_tile}")

    rng = np.random.default_rng(0)
    Nz, M = shape[0], shape[1]
    Nd = num_channels(cfg.scheme, Nz, M, cfg.reg_z_over_reg, cfg.reg_time)
    x = jnp.asarray(rng.random(shape), args.primary)
    x0 = jnp.asarray(rng.random(shape), args.primary)
    yA = jnp.zeros(shape, args.primary)
    yD = jnp.zeros((Nz, M, Nd) + shape[2:], args.dual)

    def step_prod(carry):
        a, d = carry
        a, d, dt, _ = prod(x, x0, a, d)
        return (a + 0.0 * dt, d)  # keep dt live so it is not DCE'd

    def step_zs(carry):
        a, d = carry
        a, d, dt, _ = zs(x, x0, a, d)
        return (a + 0.0 * dt, d)

    results = {}
    for name, step in (("production", step_prod), ("zstream", step_zs)):
        it_s = _time_scan(step, (yA, yD), args.n_iter, args.repeats)
        results[name] = it_s
        log(f"pass A {name:10s}: {it_s:8.1f} it/s")

    speedup = results["zstream"] / results["production"]
    log(f"zstream / production = {speedup:.3f}x "
        f"({'WIN' if speedup > 1.0 else 'LOSS'})")
    sys.path.insert(0, ".")
    import bench

    bench._record_local({
        "metric": "zstream_passA_ab",
        "shape": list(shape),
        "dual": args.dual,
        "primary": args.primary,
        "production_it_s": round(results["production"], 1),
        "zstream_it_s": round(results["zstream"], 1),
        "speedup": round(speedup, 4),
        "unit": "it/s",
    })
    print(f"{speedup:.4f}")


if __name__ == "__main__":
    main()
