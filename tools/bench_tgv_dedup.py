"""A/B ceiling measurement for the TGV pass-PQ/XW z-neighbor dedup
(VERDICT r4 item 7): the `_traffic_probe` kernel variant drops every
z-SHIFTED operand (xb_zp, wb_zm, p_zm, q_zp — ~10 volume-equivalents of
DMA per iteration, numerically WRONG at z transitions) so its marginal
iteration rate is the SPEED-OF-LIGHT bound for a perfect revolving-buffer
dedup.  Timing per CLAUDE.md: marginal cost via two scan lengths, one
forced scalar read.

Usage: python tools/bench_tgv_dedup.py [mode] [dtype]
Prints one JSON line to stdout.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pytv4d_tpu.kernels.tgv_stream import (  # noqa: E402
    make_tgv_stream_step,
    to_internal,
)

SHAPE = (32, 8, 256, 256)
REPEATS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def marginal_it_s(step, state, n_lo=30, n_hi=150):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(state, n):
        def body(c, _):
            x, xb, w, wb, p, q, x0 = c
            x, xb, w, wb, p, q = step(x, xb, w, wb, p, q, x0)
            return (x, xb, w, wb, p, q, x0), None

        c, _ = jax.lax.scan(body, state, length=n)
        return c[0]

    def timed(n):
        out = run(state, n)
        float(jnp.sum(out.astype(jnp.float32)))
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = run(state, n)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (n_hi - n_lo) / (timed(n_hi) - timed(n_lo))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "4d"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    n_ax = {"2d": 2, "3d": 3, "4d": 4}[mode]
    n_q = n_ax * (n_ax + 1) // 2
    Nz, M, Nr, Nc = SHAPE
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random(SHAPE, dtype=np.float32), dtype)
    x = x0
    xb = x0
    w = jnp.asarray(to_internal(jnp.zeros((Nz, n_ax, M, Nr, Nc))), dtype)
    p = jnp.zeros_like(w)
    q = jnp.asarray(to_internal(jnp.zeros((Nz, n_q, M, Nr, Nc))), dtype)
    state = (x, xb, w, w, p, q, x0)

    res = {"metric": "tgv_zdedup_ceiling", "mode": mode, "dtype": dtype,
           "shape": list(SHAPE)}
    for probe in (False, True):
        step = make_tgv_stream_step(SHAPE, mode, alpha1=1.0, alpha0=2.0,
                                    dtype_name=dtype,
                                    _traffic_probe=probe)
        it_s = marginal_it_s(step, state)
        key = "probe_it_s" if probe else "baseline_it_s"
        res[key] = round(it_s, 1)
        log(f"probe={probe}: {it_s:.1f} it/s")
    res["ceiling_gain"] = round(res["probe_it_s"] / res["baseline_it_s"]
                                - 1.0, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
