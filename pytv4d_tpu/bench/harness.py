"""Benchmark harness: solver throughput and weak-scaling measurement
(SURVEY.md section 6 north-star targets: >=70% roofline per chip, >=85%
weak-scaling efficiency).

``bench.py`` at the repo root prints the single-line headline; this module is
the programmatic API (and the multi-device weak-scaling sweep, which needs a
pod slice or a virtual CPU mesh to be meaningful).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TVConfig
from ..core.schemes import num_channels
from ..parallel import (
    d_volume_sharding,
    make_mesh,
    make_sharded_cp_solver,
    shard_volume,
)
from ..solvers.cp import chambolle_pock, init_state
from ..utils.profiling import cp_traffic_model, roofline_fraction


def _force(*arrays) -> float:
    jax.block_until_ready(arrays)
    return float(jnp.sum(jnp.ravel(arrays[0])[:8]))


def bench_solver(shape=(32, 8, 256, 256), n_iter=50, repeats=3,
                 cfg: TVConfig = TVConfig(scheme="hybrid", reg_time=0.5),
                 **solver_kwargs) -> Dict[str, float]:
    """Steady-state CP throughput on the local device(s)."""
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.random(shape), jnp.float32)

    def run():
        res = chambolle_pock(noisy, n_iter=n_iter, reg=1.0, cfg=cfg,
                             **solver_kwargs)
        _force(res.x, res.loss)
        return res

    run()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    it_s = n_iter / best
    nd = num_channels(cfg.scheme, shape[0], shape[1], cfg.reg_z_over_reg,
                      cfg.reg_time)
    traffic = cp_traffic_model(shape, nd)
    return {
        "it_per_s": it_s,
        "gvox_it_per_s": it_s * float(np.prod(shape)) / 1e9,
        "est_gb_per_s": traffic * it_s / 1e9,
        "roofline_fraction": roofline_fraction(traffic, it_s),
    }


def weak_scaling(base_shape=(8, 2, 128, 128), n_iter=20, repeats=3,
                 device_counts=None,
                 cfg: TVConfig = TVConfig(scheme="hybrid", reg_time=0.5),
                 ) -> Dict[int, Dict[str, float]]:
    """Weak-scaling sweep of the shard_map CP solver: the per-device volume
    (``base_shape``) is held constant while z grows with the device count.
    Efficiency(n) = it/s(n) / it/s(1) — 1.0 is perfect weak scaling.
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32)
                         if n <= len(devices)]
    rng = np.random.default_rng(0)
    results: Dict[int, Dict[str, float]] = {}
    for n in device_counts:
        mesh = make_mesh(z=n, t=1, devices=devices[:n])
        shape = (base_shape[0] * n,) + tuple(base_shape[1:])
        noisy = jnp.asarray(rng.random(shape), jnp.float32)
        solve = make_sharded_cp_solver(mesh, cfg, shape, reg=1.0,
                                       n_iter=n_iter, shard_time=False)
        st = init_state(noisy, cfg)
        args = (
            shard_volume(noisy, mesh, shard_time=False),
            shard_volume(st.x, mesh, shard_time=False),
            shard_volume(st.y_A, mesh, shard_time=False),
            jax.device_put(st.y_D, d_volume_sharding(mesh, shard_time=False)),
        )
        out = solve(*args)
        _force(*out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = solve(*args)
            _force(*out)
            best = min(best, time.perf_counter() - t0)
        results[n] = {"it_per_s": n_iter / best}
    base = results[device_counts[0]]["it_per_s"]
    for n in device_counts:
        results[n]["efficiency"] = results[n]["it_per_s"] / base
    return results
