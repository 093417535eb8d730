"""Tracing / profiling / roofline helpers (SURVEY.md section 5: the reference
has only ad-hoc ``time.time()`` deltas inside tests, ``pytv/tests.py:261-285``).

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory.
- :class:`IterationTimer` — latency-robust iterations/s measurement (times a
  whole device-resident scan, not per-call dispatch, which on tunneled or
  remote backends is dominated by round-trip latency).
- :func:`cp_traffic_model` / :func:`roofline_fraction` — bytes-moved model of
  the fused CP step for GB/s and fraction-of-HBM-roofline reporting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# Peak HBM bandwidth per chip, GB/s (public figures; override per deployment).
HBM_PEAK_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "cpu": 50.0,
}


@contextlib.contextmanager
def trace(log_dir: str):
    """``with profiling.trace('/tmp/trace'): run()`` then inspect with
    TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_read(*trees) -> float:
    """ONE forced scalar host read spanning every array leaf: the data
    dependency genuinely waits for the work.  Deliberately NOT
    block_until_ready — on tunneled backends it returns early (a no-op
    poll) and, combined with a subsequent read, adds ~35 ms of extra
    round-trips per call (docs/performance.md "Measuring through the
    tunnel").  The canonical sync for every timing loop in the repo."""
    leaves = jax.tree_util.tree_leaves(trees)
    return float(sum(jnp.sum(jnp.ravel(leaf)[:8].astype(jnp.float32))
                     for leaf in leaves))


class IterationTimer:
    """Measure steady-state iterations/s of ``run_n(n) -> arrays``.

    ``run_n`` must execute n device-resident iterations (e.g. a jitted
    ``lax.scan``) and return something whose materialization forces the work.
    """

    def __init__(self, run_n: Callable[[int], object], warmup_iters: int = 5):
        self.run_n = run_n
        self.warmup_iters = warmup_iters

    def measure(self, n_iter: int, repeats: int = 3) -> float:
        out = self.run_n(self.warmup_iters)
        self._force(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = self.run_n(n_iter)
            self._force(out)
            best = min(best, time.perf_counter() - t0)
        return n_iter / best

    @staticmethod
    def _force(out):
        force_read(out)


def device_kind() -> str:
    kind = jax.devices()[0].device_kind.lower()
    for key in ("v6e", "v5p", "v5e", "v5 lite", "v4"):
        if key in kind:
            return "v5e" if key == "v5 lite" else key
    return "cpu" if jax.default_backend() == "cpu" else "v5e"


def cp_traffic_model(shape, Nd: int, dtype=jnp.float32, fused: bool = True,
                     model: str = "minimal", dual_dtype=None,
                     n_zt_neighbors: int = 4) -> int:
    """Bytes moved per fused CP iteration (kernels/fused.py two-pass form).

    ``model='minimal'`` counts each array once per pass (unique bytes — the
    honest roofline denominator: pass A reads x,x0,yA,yD and writes yA,yD;
    pass B reads x,x0,yA,yD and writes x).  ``model='actual'`` additionally
    counts the redundant neighbor-block DMA the current kernels issue
    (pass A re-reads x per z/t neighbor operand; pass B re-reads one dual
    channel per z/t-channel neighbor operand).  ``dual_dtype`` scales the
    y_D terms (bf16 duals).  Per-tile partial outputs are negligible and
    not counted.
    """
    vox = int(np.prod(shape))
    bpe = jnp.dtype(dtype).itemsize
    dual_bpe = jnp.dtype(dual_dtype).itemsize if dual_dtype else bpe
    if not fused:
        return int((6 * 2 + 3 * Nd) * vox * bpe)  # unfused jnp-path estimate
    extra = n_zt_neighbors if model == "actual" else 0
    # pass A: reads x (+extra neighbor fetches), x0, y_A, y_D; writes y_A, y_D
    pass_a = (1 + extra + 2 + 1) * bpe + 2 * Nd * dual_bpe
    # pass B: reads x, x0, y_A, y_D (+extra dual-channel fetches); writes x
    pass_b = (3 + 1) * bpe + (Nd + extra) * dual_bpe
    return int((pass_a + pass_b) * vox)


def tgv_traffic_model(shape, mode: str, dtype=jnp.float32,
                      model: str = "minimal") -> int:
    """Bytes moved per streaming TGV-2 iteration (kernels/tgv_stream.py
    two-pass form) for the coupled modes ('3d'/'4d') and streamed '2d'.

    ``model='minimal'`` counts each array once per pass: pass PQ reads
    xb, wb, p, q and writes p, q; pass XW reads x, x0, p, w, q and writes
    x, xb, w, wb.  ``model='actual'`` adds the z-shifted full-block
    operand re-reads the kernels issue (pass PQ: xb at z+1 and the n wb
    channels at z-1; pass XW: p's z channel at z-1 and the z-coupled q
    channels at z+1); thin row-seam operands are negligible and not
    counted.  The slice-resident 2d kernel has ZERO per-iteration HBM
    traffic — this model is for the streaming path."""
    n = {"2d": 2, "3d": 3, "4d": 4}[mode]
    n_q = n + n * (n - 1) // 2
    has_z = mode in ("3d", "4d")
    vox = int(np.prod(shape))
    bpe = jnp.dtype(dtype).itemsize
    planes = (1 + 2 * n + n_q) + (n + n_q) + (2 + 2 * n + n_q) + (2 + 2 * n)
    if model == "actual" and has_z:
        # PQ: xb(z+1) + n wb(z-1); XW: p_z(z-1) + (n z-coupled q)(z+1)
        planes += (1 + n) + (1 + n)
    return int(planes * vox * bpe)


def roofline_fraction(bytes_per_iter: int, iters_per_s: float) -> float:
    peak = HBM_PEAK_GBPS.get(device_kind(), 819.0) * 1e9
    return bytes_per_iter * iters_per_s / peak
