"""Persistent-compilation-cache ergonomics.

XLA compiles of the fused 4D solvers take tens of seconds to minutes per new
program shape on TPU (the reference has no compile step at all —
``pytv/tv_operators_CPU.py`` is eager NumPy — so this is the one usability
cost the TPU build adds).  The JAX persistent cache amortizes it to a ~10 s
disk load on every later process, including across machines when the cache
dir is on shared storage.

Usage (once, before the first jit)::

    from pytv4d_tpu.utils import enable_compile_cache
    enable_compile_cache()                 # ~/.cache/pytv4d_tpu/jax_cache
    enable_compile_cache("/mnt/shared/jc") # pod-shared cache

``warm_compile`` pre-lowers a solver for a shape so first real use is
instant (e.g. in a deploy step or a container build).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def enable_compile_cache(path: Optional[str] = None,
                         min_compile_time_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing; default ``~/.cache/pytv4d_tpu/jax_cache`` or
    ``$PYTV4D_COMPILE_CACHE``).  Programs whose compile took longer than
    ``min_compile_time_secs`` are cached; returns the resolved path."""
    if path is None:
        path = os.environ.get(
            "PYTV4D_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "pytv4d_tpu",
                         "jax_cache"),
        )
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    # cache everything that crossed the time threshold, however small
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def warm_compile(solver, *args, **kwargs):
    """Trace + compile a jitted solver for concrete example arguments WITHOUT
    running it: ``warm_compile(chambolle_pock, jax.ShapeDtypeStruct((32, 8,
    256, 256), jnp.float32), n_iter=300)``.  Arguments may be
    ``ShapeDtypeStruct``s (no memory allocated) or real arrays; static
    kwargs (n_iter, cfg, reg, ...) must match later calls exactly.  With the
    persistent cache enabled the compiled program also lands on disk.

    Solvers with an eager validation wrapper around their jitted core
    (``chambolle_pock``) expose it as ``solver._jit`` — used here
    automatically so AOT lowering still works."""
    solver = getattr(solver, "_jit", solver)
    return solver.lower(*args, **kwargs).compile()
