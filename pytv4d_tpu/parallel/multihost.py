"""Multi-host initialization and mesh construction (SURVEY.md section 5
"Distributed communication backend": the reference has none; the jax analog of
NCCL/MPI bootstrap is ``jax.distributed.initialize`` + a global device mesh).

Usage on each host of a pod slice / multi-host CPU ring:

    from pytv4d_tpu.parallel import multihost
    multihost.initialize()                       # env-driven (TPU pods: no-op args)
    mesh = multihost.global_mesh(t=2)            # (z, t) over ALL hosts' devices
    x = multihost.host_local_to_global(mesh, x_local)

Halos then ride ICI within a host/slice and DCN across hosts automatically —
``parallel.halo``'s ppermute ring and the GSPMD path are both mesh-agnostic.
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import make_mesh, volume_sharding


_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the jax distributed runtime.  On TPU pods all arguments are
    discovered from the environment; on CPU/GPU clusters pass them explicitly
    (or set JAX_COORDINATOR_ADDRESS etc.).  Safe to call twice.

    Must run before any backend use — do NOT query jax.devices()/
    process_count() first (that would initialize a single-process backend
    and the distributed bootstrap would be ignored)."""
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except (ValueError, RuntimeError) as e:
        if "already" in str(e).lower():
            _initialized = True
            return
        if coordinator_address is not None:
            raise
        # single-process environment without cluster env vars
        _initialized = True


def global_mesh(z: int = 0, t: int = 1):
    """A (z, t) mesh over every device of every process."""
    return make_mesh(z=z, t=t, devices=jax.devices())


def host_local_to_global(mesh, x_local, spec=None):
    """Assemble per-host blocks (split along z) into one global sharded
    array.  Each host passes its own z-contiguous block.  ``spec`` defaults
    to the canonical volume PartitionSpec; pass e.g.
    ``d_volume_sharding(mesh).spec`` for difference volumes."""
    from jax.experimental import multihost_utils

    if spec is None:
        spec = volume_sharding(mesh).spec
    return multihost_utils.host_local_array_to_global_array(
        x_local, mesh, spec
    )


def global_to_host_local(mesh, x_global, spec=None):
    from jax.experimental import multihost_utils

    if spec is None:
        spec = volume_sharding(mesh).spec
    return multihost_utils.global_array_to_host_local_array(
        x_global, mesh, spec
    )
