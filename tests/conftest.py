"""Test env: force the CPU backend with 8 virtual devices (so the sharded
halo-exchange paths are testable without a TPU pod — SURVEY.md section 4) and
enable x64 so the numpy and jax paths agree to f64 precision.

Must run before jax is imported anywhere.
"""

import os

# Force, not setdefault: the ambient environment pins JAX_PLATFORMS to the
# TPU tunnel; the test suite is defined to run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Installed pytest plugins (jaxtyping) import jax before this conftest runs,
# baking the ambient env into jax.config — override the config directly too
# (safe: the backend itself is only initialized on first device use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
