"""Numerical-health checking (SURVEY.md section 5 "Race detection /
sanitizers": the reference has nothing; the jax-native equivalent is
``checkify`` + explicit finiteness guards with deterministic seeds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assert_finite(tree, name: str = "value"):
    """Host-side check that every leaf of a pytree is finite; raises with the
    offending leaf path."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            label = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{label}: "
                f"{int(jnp.sum(~jnp.isfinite(arr)))} bad elements"
            )


def checkified(fn, *, errors=None):
    """Wrap a jittable function with ``jax.experimental.checkify`` NaN/div
    checks; returns ``(err, out)`` — call ``err.throw()`` on host."""
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks
    return checkify.checkify(fn, errors=errors)
