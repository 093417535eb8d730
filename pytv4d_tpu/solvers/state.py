"""Solver-state checkpoint / resume (SURVEY.md section 5: the reference has
none — its solvers are user loops holding state in Python locals, with dev-test
TIFF dumps as the only artifact, ``pytv/tests.py:432-434``).

Any solver-state pytree (``CPState``, ``ADMMState``, plain dicts of arrays)
can be saved to a single ``.npz`` and restored; :func:`run_checkpointed`
wraps a scan-style solver so long runs snapshot at a configurable cadence and
resume after interruption.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import numpy as np


def save_state(path: str, pytree: Any) -> None:
    """Save an arbitrary pytree of arrays to ``path`` (.npz, atomic rename)."""
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`; ``like`` supplies the
    tree structure (e.g. a freshly-initialized solver state).

    Forward-compatible with states that GREW trailing optional leaves
    (e.g. ``InverseState.s_x``/``s_x_bar``, added for the linearity
    rewrite): a checkpoint with fewer arrays than the template loads with
    the template's trailing NamedTuple fields set to ``None`` — the
    solvers accept that and recompute the derived quantities once on
    resume (exact in math, may differ from an uninterrupted run in the
    last ulps)."""
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    want, treedef = jax.tree_util.tree_flatten(like)
    if (len(leaves) < len(want) and hasattr(like, "_fields")
            and hasattr(like, "_replace")):
        # pre-format-change checkpoint: None out trailing fields (None is
        # not a pytree leaf) until the leaf counts match, if they can
        reduced = like
        for name in reversed(like._fields):
            if len(jax.tree_util.tree_flatten(reduced)[0]) <= len(leaves):
                break
            reduced = reduced._replace(**{name: None})
        want2, treedef2 = jax.tree_util.tree_flatten(reduced)
        if len(want2) == len(leaves):
            want, treedef = want2, treedef2
    if len(leaves) != len(want):
        raise ValueError(
            f"checkpoint {path!r} holds {len(leaves)} arrays but the "
            f"template {type(like).__name__} expects {len(want)} — the "
            f"solver's state format has likely changed since the "
            f"checkpoint was written (e.g. chambolle_pock_precond now "
            f"carries the over-relaxed iterate); restart the run"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_state_orbax(path: str, pytree: Any) -> None:
    """Save a solver-state pytree with orbax (async-capable, multi-host-safe
    for sharded arrays — use this for pod runs; :func:`save_state` for simple
    single-host npz snapshots)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), pytree, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_state_orbax`; ``like`` supplies
    structure/shapes/shardings (e.g. a freshly-initialized state)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)


def run_checkpointed(
    solver: Callable[..., Any],
    x_noisy,
    n_iter: int,
    checkpoint_path: str = None,
    checkpoint_every: int = 0,
    **solver_kwargs,
):
    """Run ``solver(x_noisy, n_iter=..., state=..., **kwargs)`` in chunks,
    saving ``result.state`` every ``checkpoint_every`` iterations and resuming
    from ``checkpoint_path`` if it exists.

    The solver must follow the package convention: accept a ``state`` kwarg
    and return a result with ``.state`` and ``.loss`` fields (``chambolle_pock``
    and ``admm`` do).  Returns (final_result, full_loss_history).
    """
    if not checkpoint_every or checkpoint_path is None:
        return solver(x_noisy, n_iter=n_iter, **solver_kwargs)

    state = None
    done = 0
    losses = []
    if os.path.exists(checkpoint_path):
        meta_path = checkpoint_path + ".meta.npz"
        if os.path.exists(meta_path):
            with np.load(meta_path) as meta:
                done = int(meta["done"])
                losses = [meta["losses"]]
        # Build a template state to restore into.
        probe = solver(x_noisy, n_iter=0, **solver_kwargs)
        state = load_state(checkpoint_path, probe.state)

    result = None
    while done < n_iter:
        chunk = min(checkpoint_every, n_iter - done)
        result = solver(x_noisy, n_iter=chunk, state=state, **solver_kwargs)
        state = result.state
        losses.append(np.asarray(result.loss))
        done += chunk
        save_state(checkpoint_path, state)
        with open(checkpoint_path + ".meta.npz.tmp", "wb") as f:
            np.savez(f, done=done, losses=np.concatenate(losses))
        os.replace(checkpoint_path + ".meta.npz.tmp", checkpoint_path + ".meta.npz")

    full_loss = np.concatenate(losses) if losses else np.zeros((0,))
    return result._replace(loss=full_loss)


def run_until_converged(
    solver,
    x_noisy,
    tol: float = 1e-6,
    chunk: int = 50,
    max_iter: int = 5000,
    criterion: str = "loss",
    gap_x_box=None,
    gap_norm_bound=None,
    gap_w_box=None,
    gap_operator=None,
    **solver_kwargs,
):
    """Tolerance-based stopping for the fixed-length ``lax.scan`` solvers:
    run ``solver`` in device-resident chunks and stop when the convergence
    criterion falls below ``tol`` (or at ``max_iter``).  Only one scalar
    crosses to the host per chunk — the XLA-friendly alternative to a
    per-iteration ``while_loop`` (which would forbid the stacked loss
    history).

    ``criterion``:

    - ``'loss'`` (default, any solver): relative loss change across a
      chunk, ``|loss[0] - loss[-1]| / |loss[-1]|`` — a heuristic.
    - ``'gap'``: relative primal-dual gap — a CERTIFIED optimality bound,
      gap/P >= (P(x) - P(x*)) / P(x).  For the denoising solvers
      (``chambolle_pock``/``chambolle_pock_precond``, l2 fidelity) this is
      ``solvers.cp.pd_gap``.  For the INVERSE solvers (``cp_inverse`` /
      ``cp_reconstruct`` states) it is ``solvers.inverse.pd_gap_inverse``,
      which additionally needs a compact prior set containing the true
      solution: pass ``gap_x_box=c`` (0 <= x <= c) and/or
      ``gap_norm_bound=R`` (||x||_2 <= R) — these are consumed here, not
      forwarded to the solver.  The forward operator is read from the
      ``functools.partial`` composition (``partial(cp_inverse, A,
      vol_shape=...)`` — the documented pattern) or passed explicitly as
      ``gap_operator=A`` (required for ``cp_reconstruct``, whose projector
      is built internally: reuse ``models.ct.make_projector``).  TGV
      inverse states use ``solvers.tgv.tgv_gap_inverse`` (pass alpha1/
      alpha0 explicitly; ``gap_w_box`` bounds the auxiliary field,
      defaulting to ``gap_x_box`` — the gradient bound of a [0, c] image).

    Works with any solver following the package convention: ``chambolle_pock``
    and ``admm`` resume via their ``state`` kwarg; ``subgradient_descent``
    (no carried dual) resumes via ``x_init``.  Returns the solver's result
    type with the concatenated loss history.
    """
    import functools
    import inspect

    if criterion not in ("loss", "gap"):
        raise ValueError(
            f"criterion must be 'loss' or 'gap', got {criterion!r}"
        )
    takes_state = "state" in inspect.signature(solver).parameters
    # The gap is computed against the *objective the solver optimizes*; a
    # caller composing via functools.partial(chambolle_pock, reg=...) bakes
    # that objective into the solver, so merge partial keywords into the
    # lookup (call-site solver_kwargs win, matching call semantics).
    gap_kwargs = dict(solver_kwargs)
    gap_pos_args = []
    f = solver
    while isinstance(f, functools.partial):
        for k, v in (f.keywords or {}).items():
            gap_kwargs.setdefault(k, v)
        # partial(partial(f, *a1), *a2) calls f(*a1, *a2): inner args lead
        gap_pos_args = list(f.args) + gap_pos_args
        f = f.func
    is_tgv = "alpha1" in inspect.signature(f).parameters
    if criterion == "gap":
        if is_tgv and ("alpha1" not in gap_kwargs
                       or "alpha0" not in gap_kwargs):
            raise ValueError(
                "criterion='gap' on a TGV solver computes the gap of "
                "F + a1 N(Dx - w) + a0 N(Ew) and needs the SAME alphas the "
                "solver uses — pass alpha1= and alpha0= explicitly; "
                "refusing to silently default"
            )
        if not is_tgv and "reg" not in gap_kwargs:
            raise ValueError(
                "criterion='gap' computes the duality gap of the objective "
                "F(x) + reg*TV(x) and needs the SAME reg the solver uses — "
                "pass reg= explicitly (as a kwarg here or on a "
                "functools.partial solver); refusing to silently default"
            )
        if not takes_state:
            raise ValueError(
                "criterion='gap' needs a solver that carries a primal-dual "
                "state (chambolle_pock / cp_inverse); loss-based stopping "
                "works for all solvers"
            )
        if (gap_kwargs.get("fidelity", "l2") != "l2"
                and gap_x_box is None and gap_norm_bound is None):
            # fail FAST, before a whole chunk of solve: without a prior
            # set this can only be the denoising gap, which is l2-only
            # (the inverse gap supports l1/kl but requires gap_x_box /
            # gap_norm_bound anyway)
            raise ValueError(
                "criterion='gap' certifies the l2-fidelity denoising "
                "objective (solvers.cp.pd_gap) — use criterion='loss' for "
                "fidelity='l1'/'kl' denoising, or, for the INVERSE "
                "solvers (which support all three), pass the prior set "
                "(gap_x_box=/gap_norm_bound=)"
            )
    state = None
    x_init = None
    losses = []
    done = 0
    result = None
    prev_last_loss = None
    while done < max_iter:
        n = min(chunk, max_iter - done)
        if takes_state:
            result = solver(x_noisy, n_iter=n, state=state, **solver_kwargs)
            state = result.state
        else:
            result = solver(x_noisy, n_iter=n, x_init=x_init, **solver_kwargs)
            x_init = result.x
        loss = np.asarray(result.loss)
        losses.append(loss)
        done += n
        if criterion == "gap":
            from .cp import CPPrecondState, CPState, pd_gap
            from .inverse import InverseState, pd_gap_inverse
            from .tgv import TGVInverseState, tgv_gap_inverse

            def _operator():
                A = gap_operator
                if A is None and gap_pos_args and callable(gap_pos_args[0]):
                    A = gap_pos_args[0]  # partial(cp_inverse, A, ...)
                if A is None:
                    raise ValueError(
                        "criterion='gap' on an inverse-solver state needs "
                        "the forward operator: compose the solver as "
                        "functools.partial(cp_inverse, A, vol_shape=...) "
                        "or pass gap_operator=A (for cp_reconstruct / "
                        "tgv_reconstruct, build A via "
                        "models.ct.make_projector)"
                    )
                return A

            # type dispatch FIRST: states without a y_D field (ADMM, TGV
            # denoising) must get the clear unsupported-solver error, not
            # an AttributeError
            if isinstance(state, TGVInverseState):
                gap = float(tgv_gap_inverse(
                    state, _operator(), x_noisy,
                    alpha1=gap_kwargs["alpha1"],
                    alpha0=gap_kwargs["alpha0"],
                    axes=gap_kwargs.get("axes", "2d"),
                    norm=gap_kwargs.get("norm", "iso"),
                    huber_delta=gap_kwargs.get("huber_delta", 1.0),
                    fidelity=gap_kwargs.get("fidelity", "l2"),
                    fidelity_weight=gap_kwargs.get("fidelity_weight", 1.0),
                    x_box=gap_x_box,
                    w_box=gap_w_box,
                    A_T=gap_kwargs.get("A_T"),
                ))
            elif isinstance(state, InverseState):
                A = _operator()
                gap = float(pd_gap_inverse(
                    state, A, x_noisy,
                    reg=gap_kwargs["reg"],
                    cfg=gap_kwargs.get("cfg", _default_cfg()),
                    fidelity=gap_kwargs.get("fidelity", "l2"),
                    fidelity_weight=gap_kwargs.get("fidelity_weight", 1.0),
                    x_box=gap_x_box,
                    norm_bound=gap_norm_bound,
                    A_T=gap_kwargs.get("A_T"),
                ))
            elif isinstance(state, (CPState, CPPrecondState)):
                if gap_kwargs.get("fidelity", "l2") != "l2":
                    raise ValueError(
                        "criterion='gap' certifies the l2-fidelity "
                        "denoising objective (solvers.cp.pd_gap) — use "
                        "criterion='loss' for fidelity='l1'/'kl' denoising "
                        "(the inverse solvers' gap supports all three)"
                    )
                if state.y_D is None:
                    raise ValueError(
                        "criterion='gap' needs the dual in the state — do "
                        "not pass return_dual=False"
                    )
                gap = float(pd_gap(
                    state, x_noisy,
                    reg=gap_kwargs["reg"],
                    cfg=gap_kwargs.get("cfg", _default_cfg()),
                    mask_static=gap_kwargs.get("mask_static"),
                    weight_time=gap_kwargs.get("weight_time"),
                ))
            else:
                raise ValueError(
                    f"criterion='gap' supports the denoising CP solvers "
                    f"and the inverse solvers (cp_inverse/cp_reconstruct/"
                    f"tgv_inverse) — got {type(state).__name__}"
                )
            if gap <= tol * abs(float(loss[-1])):
                break
        else:
            # Compare against the previous chunk's last loss so a length-1
            # chunk (chunk=1, or a trailing remainder of 1) cannot trivially
            # report convergence via loss[0] == loss[-1].
            ref = float(loss[0]) if len(loss) > 1 else prev_last_loss
            if (ref is not None
                    and abs(ref - float(loss[-1]))
                    <= tol * abs(float(loss[-1]))):
                break
        prev_last_loss = float(loss[-1])
    return result._replace(loss=np.concatenate(losses))


def _default_cfg():
    from ..core.config import TVConfig

    return TVConfig()
