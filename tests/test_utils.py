"""Utility-layer tests: images, profiling models, finiteness checks,
multihost no-op bootstrap, and example scripts."""

import runpy
import sys

import numpy as np
import pytest

from pytv4d_tpu.utils import (
    IterationTimer,
    as_volume,
    assert_finite,
    cameraman,
    cp_traffic_model,
    roofline_fraction,
    synthetic_phantom,
)


def test_cameraman_contract():
    """Reference contract (``pytv/utils.py:46-55``): 256x256 integer image."""
    img = cameraman()
    assert img.shape == (256, 256)
    assert img.dtype == np.int64
    assert 0 <= img.min() and img.max() <= 255


def test_synthetic_phantom_deterministic():
    a, b = synthetic_phantom(64), synthetic_phantom(64)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 7 and a.max() <= 253


def test_as_volume():
    v = as_volume(np.ones((8, 8)), Nz=3, M=2)
    assert v.shape == (3, 2, 8, 8)
    v[0, 0, 0, 0] = 5  # must be writable (a copy, not a broadcast view)


def test_traffic_model_and_roofline():
    b = cp_traffic_model((8, 4, 64, 64), Nd=8)
    assert b > 0
    frac = roofline_fraction(b, 100.0)
    assert 0 < frac < 10


def test_assert_finite():
    assert_finite({"a": np.ones(3)}, "state")
    with pytest.raises(FloatingPointError, match="state"):
        assert_finite({"a": np.array([1.0, np.inf])}, "state")


def test_iteration_timer():
    import jax.numpy as jnp

    def run_n(n):
        return jnp.arange(n, dtype=jnp.float32) if n else jnp.zeros(1)

    its = IterationTimer(run_n, warmup_iters=1).measure(4, repeats=1)
    assert its > 0


def test_multihost_initialize_single_process(monkeypatch):
    from pytv4d_tpu.parallel import multihost

    # the tunneled dev chip sets a single-worker TPU_WORKER_HOSTNAMES, which
    # must NOT count as a cluster; a comma-separated list must
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not multihost.cluster_configured()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert multihost.cluster_configured()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")

    multihost.initialize()  # must no-op cleanly in a single process
    assert multihost._initialized


def test_multihost_initialize_raises_on_misconfigured_cluster(monkeypatch):
    """A declared cluster whose bootstrap fails must raise, never silently
    degrade to single-process (wrong-mesh results downstream)."""
    import jax

    from pytv4d_tpu.parallel import multihost

    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "badhost:1234")

    def boom(**kwargs):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="refusing to silently degrade"):
        multihost.initialize()
    assert not multihost._initialized


def test_example_scripts_run():
    """The scheme-math and sharded examples must execute end to end (the
    getting-started one has its own full-tier test below; it just takes
    longer)."""
    for script in ("examples/b_schemes_math.py", "examples/c_4d_sharded.py",
                   "examples/d_ct_reconstruction.py", "examples/e_tgv.py",
                   "examples/f_inverse_problems.py"):
        runpy.run_path(script, run_name="__main__")


@pytest.mark.full
def test_getting_started_script_runs():
    """examples/a_getting_started.py (the README user journey: TV values,
    GD/CP/ADMM cameraman denoising, operator forms, autodiff TV, TV-L1,
    gap certificate, TGV) executes end to end — ~12 s on forced CPU, so
    full tier (VERDICT r3 item 7)."""
    runpy.run_path("examples/a_getting_started.py", run_name="__main__")


def test_compile_cache_and_warm_compile(tmp_path):
    """enable_compile_cache points the persistent cache at the dir (entries
    appear after a compile) and warm_compile pre-compiles a jitted solver
    from ShapeDtypeStructs without running it."""
    import jax
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.cp import chambolle_pock
    from pytv4d_tpu.utils import enable_compile_cache, warm_compile

    d = str(tmp_path / "jc")
    assert enable_compile_cache(d, min_compile_time_secs=0.0) == d
    try:
        compiled = warm_compile(
            chambolle_pock,
            jax.ShapeDtypeStruct((1, 1, 32, 32), jnp.float32),
            n_iter=5,
        )
        assert hasattr(compiled, "as_text")
        assert len(list((tmp_path / "jc").iterdir())) >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_tgv_traffic_model_counts():
    """Plane counts of the streaming TGV traffic model, hand-derived from
    the kernel operand lists (kernels/tgv_stream.py)."""
    from pytv4d_tpu.utils.profiling import tgv_traffic_model

    vox = 2 * 3 * 8 * 16
    # 4d: n=4, n_q=10 -> PQ (1+8+10)+(4+10); XW (2+8+10)+(2+8) = 63 planes
    assert tgv_traffic_model((2, 3, 8, 16), "4d") == 63 * vox * 4
    # actual adds (1+4)+(1+4) z-shift planes = 73
    assert tgv_traffic_model((2, 3, 8, 16), "4d", model="actual") == (
        73 * vox * 4)
    # 2d: n=2, n_q=3 -> (1+4+3)+(2+3)+(2+4+3)+(2+4) = 28; no z extras
    assert tgv_traffic_model((2, 3, 8, 16), "2d") == 28 * vox * 4
    assert tgv_traffic_model((2, 3, 8, 16), "2d", model="actual") == (
        28 * vox * 4)
    # bf16 halves bytes
    assert tgv_traffic_model((2, 3, 8, 16), "3d", dtype="bfloat16") == (
        tgv_traffic_model((2, 3, 8, 16), "3d") // 2)
