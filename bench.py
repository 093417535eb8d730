"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: the BASELINE.md Chambolle-Pock recipe (cameraman 256x256, reg=25,
300 iterations) as device-resident iterations/s, vs the measured reference
baseline of 208 it/s (CPU NumPy, BASELINE.md "Measured solver baselines";
the reference GPU path is unrunnable without CUDA).  Run with the ambient
platform (TPU under the driver; CPU works too).

Extra diagnostics (4D throughput, bandwidth estimate) go to stderr so stdout
stays a single JSON line.
"""

import json
import sys
import time

import numpy as np

BASELINE_CP_IT_PER_S = 300 / 1.44  # BASELINE.md: 1.44 s / 300 it, CPU


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_cp_cameraman(n_iter=300, repeats=8):
    import jax
    import jax.numpy as jnp

    from pytv4d_tpu.models import add_noise
    from pytv4d_tpu.solvers.cp import chambolle_pock
    from pytv4d_tpu.utils import cameraman

    truth = cameraman().reshape((1, 1, 256, 256))
    noisy = jnp.asarray(add_noise(truth, 100.0, seed=0), dtype=jnp.float32)

    # compile + warm up
    res = chambolle_pock(noisy, n_iter=n_iter, reg=25.0)
    jax.block_until_ready(res.loss)
    final_loss = float(res.loss[-1])
    log(f"cp cameraman final loss: {final_loss:.2f} (f64 ref 38575639.48)")

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = chambolle_pock(noisy, n_iter=n_iter, reg=25.0)
        # ONE forced scalar host read is the sync: block_until_ready
        # returns early on tunneled backends (a no-op poll) and measurably
        # adds ~35 ms when combined with a subsequent read — the data
        # dependency through res.x is what genuinely waits for the solve
        float(jnp.sum(res.x))
        best = min(best, time.perf_counter() - t0)
    return n_iter / best, final_loss


def bench_cp_4d(shape=(32, 8, 256, 256), n_iter=50, dual_dtype=None,
                repeats=5, primary_dtype="float32"):
    """Secondary: big-4D CP (fused Pallas path) throughput + roofline
    fraction on BOTH traffic models (minimal = unique bytes, the honest
    denominator; actual = counts redundant neighbor DMA)."""
    import jax
    import jax.numpy as jnp

    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.core.schemes import num_channels
    from pytv4d_tpu.solvers.cp import chambolle_pock
    from pytv4d_tpu.utils.profiling import cp_traffic_model, roofline_fraction

    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.random(shape), dtype=primary_dtype)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)

    def run():
        res = chambolle_pock(noisy, n_iter=n_iter, reg=1.0, cfg=cfg,
                             dual_dtype=dual_dtype)
        # sync via one forced scalar read (see bench_cp_cameraman)
        return float(jnp.sum(res.x.astype(jnp.float32)))

    run()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    vox = float(np.prod(shape))
    it_s = n_iter / best
    nd = num_channels(cfg.scheme, shape[0], shape[1], cfg.reg_z_over_reg,
                      cfg.reg_time)
    t_min = cp_traffic_model(shape, nd, dtype=primary_dtype, model="minimal",
                             dual_dtype=dual_dtype)
    t_act = cp_traffic_model(shape, nd, dtype=primary_dtype, model="actual",
                             dual_dtype=dual_dtype)
    frac_min = roofline_fraction(t_min, it_s)
    tag = primary_dtype if primary_dtype != "float32" else "f32"
    if dual_dtype:
        tag += f"+{dual_dtype}-dual"
    log(
        f"cp 4D {shape} fused {tag}: {it_s:.1f} it/s, "
        f"{vox * it_s / 1e9:.2f} Gvox-it/s, "
        f"{100 * frac_min:.0f}% of HBM roofline (minimal model, "
        f"{t_min * it_s / 1e9:.0f} GB/s; actual-DMA model: "
        f"{t_act * it_s / 1e9:.0f} GB/s = "
        f"{100 * roofline_fraction(t_act, it_s):.0f}%)"
    )
    return it_s, frac_min


def bench_tgv_4d(shape=(32, 8, 256, 256), n_iter=30, repeats=5,
                 axes="2d", dtype="float32", compute_loss=True):
    """Secondary: TGV-2 kernels — slice-resident for axes='2d', streaming
    two-pass for the coupled modes.  Measured as the MARGINAL per-iteration
    cost via two solve lengths (n_iter and 5*n_iter): a single-length
    timing folds the one-time per-call costs (tunnel dispatch ~20-60 ms,
    initial-state layout conversion, result readback) into the rate —
    at n_iter=30 that under-reported the coupled-4D kernel by ~25%
    (223 vs 298 it/s measured; CLAUDE.md timing discipline)."""
    import jax.numpy as jnp

    from pytv4d_tpu.solvers.tgv import tgv_denoise

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape), dtype=dtype)

    def timed(n):
        def run():
            res = tgv_denoise(x, n_iter=n, axes=axes,
                              compute_loss=compute_loss)
            return float(jnp.sum(res.x.astype(jnp.float32)))

        run()
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return best

    it_s = (5 * n_iter - n_iter) / (timed(5 * n_iter) - timed(n_iter))
    roof = ""
    if axes in ("3d", "4d"):  # streaming two-pass kernels: HBM-bound
        from pytv4d_tpu.utils.profiling import (
            roofline_fraction,
            tgv_traffic_model,
        )

        t_min = tgv_traffic_model(shape, axes, dtype=dtype)
        roof = (f", {100 * roofline_fraction(t_min, it_s):.0f}% of HBM "
                f"roofline (minimal model)")
    log(f"tgv {axes} {shape} {dtype}: {it_s:.1f} it/s, "
        f"{float(np.prod(shape)) * it_s / 1e9:.2f} Gvox-it/s{roof}")
    return it_s


def bench_north_star(shape=(96, 16, 512, 512), n_iter=40, repeats=3):
    """README headline, driver-audited (VERDICT r4 item 2): the 403M-voxel
    north-star CP solve on ONE chip with bf16 primary+dual storage and
    ``return_dual=False`` (the only storage config that fits next to the
    solver transients — f32-primary OOMs, docs/performance.md).  Expected
    ~21.5 it/s = 8.7 Gvox-it/s (round-2 measurement; tunnel variance
    10-30%)."""
    import jax.numpy as jnp

    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.solvers.cp import chambolle_pock

    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.random(shape, dtype=np.float32), jnp.bfloat16)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)

    def run():
        res = chambolle_pock(noisy, n_iter=n_iter, reg=1.0, cfg=cfg,
                             dual_dtype="bfloat16", return_dual=False)
        return float(jnp.sum(res.x.astype(jnp.float32)))

    run()  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    it_s = n_iter / best
    log(f"north star {shape} bf16 p+d: {it_s:.1f} it/s, "
        f"{float(np.prod(shape)) * it_s / 1e9:.2f} Gvox-it/s")
    return it_s


def bench_ct_production_recon(n_iter=100, repeats=3, precision=None):
    """Flagship CT claim, driver-audited (VERDICT r3 item 6): the
    TV-regularized ``cp_reconstruct`` at the production dynamic-CT scale
    (16, 4, 512, 512) x 96 angles on the gather-free spectral projector —
    reconstruction iterations/s only (the forward/adjoint breakdown lives
    in ``pytv4d_tpu.bench.harness.bench_ct_production``).  ``precision``:
    None = the library default ('high', ~5e-6 operator accuracy);
    'default' = single-pass bf16 matmuls (~1e-3, the gather projector's
    own error order) for the fast variant."""
    import jax
    import jax.numpy as jnp

    from pytv4d_tpu.core.config import TVConfig
    from pytv4d_tpu.models.ct import cp_reconstruct, make_projector
    from pytv4d_tpu.solvers.inverse import power_iteration

    vol_shape = (16, 4, 512, 512)
    n_angles = 96
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(vol_shape), jnp.float32)
    angles = np.linspace(0.0, np.pi, n_angles, endpoint=False)
    cfg = TVConfig(scheme="hybrid", reg_time=0.5)

    A, A_T = make_projector(vol_shape, angles, method="spectral",
                            precision=precision)
    sino = jax.jit(A)(vol)
    float(jnp.sum(sino))
    op_norm = float(power_iteration(A, A_T, vol_shape))

    def run():
        res = cp_reconstruct(sino, angles, vol_shape, n_iter=n_iter,
                             reg=0.5, cfg=cfg, op_norm=op_norm,
                             method="spectral", loss_every=n_iter,
                             precision=precision)
        return float(jnp.sum(res.x))

    run()  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    it_s = n_iter / best
    log(f"ct production recon (16,4,512,512)x96 spectral"
        f"[{precision or 'high'}]: {it_s:.1f} it/s")
    return it_s


def _probe_devices(timeout_s: float = 180.0, retries: int = 3,
                   backoff_s: float = 120.0):
    """Bounded platform probe with retry: ``jax.devices()`` hangs
    INDEFINITELY when the TPU tunnel is wedged (observed after worker
    crashes) — better to fast-fail with a diagnostic than to block the
    driver.  Each attempt runs in a FRESH subprocess (an in-process retry
    would block on the same singleton backend-init lock as the first hung
    attempt), spread over ~10 min so a transient tunnel blip does not cost
    the round's benchmark; only then rc 3."""
    import subprocess
    import threading

    # The probe honors JAX_PLATFORMS via jax.config (the machine's axon
    # sitecustomize force-registers the TPU backend, so the env var alone
    # cannot select a platform) — under the driver this is 'axon', and it
    # makes the probe locally testable with JAX_PLATFORMS=cpu.
    probe_src = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "d = jax.devices()\n"
        "print('PROBE-OK', len(d), d[0].platform)\n"
    )
    for attempt in range(1, retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if r.returncode == 0 and "PROBE-OK" in r.stdout:
                log(f"probe attempt {attempt}/{retries}: "
                    f"{r.stdout.strip().splitlines()[-1]}")
                break
            log(f"probe attempt {attempt}/{retries} failed "
                f"(rc={r.returncode}): {r.stderr.strip()[-200:]}")
        except subprocess.TimeoutExpired:
            log(f"probe attempt {attempt}/{retries} timed out "
                f"after {timeout_s:.0f}s")
        if attempt < retries:
            log(f"backing off {backoff_s:.0f}s before retry")
            time.sleep(backoff_s)
    else:
        log(f"FATAL: backend unreachable after {retries} probes across "
            f"~{(retries * timeout_s + (retries - 1) * backoff_s) / 60:.0f} "
            f"min (wedged tunnel?) — no benchmark is possible")
        # keep the one-JSON-line stdout contract even on failure
        print(json.dumps({
            "metric": "cp_denoise_cameraman_300it", "value": 0.0,
            "unit": "it/s", "vs_baseline": 0.0,
            "error": "backend unreachable (wedged tunnel)",
        }))
        sys.exit(3)

    # The subprocess proved the tunnel is answering; the main-process touch
    # still gets a (generous) bound in case it wedges in between.
    out = {}

    def touch():
        import jax

        out["devices"] = jax.devices()

    t = threading.Thread(target=touch, daemon=True)
    t.start()
    t.join(timeout_s * 2)
    if "devices" not in out:
        log("FATAL: backend answered the probe but wedged on the main-"
            "process touch")
        print(json.dumps({
            "metric": "cp_denoise_cameraman_300it", "value": 0.0,
            "unit": "it/s", "vs_baseline": 0.0,
            "error": "backend wedged after successful probe",
        }))
        sys.exit(3)
    return out["devices"]


def _record_local(record: dict) -> None:
    """Append the bench result to BENCH_LOCAL.jsonl (timestamp, git sha,
    platform, metrics) — the auditable builder-side history that survives
    driver-window tunnel outages (VERDICT r2 item 2c)."""
    import datetime
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        sha = subprocess.run(
            ["git", "-C", here, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        sha = "unknown"
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        platform = "unknown"
    row = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "sha": sha,
        "platform": platform,
        **record,
    }
    try:
        with open(os.path.join(here, "BENCH_LOCAL.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")
    except OSError as e:  # history must never break the headline
        log(f"BENCH_LOCAL.jsonl append failed: {e!r}")


def main():
    log(f"devices: {_probe_devices()}")
    it_per_s, final_loss = bench_cp_cameraman()
    extras = {}
    try:
        it4, frac_min = bench_cp_4d()
        extras["fused_4d_it_s"] = round(it4, 1)
        extras["fused_4d_roofline_minimal"] = round(frac_min, 3)
        it4b, _ = bench_cp_4d(dual_dtype="bfloat16", repeats=3)
        extras["fused_4d_bf16_it_s"] = round(it4b, 1)
        # flagship storage config (the north-star one): bf16 primary + dual
        it4pd, _ = bench_cp_4d(dual_dtype="bfloat16",
                               primary_dtype="bfloat16", repeats=3)
        extras["fused_4d_bf16pd_it_s"] = round(it4pd, 1)
        # NOTE the key names (VERDICT r3 item 6): the default bench_tgv_4d
        # runs the axes='2d' slice-resident kernel on a 4D volume — name it
        # tgv_2d; the genuinely coupled space-time kernel is the _coupled key
        extras["tgv_2d_it_s"] = round(bench_tgv_4d(), 1)
        extras["tgv_4d_coupled_bf16_it_s"] = round(
            bench_tgv_4d(axes="4d", dtype="bfloat16", compute_loss=False,
                         repeats=3), 1)
    except Exception as e:  # diagnostics must never break the headline
        log(f"4D bench skipped: {e!r}")

    try:
        # README headline regression guard (VERDICT r4 item 2): shielded
        # separately so an OOM/compile hiccup at 403M vox cannot take the
        # CT keys down with it
        extras["north_star_cp_it_s"] = round(bench_north_star(), 1)
    except Exception as e:
        log(f"north-star bench skipped: {e!r}")

    try:
        extras["ct_production_recon_it_s"] = round(
            bench_ct_production_recon(), 1)
        extras["ct_production_recon_fast_it_s"] = round(
            bench_ct_production_recon(precision="default"), 1)
    except Exception as e:
        log(f"CT production bench skipped: {e!r}")

    try:
        # cone-beam flagship (gather-free SSRB + order-1 slope correction;
        # the gather cone kernel-faults the worker far below this scale)
        from pytv4d_tpu.bench.harness import bench_ct_cone

        cone = bench_ct_cone()
        extras["ct_cone_recon_it_s"] = round(cone["cone_recon_it_per_s"], 1)
        if "cone_fdk_s" in cone:       # round-5: gather-free P-FDK
            extras["ct_cone_fdk_s"] = round(cone["cone_fdk_s"], 3)
        if "cone_sart_epochs_per_s" in cone:  # round-5: cone OS-SART
            extras["ct_cone_sart_epochs_s"] = round(
                cone["cone_sart_epochs_per_s"], 2)
    except Exception as e:
        log(f"CT cone bench skipped: {e!r}")

    record = {
        "metric": "cp_denoise_cameraman_300it",
        "value": round(it_per_s, 1),
        "unit": "it/s",
        "vs_baseline": round(it_per_s / BASELINE_CP_IT_PER_S, 2),
        **extras,
    }
    _record_local(record)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
