"""EXPERIMENT (ROADMAP item 2 / VERDICT r2 item 5): z-streaming pass A.

The production pass-A kernel (``fused.make_cp_dual_kernel``) runs a
(Nz, R) grid where each program reads its x plane plus BOTH z neighbors
through shifted BlockSpecs — every x plane crosses HBM->VMEM three times.
By the measured marginal-bandwidth rule (~90-110 us per volume-equivalent
at 16.8 M voxels, docs/performance.md) the two redundant reads cost ~6 %
of the whole iteration.

This kernel removes them: the grid covers ROW TILES only and an in-kernel
``fori_loop`` streams z planes through a 4-slot revolving VMEM window
(z-1, z, z+1 resident + z+2 in flight) with manual double-buffered DMA
(``pltpu.make_async_copy``) for every operand — each plane of every array
crosses HBM exactly ONCE.  The cost: Pallas's automatic cross-program
pipelining is gone, so latency hiding rests entirely on this kernel's own
choreography — the reason ROADMAP deferred it as "plausibly negative".

The compute body is byte-for-byte the production one (``fused._dual_core``
on VMEM scratch slots), so outputs match ``make_cp_dual_kernel`` to f32
round-off (tests/test_zstream.py); only the traffic schedule differs.

DMA discipline (hardware semaphores are strict — unlike interpret mode,
a double wait deadlocks):

- x in:   start(z) at step z-2 (prologue: 0, 1); wait(z+1) at step z
  (plane z was waited at step z-1); 4 slots = {z-1, z, z+1, in-flight}.
- x0/yA/yD in: start(z+1) at step z into slot (z+1) % 2, wait(z) at
  step z; before re-loading a slot that is also written back (yA, yD),
  wait its out-DMA from step z-1.
- outs:   start(z) after compute; dt's slot is reused at z+2, so wait
  dto(z-2) before writing the slot; epilogue waits the final two of each.

Scope (experiment, unsharded bench config): any scheme/norm via the
channel table, l2/l1/kl scalar fidelity, f32/bf16 storage and dual,
no static-mask/weight_time plane, Nz >= 3.

ON-CHIP VERDICT (v5e, 2026-08-19, BENCH_LOCAL.jsonl): the isolated
pass-A scan wins for f32 primaries (1.080x f32-dual, 1.065x bf16-dual;
bf16 primary loses at 0.968x — halved x bytes no longer cover the manual
choreography), but the COMPOSED CP step's marginal per-iteration cost is
identical to <0.3 % (2.506 vs 2.503 ms/it, 4x interleaved A/B via
t(150)-t(50)) — the isolated saving does not transfer, so this kernel is
NOT dispatched by ``cp_step_fused_internal``.  Kept with its parity
tests as the recorded closing result for ROADMAP item 2 and as the
reference choreography for manual multi-operand DMA pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import TVConfig
from .fused import _build, _dual_core, _needs_z, _Specs

def _scratch_bytes(TR, Nc, M, Nd, bpe, dual_bpe):
    """Explicit scratch (4 x slots + 2x(x0, yA, dt) + 2 yD slots) plus the
    f32 compute stack (~2 Nd channel tiles live at the prox peak)."""
    buffers = M * TR * Nc * (10 * bpe + 2 * Nd * dual_bpe)
    seams = 2 * 4 * M * 8 * Nc * bpe  # 8-row aligned seam granules
    stack = M * TR * Nc * 4 * (2 * Nd + 6)
    return buffers + seams + stack


@functools.lru_cache(maxsize=None)
def make_cp_dual_kernel_zstream(cfg: TVConfig, shape, dtype_name="float32",
                                sigma_D=0.5, sigma_A=1.0, reg=1.0,
                                interpret=False, dual_dtype_name=None,
                                fidelity="l2", fid_weight=1.0,
                                row_tile=None):
    """Pass A with single-read z streaming; same contract as
    ``fused.make_cp_dual_kernel`` (unsharded mode): ``call(x, x0, y_A,
    y_D_int) -> (y_A', y_D_int', dt_local, l21_parts)`` with
    ``l21_parts`` shaped (R, 8, 128) (consume with ``[..., 0, 0]``)."""
    Nz, M, Nr, Nc = shape
    if Nz < 3:
        raise ValueError("zstream pass A needs Nz >= 3 (use the production "
                         "kernel for thin volumes)")
    sp0, chans, weights, _, dtype, store = _build(cfg, shape, dtype_name,
                                                  dual_dtype_name)
    dual_dtype = jnp.dtype(dual_dtype_name or dtype_name)
    Nd = len(chans)
    if not _needs_z(chans):
        raise ValueError("zstream pass A only pays off with z channels "
                         "(reg_z_over_reg > 0 and Nz > 1)")
    if Nr < 8 or Nr % 8:
        raise ValueError("zstream pass A requires Nr a multiple of 8 "
                         "(seam DMAs read aligned 8-row granules)")
    # default to the PRODUCTION kernel's row tile: dt_local's in-tile /
    # cross-tile split is tiling-defined, and pass B
    # (fused.make_cp_primal_kernel) assumes pass A used _build's TR — a
    # different row_tile is for pass-A-only experiments
    TR = int(row_tile) if row_tile else sp0.TR
    sp = _Specs(Nz, M, Nr, Nc, Nd, TR, dthin=sp0.dthin, xthin=sp0.xthin)
    R = sp.R

    def kernel(x_hbm, x0_hbm, yA_hbm, yD_hbm,
               yAo_hbm, yDo_hbm, dto_hbm, l21_ref,
               xbuf, sup, sdn, x0buf, yAbuf, yDbuf, dtbuf, part,
               x_sem, sup_sem, sdn_sem, x0_sem, yAi_sem, yDi_sem,
               yAo_sem, yDo_sem, dto_sem):
        r = pl.program_id(0)
        r0 = r * TR
        # Mosaic rejects 1-row HBM slices on the sublane dim (size must be
        # a multiple of the 8-row tiling granule) — DMA the aligned 8-row
        # granule containing the seam row and select the row in VMEM.
        # up seam row = max(r0-1, 0): granule r0-8 row 7, or granule 0
        # row 0 for the first tile; down seam row = min(r0+TR, Nr-1):
        # granule r0+TR row 0, or granule Nr-8 row 7 for the last tile.
        # Offsets are written as 8 * granule_index so Mosaic can PROVE
        # divisibility by the tiling (max(r0-8, 0) defeats its analysis).
        up_gran = jnp.maximum(r0 // 8 - 1, 0) * 8
        dn_gran = jnp.minimum(r0 // 8 + TR // 8, Nr // 8 - 1) * 8

        def x_in(z):
            s = jax.lax.rem(z, 4)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(z, 1), :, pl.ds(r0, TR), :],
                xbuf.at[pl.ds(s, 1)], x_sem.at[s])

        def seam_in(z, which):
            s = jax.lax.rem(z, 4)
            ref, sem, gran = ((sup, sup_sem, up_gran) if which == 0
                              else (sdn, sdn_sem, dn_gran))
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(z, 1), :, pl.ds(gran, 8), :],
                ref.at[pl.ds(s, 1)], sem.at[s])

        def plane_in(z, hbm, buf, sem):
            s = jax.lax.rem(z, 2)
            return pltpu.make_async_copy(
                hbm.at[pl.ds(z, 1), :, pl.ds(r0, TR), :],
                buf.at[pl.ds(s, 1)], sem.at[s])

        def yD_in(z):
            s = jax.lax.rem(z, 2)
            return pltpu.make_async_copy(
                yD_hbm.at[pl.ds(z, 1), :, :, pl.ds(r0, TR), :],
                yDbuf.at[pl.ds(s, 1)], yDi_sem.at[s])

        def yA_out(z):
            s = jax.lax.rem(z, 2)
            return pltpu.make_async_copy(
                yAbuf.at[pl.ds(s, 1)],
                yAo_hbm.at[pl.ds(z, 1), :, pl.ds(r0, TR), :], yAo_sem.at[s])

        def yD_out(z):
            s = jax.lax.rem(z, 2)
            return pltpu.make_async_copy(
                yDbuf.at[pl.ds(s, 1)],
                yDo_hbm.at[pl.ds(z, 1), :, :, pl.ds(r0, TR), :],
                yDo_sem.at[s])

        def dt_out(z):
            s = jax.lax.rem(z, 2)
            return pltpu.make_async_copy(
                dtbuf.at[pl.ds(s, 1)],
                dto_hbm.at[pl.ds(z, 1), :, pl.ds(r0, TR), :], dto_sem.at[s])

        def start_ins(z):
            x_in(z).start()
            if R > 1:
                seam_in(z, 0).start()
                seam_in(z, 1).start()

        def wait_ins(z):
            x_in(z).wait()
            if R > 1:
                seam_in(z, 0).wait()
                seam_in(z, 1).wait()

        # prologue: planes 0 and 1 of x (+seams), plane 0 of x0/yA/yD
        start_ins(0)
        start_ins(1)
        plane_in(0, x0_hbm, x0buf, x0_sem).start()
        plane_in(0, yA_hbm, yAbuf, yAi_sem).start()
        yD_in(0).start()
        wait_ins(0)

        def step(z, acc):
            s = jax.lax.rem(z, 2)
            s4 = jax.lax.rem(z, 4)

            @pl.when(z + 2 < Nz)
            def _():
                start_ins(z + 2)

            @pl.when(z + 1 < Nz)
            def _():
                # the (z+1) % 2 slots were consumed at step z-1; yA/yD
                # slots are also WRITTEN BACK at step z-1 — their out-DMAs
                # must land before the slot is refilled
                @pl.when(z >= 1)
                def _():
                    yA_out(z - 1).wait()
                    yD_out(z - 1).wait()
                plane_in(z + 1, x0_hbm, x0buf, x0_sem).start()
                plane_in(z + 1, yA_hbm, yAbuf, yAi_sem).start()
                yD_in(z + 1).start()
                wait_ins(z + 1)

            plane_in(z, x0_hbm, x0buf, x0_sem).wait()
            plane_in(z, yA_hbm, yAbuf, yAi_sem).wait()
            yD_in(z).wait()

            # dt slot s is in flight from step z-2
            @pl.when(z >= 2)
            def _():
                dt_out(z - 2).wait()

            x = xbuf[s4].astype(dtype)
            x_zm = xbuf[jax.lax.rem(z + 3, 4)].astype(dtype)  # (z-1) % 4
            x_zp = xbuf[jax.lax.rem(z + 1, 4)].astype(dtype)
            if R > 1:
                up8 = sup[s4].astype(dtype)      # (M, 8, Nc) granule
                dn8 = sdn[s4].astype(dtype)
                # first tile: clamped seam row 0 lives at granule row 0;
                # otherwise row 7 of granule r0-8 (= row r0-1)
                up_row = jnp.where(r0 == 0, up8[:, 0:1, :], up8[:, 7:8, :])
                # last tile: clamped seam row Nr-1 = row 7 of granule
                # Nr-8; otherwise row 0 of granule r0+TR
                dn_row = jnp.where(r0 + TR > Nr - 1,
                                   dn8[:, 7:8, :], dn8[:, 0:1, :])
            else:
                up_row = dn_row = jnp.zeros((M, 1, Nc), dtype)

            _dual_core(cfg, sp, chans, weights, sigma_D, sigma_A, reg,
                       dtype, store, dual_dtype, True, True, None,
                       x, up_row, dn_row, x_zm, x_zp, x, 0, z, r,
                       x0buf.at[pl.ds(s, 1)],
                       yAbuf.at[pl.ds(s, 1)],
                       yDbuf.at[pl.ds(s, 1)],
                       yAbuf.at[pl.ds(s, 1)],
                       yDbuf.at[pl.ds(s, 1)],
                       dtbuf.at[pl.ds(s, 1)], part,
                       fidelity=fidelity, fw=fid_weight)

            yA_out(z).start()
            yD_out(z).start()
            dt_out(z).start()
            return acc + part[0, 0, 0, 0]

        acc = jax.lax.fori_loop(0, Nz, step, jnp.zeros((), dtype))
        l21_ref[0] = jnp.full((8, 128), acc, dtype)
        # epilogue: the last two of every out stream are still in flight
        # (yA/yD out(k) is waited in-loop only for k <= Nz-3, dt likewise)
        for z in (Nz - 2, Nz - 1):
            yA_out(z).wait()
            yD_out(z).wait()
            dt_out(z).wait()

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    fn = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[any_spec] * 4,
        out_specs=(any_spec, any_spec, any_spec,
                   pl.BlockSpec((1, 8, 128), lambda r: (r, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(shape, store),
            jax.ShapeDtypeStruct((Nz, M, Nd, Nr, Nc), dual_dtype),
            jax.ShapeDtypeStruct(shape, store),
            jax.ShapeDtypeStruct((R, 8, 128), dtype),
        ),
        input_output_aliases={2: 0, 3: 1},
        scratch_shapes=[
            pltpu.VMEM((4, M, TR, Nc), store),       # x window
            pltpu.VMEM((4, M, 8, Nc), store),        # up seam granules
            pltpu.VMEM((4, M, 8, Nc), store),        # down seam granules
            pltpu.VMEM((2, M, TR, Nc), store),       # x0
            pltpu.VMEM((2, M, TR, Nc), store),       # yA in/out
            pltpu.VMEM((2, M, Nd, TR, Nc), dual_dtype),  # yD in/out
            pltpu.VMEM((2, M, TR, Nc), store),       # dt out
            pltpu.VMEM((1, 1, 8, 128), dtype),       # l21 tile scratch
            pltpu.SemaphoreType.DMA((4,)),           # x
            pltpu.SemaphoreType.DMA((4,)),           # up seam
            pltpu.SemaphoreType.DMA((4,)),           # down seam
            pltpu.SemaphoreType.DMA((2,)),           # x0 in
            pltpu.SemaphoreType.DMA((2,)),           # yA in
            pltpu.SemaphoreType.DMA((2,)),           # yD in
            pltpu.SemaphoreType.DMA((2,)),           # yA out
            pltpu.SemaphoreType.DMA((2,)),           # yD out
            pltpu.SemaphoreType.DMA((2,)),           # dt out
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            **({"vmem_limit_bytes": min(128 * 1024 * 1024, int(1.3 * need))}
               if (need := _scratch_bytes(TR, Nc, M, Nd, store.itemsize,
                                          dual_dtype.itemsize))
               > 15 * 1024 * 1024 else {}),
        ),
        interpret=interpret,
    )

    def call(x, x0, y_A, y_D_int):
        return fn(x, x0, y_A, y_D_int)

    call.row_tile = TR
    return call
