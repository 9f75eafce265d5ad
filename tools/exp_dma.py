#!/usr/bin/env python3
"""DMA-issue model for the big-grid streaming kernels (VERDICT r4 #1).

The temporal stream solve at 256^3 runs at 364 GB/s effective while the
1-sweep stream kernel and zero-compute copy patterns hit the 523 GB/s
platform ceiling, and bf16 (half the bytes) moves nothing — so the binding
constraint is NOT bytes. Candidate: per-DMA-issue cost. Every lo/mid/hi
window triple is 3 DMA issues per operand per grid step; the temporal
kernel issues 6-9 streams x ~17 grid steps x 8 passes per 15-sweep solve.

Variants (all on one padded-interior-sized (D, H, W) f32 grid, distinct
operands, scan-timed):

  copy2      2 ops mid-window + out             (3 issues/step, 3 units)
  copy2h     2 ops x (lo,mid,hi) hb rows + out  (7 issues/step, 3+4hb/blk u)
  manual2    2 ops HBM->VMEM MERGED (blk+2hb)-row windows via double-
             buffered pltpu.make_async_copy + out BlockSpec
                                                (3 issues/step, 3+4hb/blk u)
  copy2_bf16 / copy2h_bf16 / manual2_bf16: byte-dependence probe

Each variant times at several blk (grid-step count sweep at constant
bytes): if time tracks issues/steps rather than bytes, the issue model is
confirmed and the merged-window manual-DMA kernel is the lever.

Usage: python tools/exp_dma.py [W H D] [blks...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fluid_simulation_tpu.kernels.linsolve_pallas import VMEM_BUDGET_BYTES

    args = [a for a in sys.argv[1:]]
    dims = [int(a) for a in args[:3]] if len(args) >= 3 else [256, 256, 256]
    W, H, D = dims
    blks = [int(a) for a in args[3:]] or [8, 16]
    hb = 2
    n = 8
    mb = D * H * W * 4 / 1e6

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("warmup ok", flush=True)

    cp = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET_BYTES)

    def timeit(name, body, moved_mb, f0):
        def run_n(length):
            @jax.jit
            def run(c):
                r = c * 1.5 + 0.25
                return jax.lax.scan(lambda c, _: (body(c, r), None), c, None,
                                    length=length)[0]
            return run
        r1, r3 = run_n(n), run_n(3 * n)
        jax.block_until_ready(r1(f0))
        jax.block_until_ready(r3(f0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(r1(f0))
            t1 = time.perf_counter(); jax.block_until_ready(r3(f0))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        print(f"{name:16s} {best * 1e6:9.1f} us  "
              f"{moved_mb / best / 1e3:7.1f} GB/s", flush=True)
        return best

    for dtype, tag in ((jnp.float32, ""), (jnp.bfloat16, "_bf16")):
        it = 2 if dtype == jnp.bfloat16 else 4
        mbd = D * H * W * it / 1e6
        f0 = jnp.zeros((D, H, W), dtype) + 0.1
        for blk in blks:
            nblk = -(-D // blk)
            nhb = -(-D // hb)
            mid = pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM)
            lo = pl.BlockSpec(
                (hb, H, W),
                lambda k: (jnp.maximum(k * (blk // hb) - 1, 0), 0, 0),
                memory_space=pltpu.VMEM)
            hi = pl.BlockSpec(
                (hb, H, W),
                lambda k: (jnp.minimum(k * (blk // hb) + blk // hb,
                                       nhb - 1), 0, 0),
                memory_space=pltpu.VMEM)

            def k2(a_ref, b_ref, o_ref):
                o_ref[...] = a_ref[...] + b_ref[...]

            def copy2(c, r):
                return pl.pallas_call(
                    k2, grid=(nblk,), in_specs=[mid, mid], out_specs=mid,
                    compiler_params=cp,
                    out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype))(c, r)
            timeit(f"copy2{tag} blk={blk}", copy2, 3 * mbd, f0)

            def k2h(alo, a, ahi, blo, b, bhi, o_ref):
                o_ref[...] = (a[...] + b[...]) + (alo[0] + ahi[0])

            def copy2h(c, r):
                return pl.pallas_call(
                    k2h, grid=(nblk,), in_specs=[lo, mid, hi] * 2,
                    out_specs=mid, compiler_params=cp,
                    out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype))(
                        c, c, c, r, r, r)
            units = 3 + 4 * hb / blk
            timeit(f"copy2h{tag} blk={blk}", copy2h, units * mbd, f0)

            # merged windows, manual double-buffered DMA: same bytes as
            # copy2h (blk+2hb rows per op per step) but 2 issues, not 6
            E = blk + 2 * hb
            if D % blk:
                continue  # keep the manual variant simple: exact blocks

            def kman(a_hbm, b_hbm, o_ref, asc, bsc, sems):
                k = pl.program_id(0)
                nb = pl.num_programs(0)

                def start(slot, kk):
                    st = jnp.clip(kk * blk - hb, 0, D - E)
                    pltpu.make_async_copy(
                        a_hbm.at[pl.ds(st, E)], asc.at[slot],
                        sems.at[slot, 0]).start()
                    pltpu.make_async_copy(
                        b_hbm.at[pl.ds(st, E)], bsc.at[slot],
                        sems.at[slot, 1]).start()

                @pl.when(k == 0)
                def _():
                    start(0, 0)

                @pl.when(k + 1 < nb)
                def _():
                    start((k + 1) % 2, k + 1)

                slot = k % 2
                st = jnp.clip(k * blk - hb, 0, D - E)
                pltpu.make_async_copy(a_hbm.at[pl.ds(st, E)], asc.at[slot],
                                      sems.at[slot, 0]).wait()
                pltpu.make_async_copy(b_hbm.at[pl.ds(st, E)], bsc.at[slot],
                                      sems.at[slot, 1]).wait()
                off = k * blk - st   # mid rows inside the merged window
                o_ref[...] = (asc[slot, pl.ds(off, blk)]
                              + bsc[slot, pl.ds(off, blk)])

            def manual2(c, r):
                return pl.pallas_call(
                    kman, grid=(nblk,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                    out_specs=mid,
                    scratch_shapes=[
                        pltpu.VMEM((2, E, H, W), dtype),
                        pltpu.VMEM((2, E, H, W), dtype),
                        pltpu.SemaphoreType.DMA((2, 2)),
                    ],
                    compiler_params=cp,
                    out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype))(c, r)
            try:
                timeit(f"manual2{tag} blk={blk}", manual2, units * mbd, f0)
            except Exception as e:
                print(f"manual2{tag} blk={blk} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
