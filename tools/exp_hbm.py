#!/usr/bin/env python3
"""Measure achievable HBM bandwidth for z-block streaming kernels at 256^3.

The packed stream sweep runs at ~400 GB/s effective (844 us/sweep, ~335 MB)
while the resident kernel shows the same VPU work costs only ~8 ns/cell.
Is 400 GB/s the pattern's ceiling, or is the sweep kernel serializing
compute against DMA? Baselines measured here:

  copy1   - read 1 array, write 1, z-blocked mid windows only
  copy2   - read 2 arrays (like f+prev), write 1
  copy2h  - same plus lo/hi 8-row halo streams on both reads (the sweep
            kernel's exact window structure)
  sweepish- copy2h plus ~30 full-block VPU ops (the sweep's compute) to
            check compute/DMA overlap
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    D = H = W = N
    blk, hb = 16, 8
    nblk = D // blk
    nhb = D // hb
    n = 10

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    f0 = jnp.zeros((D, H, W), jnp.float32) + 0.1
    mb = D * H * W * 4 / 1e6

    mid = pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                       memory_space=pltpu.VMEM)
    lo = pl.BlockSpec((hb, H, W),
                      lambda k: (jnp.maximum(k * 2 - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((hb, H, W),
                      lambda k: (jnp.minimum(k * 2 + 2, nhb - 1), 0, 0),
                      memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

    def timeit(name, body, moved_mb):
        def run_n(length):
            @jax.jit
            def run(c):
                return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                                    length=length)[0]
            return run
        r1, r3 = run_n(n), run_n(3 * n)
        jax.block_until_ready(r1(f0))
        jax.block_until_ready(r3(f0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(f0))
            t1 = time.perf_counter()
            jax.block_until_ready(r3(f0))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        print(f"{name:10s} {best * 1e6:9.1f} us  "
              f"{moved_mb / best / 1e3:7.1f} GB/s", flush=True)
        return best

    def k1(a_ref, o_ref):
        o_ref[...] = a_ref[...] + 1.0

    def copy1(c):
        return pl.pallas_call(k1, grid=(nblk,), in_specs=[mid],
                              out_specs=mid, compiler_params=cp,
                              out_shape=jax.ShapeDtypeStruct(c.shape,
                                                             c.dtype))(c)
    timeit("copy1", copy1, 2 * mb)

    def k2(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...] + b_ref[...]

    def copy2(c):
        return pl.pallas_call(k2, grid=(nblk,), in_specs=[mid, mid],
                              out_specs=mid, compiler_params=cp,
                              out_shape=jax.ShapeDtypeStruct(c.shape,
                                                             c.dtype))(c, c)
    timeit("copy2", copy2, 3 * mb)

    # XLA's own fused elementwise stream for calibration
    def xla2(c):
        return c * 1.0001 + c
    timeit("xla2", xla2, 3 * mb)

    # bigger mid blocks (more double-buffer depth per transfer)
    mid32 = pl.BlockSpec((32, H, W), lambda k: (k, 0, 0),
                         memory_space=pltpu.TPUMemorySpace.ANY
                         if False else pltpu.VMEM)

    def copy1b(c):
        return pl.pallas_call(k1, grid=(D // 32,), in_specs=[mid32],
                              out_specs=mid32, compiler_params=cp,
                              out_shape=jax.ShapeDtypeStruct(c.shape,
                                                             c.dtype))(c)
    timeit("copy1_blk32", copy1b, 2 * mb)

    def k2h(alo, a, ahi, blo, b, bhi, o_ref):
        o_ref[...] = (a[...] + b[...] + alo[0] + ahi[0])

    def copy2h(c):
        return pl.pallas_call(k2h, grid=(nblk,),
                              in_specs=[lo, mid, hi] * 2,
                              out_specs=mid, compiler_params=cp,
                              out_shape=jax.ShapeDtypeStruct(c.shape,
                                                             c.dtype))(c, c, c, c, c, c)
    timeit("copy2h", copy2h, (3 + 2 * 2 * hb / blk) * mb)

    def ksw(alo, a, ahi, blo, b, bhi, o_ref):
        x = a[...]
        y = b[...]
        acc = x
        for _ in range(14):
            acc = acc * 1.0001 + y
        o_ref[...] = acc + alo[0] + ahi[0]

    def sweepish(c):
        return pl.pallas_call(ksw, grid=(nblk,),
                              in_specs=[lo, mid, hi] * 2,
                              out_specs=mid, compiler_params=cp,
                              out_shape=jax.ShapeDtypeStruct(c.shape,
                                                             c.dtype))(c, c, c, c, c, c)
    timeit("sweepish", sweepish, (3 + 2 * 2 * hb / blk) * mb)
    return 0


if __name__ == "__main__":
    sys.exit(main())
