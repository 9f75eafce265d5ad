#!/usr/bin/env python3
"""True streaming ceiling at 256^3 with DISTINCT operands.

exp_hbm.py (and exp_sweepcost.py's first run) passed the SAME array for
both streamed inputs — if XLA/Mosaic dedupes identical operands, those
"ceilings" undercount bytes. Variants here use distinct arrays and also
time the real production sweep protocol (carry f + constant rhs) for an
apples-to-apples bandwidth figure.

  copy2d   - read 2 DISTINCT arrays, write 1 (3 units)
  copy2hd  - distinct arrays, lo/mid/hi halo windows on both (5 units)
  arithd   - copy2hd + the sweep's FMA chain (5 units)
  prod1    - the production 1-sweep packed stream kernel, empty scene
             (f carry + distinct rhs; 5 units)

Usage: python tools/exp_hbm2.py [W H D]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fluid_simulation_tpu.kernels.linsolve_pallas import VMEM_BUDGET_BYTES
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        make_packed_sweep_call)

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (
        256, 256, 256)
    blk, hb = 16, 8
    nblk = -(-D // blk)
    nhb = -(-D // hb)
    n = 10
    mb = D * H * W * 4 / 1e6

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    f0 = jnp.zeros((D, H, W), jnp.float32) + 0.1

    mid = pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                       memory_space=pltpu.VMEM)
    lo = pl.BlockSpec((hb, H, W), lambda k: (jnp.maximum(k * 2 - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((hb, H, W),
                      lambda k: (jnp.minimum(k * 2 + 2, nhb - 1), 0, 0),
                      memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET_BYTES)

    def timeit(name, body, moved_mb):
        def run_n(length):
            @jax.jit
            def run(c):
                # rhs derives from c ONCE outside the scan: distinct buffer
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
        print(f"{name:8s} {best * 1e6:9.1f} us  "
              f"{moved_mb / best / 1e3:7.1f} GB/s", flush=True)
        return best

    def k2(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...] + b_ref[...]

    def copy2d(c, r):
        return pl.pallas_call(k2, grid=(nblk,), in_specs=[mid, mid],
                              out_specs=mid, compiler_params=cp,
                              out_shape=jax.ShapeDtypeStruct(c.shape,
                                                             c.dtype))(c, r)
    timeit("copy2d", copy2d, 3 * mb)

    def k2h(alo, a, ahi, blo, b, bhi, o_ref):
        o_ref[...] = (a[...] + b[...] + alo[0] + ahi[0])

    def copy2hd(c, r):
        return pl.pallas_call(k2h, grid=(nblk,), in_specs=[lo, mid, hi] * 2,
                              out_specs=mid, compiler_params=cp,
                              out_shape=jax.ShapeDtypeStruct(
                                  c.shape, c.dtype))(c, c, c, r, r, r)
    units = 3 + 2 * 2 * hb / blk
    timeit("copy2hd", copy2hd, units * mb)

    def ka(alo, a, ahi, blo, b, bhi, o_ref):
        x = a[...]
        y = b[...]
        acc = x
        for _ in range(14):
            acc = acc * 1.0001 + y
        o_ref[...] = acc + alo[0] + ahi[0]

    def arithd(c, r):
        return pl.pallas_call(ka, grid=(nblk,), in_specs=[lo, mid, hi] * 2,
                              out_specs=mid, compiler_params=cp,
                              out_shape=jax.ShapeDtypeStruct(
                                  c.shape, c.dtype))(c, c, c, r, r, r)
    timeit("arithd", arithd, units * mb)

    call = make_packed_sweep_call(1, 1e-4, 1.0006, "reference", (D, H, W),
                                  jnp.float32, False, blk, False)

    def prod1(c, r):
        return call(c, c, c, r, r, r)
    timeit("prod1", prod1, units * mb)
    return 0


if __name__ == "__main__":
    sys.exit(main())
