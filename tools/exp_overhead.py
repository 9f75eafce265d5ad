#!/usr/bin/env python3
"""Measure per-pallas-call overhead inside a compiled scan.

The flagship step's phase-isolated costs sum to ~0.54 ms but the step runs
at 0.97 ms; hypothesis: each Mosaic kernel launch carries a fixed cost
(grid setup + VMEM priming) that phase isolation hides via pipelining.
Times scan bodies with K back-to-back kernel calls and reports the marginal
cost per call for (a) a trivial (8,128) copy kernel, (b) the real packed
solve at the flagship grid, (c) an XLA-only elementwise op for contrast.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    n = 100

    def timeit(name, body, init):
        def run_n(length):
            @jax.jit
            def run(c):
                return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                                    length=length)[0]
            return run
        r1, r3 = run_n(n), run_n(3 * n)
        jax.block_until_ready(r1(init))
        jax.block_until_ready(r3(init))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(init))
            t1 = time.perf_counter()
            jax.block_until_ready(r3(init))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        print(f"{name:34s} {best * 1e6:9.2f} us/iter", flush=True)
        return best

    # (a) trivial kernel, K back-to-back calls
    def tiny_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def tiny_call(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    x0 = jnp.zeros((8, 128), jnp.float32)
    for K in (1, 4, 16):
        def body(c, K=K):
            for _ in range(K):
                c = tiny_call(c)
            return c
        timeit(f"tiny_pallas xK={K}", body, x0)

    # (b) the real packed solve (full 15-sweep diffuse) chained K times
    from fluid_simulation_tpu.kernels.linsolve_pallas import pallas_rbgs_solve
    from fluid_simulation_tpu.config import SimParams
    p = SimParams(div_stats=False, mode="split", empty_scene=True)
    D2, H2, W2 = p.padded_shape
    f0 = jnp.zeros((D2, H2, W2), jnp.float32) + 0.1

    for K in (1, 3):
        def body(c, K=K):
            for _ in range(K):
                c = pallas_rbgs_solve(1, c, c, None, 1e-4, 1.0006, acc=p.acc,
                                      empty_scene=True, packed=True)
            return c
        timeit(f"packed_solve15 xK={K}", body, f0)

    # single sweep variant: fixed cost vs per-sweep cost
    for acc in (1, 5, 15):
        def body(c, acc=acc):
            return pallas_rbgs_solve(1, c, c, None, 1e-4, 1.0006, acc=acc,
                                     empty_scene=True, packed=True)
        timeit(f"packed_solve acc={acc}", body, f0)

    # (c) XLA elementwise for contrast
    def body(c):
        return c * 1.0001 + 0.0001
    timeit("xla_fma_full_grid", body, f0)

    return 0


if __name__ == "__main__":
    sys.exit(main())
