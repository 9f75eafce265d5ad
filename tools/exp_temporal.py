#!/usr/bin/env python3
"""Measure the temporally-blocked streaming solve at big grids vs the packed
stream solve (ADVICE r2: the temporal kernel is unreachable from the ladder;
round-2 shelved it when sweeps were VPU-bound — the packed stream work since
moved big-grid sweeps to their HBM roofline, where temporal blocking is the
right trade again).

Usage: python tools/exp_temporal.py [W H D]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (256, 256, 256)
    shape = (D + 2, H + 2, W + 2)
    acc = 15
    n = 4

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream, pallas_stream_solve_supported)
    from fluid_simulation_tpu.kernels.linsolve_temporal import (
        pallas_rbgs_solve_temporal, pallas_temporal_solve_supported, pick_params)

    print("stream supported:", pallas_stream_solve_supported(shape, jnp.float32, False))
    print("temporal supported:", pallas_temporal_solve_supported(shape, jnp.float32, False))
    print("temporal params (blk, hb, ksw):", pick_params(shape, jnp.float32, False))

    f0 = jnp.zeros(shape, jnp.float32) + 0.1

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
        print(f"{name:30s} {best * 1e3:9.3f} ms/solve "
              f"({best / acc * 1e6:7.1f} us/sweep)", flush=True)
        return best

    def stream(c):
        return pallas_rbgs_solve_stream(1, c, c, None, 1e-4, 1.0006, acc=acc,
                                        empty_scene=True)
    timeit("packed_stream", stream, f0)

    def temporal(c):
        return pallas_rbgs_solve_temporal(1, c, c, None, 1e-4, 1.0006,
                                          acc=acc, empty_scene=True)
    timeit("temporal", temporal, f0)

    # value agreement
    @jax.jit
    def diff(c):
        a = stream(c)
        b = temporal(c)
        return jnp.max(jnp.abs(a - b))
    print("max |stream - temporal| =", float(diff(f0)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
