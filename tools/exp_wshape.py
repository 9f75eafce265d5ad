#!/usr/bin/env python3
"""Per-sweep cost of the packed streaming solves vs row width W at FIXED
total cells: is the 2-lane-tile row (W=256) intrinsically slower per cell
than exact-1-tile rows (W=128)? If yes, an x-fold layout (W -> (2, W/2),
within-tile rolls + seam fixup) is the next 256^3 kernel; if no, the
streamed sweeps are bound by streaming overheads and folding is dead.

Usage: python tools/exp_wshape.py W H D [W H D ...]
Runs the 1-sweep stream kernel and the temporal ksw=2 kernel (when blk
divides) at each shape, slope-timed. ONE process per invocation is fine:
variants here share no jit caches with the production step.
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream, pallas_rbgs_solve_stream_t)

    args = [int(a) for a in sys.argv[1:]]
    shapes = [tuple(args[i:i + 3]) for i in range(0, len(args), 3)] or [
        (256, 256, 256), (128, 256, 512), (128, 512, 256)]
    acc, n = 15, 4
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    def timeit(name, body, init, cells):
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
            t0 = time.perf_counter(); jax.block_until_ready(r1(init))
            t1 = time.perf_counter(); jax.block_until_ready(r3(init))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        us = best / acc * 1e6
        print(f"{name:34s} {best * 1e3:9.3f} ms/solve {us:8.1f} us/sweep "
              f"{us * 1e3 / cells * 1e6:6.2f} ns/cell", flush=True)
        return best

    for W, H, D in shapes:
        shape = (D + 2, H + 2, W + 2)
        cells = W * H * D
        f0 = jnp.zeros(shape, jnp.float32) + 0.1

        def stream(c):
            return pallas_rbgs_solve_stream(1, c, c, None, 1e-4, 1.0006,
                                            acc=acc, empty_scene=True)
        try:
            timeit(f"stream    {W}x{H}x{D}", stream, f0, cells)
        except Exception as e:
            print(f"stream {W}x{H}x{D} failed: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

        def tmp(c):
            return pallas_rbgs_solve_stream_t(1, c, c, None, 1e-4, 1.0006,
                                              acc=acc, empty_scene=True,
                                              ksw=2, blk=16)
        try:
            timeit(f"temporal2 {W}x{H}x{D}", tmp, f0, cells)
        except Exception as e:
            print(f"temporal2 {W}x{H}x{D} failed: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
