#!/usr/bin/env python3
"""Push temporal ksw higher with explicit blk overrides at 256^3."""
import sys, time
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream_t)

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (256, 256, 256)
    shape = (D + 2, H + 2, W + 2)
    acc, n = 15, 4
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    f0 = jnp.zeros(shape, jnp.float32) + 0.1

    def timeit(name, body, init):
        def run_n(length):
            @jax.jit
            def run(c):
                return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                                    length=length)[0]
            return run
        r1, r3 = run_n(n), run_n(3 * n)
        jax.block_until_ready(r1(init)); jax.block_until_ready(r3(init))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(r1(init))
            t1 = time.perf_counter(); jax.block_until_ready(r3(init))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        print(f"{name:26s} {best * 1e3:9.3f} ms/solve "
              f"({best / acc * 1e6:7.1f} us/sweep)", flush=True)
        return best

    # config from argv: exp_temporal3.py W H D ksw blk (one per process)
    cfgs = ((2, 16),)
    if len(sys.argv) > 5:
        cfgs = ((int(sys.argv[4]), int(sys.argv[5])),)
    for ksw, blk in cfgs:
        def tmp(c, ksw=ksw, blk=blk):
            return pallas_rbgs_solve_stream_t(1, c, c, None, 1e-4, 1.0006,
                                              acc=acc, empty_scene=True,
                                              ksw=ksw, blk=blk)
        try:
            timeit(f"temporal ksw={ksw} blk={blk}", tmp, f0)
        except Exception as e:
            print(f"ksw={ksw} blk={blk} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    return 0

if __name__ == "__main__":
    sys.exit(main())
