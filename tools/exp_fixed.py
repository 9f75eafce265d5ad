#!/usr/bin/env python3
"""Decompose the per-SOLVE fixed cost of the packed streaming solves at
256^3. exp_hbm2 showed the marginal packed sweep (641 us) is already AT
the distinct-operand streaming ceiling (copy2hd == arithd == prod1), yet a
full acc=15 solve costs 13.08 ms = 14 x 641 us + ~4.1 ms of fixed work:
sweep-1 on the padded layout (258-lane rows tile to 384 — 1.5x bytes),
the fpre/rp interior slices, and the padded .at[].set reconstruction.
This tool times each piece so the fix targets the right one.

Usage: python tools/exp_fixed.py [W H D]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tools.linsolve_blocked import (
        pallas_rbgs_solve_blocked)
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream, pallas_rbgs_solve_stream_t)

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (
        256, 256, 256)
    shape = (D + 2, H + 2, W + 2)
    n = 10
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    f0 = jnp.zeros(shape, jnp.float32) + 0.1

    def timeit(name, body, nrep=n):
        def run_n(length):
            @jax.jit
            def run(c):
                return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                                    length=length)[0]
            return run
        r1, r3 = run_n(nrep), run_n(3 * nrep)
        jax.block_until_ready(r1(f0))
        jax.block_until_ready(r3(f0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(r1(f0))
            t1 = time.perf_counter(); jax.block_until_ready(r3(f0))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * nrep))
        print(f"{name:24s} {best * 1e3:9.3f} ms", flush=True)
        return best

    def solve(acc):
        def body(c):
            return pallas_rbgs_solve_stream(1, c, c, None, 1e-4, 1.0006,
                                            acc=acc, empty_scene=True)
        return body

    t1s = timeit("stream acc=1 (fixed)", solve(1))
    t2s = timeit("stream acc=2", solve(2))
    t15 = timeit("stream acc=15", solve(15), nrep=4)
    print(f"  -> marginal sweep {1e3 * (t15 - t1s) / 14:.1f} us, "
          f"acc2-acc1 {1e3 * (t2s - t1s):.1f} us", flush=True)

    def tsolve(acc):
        def body(c):
            return pallas_rbgs_solve_stream_t(1, c, c, None, 1e-4, 1.0006,
                                              acc=acc, empty_scene=True,
                                              ksw=2, blk=16)
        return body
    t15t = timeit("temporal acc=15", tsolve(15), nrep=4)

    # sweep-1 alone: the padded blocked kernel at acc=1, no-keep
    def pre1(c):
        return pallas_rbgs_solve_blocked(1, c, c, None, 1e-4, 1.0006, acc=1,
                                         empty_scene=True)
    tp = timeit("pre1 (padded blocked)", pre1)

    # slice + padded reconstruction round-trip (carry stays padded): the
    # exact pair the solve pays around its packed sweeps
    def roundtrip(c):
        fp = c[1:-1, 1:-1, 1:-1] * 1.0000001
        out = c
        out = out.at[1:-1, 1:-1, 1:-1].set(fp)
        out = out.at[1:-1, 1:-1, 0].set(-fp[:, :, 0])
        out = out.at[1:-1, 1:-1, -1].set(fp[:, :, -1])
        out = out.at[1:-1, 0, 1:-1].set(fp[:, 0, :])
        out = out.at[1:-1, -1, 1:-1].set(fp[:, -1, :])
        out = out.at[0, 1:-1, 1:-1].set(fp[0])
        out = out.at[-1, 1:-1, 1:-1].set(fp[-1])
        return out
    tr = timeit("slice+recon roundtrip", roundtrip)
    # two slices (fpre + rp) as the solve actually issues them: second one
    # differs by the consumer so CSE cannot drop it
    def two_slices(c):
        g = c[1:-1, 1:-1, 1:-1] * 1.0000001
        h = c[1:-1, 1:-1, 1:-1] * 2.0000001
        out = c
        out = out.at[1:-1, 1:-1, 1:-1].set(g + h)
        return out
    t2 = timeit("2 slices + interior set", two_slices)
    print(f"  -> pre1 {tp * 1e3:.2f} + roundtrip {tr * 1e3:.2f}; "
          f"2slices+set {t2 * 1e3:.2f}; fixed {t1s * 1e3:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
