#!/usr/bin/env python3
"""Color-packed solve vs the packed resident solve on the chip.

Usage: python tools/exp_cpack.py [W H D] (default 256 64 64)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.linsolve_pallas import (
        pallas_rbgs_solve, pallas_solve_supported)
    from linsolve_cpack import (
        pallas_rbgs_solve_cpack, cpack_solve_supported)

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (256, 64, 64)
    shape = (D + 2, H + 2, W + 2)
    acc = 15
    n = 20

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("resident supported:", pallas_solve_supported(shape))
    print("cpack supported:", cpack_solve_supported(shape))

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
        print(f"{name:26s} {best * 1e3:9.3f} ms/solve "
              f"({best / acc * 1e6:7.1f} us/sweep)", flush=True)
        return best

    def packed(c):
        return pallas_rbgs_solve(1, c, c, None, 1e-4, 1.0006, acc=acc,
                                 empty_scene=True, packed=True)

    def cpack(c):
        return pallas_rbgs_solve_cpack(1, c, c, None, 1e-4, 1.0006, acc=acc,
                                       empty_scene=True)

    if pallas_solve_supported(shape):
        timeit("packed_resident", packed, f0)
    timeit("cpack", cpack, f0)

    @jax.jit
    def diff(c):
        return jnp.max(jnp.abs(packed(c) - cpack(c)))
    print("max |packed - cpack| =", float(diff(f0)))
    return 0


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] != "stream"):
    sys.exit(main())


def stream_main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream)
    from linsolve_cpack import (
        pallas_rbgs_solve_cpack_stream, cpack_stream_supported)
    import time
    W, H, D = (int(a) for a in sys.argv[2:5]) if len(sys.argv) > 4 else (256, 256, 256)
    shape = (D + 2, H + 2, W + 2)
    acc, n = 15, 4
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("cpack stream supported:", cpack_stream_supported(shape, jnp.float32, False))
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

    def stream(c):
        return pallas_rbgs_solve_stream(1, c, c, None, 1e-4, 1.0006, acc=acc,
                                        empty_scene=True)

    def cps(c):
        return pallas_rbgs_solve_cpack_stream(1, c, c, None, 1e-4, 1.0006,
                                              acc=acc, empty_scene=True)
    timeit("cpack_stream", cps, f0)
    timeit("packed_stream", stream, f0)

    @jax.jit
    def diff(c):
        a = stream(c)[1:-1, 1:-1, 1:-1]
        b = cps(c)[1:-1, 1:-1, 1:-1]
        return jnp.max(jnp.abs(a - b))
    print("interior max |stream - cpack_stream| =", float(diff(f0)))
    return 0


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "stream":
    sys.exit(stream_main())
