#!/usr/bin/env python3
"""Degrade-cost split of the stacked lane-lerp advection pass at 256^3
x-geometry: is the 3-4 ms pass DMA-, gather-, or select-bound?

Each variant swaps the kernel body while keeping operands/blocks identical
(the exp_sweepcost pattern). Run ONE variant per process:

  python tools/exp_lerpcost.py {full|gather1|nogather|copy}
"""
import sys
import time

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import fluid_simulation_tpu.kernels.advect_pallas as ap

    D2 = H2 = W2 = 258
    Bn, R, C, Co = 3, D2 * H2, W2, W2 - 2
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    if variant != "full":
        offs = ap._window_offsets(C)

        def make_kernel(Bn, C):
            def kernel(arr_ref, xb_ref, out_ref):
                xb = xb_ref[...]
                i0 = jnp.clip(jnp.floor(xb).astype(jnp.int32), 0, C - 2)
                s = xb - i0.astype(xb.dtype)
                for b in range(Bn):
                    if variant == "gather1":
                        w = arr_ref[b][:, :128]
                        li = jnp.clip(i0, 0, 126)
                        a = jnp.take_along_axis(w, li, axis=1)
                        bb = jnp.take_along_axis(w, li + 1, axis=1)
                    elif variant == "nogather":
                        acc = jnp.zeros(xb.shape, jnp.float32)
                        for off in offs:
                            acc = acc + arr_ref[b][:, off:off + 128]
                        a = acc
                        bb = acc
                    else:  # copy: DMA only
                        a = arr_ref[b][:, :Co if Co <= 128 else 128]
                        a = arr_ref[b][:, :128]
                        bb = a
                    out_ref[b] = a * (1.0 - s) + bb * s
            return kernel

        ap._make_lerp_kernel_stack = lambda Bn, C: make_kernel(Bn, C)

    arr = jnp.zeros((Bn, R, C), jnp.float32) + 0.5
    xb = jnp.zeros((R, Co), jnp.float32) + 77.3

    def run_n(length):
        @jax.jit
        def run(a, x):
            def body(c, _):
                o = ap.lane_lerp_stack(c, x)
                # feed back at same shape: pad two lanes
                return jnp.concatenate(
                    [o[:, :, :1], o, o[:, :, -1:]], axis=2), None
            return jax.lax.scan(body, a, None, length=length)[0]
        return run

    n = 20
    r1, r3 = run_n(n), run_n(3 * n)
    jax.block_until_ready(r1(arr, xb))
    jax.block_until_ready(r3(arr, xb))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(r1(arr, xb))
        t1 = time.perf_counter(); jax.block_until_ready(r3(arr, xb))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
    print(f"{variant}: {best * 1e3:.3f} ms/pass (incl. repad concat)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
