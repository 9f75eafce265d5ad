#!/usr/bin/env python3
"""Repro: does the obstacle_sphere bench config fault the chip in isolation?

Two consecutive full-bench runs (bench_out2/3.json) died at obstacle_sphere
with UNAVAILABLE after flagship_split+compat passed in the same process.
This runs ONLY the obstacle config in a fresh process (A/B methodology:
one variant per process).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (
        WindTunnel, simulation_step)
    from fluid_simulation_tpu.scene.primitives import add_sphere, empty_obstacles

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("warmup ok", flush=True)

    split = SimParams(div_stats=False, mode="split")
    sphere = add_sphere(empty_obstacles(128, 64, 64), cx=40, cy=32, cz=32,
                        radius=10)
    wt = WindTunnel(split, obstacles=np.asarray(sphere))
    params, masks = wt.params, wt.masks
    print("advect route:", getattr(params, "advect_impl", "?"), flush=True)

    def run_n(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                c, _s = simulation_step(c, m, params)
                return c, None
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    r1, r3 = run_n(50), run_n(150)
    out = r1(wt.state, masks)
    jax.block_until_ready(out)
    print("n=50 ok", flush=True)
    jax.block_until_ready(r3(wt.state, masks))
    print("n=150 ok", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(wt.state, masks))
        t1 = time.perf_counter()
        jax.block_until_ready(r3(wt.state, masks))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 100)
    ds = float(jnp.sum(out.dens, dtype=jnp.float32))
    print(f"obstacle_sphere: {best * 1e3:.3f} ms/step, density_sum={ds:.1f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
