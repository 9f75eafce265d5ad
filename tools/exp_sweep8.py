#!/usr/bin/env python3
"""Measure bench.py's sweep8 config (design_sweep auto route) standalone.

Usage: python tools/exp_sweep8.py [route]   (route: auto|vmap|sequential)
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
    from fluid_simulation_tpu.models.sweep import batch_masks, design_sweep
    from fluid_simulation_tpu.scene.primitives import (
        add_box, add_sphere, empty_obstacles)

    route = sys.argv[1] if len(sys.argv) > 1 else "auto"
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    split = SimParams(div_stats=False, step_stats=False, mode="split")
    sphere = add_sphere(empty_obstacles(128, 64, 64), cx=40, cy=32, cz=32,
                        radius=10)
    geoms = [np.asarray(sphere)]
    e = empty_obstacles(128, 64, 64)
    for k in range(7):
        g = (add_sphere(e, 30 + 6 * k, 20 + 3 * k, 28, 5 + k % 3)
             if k % 2 else add_box(e, 20 + 5 * k, 35 + 5 * k, 20, 40,
                                   24, 40))
        geoms.append(np.asarray(g))
    bm = jax.tree_util.tree_map(jnp.asarray, batch_masks(geoms))

    n = 4
    t0 = time.perf_counter()

    def run_n(length):
        def run(bm):
            return design_sweep(bm, split, steps=length, route=route)[0]
        return run

    r1, r3 = run_n(n), run_n(3 * n)
    out = r1(bm)
    jax.block_until_ready(out)
    jax.block_until_ready(r3(bm))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(bm))
        t1 = time.perf_counter()
        jax.block_until_ready(r3(bm))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
    dens = np.asarray(jax.jit(
        lambda st: jnp.sum(st.dens, axis=(1, 2, 3), dtype=jnp.float32))(out))
    assert np.all(np.isfinite(dens)) and np.all(dens > 0), dens
    print(f"sweep8 route={route}: {best * 1e3:.2f} ms/batched-step = "
          f"{8.0 / best:.0f} geometry-steps/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
