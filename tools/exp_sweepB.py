#!/usr/bin/env python3
"""Compile-time + throughput scaling of the design-sweep routes vs batch
size B (VERDICT r4 #6): the unrolled 'sequential' route compiles O(B),
the 'map' route compiles O(1) — measure both bills at the flagship grid
so models/sweep.py's auto-router crossover is a documented number, not a
guess.

One route per process (round-3 policy). Prints compile seconds (first-call
wall), steady-state geometry-steps/s (slope-timed over scan lengths), and
a final-state SHA for cross-route bitwise checks where expected (map ==
vmap; sequential differs only by the batched=False kernel dispatch, value-
equal to 1e-6 — test_sweep.py).

Usage: python tools/exp_sweepB.py ROUTE B [steps]
"""
import hashlib
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
        add_sphere, empty_obstacles)

    route = sys.argv[1]
    B = int(sys.argv[2])
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    W, H, D = 128, 64, 64
    p = SimParams(width=W, height=H, depth=D, div_stats=False,
                  step_stats=True, mode="split")

    geoms = [np.asarray(add_sphere(empty_obstacles(W, H, D),
                                   cx=W // 3, cy=H // 2, cz=D // 2,
                                   radius=6 + (g % 5)))
             for g in range(B)]
    bm = jax.tree_util.tree_map(jnp.asarray, batch_masks(geoms))

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("warmup ok", flush=True)

    t0 = time.perf_counter()
    final, stats = design_sweep(bm, p, steps=steps, route=route)
    jax.block_until_ready(final)
    t_first = time.perf_counter() - t0
    sha = hashlib.sha256(np.asarray(final.dens).tobytes()).hexdigest()[:16]
    print(f"{route} B={B} steps={steps}: first call {t_first:.1f} s "
          f"(compile + run)  sha={sha}", flush=True)

    # steady state: slope over two more step counts (programs re-compile per
    # `steps`, so time the SAME program twice and take the second)
    t0 = time.perf_counter()
    final2, _ = design_sweep(bm, p, steps=steps, route=route)
    jax.block_until_ready(final2)
    t_steady = time.perf_counter() - t0
    gsps = B * steps / t_steady
    print(f"{route} B={B}: steady {t_steady * 1e3:.1f} ms for "
          f"{B}x{steps} geometry-steps = {gsps:.0f} g-steps/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
