#!/usr/bin/env python3
"""Bisect the obstacle_sphere chip fault — ONE variant per process.

Usage: python tools/exp_obstacle_bisect.py VARIANT
  empty               flagship empty-scene split (chip-health control)
  obstacle            sphere scene, stock dispatch (known to fault)
  obstacle-fused      sphere, advect routed to the fused-backtrace kernel
  obstacle-jnpadvect  sphere, advect routed to the XLA jnp path
  obstacle-noprestep  sphere, fused prestep disabled (solve+proj chain)
  obstacle-nomask     sphere, masked fused projection disabled
  obstacle-nopallas   sphere, use_pallas=False end to end

The variant is applied by module-level patching BEFORE the first trace —
process-isolated per the A/B methodology (in-process repatching is what
destabilises the relay, not a single patch at import time).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(variant):
    import jax
    import jax.numpy as jnp
    import fluid_simulation_tpu.models.windtunnel as wtm
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.scene.primitives import add_sphere, empty_obstacles

    if variant == "obstacle-fused":
        import fluid_simulation_tpu.kernels.advect_pallas as ap
        orig_fused = ap.advect_split_fused
        ap.advect_split_auto = lambda prev, vx, vy, vz, dt_, use_pallas=True: (
            orig_fused(prev, vx, vy, vz, float(dt_)))
        wtm.advect_split_auto = ap.advect_split_auto
    elif variant == "obstacle-jnpadvect":
        import fluid_simulation_tpu.kernels.advect_pallas as ap
        orig_jnp = ap.advect_split_jnp
        ap.advect_split_auto = lambda prev, vx, vy, vz, dt_, use_pallas=True: (
            orig_jnp(prev, vx, vy, vz, float(dt_)))
    elif variant == "obstacle-noprestep":
        pass  # r5: the prestep gate is gone (kernel retired to tools/);
        # this variant is now identical to stock
    elif variant == "obstacle-nomask":
        import fluid_simulation_tpu.kernels.project_pallas as pp
        pp.pallas_project_masked_supported = lambda *a, **k: False

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("warmup ok", flush=True)

    use_pallas = variant != "obstacle-nopallas"
    split = SimParams(div_stats=False, mode="split", use_pallas=use_pallas)
    if variant == "empty":
        obstacles = None
    else:
        obstacles = np.asarray(add_sphere(empty_obstacles(128, 64, 64),
                                          cx=40, cy=32, cz=32, radius=10))
    wt = wtm.WindTunnel(split, obstacles=obstacles)
    params, masks = wt.params, wt.masks

    def run_n(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                c, _s = wtm.simulation_step(c, m, params)
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
    print(f"{variant}: {best * 1e3:.3f} ms/step, density_sum={ds:.1f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "obstacle"))
