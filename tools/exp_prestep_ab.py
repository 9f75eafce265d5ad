#!/usr/bin/env python3
"""HISTORICAL (round 2-3): A/B of the fused prestep kernel per scene type
(it regressed the empty flagship 0.97 -> 1.12 ms while the sphere scene went
2.18 -> 1.26). NOT RUNNABLE since round 5: the kernel was retired to
tools/prestep_pallas.py and the ``_prestep_applicable`` gate it patches was
deleted from models/windtunnel.py (VERDICT r4 #7). Kept as the measurement
record."""
import sys, time
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    import fluid_simulation_tpu.models.windtunnel as wtm
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.scene.primitives import empty_obstacles, add_sphere

    n = 50
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    def measure(name, params, obstacles, prestep):
        orig = wtm._prestep_applicable
        if not prestep:
            wtm._prestep_applicable = lambda p, v: False
        try:
            wt = wtm.WindTunnel(params, obstacles=obstacles)
            p, masks = wt.params, wt.masks
            # distinct params object per variant -> distinct jit cache key
            wtm.simulation_step._clear_cache()
            def run_n(length):
                @jax.jit
                def run(state, m):
                    def body(c, _):
                        c, _s = wtm.simulation_step(c, m, p)
                        return c, None
                    return jax.lax.scan(body, state, None, length=length)[0]
                return run
            r1, r3 = run_n(n), run_n(3 * n)
            st = r1(wt.state, masks); jax.block_until_ready(st)
            jax.block_until_ready(r3(st, masks))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); jax.block_until_ready(r1(st, masks))
                t1 = time.perf_counter(); jax.block_until_ready(r3(st, masks))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
            print(f"{name:30s} {best*1e3:7.3f} ms/step", flush=True)
        finally:
            wtm._prestep_applicable = orig

    base = SimParams(div_stats=False, mode="split")
    sphere = np.asarray(add_sphere(empty_obstacles(128, 64, 64), 40, 32, 32, 10))
    measure("empty prestep=off", base, None, False)
    measure("empty prestep=on", base, None, True)
    measure("sphere prestep=off", base, sphere, False)
    measure("sphere prestep=on", base, sphere, True)
    return 0

if __name__ == "__main__":
    sys.exit(main())
