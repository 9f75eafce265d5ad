#!/usr/bin/env python3
"""Flagship empty + sphere-obstacle step timing (VERDICT r2 #3 check)."""
import sys, time
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import WindTunnel, simulation_step
    from fluid_simulation_tpu.scene.primitives import empty_obstacles, add_sphere

    n = 50
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    def measure(name, params, obstacles=None):
        wt = WindTunnel(params, obstacles=obstacles)
        p, masks = wt.params, wt.masks
        def run_n(length):
            @jax.jit
            def run(state, m):
                def body(c, _):
                    c, _s = simulation_step(c, m, p)
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
        ds = float(jnp.sum(st.dens, dtype=jnp.float32))
        assert np.isfinite(ds) and ds > 0, ds
        print(f"{name:24s} {best*1e3:7.3f} ms/step  (dens_sum {ds:.1f})",
              flush=True)

    base = SimParams(div_stats=False, mode="split")
    measure("flagship empty", base)
    sphere = add_sphere(empty_obstacles(128, 64, 64), 40, 32, 32, 10)
    measure("flagship sphere", base, np.asarray(sphere))
    return 0

if __name__ == "__main__":
    sys.exit(main())
