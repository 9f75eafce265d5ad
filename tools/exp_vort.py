#!/usr/bin/env python3
"""noslip+vorticity flagship step timing on the real chip (one variant per
process): `python tools/exp_vort.py kernel|xla [n]`. Compares the fused
confinement kernel (kernels/vorticity_pallas.py) against the jnp oracle
path inside the full step; also prints the 20-step state checksum so the
two variants can be value-compared."""

import sys
import time

import numpy as np

BASELINE_CU = 0.43e6


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (WindTunnel,
                                                        simulation_step)
    if variant == "xla":
        import fluid_simulation_tpu.kernels.vorticity_pallas as vp
        vp.pallas_confinement_supported = lambda *a, **k: False

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    params = SimParams(div_stats=False, step_stats=False, mode="split",
                       wall_mode="noslip", vorticity=5.0)
    wt = WindTunnel(params)
    params = wt.params
    masks = wt.masks

    def make_run(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                s, _ = simulation_step(c, m, params)
                return s, ()
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    r1, r3 = make_run(n), make_run(3 * n)
    s1 = jax.block_until_ready(r1(wt.state, masks))
    jax.block_until_ready(r3(wt.state, masks))

    @jax.jit
    def checksum(s):
        return sum(jnp.sum(jnp.abs(f), dtype=jnp.float64
                           if jax.config.jax_enable_x64 else jnp.float32)
                   for f in (s.vx, s.vy, s.vz, s.dens))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(wt.state, masks))
        t1 = time.perf_counter()
        jax.block_until_ready(r3(wt.state, masks))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
    ms = best * 1e3
    W, H, D = params.width, params.height, params.depth
    cu = W * H * D / best
    print(f"noslip+vort {variant}: {ms:.3f} ms/step, {cu:.3e} cu/s "
          f"({cu/BASELINE_CU:.0f}x), checksum(n={n})="
          f"{float(checksum(s1)):.6f}", flush=True)


if __name__ == "__main__":
    main()
