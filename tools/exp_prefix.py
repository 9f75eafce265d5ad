#!/usr/bin/env python3
"""Prefix timing of the split-mode step: marginal cost of each phase INSIDE
the real chain (vs profile_phases.py's isolated phases, whose sum undershoots
the step ~2x because homogeneous scans pipeline across iterations in ways the
heterogeneous step cannot). Scans step PREFIXES — inlets; +diffuse; +proj1;
+advect; +proj2; +dens-advect(=full) — and reports each prefix's ms/iter and
the delta over the previous prefix: the phase's true in-chain cost.

Usage: python tools/exp_prefix.py [W H D]   (default 128 64 64)
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (
        FluidState, WindTunnel, _apply_inlets, _diffuse_vel_dispatch,
        _pad_bounds_tail, _project_dispatch, simulation_step)

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (
        128, 64, 64)
    n = 50
    params = SimParams(width=W, height=H, depth=D, div_stats=False,
                       mode="split", empty_scene=True)
    wt = WindTunnel(params)
    masks = wt.masks
    p = params
    kw = dict(acc=p.acc, solver=p.solver, wall_mode=p.wall_mode,
              use_pallas=p.use_pallas, empty_scene=p.empty_scene)

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    state, _ = jax.jit(simulation_step, static_argnames=("params",))(
        wt.state, masks, params)

    def prefix_body(stages):
        def body(st, m):
            st, buffer = _apply_inlets(st, p)
            vx, vy, vz, dens = st
            pvx, pvy, pvz = vx, vy, vz
            if stages >= 1:
                vx, vy, vz = _diffuse_vel_dispatch(
                    vx, vy, vz, pvx, pvy, pvz, m, p, p.diff, kw)
            if stages >= 2:
                vx, vy, vz = _project_dispatch(vx, vy, vz, m, p)
            if stages >= 3:
                from fluid_simulation_tpu.kernels.advect_pallas import (
                    advect_split_auto)
                stacked = jnp.stack([pvx, pvy, pvz])
                smp = advect_split_auto(stacked, vx, vy, vz, p.dt,
                                        use_pallas=p.use_pallas)
                vx, vy, vz = _pad_bounds_tail(smp, (1, 2, 3), m, p)
            if stages >= 4:
                vx, vy, vz = _project_dispatch(vx, vy, vz, m, p)
            if stages >= 5:
                from fluid_simulation_tpu.kernels.advect_pallas import (
                    advect_split_auto)
                smp = advect_split_auto(buffer, vx, vy, vz, p.dt,
                                        use_pallas=p.use_pallas)
                dens, = _pad_bounds_tail(smp, (0,), m, p)
            return FluidState(vx, vy, vz, dens)
        return body

    def timeit(name, body, init):
        def run_n(length):
            @jax.jit
            def run(c, m):
                return jax.lax.scan(lambda c, _: (body(c, m), None), c, None,
                                    length=length)[0]
            return run
        r1, r3 = run_n(n), run_n(3 * n)
        jax.block_until_ready(r1(init, masks))
        jax.block_until_ready(r3(init, masks))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(init, masks))
            t1 = time.perf_counter()
            jax.block_until_ready(r3(init, masks))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        return best

    names = ["inlets", "+diffuse3", "+project1", "+advect_vel", "+project2",
             "+advect_dens(=full-stats)"]
    prev = 0.0
    for i, name in enumerate(names):
        t = timeit(name, prefix_body(i), state)
        print(f"{name:28s} {t * 1e3:7.3f} ms/iter   delta {(t - prev) * 1e3:7.3f} ms",
              flush=True)
        prev = t

    def full(st, m):
        st, _s = simulation_step(st, m, p)
        return st

    t = timeit("full step (with stats)", full, state)
    print(f"{'full step (with stats)':28s} {t * 1e3:7.3f} ms/iter   "
          f"delta {(t - prev) * 1e3:7.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
