#!/usr/bin/env python3
"""A/B the fused-backtrace advect passes against the lane_lerp path.

Measures the FULL split-mode step both ways (phase-isolated timings
pipeline differently than the real step — only end-to-end counts), plus the
advect phases standalone, and checks value agreement on the chip.

Usage: python tools/exp_advect_fused.py [W H D]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import WindTunnel, simulation_step
    from fluid_simulation_tpu.kernels import advect_pallas as ap

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (128, 64, 64)
    n = 50

    params = SimParams(width=W, height=H, depth=D, div_stats=False,
                       mode="split", empty_scene=True)
    wt = WindTunnel(params)
    masks = wt.masks
    p = wt.params
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    st, _ = jax.jit(simulation_step, static_argnames=("params",))(
        wt.state, masks, p)
    state = st

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
        print(f"{name:34s} {best * 1e3:8.3f} ms", flush=True)
        return best

    # value agreement on chip. NB the stack must happen INSIDE jit: an eager
    # jnp.stack commits its result on the TPU and any readback downstream of
    # eager-committed inputs crashes the relay worker (CLAUDE.md).
    @jax.jit
    def both(s):
        stacked = jnp.stack([s.vx, s.vy, s.vz])
        a = ap.advect_split(stacked, s.vx, s.vy, s.vz, float(p.dt))
        b = ap.advect_split_fused(stacked, s.vx, s.vy, s.vz, float(p.dt))
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a))
    d, m = (float(x) for x in both(state))
    print(f"on-chip max |lane - fused| = {d:.3g} (field max {m:.3g})")

    orig = ap.advect_split_auto

    def lane_auto(prev, vx, vy, vz, dt_, use_pallas=True):
        if use_pallas and ap.lane_lerp_supported(prev.shape):
            return ap.advect_split(prev, vx, vy, vz, float(dt_))
        return ap.advect_split_jnp(prev, vx, vy, vz, float(dt_))

    def fused_auto(prev, vx, vy, vz, dt_, use_pallas=True):
        if use_pallas and ap.lane_lerp_supported(prev.shape):
            return ap.advect_split_fused(prev, vx, vy, vz, float(dt_))
        return ap.advect_split_jnp(prev, vx, vy, vz, float(dt_))

    # windtunnel imports advect_split_auto inside the function body from the
    # module, so patching the module attribute is enough — but
    # simulation_step caches on the static params, so clear the jit cache
    # before each re-trace under a different patched dispatch.
    def step_fn(s, m):
        return simulation_step(s, m, p)[0]

    for name, auto in (("full_step lane_lerp", lane_auto),
                       ("full_step fused", fused_auto)):
        ap.advect_split_auto = auto
        simulation_step._clear_cache()
        timeit(name, step_fn, state)
    ap.advect_split_auto = orig

    return 0


if __name__ == "__main__":
    sys.exit(main())
