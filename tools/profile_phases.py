#!/usr/bin/env python3
"""Phase-level timing of the split-mode step on the real TPU.

VERDICT r1 weak#4: nobody knows where the 4.86 ms step goes (roofline says
~0.2 ms of HBM traffic). This times each phase of the step in isolation, the
only reliable way on this backend: scan n repetitions of the phase inside one
jit (per-dispatch RPC is ~150 ms, CLAUDE.md), best of k windows, report
ms/iteration. Phases are closed state->state maps so scan carries them.

Usage: python tools/profile_phases.py [W H D]   (default 128 64 64)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (
        WindTunnel, simulation_step, _apply_inlets)
    from fluid_simulation_tpu.ops.linsolve import diffuse, diffusion_coeffs
    from fluid_simulation_tpu.ops.bounds import set_bounds

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (128, 64, 64)
    n = 50
    reps = 3

    params = SimParams(width=W, height=H, depth=D, div_stats=False,
                       mode="split", empty_scene=True)
    wt = WindTunnel(params)
    masks = wt.masks
    p = params

    # warmup transfer (per-process tunnel stall)
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    # advance a few steps so fields are realistic. masks go in as a jit
    # ARGUMENT everywhere below: closure-captured device arrays embed as
    # full-size program constants and blow the remote-compile body limit at
    # 256^3 (NOTES.md).
    st, _ = jax.jit(simulation_step, static_argnames=("params",))(
        wt.state, masks, params)
    state = st

    def timeit(name, body, init):
        """Slope timing: per-iteration cost = (t(3n) - t(n)) / 2n, which
        cancels the fixed per-dispatch overhead of the relay tunnel.
        ``body(c, m)`` receives the masks pytree as a traced argument."""
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
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(init, masks))
            t1 = time.perf_counter()
            jax.block_until_ready(r3(init, masks))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        print(f"{name:28s} {best * 1e3:8.3f} ms", flush=True)
        return best

    kw = dict(acc=p.acc, solver=p.solver, wall_mode=p.wall_mode,
              use_pallas=p.use_pallas, empty_scene=p.empty_scene)

    # -- full step
    timeit("full_step", lambda s, m: simulation_step(s, m, params)[0], state)

    # -- inlets + buffer copy
    timeit("inlets", lambda s, m: _apply_inlets(s, p)[0], state)

    # -- one diffuse solve (step runs 3)
    def d1(s, m):
        vx = diffuse(1, s.vx, s.vx, m, p.dt, p.diff, **kw)
        return s._replace(vx=vx)
    timeit("diffuse_x1 (step has 3)", d1, state)

    # -- projection as the step dispatches it (fused kernel when the grid
    # fits VMEM, composable + streaming solve otherwise)
    from fluid_simulation_tpu.models.windtunnel import _project_dispatch

    def proj(s, m):
        vx, vy, vz = _project_dispatch(s.vx, s.vy, s.vz, m, p)
        return s._replace(vx=vx, vy=vy, vz=vz)
    timeit("project_x1 (2)", proj, state)

    # -- split advect of the stacked 3 velocity fields, exactly as the step
    # dispatches it (advect_split_auto + fused _pad_bounds_tail)
    from fluid_simulation_tpu.kernels.advect_pallas import advect_split_auto
    from fluid_simulation_tpu.models.windtunnel import _pad_bounds_tail

    def adv3(s, m):
        stacked = jnp.stack([s.vx, s.vy, s.vz])
        smp = advect_split_auto(stacked, s.vx, s.vy, s.vz, p.dt)
        vx, vy, vz = _pad_bounds_tail(smp, (1, 2, 3), m, p)
        return s._replace(vx=vx, vy=vy, vz=vz)
    timeit("advect_split_vel3 (1)", adv3, state)

    # -- split advect of density (step runs 1)
    def advd(s, m):
        smp = advect_split_auto(s.dens, s.vx, s.vy, s.vz, p.dt)
        dens, = _pad_bounds_tail(smp, (0,), m, p)
        return s._replace(dens=dens)
    timeit("advect_split_dens (1)", advd, state)

    # -- the fused pad+setBounds epilogue alone (one 3-stack call)
    def tail3(s, m):
        smp = jnp.stack([s.vx[1:-1, 1:-1, 1:-1], s.vy[1:-1, 1:-1, 1:-1],
                         s.vz[1:-1, 1:-1, 1:-1]])
        vx, vy, vz = _pad_bounds_tail(smp, (1, 2, 3), m, p)
        return s._replace(vx=vx, vy=vy, vz=vz)
    timeit("pad_bounds_tail3_x1", tail3, state)

    # -- pieces of the split advect: transposes only (y-pass + z-pass style,
    # there and back = 4 transposes of one field)
    def transposes_only(s, m):
        a = jnp.swapaxes(s.dens, 1, 2) + 1.0
        b = jnp.swapaxes(a, 1, 2)
        c2 = jnp.transpose(b, (1, 2, 0)) + 1.0
        return s._replace(dens=jnp.transpose(c2, (2, 0, 1)))
    timeit("transpose_x4", transposes_only, state)

    # -- inlet via where-mask instead of scatter (mask built in-trace so it
    # is device-computed, not an embedded constant)
    def inlets_where(s, m):
        inlet_mask = jnp.zeros(
            p.padded_shape, jnp.float32).at[1:-1, 1:-1, 1].set(1.0)
        dens = s.dens + inlet_mask * np.float32(p.inlet_density)
        vx = jnp.where(inlet_mask > 0, np.float32(p.speed), s.vx)
        vy = s.vy * (1.0 - inlet_mask)
        vz = s.vz * (1.0 - inlet_mask)
        return s._replace(dens=dens, vx=vx, vy=vy, vz=vz)
    timeit("inlets_where_mask", inlets_where, state)

    # -- one lane-lerp pass over the stacked shape (x pass geometry)
    from fluid_simulation_tpu.kernels.advect_pallas import lane_lerp
    D2, H2, W2 = p.padded_shape
    arr = jnp.zeros((3 * D2 * H2, W2), jnp.float32) + state.dens.reshape(-1)[0]

    def lane1(a, m):
        idx = jnp.clip(jnp.broadcast_to(
            jnp.arange(W2, dtype=jnp.float32) * 0.98 + 0.5,
            (3 * D2 * H2, W2)), 0.5, W2 - 1.5)
        return lane_lerp(a, idx)
    timeit("lane_lerp_3DH_rows_x1", lane1, arr)

    # -- set_bounds alone (step runs 4)
    def sb(s, m):
        return s._replace(dens=set_bounds(0, s.dens, m, p.wall_mode,
                                          p.empty_scene))
    timeit("set_bounds_x1 (4)", sb, state)

    return 0


if __name__ == "__main__":
    sys.exit(main())
