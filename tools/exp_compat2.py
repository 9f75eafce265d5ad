#!/usr/bin/env python3
"""Follow-up to exp_compat_advect.py: the (K=1, KY=1) window premise is
FALSE on real flagship flows (max |dz|/|dy| 13-18 — projection makes
vy/vz ~ +-3 even in an empty tunnel, and backtrace scale is dt*64*v).

Two questions decide salvage-vs-falsify for the corner-fetch kernel:
1. When the kernel branch DOES engage, is it even faster than the XLA
   gather at flagship geometry?  (slope-timed, in-window synthetic coords)
2. Are the offsets smooth enough that a per-z-slab dynamic base (scalar
   prefetch) makes small windows viable — i.e. what is the per-slab
   SPREAD (max-min) of dz and dy on real flagship flows?
"""
import sys, time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (
        WindTunnel, simulation_step)
    from fluid_simulation_tpu.ops.advect import backtrace, trilinear_gather
    from fluid_simulation_tpu.kernels.advect_compat import corner_fetch
    from fluid_simulation_tpu.scene.primitives import (
        empty_obstacles, add_sphere)

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    spread_only = "--spread-only" in sys.argv

    # ---- 1. kernel-branch vs XLA gather, slope-timed, flagship geometry
    shape = (66, 66, 130)
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    # coords with |dz|,|dy| <= 1: tiny vy/vz
    vx = jnp.asarray(rng.normal(scale=2.0, size=(D, H, W)).astype(np.float32))
    vy = jnp.asarray(
        rng.normal(scale=1.0 / H2, size=(D, H, W)).astype(np.float32))
    vz = jnp.asarray(
        rng.normal(scale=1.0 / D2, size=(D, H, W)).astype(np.float32))
    xb, yb, zb = backtrace(vx, vy, vz, 0.05, W, H, D, jnp.float32)
    i0 = jnp.floor(xb).astype(jnp.int32)
    j0 = jnp.floor(yb).astype(jnp.int32)
    k0 = jnp.floor(zb).astype(jnp.int32)
    yi = jnp.arange(1, H + 1, dtype=jnp.int32).reshape(1, H, 1)
    zi = jnp.arange(1, D + 1, dtype=jnp.int32).reshape(D, 1, 1)

    def pad_geom(a):
        return jnp.zeros((D2, H2, W2), a.dtype).at[1:-1, 1:-1, 1:-1].set(a)

    i0p, dzp, dyp = pad_geom(i0), pad_geom(k0 - zi), pad_geom(j0 - yi)

    def slope(run_n, *args, n=30):
        r1, r3 = run_n(n), run_n(3 * n)
        jax.block_until_ready(r1(*args))
        jax.block_until_ready(r3(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(r1(*args))
            t1 = time.perf_counter(); jax.block_until_ready(r3(*args))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        return best

    def kern_n(length):
        @jax.jit
        def run(prev, i0p, dzp, dyp):
            def body(c, _):
                g = corner_fetch(c, i0p, dzp, dyp, K=1, KY=1)
                return c + g[0] * 1e-30, None
            return jax.lax.scan(body, prev, None, length=length)[0]
        return run

    def xla_n(length):
        @jax.jit
        def run(prev, xb, yb, zb):
            def body(c, _):
                s = trilinear_gather(c, xb, yb, zb)
                return c.at[1:-1, 1:-1, 1:-1].add(s * 1e-30), None
            return jax.lax.scan(body, prev, None, length=length)[0]
        return run

    if not spread_only:
        tk = slope(kern_n, prev, i0p, dzp, dyp)
        tx = slope(xla_n, prev, xb, yb, zb)
        print(f"corner_fetch K=1: {tk*1e3:7.3f} ms/advect-gather",
              flush=True)
        print(f"XLA (N,8) gather: {tx*1e3:7.3f} ms/advect-gather",
              flush=True)

    # ---- 2. per-z-slab spread of dz/dy on real flagship flows
    for name, obstacles in (
            ("empty", None),
            ("sphere", np.asarray(
                add_sphere(empty_obstacles(128, 64, 64), 40, 32, 32, 10)))):
        p = SimParams(div_stats=False, mode="compat")
        wt = WindTunnel(p, obstacles=obstacles)
        pp, masks = wt.params, wt.masks

        for ZB in (8, 4):
            @jax.jit
            def spreads(state, m):
                def body(c, _):
                    c, _s = simulation_step(c, m, pp)
                    vxi = c.vx[1:-1, 1:-1, 1:-1]
                    vyi = c.vy[1:-1, 1:-1, 1:-1]
                    vzi = c.vz[1:-1, 1:-1, 1:-1]
                    xb, yb, zb = backtrace(vxi, vyi, vzi, pp.dt, 128, 64,
                                           64, jnp.float32)
                    dz = (jnp.floor(zb).astype(jnp.int32)
                          - jnp.arange(1, 65, dtype=jnp.int32
                                       ).reshape(64, 1, 1))
                    dy = (jnp.floor(yb).astype(jnp.int32)
                          - jnp.arange(1, 65, dtype=jnp.int32
                                       ).reshape(1, 64, 1))
                    def sp(a):
                        blk = a.reshape(64 // ZB, ZB, 64, 128)
                        return jnp.max(jnp.max(blk, (1, 2, 3))
                                       - jnp.min(blk, (1, 2, 3)))
                    return c, (sp(dz), sp(dy))
                _, (szs, sys_) = jax.lax.scan(body, state, None, length=100)
                return jnp.max(szs), jnp.max(sys_)

            sz, sy = (int(np.asarray(v)) for v in spreads(wt.state, masks))
            print(f"{name}: max per-{ZB}-slab spread dz {sz}, dy {sy}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
