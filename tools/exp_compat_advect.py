#!/usr/bin/env python3
"""On-chip validation + timing of the compat corner-fetch kernel
(kernels/advect_compat.py).

1. Bitwise check: jitted kernel path vs jitted XLA gather path at the
   flagship advect geometry (both compiled in one program via lax.cond and
   separately) — the corner planes are selection-only so any difference is
   a lerp-contraction divergence between the two compiled paths.
2. Window-reach check: run the real compat flagship (empty + sphere) and
   report max |floor(zb)-z|, |floor(yb)-y| across steps — validates the
   (K, KY) choices in ops/advect.py.
3. Slope-timed compat step with and without the kernel.
"""
import sys, time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import WindTunnel, simulation_step
    from fluid_simulation_tpu.ops.advect import backtrace, trilinear_gather
    from fluid_simulation_tpu.kernels.advect_compat import (
        trilinear_gather_pallas)
    from fluid_simulation_tpu.scene.primitives import (
        empty_obstacles, add_sphere)

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    # ---- 1. bitwise parity at flagship advect geometry
    shape = (66, 66, 130)
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    vx = jnp.asarray(rng.normal(scale=2.0, size=(D, H, W)).astype(np.float32))
    vy = jnp.asarray(
        rng.normal(scale=1.0 / H2, size=(D, H, W)).astype(np.float32))
    vz = jnp.asarray(
        rng.normal(scale=1.0 / D2, size=(D, H, W)).astype(np.float32))

    @jax.jit
    def both(prev, vx, vy, vz):
        xb, yb, zb = backtrace(vx, vy, vz, 0.05, W, H, D, jnp.float32)
        a = trilinear_gather_pallas(prev, xb, yb, zb, K=1, KY=1)
        b = trilinear_gather(prev, xb, yb, zb)
        ai = jax.lax.bitcast_convert_type(a, jnp.int32)
        bi = jax.lax.bitcast_convert_type(b, jnp.int32)
        return jnp.sum((ai != bi).astype(jnp.int32)), jnp.max(jnp.abs(a - b))

    nbad, maxdiff = (np.asarray(x) for x in both(prev, vx, vy, vz))
    print(f"flagship advect parity: {int(nbad)} differing words, "
          f"max |diff| {float(maxdiff):.3e}", flush=True)

    # ---- 2. window reach on real flagship flows
    for name, obstacles in (
            ("empty", None),
            ("sphere", np.asarray(
                add_sphere(empty_obstacles(128, 64, 64), 40, 32, 32, 10)))):
        p = SimParams(div_stats=False, mode="compat")
        wt = WindTunnel(p, obstacles=obstacles)
        pp, masks = wt.params, wt.masks

        @jax.jit
        def reach(state, m):
            def body(c, _):
                c, _s = simulation_step(c, m, pp)
                yb = jnp.clip(
                    jnp.arange(1, 65, dtype=jnp.float32).reshape(1, 64, 1)
                    - np.float32(pp.dt * 64) * c.vy[1:-1, 1:-1, 1:-1],
                    0.5, 64.5)
                zb = jnp.clip(
                    jnp.arange(1, 65, dtype=jnp.float32).reshape(64, 1, 1)
                    - np.float32(pp.dt * 64) * c.vz[1:-1, 1:-1, 1:-1],
                    0.5, 64.5)
                dy = jnp.max(jnp.abs(
                    jnp.floor(yb).astype(jnp.int32)
                    - jnp.arange(1, 65, dtype=jnp.int32).reshape(1, 64, 1)))
                dz = jnp.max(jnp.abs(
                    jnp.floor(zb).astype(jnp.int32)
                    - jnp.arange(1, 65, dtype=jnp.int32).reshape(64, 1, 1)))
                return c, (dy, dz)
            _, (dys, dzs) = jax.lax.scan(body, state, None, length=100)
            return jnp.max(dys), jnp.max(dzs)

        dy, dz = (int(np.asarray(v)) for v in reach(wt.state, masks))
        print(f"{name}: 100-step max |dy| {dy}, max |dz| {dz}", flush=True)

    # ---- 3. slope-timed compat step, kernel opt-in (advect_window=1,
    # fallback fires every step at flagship speeds) vs XLA gather
    n = 30
    for name, obstacles in (
            ("empty", None),
            ("sphere", np.asarray(
                add_sphere(empty_obstacles(128, 64, 64), 40, 32, 32, 10)))):
        for label, win in (("xla", 0), ("kernel", 1)):
            try:
                p = SimParams(div_stats=False, mode="compat",
                              advect_window=win)
                wt = WindTunnel(p, obstacles=obstacles)
                pp, masks = wt.params, wt.masks
                simulation_step._clear_cache()

                def run_n(length):
                    @jax.jit
                    def run(state, m):
                        def body(c, _):
                            c, _s = simulation_step(c, m, pp)
                            return c, None
                        return jax.lax.scan(body, state, None,
                                            length=length)[0]
                    return run
                r1, r3 = run_n(n), run_n(3 * n)
                st = r1(wt.state, masks)
                jax.block_until_ready(st)
                jax.block_until_ready(r3(st, masks))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(r1(st, masks))
                    t1 = time.perf_counter()
                    jax.block_until_ready(r3(st, masks))
                    t2 = time.perf_counter()
                    best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
                print(f"compat {name} {label:7s} {best*1e3:7.3f} ms/step",
                      flush=True)
            except Exception as e:
                print(f"compat {name} {label}: FAILED {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
