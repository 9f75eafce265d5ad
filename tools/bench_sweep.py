#!/usr/bin/env python3
"""Design-sweep benchmark at flagship scale (VERDICT r1 weak#7).

BASELINE config 4: "vmapped batch of 8 obstacle geometries simulated in
parallel for design sweep". Measures the 8-geometry vmapped sweep at
128x64x64 on the real TPU against running the same geometries sequentially,
reporting geometry-steps/s both ways. Slope timing over two scan lengths
cancels the relay tunnel's per-dispatch overhead.

Usage: python tools/bench_sweep.py [B [n]]   (default B=8 geometries, n=10)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.sweep import batch_masks
    from fluid_simulation_tpu.models.windtunnel import (
        WindTunnel, init_state, simulation_step)
    from fluid_simulation_tpu.scene.primitives import (
        add_box, add_sphere, empty_obstacles)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    params = SimParams(div_stats=False, mode="split")
    W, H, D = params.width, params.height, params.depth

    geoms = []
    for i in range(B):
        o = empty_obstacles(W, H, D)
        if i % 2 == 0:
            o = add_sphere(o, cx=32 + 4 * i, cy=H // 2, cz=D // 2,
                           radius=6 + i)
        else:
            o = add_box(o, 30 + 2 * i, 40 + 3 * i, H // 3, 2 * H // 3,
                        D // 3, 2 * D // 3)
        geoms.append(np.asarray(o, np.float32))
    bm = batch_masks(geoms)

    def slope(run, s0, m):
        r1 = run(n)
        r3 = run(3 * n)
        s = r1(s0, m)
        jax.block_until_ready(s)
        jax.block_until_ready(r3(s, m))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(s, m))
            t1 = time.perf_counter()
            jax.block_until_ready(r3(s, m))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        return best, s

    # ---- vmapped sweep: one program, B geometries per step
    def run_batched(length):
        @jax.jit
        def run(state, m):
            step_v = jax.vmap(lambda s, mm: simulation_step(s, mm, params))

            def body(c, _):
                c, _stats = step_v(c, m)
                return c, None
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    state0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), init_state(params))
    t_b, s_b = slope(run_batched, state0, bm)
    dens = np.asarray(jax.jit(
        lambda st: jnp.sum(st.dens, axis=(1, 2, 3), dtype=jnp.float32))(s_b))
    assert np.all(np.isfinite(dens)) and np.all(dens > 0), dens

    # ---- sequential: one geometry per program (same masks, B dispatch sets)
    wt = WindTunnel(params.replace(empty_scene=False), obstacles=geoms[0])
    m_single = wt.masks

    def run_single(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                c, _stats = simulation_step(c, m, params.replace(
                    empty_scene=False))
                return c, None
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    t_s, _ = slope(run_single, wt.state, m_single)

    gsps_b = B / t_b
    gsps_s = 1.0 / t_s
    print(f"B={B} geometries @ {W}x{H}x{D}, mode=split")
    print(f"vmapped   : {t_b * 1e3:8.2f} ms/batched-step  -> "
          f"{gsps_b:7.1f} geometry-steps/s")
    print(f"sequential: {t_s * 1e3:8.2f} ms/step          -> "
          f"{gsps_s:7.1f} geometry-steps/s per geometry "
          f"({B / (B * t_s) : .1f} if run back-to-back)")
    print(f"batching speedup: {B * t_s / t_b:.2f}x over {B} sequential runs")

    # ---- design_sweep's lax.map sequential route (VERDICT r2 #6): one
    # program that runs the B geometries one after another with unvmapped
    # kernels — what route='auto' picks at flagship scale
    from fluid_simulation_tpu.models.sweep import design_sweep

    def run_route(length):
        @jax.jit
        def run(_state, m):
            final, _ = design_sweep(m, params.replace(empty_scene=False),
                                    steps=length, route="sequential")
            return final
        return run

    t_r, _ = slope(run_route, state0, bm)
    # t_r covers B geometries x length steps in one program
    print(f"lax.map route: {t_r * 1e3:8.2f} ms/(step x {B} geoms) -> "
          f"{B / t_r:7.1f} geometry-steps/s "
          f"({t_b / t_r:.2f}x vs vmapped)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
