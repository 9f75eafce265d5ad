#!/usr/bin/env python3
"""Bisect the masked-stream advect-mix penalty (VERDICT r4 #5).

At 256x128x128 sphere the transposing t-pass advect loses ~1.4 ms/step
flat inside the MASKED z-streaming kernel mix (17.0 vs 15.6, r3) while
winning at every empty size and at masked >= 8M cells — the routing
band-aid `_LANE_ADVECT_MAX_CELLS` eats a 12-15% obstacle penalty at this
size. This tool forces the t-pass ON and swaps ONE masked component for
its empty-scene form per process (timing-valid, numerics intentionally
wrong for the swapped component — density printed for visibility only):

Usage: python tools/exp_mix5.py VARIANT [W H D]
  empty          empty scene, stock dispatch (t-pass) — control
  lane           sphere, stock dispatch (lane routing, the r4 band-aid)
  tpass          sphere, _advect_prefer_t forced True (the known regression)
  tpass-ediff    tpass + diffusion solves forced empty_scene (keep streams
                 off in the 4 diffuse solves; projection still masked)
  tpass-eproj    tpass + projection swapped to the EMPTY streamed kernel
                 (masked keep solves still on in diffusions)
  lane-eproj     lane + empty projection (cross-check)

One variant per process (round-3 policy: in-process repatching
destabilises the relay and lies).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    variant = args[0] if args else "tpass"
    W, H, D = (int(a) for a in args[1:4]) if len(args) >= 4 else (256, 128,
                                                                  128)

    import jax
    import jax.numpy as jnp
    import fluid_simulation_tpu.models.windtunnel as wtm
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.scene.primitives import (
        add_sphere, empty_obstacles)

    if variant.startswith("tpass"):
        wtm._advect_prefer_t = lambda p, shape, dtype: True
    if variant.endswith("-ediff"):
        orig_diffuse = wtm.diffuse

        def ediff(b, f, prev, masks, dt, diff, **kw):
            kw = {**kw, "empty_scene": True}
            return orig_diffuse(b, f, prev, masks, dt, diff, **kw)
        wtm.diffuse = ediff
    if variant.endswith("-eproj"):
        from fluid_simulation_tpu.kernels.project_stream import (
            pallas_project_stream_packed)

        def eproj(vx, vy, vz, masks, p):
            smp = pallas_project_stream_packed(vx, vy, vz, acc=p.acc,
                                               wall_mode=p.wall_mode)
            return wtm._pad_bounds_tail(smp, (1, 2, 3), masks, p)
        wtm._project_dispatch = eproj

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("warmup ok", flush=True)

    p = SimParams(width=W, height=H, depth=D, div_stats=False,
                  step_stats=False, mode="split")
    obstacles = None
    if variant != "empty":
        obstacles = np.asarray(add_sphere(empty_obstacles(W, H, D),
                                          cx=W // 3, cy=H // 2, cz=D // 2,
                                          radius=max(10, H // 6)))
    wt = wtm.WindTunnel(p, obstacles=obstacles)
    params, masks = wt.params, wt.masks

    def run_n(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                c, _s = wtm.simulation_step(c, m, params)
                return c, None
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    n = 10
    r1, r3 = run_n(n), run_n(3 * n)
    out = r1(wt.state, masks)
    jax.block_until_ready(out)
    jax.block_until_ready(r3(wt.state, masks))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(wt.state, masks))
        t1 = time.perf_counter()
        jax.block_until_ready(r3(wt.state, masks))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
    ds = float(jnp.sum(out.dens, dtype=jnp.float32))
    print(f"{variant} {W}x{H}x{D}: {best * 1e3:.3f} ms/step  "
          f"density_sum={ds:.1f} (informational)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
