#!/usr/bin/env python3
"""Full-step timing at one grid/scene (r4 stream-window work), one config
per process (round-3 policy: never patch modules in-process on the relay).

Prints ms/step (slope-timed), a 20-step state SHA (bitwise cross-process /
cross-round check), and the dispatch choices in effect.

Usage: python tools/exp_r4step.py W H D [sphere] [noslip]
"""

import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (
        WindTunnel, simulation_step)
    from fluid_simulation_tpu.scene.primitives import (
        add_sphere, empty_obstacles)

    args = sys.argv[1:]
    W, H, D = int(args[0]), int(args[1]), int(args[2])
    sphere = "sphere" in args
    noslip = "noslip" in args

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    p = SimParams(width=W, height=H, depth=D, div_stats=False,
                  step_stats=False, mode="split",
                  wall_mode="noslip" if noslip else "reference",
                  vorticity=5.0 if noslip else 0.0)
    obs = None
    if sphere:
        obs = np.asarray(add_sphere(empty_obstacles(W, H, D), cx=W // 3,
                                    cy=H // 2, cz=D // 2,
                                    radius=max(10, H // 6)))
    wt = WindTunnel(p, obstacles=obs)
    p = wt.params
    masks = wt.masks

    from fluid_simulation_tpu.kernels.linsolve_stream import (
        _pick_blk, temporal_stream_preferred)
    shape = (D + 2, H + 2, W + 2)
    print(f"dispatch: stream blk={_pick_blk(shape, jnp.float32, sphere)} "
          f"temporal={temporal_stream_preferred(shape, jnp.float32, sphere)}",
          flush=True)

    def run_n(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                return simulation_step(c, m, p)[0], None
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    s20 = run_n(20)(wt.state, masks)
    h = hashlib.sha256()
    for f in (s20.vx, s20.vy, s20.vz, s20.dens):
        h.update(np.asarray(f).tobytes())
    sha = h.hexdigest()[:16]

    n = 100 if W <= 128 else (10 if W <= 256 else 5)
    r1, r3 = run_n(n), run_n(3 * n)
    jax.block_until_ready(r1(wt.state, masks))
    jax.block_until_ready(r3(wt.state, masks))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(wt.state, masks))
        t1 = time.perf_counter()
        jax.block_until_ready(r3(wt.state, masks))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
    scene = "sphere" if sphere else ("noslip" if noslip else "empty")
    print(f"r4 {W}x{H}x{D} {scene}: {best * 1e3:.3f} ms/step  sha={sha}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
