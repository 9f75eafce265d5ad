#!/usr/bin/env python3
"""Capture a jax.profiler trace of the scanned flagship step (VERDICT r3 #3:
the ~0.4 ms gap between isolated phase sums and the 0.97 ms step needs
trace-level evidence of what serializes).

Usage: python tools/exp_trace.py [W H D] [sphere]
Writes a TensorBoard trace dir to /tmp/fstpu_trace; prints the trace files
found so we know whether the axon plugin emitted a device trace at all.
"""

import os
import sys

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
    W, H, D = (int(args[0]), int(args[1]), int(args[2])) if len(args) >= 3 \
        else (128, 64, 64)
    sphere = "sphere" in args

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    p = SimParams(width=W, height=H, depth=D, div_stats=False,
                  step_stats=False, mode="split")
    obs = None
    if sphere:
        obs = np.asarray(add_sphere(empty_obstacles(W, H, D), cx=W // 3,
                                    cy=H // 2, cz=D // 2, radius=H // 6))
    wt = WindTunnel(p, obstacles=obs)
    p = wt.params

    @jax.jit
    def run(state, m):
        def body(c, _):
            return simulation_step(c, m, p)[0], None
        return jax.lax.scan(body, state, None, length=50)[0]

    # warm up / compile outside the trace
    jax.block_until_ready(run(wt.state, wt.masks))

    out = "/tmp/fstpu_trace"
    jax.profiler.start_trace(out)
    jax.block_until_ready(run(wt.state, wt.masks))
    jax.profiler.stop_trace()

    for root, _dirs, files in os.walk(out):
        for f in files:
            path = os.path.join(root, f)
            print(f"{os.path.getsize(path):>12} {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
