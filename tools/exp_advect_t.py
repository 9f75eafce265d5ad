#!/usr/bin/env python3
"""Full-step A/B of materialised-transpose vs transposing-pass split
advection, one variant per process (env ADVECT_VARIANT=lane|tpass) —
in-process patching + jit cache clearing destabilises the relay worker
(round-3 notes).

Also prints a 20-step state SHA so the two variants' numerics can be
compared bitwise across processes.

Usage: ADVECT_VARIANT=tpass python tools/exp_advect_t.py [W H D]
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
    import fluid_simulation_tpu.kernels.advect_pallas as ap
    from fluid_simulation_tpu.models.windtunnel import (
        WindTunnel, simulation_step)

    variant = os.environ.get("ADVECT_VARIANT", "tpass")
    W, H, D = ((int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3
               else (256, 256, 256))

    if variant == "tpass":
        def t_auto(prev, vx, vy, vz, dt_, use_pallas=True):
            if use_pallas and ap.advect_split_t_supported(prev.shape):
                return ap.advect_split_t(prev, vx, vy, vz, float(dt_))
            if use_pallas and ap.lane_lerp_supported(prev.shape):
                return ap.advect_split(prev, vx, vy, vz, float(dt_))
            return ap.advect_split_jnp(prev, vx, vy, vz, float(dt_))
        ap.advect_split_auto = t_auto

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())

    p = SimParams(width=W, height=H, depth=D, div_stats=False, mode="split")
    wt = WindTunnel(p)
    p = wt.params
    masks = wt.masks

    def run_n(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                return simulation_step(c, m, p)[0], None
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    # 20-step state SHA (bitwise cross-process check)
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
    print(f"{variant} {W}x{H}x{D}: {best * 1e3:.3f} ms/step  sha={sha}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
