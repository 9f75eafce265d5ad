#!/usr/bin/env python3
"""A/B the fused 3-field diffusion solve (pallas_rbgs_solve3) in the
flagship step. ONE variant per process (in-process patching + jit-cache
clearing destabilises the relay and mis-measured once — CLAUDE.md):

    python tools/exp_diffuse3.py {fused|stock} {empty|sphere}

Prints ms/step (slope-timed) and a SHA of the 20-step final state so the
two variants' outputs can be compared bitwise across processes.
"""
import hashlib
import sys
import time

import numpy as np


def main():
    variant, scene = sys.argv[1], sys.argv[2]
    import jax
    import jax.numpy as jnp
    import fluid_simulation_tpu.models.windtunnel as wtm
    if variant == "fused":
        # production dispatch gates the fused kernel off (measured neutral);
        # patch it on BEFORE any trace — one variant per process
        wtm._diffuse3_applicable = lambda p: True
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.scene.primitives import (add_sphere,
                                                       empty_obstacles)

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    params = SimParams(div_stats=False, mode="split")
    obstacles = None
    if scene == "sphere":
        obstacles = np.asarray(
            add_sphere(empty_obstacles(128, 64, 64), 40, 32, 32, 10))
    wt = wtm.WindTunnel(params, obstacles=obstacles)
    p, masks = wt.params, wt.masks

    n = 50

    def run_n(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                c, _s = wtm.simulation_step(c, m, p)
                return c, None
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    # bitwise fingerprint of a 20-step run from zero state
    st20 = run_n(20)(wt.state, masks)
    jax.block_until_ready(st20)
    h = hashlib.sha256()
    for f in st20:
        h.update(np.asarray(f).tobytes())
    print(f"state20_sha={h.hexdigest()[:16]} "
          f"dens_sum={float(jnp.sum(st20.dens, dtype=jnp.float32)):.6f}",
          flush=True)

    r1, r3 = run_n(n), run_n(3 * n)
    st = r1(wt.state, masks)
    jax.block_until_ready(st)
    jax.block_until_ready(r3(st, masks))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(r1(st, masks))
        t1 = time.perf_counter(); jax.block_until_ready(r3(st, masks))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
    print(f"{variant:6s} {scene:7s} {best * 1e3:7.3f} ms/step", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
