#!/usr/bin/env python3
"""A/B the merged-window manual-DMA solve WITH keep streams at wide rows.

mdma_preferred excludes apply_keep by the 256^3 measurement (mdma 519.4 vs
temporal BlockSpec 508.1 us/sweep) — but at 512-wide rows the BlockSpec
temporal kernel has never fit (temporal_stream_preferred is None), so the
masked 512x256x256 solves + the masked streamed projection's Poisson stage
run DEPTH-1 streams. There the comparison is mdma:16:2 vs depth-1, the
matchup the EMPTY 512 already won by 18.7% (980.5 vs 1206.7 us/sweep).

One variant per process. 'mdma' patches the keep gate out of
mdma_preferred (both the linsolve dispatch, which imports it per call, and
project_stream's import-time binding). SHA must match stock bitwise.

Usage: python tools/exp_mdma_keep.py {stock|mdma} [W H D]
"""
import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variant = sys.argv[1]
    args = [int(a) for a in sys.argv[2:]]
    W, H, D = args if len(args) == 3 else (512, 256, 256)

    import jax
    import jax.numpy as jnp
    import fluid_simulation_tpu.models.windtunnel as wtm
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.scene.primitives import (
        add_sphere, empty_obstacles)

    if variant == "mdma":
        import fluid_simulation_tpu.kernels.linsolve_mdma as lm
        import fluid_simulation_tpu.kernels.project_stream as ps
        orig = lm.mdma_preferred

        def pref(shape, dtype=jnp.float32, apply_keep=True, batched=False):
            if apply_keep and not batched:
                if jax.default_backend() not in ("tpu", "axon"):
                    return None
                return lm.mdma_params(shape, dtype, apply_keep=True)
            return orig(shape, dtype, apply_keep, batched)
        lm.mdma_preferred = pref
        ps.mdma_preferred = pref

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("warmup ok", flush=True)

    p = SimParams(width=W, height=H, depth=D, div_stats=False,
                  step_stats=False, mode="split")
    obs = np.asarray(add_sphere(empty_obstacles(W, H, D), cx=W // 3,
                                cy=H // 2, cz=D // 2, radius=H // 6))
    wt = wtm.WindTunnel(p, obstacles=obs)
    p, masks = wt.params, wt.masks

    def run_n(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                return wtm.simulation_step(c, m, p)[0], None
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    s20 = run_n(20)(wt.state, masks)
    h = hashlib.sha256()
    for f in (s20.vx, s20.vy, s20.vz, s20.dens):
        h.update(np.asarray(f).tobytes())
    sha = h.hexdigest()[:16]

    n = 10 if W <= 256 else 5
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
    print(f"mdma_keep {variant} {W}x{H}x{D} sphere: {best * 1e3:.3f} ms/step"
          f"  sha={sha}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
