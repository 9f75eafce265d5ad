#!/usr/bin/env python3
"""Masked streamed projection on the real chip: parity + step timing.

Usage:
  python tools/exp_project_masked.py parity [W H D]   # max |diff| vs composable
  python tools/exp_project_masked.py step  [W H D [variant]]
                                            # slope-timed obstacle step;
                                            # variant: stock | xla_project

One variant per process (CLAUDE.md: in-process A/B patching destabilises
the relay and has produced wrong verdicts).
"""

import sys
import time

import numpy as np

BASELINE_CU = 0.43e6


def _scene(W, H, D):
    from fluid_simulation_tpu.scene.primitives import (add_sphere,
                                                       empty_obstacles)
    return add_sphere(empty_obstacles(W, H, D), W // 3, H // 2, D // 2,
                      min(H, D) // 4)


def parity(W, H, D):
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.project_stream import (
        pallas_project_stream_masked, pallas_project_stream_masked_supported,
        _pick_blk_masked)
    from fluid_simulation_tpu.models.windtunnel import _pad_bounds_tail
    from fluid_simulation_tpu.ops.project import project
    from fluid_simulation_tpu.config import SimParams

    shape = (D + 2, H + 2, W + 2)
    print("supported:", pallas_project_stream_masked_supported(shape),
          "blocks:", _pick_blk_masked(shape, jnp.float32), flush=True)
    import jax.numpy as jnp2
    from fluid_simulation_tpu.scene.masks import build_masks
    masks = build_masks(jnp2.asarray(_scene(W, H, D)))
    p = SimParams(width=W, height=H, depth=D, empty_scene=False)

    @jax.jit
    def diff(m):
        key = jax.random.PRNGKey(3)
        ks = jax.random.split(key, 3)
        edge = jnp.zeros(shape).at[1:-1, 1:-1, :].set(1.0)
        edge = edge.at[1:-1, :, 1:-1].set(1.0).at[:, 1:-1, 1:-1].set(1.0)
        vx, vy, vz = (jax.random.normal(k, shape, jnp.float32) * edge
                      for k in ks)
        ref = project(vx, vy, vz, m, acc=15, solver="rbgs",
                      use_pallas=False, empty_scene=False)
        smp = pallas_project_stream_masked(vx, vy, vz, m.fluid_i, acc=15)
        got = _pad_bounds_tail(smp, (1, 2, 3), m, p)
        return jnp.stack([jnp.max(jnp.abs(got[i] - ref[i]))
                          for i in range(3)])

    t0 = time.time()
    d = np.asarray(diff(masks))
    print(f"max |diff| per component: {d}  ({time.time()-t0:.1f} s)",
          flush=True)


def step(W, H, D, variant):
    import jax
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (WindTunnel,
                                                        simulation_step)
    if variant == "xla_project":
        import fluid_simulation_tpu.models.windtunnel as wtm
        from fluid_simulation_tpu.ops.project import project as _proj

        def _dispatch(vx, vy, vz, masks, p):
            out = _proj(vx, vy, vz, masks, acc=p.acc, solver=p.solver,
                        wall_mode=p.wall_mode, use_pallas=p.use_pallas,
                        empty_scene=p.empty_scene)
            return out[0], out[1], out[2]
        wtm._project_dispatch = _dispatch
    elif variant == "lane_advect":
        # disable the transposing y/z advect passes (advect_split_t) so
        # advect_split_auto falls back to the lane_lerp path — isolates the
        # 58fb300 change on OBSTACLE scenes (its A/B was empty-scene only)
        import fluid_simulation_tpu.kernels.advect_pallas as ap
        ap.advect_split_t_supported = lambda shape: False
    elif variant == "tpass_advect":
        # force the t-pass even on the masked-stream route (undo
        # _advect_prefer_t): the t-pass's empty-scene win GROWS with grid
        # size (1.4 ms at 256x128x128, 6.4 ms at 256^3) while the
        # masked-mix penalty may not — measure per size
        import fluid_simulation_tpu.models.windtunnel as wtm
        wtm._advect_prefer_t = lambda p, shape, dtype: True

    np.asarray(jax.jit(lambda: jax.numpy.zeros((8, 128)))())
    params = SimParams(width=W, height=H, depth=D, div_stats=False,
                       mode="split", empty_scene=False)
    wt = WindTunnel(params, obstacles=_scene(W, H, D))
    masks = wt.masks

    def make_run(length):
        @jax.jit
        def run(state, m):
            def body(c, _):
                s, _ = simulation_step(c, m, params)
                return s, ()
            return jax.lax.scan(body, state, None, length=length)[0]
        return run

    n = 10
    r1, r3 = make_run(n), make_run(3 * n)
    jax.block_until_ready(r1(wt.state, masks))      # compile both
    jax.block_until_ready(r3(wt.state, masks))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(wt.state, masks))
        t1 = time.perf_counter()
        jax.block_until_ready(r3(wt.state, masks))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
    ms = best * 1e3
    cu = W * H * D / best
    print(f"{W}x{H}x{D} obstacle {variant}: {ms:.1f} ms/step, "
          f"{cu:.2e} cu/s ({cu/BASELINE_CU:.0f}x)", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    dims = [int(a) for a in sys.argv[2:5]] or [256, 128, 128]
    W, H, D = dims
    if mode == "parity":
        parity(W, H, D)
    else:
        variant = sys.argv[5] if len(sys.argv) > 5 else "stock"
        step(W, H, D, variant)


if __name__ == "__main__":
    main()
