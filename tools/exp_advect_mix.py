#!/usr/bin/env python3
"""Bisect the masked-stream advect-mix penalty at 256x128x128 (VERDICT
r4 #5): the t-pass advect loses ~1.5 ms/step ONLY when the step's other
kernels take the MASKED z-streaming route (obstacle past VMEM residency,
<8M cells), so `_advect_prefer_t` routes those steps to the lane path.
This measures each suspect interaction in isolation — ONE variant per
process (round-3 policy: in-process repatching destabilises the relay).

Variants (default grid 256x128x128 + sphere):
  lane           stock dispatch (production: lane advect)      ~14.9 r4
  tpass          force prefer_t=True (the losing mix)          ~17.0 r4
  tpass-eproj    tpass + projections routed to the EMPTY stream path
                 (numerically wrong; isolates the masked-projection mix)
  tpass-esolve   tpass + solves forced empty (no keep streams; wrong)
  tpass-empty    tpass on the EMPTY scene (control — t-pass wins there)
  lane-eproj     lane + empty projections (control for eproj delta)

Add 'trace' to capture a 20-step jax.profiler device trace to
/tmp/fstpu_trace_mix/<variant> for tools/trace_report.py diffing.

Usage: python tools/exp_advect_mix.py VARIANT [trace]
"""
import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variant = sys.argv[1]
    do_trace = "trace" in sys.argv[2:]

    import jax
    import jax.numpy as jnp
    import fluid_simulation_tpu.models.windtunnel as wtm
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.scene.primitives import (
        add_sphere, empty_obstacles)

    # ---- module-level patches, applied ONCE before the first trace ----
    if variant.startswith("tpass"):
        wtm._advect_prefer_t = lambda *a, **k: True
    if variant.endswith("-eproj"):
        # Route projections to the empty streamed path regardless of the
        # scene. Wrong numerics; isolates the masked projection's share.
        import fluid_simulation_tpu.kernels.project_stream as ps
        orig = ps.pallas_project_stream_packed
        _orig_dispatch = wtm._project_dispatch

        def dispatch(vx, vy, vz, masks, p):
            smp = orig(vx, vy, vz, acc=p.acc, wall_mode=p.wall_mode,
                       batched=p.batched)
            return wtm._pad_bounds_tail(smp, (1, 2, 3), masks, p)
        wtm._project_dispatch = dispatch
    if variant.endswith("-esolve"):
        # Force every diffusion solve onto the empty (no keep-stream)
        # kernels. Wrong numerics; isolates the keep-masked solve's share.
        # (windtunnel imports `diffuse`, which resolves `linear_solver`
        # through ops.linsolve module globals at call time, so this one
        # patch covers every solve.)
        import fluid_simulation_tpu.ops.linsolve as ls
        orig_solver = ls.linear_solver

        def solver(b, f, f_prev, a, c, masks, **kw):
            kw["empty_scene"] = True
            return orig_solver(b, f, f_prev, a, c, masks, **kw)
        ls.linear_solver = solver

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("warmup ok", flush=True)

    W, H, D = 256, 128, 128
    p = SimParams(width=W, height=H, depth=D, div_stats=False,
                  step_stats=False, mode="split")
    obs = None
    if not variant.endswith("-empty"):
        obs = np.asarray(add_sphere(empty_obstacles(W, H, D), cx=W // 3,
                                    cy=H // 2, cz=D // 2, radius=H // 6))
    wt = wtm.WindTunnel(p, obstacles=obs)
    p, masks = wt.params, wt.masks
    print(f"prefer_t={wtm._advect_prefer_t(p, wt.state.vx.shape, jnp.float32)}",
          flush=True)

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

    n = 20
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
    print(f"mix {variant}: {best * 1e3:.3f} ms/step  sha={sha}", flush=True)

    if do_trace:
        out = f"/tmp/fstpu_trace_mix/{variant}"
        jax.profiler.start_trace(out)
        jax.block_until_ready(r1(wt.state, masks))
        jax.profiler.stop_trace()
        print(f"trace -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
