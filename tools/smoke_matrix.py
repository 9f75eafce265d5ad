#!/usr/bin/env python3
"""On-chip dispatch-combination smoke matrix (VERDICT r3 #6).

Round 3 shipped four Mosaic *combination* faults to runtime — kernels that
are each clean alone but fault when scanned together in one program
(prestep x lane-lerp, stacked-grid scan, unstacked advect, nested lax.map)
— and every one appeared only on the chip, in kernel mixes the CPU
interpret tests cannot reach. This tool runs ONE short scanned step-program
of every PRODUCTION dispatch combination, one combo per process (a faulted
combo must not poison the rest: the relay worker dies with the process),
before any bench run. Any new kernel or routing change must add its combos
here.

Usage:
    python tools/smoke_matrix.py            # run all combos, one subprocess each
    python tools/smoke_matrix.py NAME       # run one combo in-process
    python tools/smoke_matrix.py --list     # list combo names

Exit code 0 iff every combo ran a finite scan. Prints one status line per
combo plus a final PASS/FAIL summary.
"""

from __future__ import annotations

import os
import subprocess
import sys

# combo name -> (grid (W,H,D), scene, params overrides, scan length)
# The scene/size pairs are chosen to hit every production dispatch rung
# (ops/linsolve.py ladder + windtunnel routing):
#   - flagship 128x64x64: VMEM-resident packed solve, fused projection,
#     t-pass advect; sphere adds the masked fused projection
#   - 256x128x128: packed z-stream solve + streamed projection; sphere adds
#     the masked streamed projection + the lane-advect routing (<8M cells,
#     _advect_prefer_t)
#   - 256^3: temporally-blocked (ksw=2) stream solve; sphere keeps the
#     t-pass advect (>=8M cells)
#   - 512x256x256: wide-row stream gates (r4 hb=2 + int8-keep model:
#     empty blk=16, sphere keep blk=8 — test_solve_dispatch_gates)
#   - noslip_vort: fused vorticity-confinement kernel
#   - batched: SimParams.batched streamed-kernel dispatch (design sweeps)
#   - compat: one-gather XLA advection path
#   - bf16: bf16 state through the whole kernel suite
COMBOS = {
    "flagship_empty":   ((128, 64, 64), "empty", {}, 3),
    "flagship_sphere":  ((128, 64, 64), "sphere", {}, 3),
    "noslip_vort":      ((128, 64, 64), "empty",
                         {"wall_mode": "noslip", "vorticity": 5.0}, 3),
    "flagship_bf16":    ((128, 64, 64), "empty", {"dtype": "bfloat16"}, 3),
    "flagship_compat":  ((128, 64, 64), "empty", {"mode": "compat"}, 3),
    "batched2_sphere":  ((128, 64, 64), "batch2", {}, 3),
    "stream_empty":     ((256, 128, 128), "empty", {}, 2),
    "stream_sphere":    ((256, 128, 128), "sphere", {}, 2),
    "temporal_empty":   ((256, 256, 256), "empty", {}, 2),
    "temporal_sphere":  ((256, 256, 256), "sphere", {}, 2),
    "wide_empty":       ((512, 256, 256), "empty", {}, 1),
    "wide_sphere":      ((512, 256, 256), "sphere", {}, 1),
}


def run_combo(name: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (
        WindTunnel, simulation_step)
    from fluid_simulation_tpu.scene.primitives import (
        add_sphere, empty_obstacles)

    (W, H, D), scene, over, n = COMBOS[name]
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())  # warmup stall

    params = SimParams(width=W, height=H, depth=D, div_stats=False,
                       step_stats=False, mode=over.pop("mode", "split"),
                       **over)

    if scene == "batch2":
        from fluid_simulation_tpu.models.sweep import batch_masks, design_sweep
        e = empty_obstacles(W, H, D)
        geoms = [np.asarray(add_sphere(e, W // 3, H // 2, D // 2, H // 6)),
                 np.asarray(e)]
        bm = jax.tree_util.tree_map(jnp.asarray, batch_masks(geoms))
        out = design_sweep(bm, params, steps=n)[0]
        s = float(jnp.sum(out.dens, dtype=jnp.float32))
        assert np.isfinite(s), s
        print(f"{name}: OK (batched dens_sum={s:.3f})", flush=True)
        return

    obs = None
    if scene == "sphere":
        obs = np.asarray(add_sphere(empty_obstacles(W, H, D),
                                    cx=W // 3, cy=H // 2, cz=D // 2,
                                    radius=max(4, H // 6)))
    wt = WindTunnel(params, obstacles=obs)
    params = wt.params

    @jax.jit
    def run(state, m):
        def body(c, _):
            c, _stats = simulation_step(c, m, params)
            return c, None
        return jax.lax.scan(body, state, None, length=n)[0]

    st = run(wt.state, wt.masks)
    s = float(jnp.sum(st.dens, dtype=jnp.float32))
    assert np.isfinite(s) and s > 0, s
    print(f"{name}: OK (dens_sum={s:.3f})", flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--list":
        print("\n".join(COMBOS))
        return 0
    if len(sys.argv) > 1:
        run_combo(sys.argv[1])
        return 0

    # one process per combo: a Mosaic runtime fault (UNAVAILABLE) or a
    # compile-time scoped-VMEM OOM kills only that subprocess
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:/root/repo"
    failed = []
    for name in COMBOS:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), name],
                           env=env, capture_output=True, text=True,
                           timeout=1200)
        if r.returncode != 0:
            failed.append(name)
            tail = (r.stdout + r.stderr).strip().splitlines()[-8:]
            print(f"{name}: FAILED (rc={r.returncode})", flush=True)
            for line in tail:
                print(f"    {line}", flush=True)
        else:
            print(r.stdout.strip().splitlines()[-1], flush=True)
    if failed:
        print(f"SMOKE MATRIX FAIL: {len(failed)}/{len(COMBOS)} combos "
              f"faulted: {', '.join(failed)}", flush=True)
        return 1
    print(f"SMOKE MATRIX PASS: {len(COMBOS)}/{len(COMBOS)} production "
          f"dispatch combos ran finite scans on chip", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
