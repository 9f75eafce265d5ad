"""Batched design sweeps via ``vmap`` (BASELINE config 4).

The reference can simulate one geometry per process run. Because the rebuilt
step is a pure function of ``(state, masks)``, a batch of obstacle geometries
is just a leading axis — XLA turns the whole sweep into one program with
batched stencils, which is the TPU analog of data parallelism over scenes.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from fluid_simulation_tpu.config import SimParams
from fluid_simulation_tpu.models.windtunnel import (
    FluidState, init_state, simulation_step)
from fluid_simulation_tpu.scene.masks import build_masks


def batch_masks(obstacle_list: Sequence[np.ndarray]):
    """Stack per-geometry masks into one batched SceneMasks pytree.

    Stacking happens on host (jit-output readback is cheap; eager device
    stacking would poison later readback on the axon backend)."""
    masks = [build_masks(np.asarray(o, np.float32)) for o in obstacle_list]
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *masks)


# Auto-route crossover (interior cells). Measured on one v5e with the packed
# kernel suite (tools/bench_sweep.py, NOTES.md "Round-2 re-measure"): at the
# 524,288-cell flagship the vmapped batch runs 0.78x of 8 sequential runs
# (vmapped Pallas grids + non-fused batch layouts), while at small grids the
# single batched program wins on amortized dispatch. Sizes at/above this
# threshold take a sequential route.
SWEEP_VMAP_MAX_CELLS = 256 * 1024

# The Python-unrolled sequential route compiles O(B) (~12 s per geometry per
# program length at the flagship on the axon remote compiler: 193 s for B=8
# at two lengths, r4) and runs ~1.18x the lax.map route (905 vs 770
# geometry-steps/s at B=8). Past this batch size the compile bill outweighs
# the throughput edge for any realistic step count and 'auto' switches to
# 'map' (O(1) compile, z-streamed batched=True kernels).
SWEEP_UNROLL_MAX_B = 8


@functools.partial(jax.jit, static_argnames=("params", "steps", "route"))
def design_sweep(batched_masks, params: SimParams, steps: int,
                 route: str = "auto"):
    """Simulate ``B`` geometries for ``steps`` steps in ONE compiled program.

    Returns ``(final_states, stats)``: states carry a leading batch axis,
    stats are ``(steps, B)``. Pair with a ``('batch',)`` mesh axis
    (parallel/) to spread geometries across chips.

    ``route`` picks how the batch axis is executed:

    - ``'vmap'``: one vmapped step, the whole batch advances together.
      Wins when the per-step program is dispatch/latency-bound (small grids).
    - ``'sequential'``: a Python-unrolled loop of ``B`` back-to-back scans
      inside the one jit — each geometry simulated with the unbatched step
      and *statically* indexed masks, so every Pallas kernel runs in its
      exact single-geometry production form (resident solves, masked fused
      projection). This is literally "B isolated runs in one program":
      zero per-step batching overhead (905 geometry-steps/s at B=8 on one
      v5e) — but the program and its compile time grow O(B)
      (~12 s/geometry/length on the remote compiler).
    - ``'map'``: ``lax.map`` over geometries with the ``batched=True``
      kernel dispatch (z-streamed solves/projections — the whole-array
      kernels fault Mosaic under nested lax.map scans, NOTES.md r3
      "design sweeps broke"). O(1) compile at ~0.85x the unrolled route's
      throughput: the large-B workhorse.
    - ``'auto'`` (default): vmap below ``SWEEP_VMAP_MAX_CELLS`` interior
      cells; otherwise sequential up to ``SWEEP_UNROLL_MAX_B`` geometries,
      map beyond.

    All routes run the same ``simulation_step`` on the same inputs; results
    are identical (test_sweep.py asserts equality).
    """
    B = jax.tree_util.tree_leaves(batched_masks)[0].shape[0]
    if route == "auto":
        route = ("vmap" if params.n_cells < SWEEP_VMAP_MAX_CELLS else
                 "sequential" if B <= SWEEP_UNROLL_MAX_B else "map")
    if route not in ("vmap", "sequential", "map"):
        raise ValueError(f"unknown sweep route: {route!r}")

    if route == "map":
        mp = params.replace(batched=True)

        def one_geometry(masks_g):
            def body(st, _):
                st, stats = simulation_step(st, masks_g, mp)
                return st, stats
            return jax.lax.scan(body, init_state(mp), None, length=steps)

        final, stats = jax.lax.map(one_geometry, batched_masks)
        # per-geometry (B, steps, ...) -> (steps, B, ...) to match vmap
        stats = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1), stats)
        return final, stats

    if route == "sequential":
        # r4: the r3 nested ``lax.map(scan(step))`` program faulted Mosaic
        # at runtime with the resident/masked-fused kernel mix (the
        # combination-fault family, NOTES.md "design sweeps broke") and so
        # had to run the z-blocked streaming kernels via batched=True —
        # ~770 geometry-steps/s vs ~917 for 8 isolated runs. Unrolling the
        # geometry loop in Python keeps the program a sequence of plain
        # scans (no nesting, no dynamic mask indexing), which is the same
        # program shape as a single-geometry run repeated B times: the
        # production (batched=False) kernels apply. Compile time grows ~B x
        # the single-run step program; cached after the first call.
        finals, all_stats = [], []
        for g in range(B):
            masks_g = jax.tree_util.tree_map(lambda x: x[g], batched_masks)

            def body(st, _, m=masks_g):
                st, stats = simulation_step(st, m, params)
                return st, stats

            f, s = jax.lax.scan(body, init_state(params), None, length=steps)
            finals.append(f)
            all_stats.append(s)
        final = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *finals)
        # per-geometry (steps, ...) -> (steps, B, ...) to match vmap
        stats = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=1), *all_stats)
        return final, stats

    # vmap dispatches the step with batched=True: the whole-array-VMEM
    # kernels would otherwise become whole-BATCH operands and blow scoped
    # VMEM at compile (96M limit, measured 99.25M at 8x flagship). The
    # z-blocked streaming kernels the flag selects survive vmap.
    params = params.replace(batched=True)

    state0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), init_state(params))

    step_v = jax.vmap(lambda s, m: simulation_step(s, m, params))

    def body(st, _):
        st, stats = step_v(st, batched_masks)
        return st, stats

    final, stats = jax.lax.scan(body, state0, None, length=steps)
    return final, stats


def drag_proxy(state: FluidState, params: SimParams) -> jnp.ndarray:
    """Cheap per-geometry objective for sweeps: mean momentum deficit at the
    outflow plane relative to the inlet speed."""
    vx_out = state.vx[1:-1, 1:-1, -2]
    return jnp.asarray(params.speed, vx_out.dtype) - jnp.mean(vx_out)
