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


@functools.partial(jax.jit, static_argnames=("params", "steps"))
def design_sweep(batched_masks, params: SimParams, steps: int):
    """Simulate ``B`` geometries in parallel for ``steps`` steps.

    Returns ``(final_states, stats)`` with a leading batch axis. Pair with a
    ``('batch',)`` mesh axis (parallel/) to spread geometries across chips.
    """
    B = jax.tree_util.tree_leaves(batched_masks)[0].shape[0]
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
