"""The wind-tunnel model: the reference's whole program as one jitted step.

Time-step composition mirrors ``Simulation::run`` + ``Simulation::step``
(simulation.cpp:49-150):

  per step (run loop, :63-71):  inlet density += 0.001 on the x=1 plane;
                                buffer = dens;            then step():
  step (:96-150):               inlet velocity (speed,0,0) on the x=1 plane;
                                v_prev = v  (pre-diffusion save, :107-110);
                                diffuse vx,vy,vz; project;
                                advect vx,vy,vz from v_prev (order-dependent
                                chain, :125-127); project again;
                                density diffuse + advect from buffer.

Two deliberate deviations, both output-preserving or opt-in:

- the density diffusion's result is provably dead in the reference — advection
  rewrites every cell from the *pre*-diffusion ``buffer``
  (simulation.cpp:135-136 with :371-421) — so it is not computed; outputs are
  identical and XLA would DCE it anyway.
- the default ``'compat'`` keeps the reference's sequential advection chain;
  ``mode='fast'`` switches to *simultaneous* trilinear advection (one shared
  backtrace through the post-projection field, the standard stable-fluids
  formulation); ``mode='split'`` uses operator-split advection on Mosaic
  lane-gather kernels — the fastest TPU path (kernels/advect_pallas.py).

The whole time loop runs under ``jax.lax.scan`` — zero host round-trips; the
reference's per-step 11.3 MB file write (simulation.cpp:140-148) becomes
either on-device frame stacking or an async host writer (io/dump.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fluid_simulation_tpu.config import SimParams
from fluid_simulation_tpu.ops.advect import advect, backtrace, trilinear_gather
from fluid_simulation_tpu.ops.bounds import set_bounds
from fluid_simulation_tpu.ops.linsolve import diffuse
from fluid_simulation_tpu.ops.project import project, divergence, grid_h
from fluid_simulation_tpu.ops.vorticity import apply_confinement
from fluid_simulation_tpu.scene.masks import SceneMasks, build_masks


class FluidState(NamedTuple):
    """Padded (D+2, H+2, W+2) field pytree — the analog of the reference's
    member arrays (simulation.h:16-27). Pressure/divergence are recomputed
    per projection and surfaced via StepStats instead of being carried."""

    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    dens: jnp.ndarray


class StepStats(NamedTuple):
    """Per-step scalars (the reference prints density sums every 100 steps,
    simulation.cpp:73-77; we keep them every step for free inside scan)."""

    density_sum: jnp.ndarray
    max_divergence: jnp.ndarray


def _dtype(params: SimParams):
    return jnp.bfloat16 if params.dtype == "bfloat16" else jnp.float32


@functools.partial(jax.jit, static_argnames=("params",))
def init_state(params: SimParams) -> FluidState:
    """All-zero fields, like the ctor fill (simulation.cpp:38-43). Jitted so
    the arrays are cheap to read back (see build_masks on eager readback)."""
    shape = params.padded_shape
    dt = _dtype(params)
    z = jnp.zeros(shape, dt)
    return FluidState(vx=z, vy=z, vz=z, dens=z)


def _apply_inlets(state: FluidState, params: SimParams) -> Tuple[FluidState, jnp.ndarray]:
    """Inlet density (run loop, simulation.cpp:64-67) and inlet velocity
    (step, simulation.cpp:102-105) on the x=1 interior plane; returns the
    post-inlet density copy (``buffer = dens``, simulation.cpp:70).

    Written as iota-masked ``where`` selects, NOT ``.at[...].set``: the
    flagship device trace (tools/exp_trace.py, round 4) showed each plane
    ``.at[].set`` lowering to a full-array dynamic-update-slice at ~29 us —
    4 x 29 = 116 us/step, 12% of the 0.988 ms step — while the equivalent
    fused elementwise selects cost one VPU pass. Values are bitwise
    identical per call: ``where(m, x + c, x)`` / ``where(m, c, x)`` write
    the exact same words as the indexed update (f32 + bf16, plain and
    vmapped, checked on CPU).

    ``params.batched`` keeps the indexed updates: inside the VMAPPED sweep
    step the select formulation perturbs downstream XLA fusion enough to
    flip f32 contractions (~1e-5 after 3 steps on CPU), breaking the
    bitwise route-equality contract (test_sweep_routes_agree) — and the
    sweep amortizes the DUS cost anyway. The unbatched step is bitwise
    stable under the swap (goldens + 20-step SHA)."""
    if params.batched:
        dens = state.dens.at[1:-1, 1:-1, 1].add(
            jnp.asarray(np.float32(params.inlet_density), state.dens.dtype))
        vx = state.vx.at[1:-1, 1:-1, 1].set(
            jnp.asarray(np.float32(params.speed), state.vx.dtype))
        vy = state.vy.at[1:-1, 1:-1, 1].set(0.0)
        vz = state.vz.at[1:-1, 1:-1, 1].set(0.0)
        return FluidState(vx, vy, vz, dens), dens
    shape = state.dens.shape
    zi = lax.broadcasted_iota(jnp.int32, shape, 0)
    yi = lax.broadcasted_iota(jnp.int32, shape, 1)
    xi = lax.broadcasted_iota(jnp.int32, shape, 2)
    m = ((xi == 1) & (zi >= 1) & (zi <= shape[0] - 2)
         & (yi >= 1) & (yi <= shape[1] - 2))
    dt = state.dens.dtype
    dens = jnp.where(
        m, state.dens + jnp.asarray(np.float32(params.inlet_density), dt),
        state.dens)
    vx = jnp.where(m, jnp.asarray(np.float32(params.speed), dt), state.vx)
    vy = jnp.where(m, jnp.asarray(0.0, dt), state.vy)
    vz = jnp.where(m, jnp.asarray(0.0, dt), state.vz)
    return FluidState(vx, vy, vz, dens), dens


def _pad_bounds_tail(smp, bs, masks, p: SimParams):
    """Rebuild padded fields + setBounds from advected interior samples —
    fused kernel when applicable (kernels/bounds_pallas.py, bit-identical),
    composable ops otherwise. ``smp`` is (len(bs), D, H, W) or (D, H, W)."""
    from fluid_simulation_tpu.kernels.bounds_pallas import (
        pallas_pad_bounds, pallas_pad_bounds_supported)
    if smp.ndim == 3:
        smp = smp[None]
    if p.use_pallas and not p.batched and pallas_pad_bounds_supported(
            p.padded_shape, len(bs), smp.dtype):
        if p.empty_scene:
            return pallas_pad_bounds(smp, bs, p.wall_mode)
        keep = masks.keep_vel if bs[0] in (1, 2, 3) else masks.keep_scalar
        return pallas_pad_bounds(smp, bs, p.wall_mode,
                                 fluid_i=masks.fluid_i,
                                 keep_i=keep[1:-1, 1:-1, 1:-1])
    # NOT routed: kernels/bounds_pallas.pallas_pad_bounds_stream (a
    # z-streamed pad+setBounds for >VMEM grids, bitwise == the concat
    # fallback below) measured NEUTRAL in the full step on chip (256^3
    # 65.0 -> 65.1 ms, 256x128x128 13.7 -> 13.9): the isolated 2.15 ms
    # phase cost of the concat tail does not transfer — XLA already
    # pipelines it with neighboring kernels. Kept tested as an opt-in
    # experiment; zero gain does not buy Mosaic-combination risk (same
    # policy as _diffuse3_applicable and the retired prestep kernel).
    # fallback (grids beyond the kernel's VMEM gate): build each padded
    # field as nested concats — one fused pass per field — instead of the
    # zeros.at[].set + set_bounds chain (XLA materialises a full-array copy
    # per face write there). Identical values: interior iv*keep, faces are
    # signed mirrors of the pre-keep edge, ghost edges/corners zero.
    from fluid_simulation_tpu.kernels.bounds_pallas import _signs
    dt = smp.dtype
    keep_i = None
    if not p.empty_scene:
        keep = masks.keep_vel if bs[0] in (1, 2, 3) else masks.keep_scalar
        keep_i = keep[1:-1, 1:-1, 1:-1].astype(dt)
    outs = []
    for i, b in enumerate(bs):
        iv = smp[i] if p.empty_scene else smp[i] * masks.fluid_i.astype(dt)
        core = iv if keep_i is None else iv * keep_i
        sx, sy, sz = (jnp.asarray(s, dt) for s in _signs(b, p.wall_mode))
        lvl1 = jnp.concatenate(
            [sx * iv[:, :, :1], core, iv[:, :, -1:]], axis=2)
        zc = jnp.zeros((iv.shape[0], 1, 1), dt)
        fy0 = jnp.concatenate([zc, sy * iv[:, :1, :], zc], axis=2)
        fy1 = jnp.concatenate([zc, sy * iv[:, -1:, :], zc], axis=2)
        lvl2 = jnp.concatenate([fy0, lvl1, fy1], axis=1)
        fz0 = jnp.pad(sz * iv[:1], ((0, 0), (1, 1), (1, 1)))
        fz1 = jnp.pad(sz * iv[-1:], ((0, 0), (1, 1), (1, 1)))
        outs.append(jnp.concatenate([fz0, lvl2, fz1], axis=0))
    return tuple(outs)


def _diffuse3_applicable(p: SimParams) -> bool:
    """The fused 3-field diffusion kernel (pallas_rbgs_solve3) is DISABLED
    in the production dispatch: process-isolated on-chip A/B at the flagship
    grid measured it NEUTRAL (empty 0.925 stock vs 0.930 fused; sphere 1.035
    vs 1.042 ms/step; tools/exp_diffuse3.py, one variant per process,
    bitwise-identical outputs) — the per-call fixed cost it was built to
    amortize (~35 us/solve in exp_overhead.py's back-to-back scan) is
    already hidden by cross-kernel pipelining inside the real heterogeneous
    step. Kept tested and available as an opt-in experiment; fusing kernels
    for zero gain only buys Mosaic-combination risk (the same fault family
    that retired the prestep kernel, tools/prestep_pallas.py)."""
    return False


def _diffuse_vel_dispatch(vx, vy, vz, pvx, pvy, pvz, masks, p: SimParams,
                          vel_diff: float, kw: dict):
    """The step's three velocity diffusions (simulation.cpp:115-117). The
    fused single-call kernel (kernels/linsolve_pallas.py::pallas_rbgs_solve3,
    bitwise-identical) is gated off by _diffuse3_applicable — measured
    neutral; the composable per-field diffuse is the production path."""
    if _diffuse3_applicable(p) and p.use_pallas and p.solver == "rbgs":
        from fluid_simulation_tpu.kernels.linsolve_pallas import (
            pallas_rbgs_solve3, pallas_solve3_supported)
        if pallas_solve3_supported(vx.shape, vx.dtype):
            from fluid_simulation_tpu.ops.linsolve import diffusion_coeffs
            a, c = diffusion_coeffs(p.width, p.height, p.depth, p.dt,
                                    vel_diff)
            keep = None if p.empty_scene else masks.keep_vel
            return pallas_rbgs_solve3(
                (1, 2, 3), vx, vy, vz, pvx, pvy, pvz, keep,
                float(a), float(c), acc=p.acc, wall_mode=p.wall_mode,
                empty_scene=p.empty_scene)
    return (diffuse(1, vx, pvx, masks, p.dt, vel_diff, **kw),
            diffuse(2, vy, pvy, masks, p.dt, vel_diff, **kw),
            diffuse(3, vz, pvz, masks, p.dt, vel_diff, **kw))


# Measured crossover for the masked-stream advect routing below
# (tools/exp_project_masked.py, one variant per process, one v5e):
# at 256x128x128 sphere (4.2M cells) the t-pass LOSES 1.4 ms/step in the
# masked z-streaming kernel mix (17.0 vs 15.6); at 256^3 sphere (16.8M)
# it WINS 6.6 ms (64.9 vs 71.5). The mix penalty is ~constant while the
# t-pass advantage grows with grid size (0.33 ms at 4.2M, 6.4 at 16.8M,
# 14.4 at 33.5M cells on empty scenes — exp_advect_t), so only the
# smaller masked-stream grids prefer the lane path.
def _advect_prefer_t(p: SimParams, shape, dtype) -> bool:
    """Route split advection off the transposing y/z passes ONLY in steps
    whose masked solves/projections run the depth-1 BlockSpec z-streaming
    kernels. The r3/r4 "t-pass loses ~1.5 ms flat below 8M cells" was a
    kernel-MIX interaction, not a size effect: the lo/mid/hi BlockSpec
    masked-stream kernels issue 7+ small window DMAs per grid step
    (~2.4 us each exposed — NOTES "DMA-issue model"), and the t-pass
    transpose programs, being data-movement-dense with little compute to
    hide under, eat that issue rate where the lane path does not. With
    the merged-window manual-DMA masked solves (3 issues/step) the
    penalty is gone and the t-pass wins again: 13.22 vs 13.88 ms/step at
    256x128x128 sphere (tools/exp_advect_mix.py, sha-identical, one
    process per variant). The t-pass also wins on every empty scene, on
    VMEM-resident masked scenes (flagship), and in the temporal-BlockSpec
    mix at 256^3 sphere (64.9 vs 71.5)."""
    if p.empty_scene or not p.use_pallas or p.solver != "rbgs":
        return True
    from fluid_simulation_tpu.kernels.project_pallas import (
        pallas_project_masked_supported)
    if not p.batched and pallas_project_masked_supported(shape, dtype):
        return True  # VMEM-resident masked mix
    from fluid_simulation_tpu.kernels.linsolve_mdma import mdma_preferred
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        temporal_stream_preferred)
    if mdma_preferred(shape, dtype, apply_keep=True,
                      batched=p.batched) is not None:
        return True  # merged-window masked mix
    if temporal_stream_preferred(shape, dtype, apply_keep=True) is not None:
        return True  # temporal BlockSpec masked mix (>= 8M cells)
    # depth-1 BlockSpec masked-stream mix (vmapped sweeps; shapes the
    # merged kernel cannot tile): the measured losing mix for the t-pass
    return False


def _project_dispatch(vx, vy, vz, masks, p: SimParams):
    """Projection with the whole-stage fused kernel when applicable (empty
    scene, rbgs, TPU — kernels/project_pallas.py, bit-identical to the
    composable path); returns (vx, vy, vz) only."""
    if p.empty_scene and p.use_pallas and p.solver == "rbgs":
        from fluid_simulation_tpu.kernels.project_pallas import (
            pallas_project_empty, pallas_project_supported)
        if not p.batched and pallas_project_supported(vx.shape, vx.dtype):
            return pallas_project_empty(vx, vy, vz, acc=p.acc,
                                        wall_mode=p.wall_mode)
        from fluid_simulation_tpu.kernels.project_stream import (
            pallas_project_stream_packed, pallas_project_stream_supported)
        if pallas_project_stream_supported(vx.shape, vx.dtype):
            # >VMEM grids: z-streamed div -> packed Poisson sweeps -> grad
            smp = pallas_project_stream_packed(vx, vy, vz, acc=p.acc,
                                               wall_mode=p.wall_mode,
                                               batched=p.batched)
            return _pad_bounds_tail(smp, (1, 2, 3), masks, p)
    elif p.use_pallas and p.solver == "rbgs":
        # obstacle scenes: masked fused projection (VERDICT r2 #3),
        # bit-identical to the composable path below
        from fluid_simulation_tpu.kernels.project_pallas import (
            pallas_project_masked, pallas_project_masked_supported)
        if not p.batched and pallas_project_masked_supported(vx.shape,
                                                             vx.dtype):
            return pallas_project_masked(
                vx, vy, vz, masks.fluid_i,
                masks.keep_vel[1:-1, 1:-1, 1:-1],
                acc=p.acc, wall_mode=p.wall_mode)
        from fluid_simulation_tpu.kernels.project_stream import (
            pallas_project_stream_masked, pallas_project_stream_masked_supported)
        if pallas_project_stream_masked_supported(vx.shape, vx.dtype):
            # >VMEM obstacle grids: masked z-streamed div -> keep-masked
            # packed Poisson sweeps -> masked grad (values equal the
            # composable path's pre-set_bounds state; the masked tail is
            # the same set_bounds)
            smp = pallas_project_stream_masked(vx, vy, vz, masks.fluid_i,
                                               acc=p.acc,
                                               wall_mode=p.wall_mode,
                                               batched=p.batched)
            return _pad_bounds_tail(smp, (1, 2, 3), masks, p)
    out = project(vx, vy, vz, masks, acc=p.acc, solver=p.solver,
                  wall_mode=p.wall_mode, use_pallas=p.use_pallas,
                  empty_scene=p.empty_scene, batched=p.batched)
    return out[0], out[1], out[2]


@functools.partial(jax.jit, static_argnames=("params",))
def simulation_step(state: FluidState, masks: SceneMasks,
                    params: SimParams) -> Tuple[FluidState, StepStats]:
    """Advance one full time step. Pure; jitted with ``params`` static."""
    p = params
    kw = dict(acc=p.acc, solver=p.solver, wall_mode=p.wall_mode,
              use_pallas=p.use_pallas, empty_scene=p.empty_scene,
              batched=p.batched)

    state, buffer = _apply_inlets(state, p)
    vx, vy, vz, dens = state
    pvx, pvy, pvz = vx, vy, vz   # pre-diffusion save (simulation.cpp:107-110)

    vel_diff = p.visc if p.use_visc_for_velocity else p.diff  # compat: diff
    # (The fused diffuse(1..3)+project "prestep" kernel was RETIRED out of
    # the package to tools/prestep_pallas.py: it faults Mosaic when combined
    # with the lane-lerp split advection in one scanned program, and loses
    # 1.185 vs 1.038 ms/step to this chain on the v5e sphere scene —
    # NOTES.md "Retired: fused prestep kernel", tools/exp_obstacle_bisect.py.)
    vx, vy, vz = _diffuse_vel_dispatch(vx, vy, vz, pvx, pvy, pvz,
                                       masks, p, vel_diff, kw)
    vx, vy, vz = _project_dispatch(vx, vy, vz, masks, p)

    if p.mode == "compat":
        # Sequential component advection (simulation.cpp:125-127): each later
        # component backtraces through already-advected earlier components.
        vx2 = advect(1, pvx, vx, vy, vz, masks, p.dt, p.wall_mode,
                     p.empty_scene, p.advect_window)
        vy2 = advect(2, pvy, vx2, vy, vz, masks, p.dt, p.wall_mode,
                     p.empty_scene, p.advect_window)
        vz2 = advect(3, pvz, vx2, vy2, vz, masks, p.dt, p.wall_mode,
                     p.empty_scene, p.advect_window)
        vx, vy, vz = vx2, vy2, vz2
    elif p.mode == "fast":
        # Simultaneous advection: one shared backtrace through the projected
        # field, three gathers. Standard formulation; not bit-compatible.
        D, H, W = p.depth, p.height, p.width
        xb, yb, zb = backtrace(
            vx[1:-1, 1:-1, 1:-1], vy[1:-1, 1:-1, 1:-1], vz[1:-1, 1:-1, 1:-1],
            p.dt, W, H, D, vx.dtype)
        gather = trilinear_gather
        if p.advect_window > 0:
            from fluid_simulation_tpu.kernels.advect_compat import (
                corner_fetch_supported, trilinear_gather_pallas)
            K = p.advect_window
            if corner_fetch_supported(pvx.shape, pvx.dtype, K, K):
                gather = functools.partial(trilinear_gather_pallas, K=K, KY=K)
        smp = jnp.stack([gather(prev, xb, yb, zb)
                         for prev in (pvx, pvy, pvz)])
        vx, vy, vz = _pad_bounds_tail(smp, (1, 2, 3), masks, p)
    elif p.mode == "split":
        # Operator-split advection (kernels/advect_pallas.py): three 1-D
        # lane-gather passes — the fastest TPU path; standard production
        # formulation, not bit-compatible with the trilinear backtrace. The
        # three components ride one stacked pipeline (shared gather indices).
        # prefer_t routes on the step's solve-kernel MIX: the transposing
        # y/z passes win everywhere except steps whose masked solves run
        # the depth-1 BlockSpec z-streaming kernels, where their exposed
        # small-window DMA issue rate eats the transpose programs (see
        # _advect_prefer_t and advect_split_auto's docstring).
        from fluid_simulation_tpu.kernels.advect_pallas import advect_split_auto
        prefer_t = _advect_prefer_t(p, vx.shape, vx.dtype)
        stacked = jnp.stack([pvx, pvy, pvz])
        smp = advect_split_auto(stacked, vx, vy, vz, p.dt,
                                use_pallas=p.use_pallas, prefer_t=prefer_t)
        vx, vy, vz = _pad_bounds_tail(smp, (1, 2, 3), masks, p)
    else:
        raise ValueError(f"unknown mode {p.mode!r}")

    if p.vorticity:
        from fluid_simulation_tpu.kernels.vorticity_pallas import (
            pallas_confinement, pallas_confinement_supported)
        if (p.use_pallas and not p.batched
                and pallas_confinement_supported(vx.shape, vx.dtype)):
            vx, vy, vz = pallas_confinement(
                vx, vy, vz, masks.keep_vel[1:-1, 1:-1, 1:-1],
                float(p.vorticity), float(p.dt))
        else:
            vx, vy, vz = apply_confinement(vx, vy, vz, masks, p.vorticity,
                                           p.dt)

    vx, vy, vz = _project_dispatch(vx, vy, vz, masks, p)

    # Density transport. The reference's diffuse(0, dens, buffer) result is
    # fully overwritten by this advection (see module docstring) — skipped.
    if p.mode == "split":
        from fluid_simulation_tpu.kernels.advect_pallas import advect_split_auto
        smp = advect_split_auto(buffer, vx, vy, vz, p.dt,
                                use_pallas=p.use_pallas,
                                prefer_t=_advect_prefer_t(p, vx.shape,
                                                          vx.dtype))
        dens, = _pad_bounds_tail(smp, (0,), masks, p)
    else:
        dens = advect(0, buffer, vx, vy, vz, masks, p.dt, p.wall_mode,
                      p.empty_scene, p.advect_window)

    new_state = FluidState(vx, vy, vz, dens)
    if p.div_stats:
        h = grid_h(p.width, p.height, p.depth)
        max_div = jnp.max(jnp.abs(divergence(vx, vy, vz, masks, h)))
    else:
        max_div = jnp.asarray(jnp.nan, jnp.float32)
    if p.step_stats:
        density_sum = jnp.sum(dens, dtype=jnp.float32)
    else:
        # per-step reductions cost ~0.08 ms/step at the flagship grid
        # (tools/exp_prefix.py); the reference only sums every 100 steps
        density_sum = jnp.asarray(jnp.nan, jnp.float32)
    stats = StepStats(density_sum=density_sum, max_divergence=max_div)
    return new_state, stats


@functools.partial(jax.jit, static_argnames=("params", "steps", "record"))
def simulate(state: FluidState, masks: SceneMasks, params: SimParams,
             steps: int, record: bool = False):
    """Run ``steps`` under ``lax.scan``. With ``record=True`` the per-step
    fields are stacked on device (the dump-file analog of the reference's
    per-step write, simulation.cpp:143-147); otherwise only stats stream out.
    """

    def body(st, _):
        st, stats = simulation_step(st, masks, params)
        out = (stats, st) if record else stats
        return st, out

    final, ys = jax.lax.scan(body, state, None, length=steps)
    return final, ys


class WindTunnel:
    """Convenience wrapper tying params + scene masks + jitted step together —
    the ergonomic equivalent of constructing ``Simulation`` and calling
    ``run()`` (simulation.cpp:429-451), minus the hardcoding."""

    def __init__(self, params: SimParams = SimParams(),
                 obstacles: Optional[np.ndarray] = None):
        self.params = params
        if obstacles is None:
            obstacles = np.zeros(params.padded_shape, np.float32)
        if tuple(obstacles.shape) != params.padded_shape:
            raise ValueError(
                f"obstacle shape {obstacles.shape} != padded {params.padded_shape}")
        # kept as host numpy: readback of eager device arrays is pathologically
        # slow on some backends (see build_masks docstring); jit inputs are
        # transferred host->device cheaply on call.
        self.obstacles = np.asarray(obstacles, np.float32)
        # empty scenes statically skip obstacle-mask arithmetic (exact
        # identity); always derived from the actual obstacle field here.
        # An explicit empty_scene=True together with solids is a user error
        # that would silently produce wrong physics if it reached
        # simulation_step directly — reject it (config.py:79-84 contract).
        has_solids = bool((self.obstacles >= 0.5).any())
        if params.empty_scene and has_solids:
            raise ValueError(
                "SimParams(empty_scene=True) with a non-empty obstacle "
                "field: empty_scene statically skips all obstacle masking "
                "and must only be set for scenes without solids")
        self.params = params = params.replace(empty_scene=not has_solids)
        self.masks = build_masks(self.obstacles, dtype=_dtype(params))
        self.state = init_state(params)

    def reset(self):
        self.state = init_state(self.params)
        return self.state

    def step(self) -> StepStats:
        self.state, stats = simulation_step(self.state, self.masks, self.params)
        return stats

    def simulate(self, steps: int, record: bool = False):
        self.state, ys = simulate(self.state, self.masks, self.params,
                                  steps=steps, record=record)
        return self.state, ys

    # -- single-cell edit API (simulation.cpp:155-178) --------------------
    # Setup-time helpers; edits land in host NumPy copies (cheap, and jit
    # re-uploads on the next step — never create eager device arrays here).

    def add_obstacle(self, x: int, y: int, z: int):
        """Mark one interior cell solid (Simulation::addObstacle) and refresh
        the derived masks."""
        self._check_cell(x, y, z)
        self.obstacles[z, y, x] = 1.0
        self.masks = build_masks(self.obstacles, dtype=_dtype(self.params))
        self.params = self.params.replace(empty_scene=False)

    def add_density(self, x: int, y: int, z: int, amount: float):
        """Add density to one cell (Simulation::addDensity)."""
        self._check_cell(x, y, z)
        dens = np.array(self.state.dens)
        dens[z, y, x] += np.float32(amount)
        self.state = self.state._replace(dens=dens)

    def set_velocity(self, x: int, y: int, z: int,
                     vx: float, vy: float, vz: float):
        """Set the velocity of one cell (Simulation::setVelocity)."""
        self._check_cell(x, y, z)
        new = {k: np.array(v) for k, v in
               zip(("vx", "vy", "vz"), (self.state.vx, self.state.vy,
                                        self.state.vz))}
        for key, val in zip(("vx", "vy", "vz"), (vx, vy, vz)):
            new[key][z, y, x] = np.float32(val)
        self.state = self.state._replace(**new)

    def _check_cell(self, x, y, z):
        p = self.params
        if not (1 <= x <= p.width and 1 <= y <= p.height
                and 1 <= z <= p.depth):
            raise ValueError(
                f"cell ({x},{y},{z}) outside interior "
                f"1..{p.width} x 1..{p.height} x 1..{p.depth}")

    def density_sum(self) -> float:
        return float(_density_sum(self.state))

    def field_ranges(self):
        """Final min/max statistics, like simulation.cpp:81-90."""
        r = jax.device_get(_ranges(self.state))
        return {
            "density": (float(r[0]), float(r[1])),
            "vx": (float(r[2]), float(r[3])),
            "vy": (float(r[4]), float(r[5])),
            "vz": (float(r[6]), float(r[7])),
        }


@jax.jit
def _density_sum(state: FluidState):
    return jnp.sum(state.dens, dtype=jnp.float32)


@jax.jit
def _ranges(state: FluidState):
    s = state
    return jnp.stack([
        s.dens.min(), s.dens.max(), s.vx.min(), s.vx.max(),
        s.vy.min(), s.vy.max(), s.vz.min(), s.vz.max()]).astype(jnp.float32)
