"""Fused pre-advection phase: 3 velocity diffusions + first projection in
ONE kernel (Pallas TPU).

RETIRED EXPERIMENT (round 3; moved out of the package in round 5, VERDICT
r4 #7): two process-isolated on-chip measurements retired it
(tools/exp_obstacle_bisect.py, one variant per process) — it faults Mosaic
when combined with the lane-lerp split advection in one scanned program
(UNAVAILABLE at the first n=50 scan; either kernel alone is clean), and it
loses 1.185 vs 1.038 ms/step to the resident-solve + masked-fused-projection
chain on the v5e sphere scene. Kept here, tested
(tests/test_kernels.py::test_prestep_fused_matches_chain_interpret), as the
record of the fused-prestep design.

The flagship step pays a ~35 us fixed cost per resident solve call (VMEM
in/out DMA + grid setup — tools/exp_overhead.py) and writes/rereads the
three velocity fields between the diffusion stage and the projection. This
kernel runs the reference's step():115-120 block — diffuse(1..3) then
project — with the velocities VMEM-resident throughout: one fixed cost
instead of four, zero inter-stage HBM.

Per component the solve is the packed-interior RBGS of
kernels/linsolve_pallas.py (sweep 1 legacy-padded for the caller's ghosts,
sweeps 2..acc packed with the sign*fpre ghost algebra) with ``prev``
snapshotted from the component itself — in the step, diffusion's rhs IS
the pre-diffusion field (simulation.cpp:107-117). The projection body is
shared with kernels/project_pallas.py (empty + masked variants). Values
are bitwise-equal to the separate kernels (asserted in tests).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    VMEM_BUDGET_BYTES, _roll, _tiled_bytes)
from fluid_simulation_tpu.kernels.project_pallas import (
    _make_project_kernel, _make_project_masked_kernel)


def pallas_prestep_supported(shape, dtype=jnp.float32,
                             masked: bool = False) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    interior = tuple(n - 2 for n in shape)
    n_int = 3 + (2 if masked else 0)   # scratch + mask operands
    return (4 * _tiled_bytes(shape, itemsize)
            + (n_int + 3) * _tiled_bytes(interior, itemsize)
            ) <= VMEM_BUDGET_BYTES


def _vel_signs(b: int, wall_mode: str):
    if wall_mode == "noslip":
        return (-1.0 if b == 1 else 1.0), -1.0, -1.0
    return ((-1.0 if b == 1 else 1.0), (-1.0 if b == 2 else 1.0),
            (-1.0 if b == 3 else 1.0))


def _make_prestep_kernel(acc: int, a: float, c: float, wall_mode: str,
                         shape, dtype, masked: bool):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    if masked:
        project_body = _make_project_masked_kernel(
            acc, wall_mode, shape, dtype).project_body
    else:
        project_body = _make_project_kernel(
            acc, wall_mode, shape, dtype).project_body

    def solve_inplace(b, io, kv_ref, fp, pp, fpre):
        """Packed RBGS diffusion of one velocity component, in place;
        rhs = the component's own input state (pre-diffusion save)."""
        sx, sy, sz = _vel_signs(b, wall_mode)
        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        sxc = jnp.asarray(sx, dtype)
        syc = jnp.asarray(sy, dtype)
        szc = jnp.asarray(sz, dtype)
        iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
        red = ((iz + iy + ix) % 2) == 1
        prev_i = io[1:-1, 1:-1, 1:-1]              # loaded before any write

        # ---- sweep 1, legacy padded form (arbitrary input ghosts)
        def half_padded(take_red):
            f = io[...]
            s = (
                (((f[1:-1, 1:-1, 2:] + f[1:-1, 1:-1, :-2])
                  + f[1:-1, 2:, 1:-1]) + f[1:-1, :-2, 1:-1])
                + f[2:, 1:-1, 1:-1]
            ) + f[:-2, 1:-1, 1:-1]
            upd = (prev_i + a_c * s) * crec
            cur = f[1:-1, 1:-1, 1:-1]
            sel = red if take_red else jnp.logical_not(red)
            io[1:-1, 1:-1, 1:-1] = jnp.where(sel, upd, cur)

        half_padded(True)
        half_padded(False)
        fpre[...] = io[1:-1, 1:-1, 1:-1]           # pre-keep snapshot
        if masked:
            io[1:-1, 1:-1, 1:-1] = io[1:-1, 1:-1, 1:-1] * kv_ref[...]
        fp[...] = io[1:-1, 1:-1, 1:-1]
        pp[...] = prev_i

        # ---- sweeps 2..acc, packed (ghosts = sign * fpre at edges)
        def half(take_red):
            f = fp[...]
            pre = fpre[...]
            xp = jnp.where(ix == W - 1, pre, _roll(f, W - 1, 2))
            xm = jnp.where(ix == 0, sxc * pre, _roll(f, 1, 2))
            yp = jnp.where(iy == H - 1, syc * pre, _roll(f, H - 1, 1))
            ym = jnp.where(iy == 0, syc * pre, _roll(f, 1, 1))
            zp = jnp.concatenate([f[1:], szc * pre[D - 1:]], axis=0)
            zm = jnp.concatenate([szc * pre[:1], f[:D - 1]], axis=0)
            s = (((xp + xm) + yp) + ym + zp) + zm
            upd = (pp[...] + a_c * s) * crec
            sel = red if take_red else jnp.logical_not(red)
            fp[...] = jnp.where(sel, upd, f)

        def sweep(i, _):
            half(True)
            half(False)
            fpre[...] = fp[...]
            if masked:
                fp[...] = fp[...] * kv_ref[...]
            return 0

        jax.lax.fori_loop(0, acc - 1, sweep, 0)
        io[1:-1, 1:-1, 1:-1] = fp[...]
        io[1:-1, 1:-1, 0] = sxc * fpre[:, :, 0]
        io[1:-1, 1:-1, W + 1] = fpre[:, :, W - 1]          # x+ outflow
        io[1:-1, 0, 1:-1] = syc * fpre[:, 0, :]
        io[1:-1, H + 1, 1:-1] = syc * fpre[:, H - 1, :]
        io[0, 1:-1, 1:-1] = szc * fpre[0]
        io[D + 1, 1:-1, 1:-1] = szc * fpre[D - 1]

    def _run(vx_ref, vy_ref, vz_ref, fl_ref, kv_ref,
             vxo, vyo, vzo, fp, pp, fpre):
        vxo[...] = vx_ref[...]
        vyo[...] = vy_ref[...]
        vzo[...] = vz_ref[...]
        for b, io in ((1, vxo), (2, vyo), (3, vzo)):
            solve_inplace(b, io, kv_ref, fp, pp, fpre)
        if masked:
            project_body(fl_ref, kv_ref, vxo, vyo, vzo, fp, pp, fpre)
        else:
            project_body(vxo, vyo, vzo, fp, pp, fpre)

    if masked:
        def kernel(vx_ref, vy_ref, vz_ref, fl_ref, kv_ref,
                   vxo, vyo, vzo, fp, pp, fpre):
            _run(vx_ref, vy_ref, vz_ref, fl_ref, kv_ref,
                 vxo, vyo, vzo, fp, pp, fpre)
    else:
        def kernel(vx_ref, vy_ref, vz_ref, vxo, vyo, vzo, fp, pp, fpre):
            _run(vx_ref, vy_ref, vz_ref, None, None,
                 vxo, vyo, vzo, fp, pp, fpre)
    return kernel


@functools.partial(jax.jit, static_argnames=("a", "c", "acc", "wall_mode",
                                              "interpret"))
def pallas_prestep(vx, vy, vz, fluid_i, keep_vel_i, a: float, c: float,
                   acc: int = 15, wall_mode: str = "reference",
                   interpret: bool = False):
    """diffuse(1..3) + project in one kernel. ``fluid_i``/``keep_vel_i``
    are the interior masks, or None for empty scenes."""
    masked = fluid_i is not None
    shape = vx.shape
    kernel = _make_prestep_kernel(acc, a, c, wall_mode, shape, vx.dtype,
                                  masked)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    operands = [vx, vy, vz]
    if masked:
        operands += [fluid_i.astype(vx.dtype), keep_vel_i.astype(vx.dtype)]
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape, vx.dtype)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        scratch_shapes=[pltpu.VMEM(tuple(n - 2 for n in shape), vx.dtype)
                        for _ in range(3)],
        interpret=interpret,
        **kwargs,
    )(*operands)
