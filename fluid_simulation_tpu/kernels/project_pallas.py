"""Fully-fused pressure projection for empty scenes (Pallas TPU).

One kernel runs the reference's entire ``project`` (simulation.cpp:289-362):
divergence, scalar boundary copies, all ``acc`` Poisson sweeps (red-black with
boundaries per sweep), gradient subtraction with one-sided boundary handling,
and the final velocity boundary passes — with the three velocity fields
aliased in/out and pressure/divergence living in VMEM scratch. This removes
every XLA fusion boundary and HBM round trip between the projection's stages.

Empty scenes only (no obstacle masks; neighbor validity reduces to in-bounds
tests computed from iotas — the headline wind-tunnel workload, and exactly
the reference's own default scene after its STL path fails,
object_loader.cpp:282-285). Obstacle scenes use the composable ops path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    VMEM_BUDGET_BYTES, _tiled_bytes)
from fluid_simulation_tpu.ops.project import grid_h


def pallas_project_supported(shape, dtype=jnp.float32) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    # 3 velocities (aliased) + p + div scratch + ~2 temporaries
    return 7 * _tiled_bytes(shape, itemsize) <= VMEM_BUDGET_BYTES


def _make_project_kernel(acc: int, wall_mode: str, shape, dtype):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    h = grid_h(W, H, D)
    neg_half_h = float(np.float32(-0.5) * np.float32(h))
    inv_h = float(np.float32(1.0) / np.float32(h))
    inv_2h = float(np.float32(1.0) / (np.float32(2.0) * np.float32(h)))
    c_recip = float(np.float32(1.0) / np.float32(6.0))
    if wall_mode == "noslip":
        # ops/bounds._set_bounds_noslip: x- negates vx only; y/z walls negate
        # every component
        svx = (-1.0, -1.0, -1.0)
        svy = (1.0, -1.0, -1.0)
        svz = (1.0, -1.0, -1.0)
    else:
        svx = (-1.0, 1.0, 1.0)   # (x-sign, y-sign, z-sign) for vx
        svy = (1.0, -1.0, 1.0)
        svz = (1.0, 1.0, -1.0)

    def kernel(vx_ref, vy_ref, vz_ref, vxo_ref, vyo_ref, vzo_ref,
               p_ref, div_ref):
        vxo_ref[...] = vx_ref[...]
        vyo_ref[...] = vy_ref[...]
        vzo_ref[...] = vz_ref[...]

        # in-bounds neighbor masks (reference guards, simulation.cpp:307-312);
        # booleans from iotas, broadcast over the interior
        ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2) + 1
        iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1) + 1
        iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0) + 1
        xp, xm = ix + 1 <= W, ix - 1 >= 1
        yp, ym = iy + 1 <= H, iy - 1 >= 1
        zp, zm = iz + 1 <= D, iz - 1 >= 1
        red = ((iz + iy + ix) % 2) == 0   # 1-based parity (masks.py red_i)
        zero = jnp.zeros((D, H, W), dtype)

        def faces(ref, sx, sy, sz):
            ref[1:-1, 1:-1, 0] = sx * ref[1:-1, 1:-1, 1]
            ref[1:-1, 1:-1, W + 1] = ref[1:-1, 1:-1, W]      # outflow copy
            ref[1:-1, 0, 1:-1] = sy * ref[1:-1, 1, 1:-1]
            ref[1:-1, H + 1, 1:-1] = sy * ref[1:-1, H, 1:-1]
            ref[0, 1:-1, 1:-1] = sz * ref[1, 1:-1, 1:-1]
            ref[D + 1, 1:-1, 1:-1] = sz * ref[D, 1:-1, 1:-1]

        # divergence with skipped out-of-bounds neighbors
        # (simulation.cpp:297-316), then scalar faces (setBounds(0, div))
        vxv, vyv, vzv = vxo_ref[...], vyo_ref[...], vzo_ref[...]
        div_val = (
            jnp.where(xp, vxv[1:-1, 1:-1, 2:], zero)
            - jnp.where(xm, vxv[1:-1, 1:-1, :-2], zero)
            + jnp.where(yp, vyv[1:-1, 2:, 1:-1], zero)
            - jnp.where(ym, vyv[1:-1, :-2, 1:-1], zero)
            + jnp.where(zp, vzv[2:, 1:-1, 1:-1], zero)
            - jnp.where(zm, vzv[:-2, 1:-1, 1:-1], zero))
        div_ref[...] = jnp.zeros(shape, dtype)
        div_ref[1:-1, 1:-1, 1:-1] = jnp.asarray(neg_half_h, dtype) * div_val
        faces(div_ref, 1.0, 1.0, 1.0)
        p_ref[...] = jnp.zeros(shape, dtype)

        # Poisson: acc red-black sweeps with scalar faces per sweep
        prev_i = div_ref[1:-1, 1:-1, 1:-1]

        def half(take_red):
            f = p_ref[...]
            s = (
                (((f[1:-1, 1:-1, 2:] + f[1:-1, 1:-1, :-2])
                  + f[1:-1, 2:, 1:-1]) + f[1:-1, :-2, 1:-1])
                + f[2:, 1:-1, 1:-1]
            ) + f[:-2, 1:-1, 1:-1]
            upd = (prev_i + s) * jnp.asarray(c_recip, dtype)
            cur = f[1:-1, 1:-1, 1:-1]
            sel = red if take_red else jnp.logical_not(red)
            p_ref[1:-1, 1:-1, 1:-1] = jnp.where(sel, upd, cur)

        def sweep(i, _):
            half(True)
            half(False)
            faces(p_ref, 1.0, 1.0, 1.0)
            return 0

        jax.lax.fori_loop(0, acc, sweep, 0)

        # gradient subtraction with central/one-sided selection
        # (simulation.cpp:322-357), then per-component faces
        pv = p_ref[...]
        p_i = pv[1:-1, 1:-1, 1:-1]
        i2h = jnp.asarray(inv_2h, dtype)
        i1h = jnp.asarray(inv_h, dtype)

        def grad(mask_p, mask_m, p_p, p_m):
            return jnp.where(
                mask_p & mask_m, (p_p - p_m) * i2h,
                jnp.where(mask_p, (p_p - p_i) * i1h,
                          jnp.where(mask_m, (p_i - p_m) * i1h, zero)))

        gx = grad(xp, xm, pv[1:-1, 1:-1, 2:], pv[1:-1, 1:-1, :-2])
        gy = grad(yp, ym, pv[1:-1, 2:, 1:-1], pv[1:-1, :-2, 1:-1])
        gz = grad(zp, zm, pv[2:, 1:-1, 1:-1], pv[:-2, 1:-1, 1:-1])
        vxo_ref[1:-1, 1:-1, 1:-1] = vxo_ref[1:-1, 1:-1, 1:-1] - gx
        vyo_ref[1:-1, 1:-1, 1:-1] = vyo_ref[1:-1, 1:-1, 1:-1] - gy
        vzo_ref[1:-1, 1:-1, 1:-1] = vzo_ref[1:-1, 1:-1, 1:-1] - gz
        faces(vxo_ref, *svx)
        faces(vyo_ref, *svy)
        faces(vzo_ref, *svz)

    return kernel


@functools.partial(jax.jit, static_argnames=("acc", "wall_mode", "interpret"))
def pallas_project_empty(vx, vy, vz, acc: int = 15,
                         wall_mode: str = "reference",
                         interpret: bool = False):
    """Drop-in for ``ops.project.project(..., empty_scene=True)`` (velocity
    outputs only). Numerics match the composable rbgs path."""
    shape = vx.shape
    kernel = _make_project_kernel(acc, wall_mode, shape, vx.dtype)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape, vx.dtype)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        scratch_shapes=[pltpu.VMEM(shape, vx.dtype),
                        pltpu.VMEM(shape, vx.dtype)],
        interpret=interpret,
        **kwargs,
    )(vx, vy, vz)
    return out
