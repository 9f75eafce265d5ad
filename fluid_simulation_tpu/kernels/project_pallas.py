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
    VMEM_BUDGET_BYTES, _tiled_bytes, _roll)
from fluid_simulation_tpu.ops.project import grid_h


def pallas_project_supported(shape, dtype=jnp.float32) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    # 3 velocities (aliased) + p/div/fpre interior scratch + ~2 temporaries
    interior = tuple(n - 2 for n in shape)
    return (4 * _tiled_bytes(shape, itemsize)
            + 5 * _tiled_bytes(interior, itemsize)) <= VMEM_BUDGET_BYTES


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

    def body(vxo_ref, vyo_ref, vzo_ref, pp, dp, fpre):
        # in-bounds neighbor masks (reference guards, simulation.cpp:307-312);
        # booleans from 0-based iotas over the packed interior
        ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
        iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1)
        iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
        xp, xm = ix < W - 1, ix > 0
        yp, ym = iy < H - 1, iy > 0
        zp, zm = iz < D - 1, iz > 0
        # 1-based parity (masks.py red_i): (iz+1 + iy+1 + ix+1) % 2 == 0
        red = ((iz + iy + ix) % 2) == 1
        zero = jnp.zeros((D, H, W), dtype)

        def faces(ref, sx, sy, sz):
            ref[1:-1, 1:-1, 0] = sx * ref[1:-1, 1:-1, 1]
            ref[1:-1, 1:-1, W + 1] = ref[1:-1, 1:-1, W]      # outflow copy
            ref[1:-1, 0, 1:-1] = sy * ref[1:-1, 1, 1:-1]
            ref[1:-1, H + 1, 1:-1] = sy * ref[1:-1, H, 1:-1]
            ref[0, 1:-1, 1:-1] = sz * ref[1, 1:-1, 1:-1]
            ref[D + 1, 1:-1, 1:-1] = sz * ref[D, 1:-1, 1:-1]

        # divergence with skipped out-of-bounds neighbors
        # (simulation.cpp:297-316); the reference's setBounds(0, div) only
        # writes div's ghost faces, which nothing below reads — elided
        vxv, vyv, vzv = vxo_ref[...], vyo_ref[...], vzo_ref[...]
        div_val = (
            jnp.where(xp, vxv[1:-1, 1:-1, 2:], zero)
            - jnp.where(xm, vxv[1:-1, 1:-1, :-2], zero)
            + jnp.where(yp, vyv[1:-1, 2:, 1:-1], zero)
            - jnp.where(ym, vyv[1:-1, :-2, 1:-1], zero)
            + jnp.where(zp, vzv[2:, 1:-1, 1:-1], zero)
            - jnp.where(zm, vzv[:-2, 1:-1, 1:-1], zero))
        dp[...] = jnp.asarray(neg_half_h, dtype) * div_val

        # Poisson: acc red-black sweeps, packed-interior layout. p starts at
        # zero everywhere, and the scalar faces written after each sweep are
        # plain copies of the edge value (all signs 1, x+ = outflow copy), so
        # a sweep's ghost reads equal the previous sweep's edge values. No
        # keep multiply here -> the previous sweep's value at a ghost-splice
        # position (always the updated cell's own, not-yet-touched position)
        # is ``f`` itself: no snapshot scratch needed (see
        # linsolve_pallas._make_packed_kernel; before sweep 1 f == 0 == p's
        # init, which is what the reference's zeroed ghosts read too).
        pp[...] = zero
        crec = jnp.asarray(c_recip, dtype)

        def half(take_red):
            f = pp[...]
            pre = f
            nxp = jnp.where(ix == W - 1, pre, _roll(f, W - 1, 2))
            nxm = jnp.where(ix == 0, pre, _roll(f, 1, 2))
            nyp = jnp.where(iy == H - 1, pre, _roll(f, H - 1, 1))
            nym = jnp.where(iy == 0, pre, _roll(f, 1, 1))
            nzp = jnp.concatenate([f[1:], pre[D - 1:]], axis=0)
            nzm = jnp.concatenate([pre[:1], f[:D - 1]], axis=0)
            s = (((nxp + nxm) + nyp) + nym + nzp) + nzm
            upd = (dp[...] + s) * crec
            sel = red if take_red else jnp.logical_not(red)
            pp[...] = jnp.where(sel, upd, f)

        def sweep(i, _):
            half(True)
            half(False)
            return 0

        jax.lax.fori_loop(0, acc, sweep, 0)

        # gradient subtraction with central/one-sided selection
        # (simulation.cpp:322-357): out-of-bounds neighbor lanes from the
        # rolls are discarded by the mask selects, so no ghost splicing
        p_i = pp[...]
        i2h = jnp.asarray(inv_2h, dtype)
        i1h = jnp.asarray(inv_h, dtype)

        def grad(mask_p, mask_m, p_p, p_m):
            return jnp.where(
                mask_p & mask_m, (p_p - p_m) * i2h,
                jnp.where(mask_p, (p_p - p_i) * i1h,
                          jnp.where(mask_m, (p_i - p_m) * i1h, zero)))

        gx = grad(xp, xm, _roll(p_i, W - 1, 2), _roll(p_i, 1, 2))
        gy = grad(yp, ym, _roll(p_i, H - 1, 1), _roll(p_i, 1, 1))
        gz = grad(zp, zm,
                  jnp.concatenate([p_i[1:], p_i[D - 1:]], axis=0),
                  jnp.concatenate([p_i[:1], p_i[:D - 1]], axis=0))
        vxo_ref[1:-1, 1:-1, 1:-1] = vxo_ref[1:-1, 1:-1, 1:-1] - gx
        vyo_ref[1:-1, 1:-1, 1:-1] = vyo_ref[1:-1, 1:-1, 1:-1] - gy
        vzo_ref[1:-1, 1:-1, 1:-1] = vzo_ref[1:-1, 1:-1, 1:-1] - gz
        faces(vxo_ref, *svx)
        faces(vyo_ref, *svy)
        faces(vzo_ref, *svz)

    def kernel(vx_ref, vy_ref, vz_ref, vxo_ref, vyo_ref, vzo_ref,
               pp, dp):
        vxo_ref[...] = vx_ref[...]
        vyo_ref[...] = vy_ref[...]
        vzo_ref[...] = vz_ref[...]
        body(vxo_ref, vyo_ref, vzo_ref, pp, dp, None)

    kernel.project_body = body
    return kernel


def pallas_project_masked_supported(shape, dtype=jnp.float32) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    # 3 velocities (aliased) + fluid/keep_vel operands + p/div/fpre scratch
    # + ~3 temporaries (the in-kernel nb-mask rolls)
    interior = tuple(n - 2 for n in shape)
    return (4 * _tiled_bytes(shape, itemsize)
            + 8 * _tiled_bytes(interior, itemsize)) <= VMEM_BUDGET_BYTES


def _make_project_masked_kernel(acc: int, wall_mode: str, shape, dtype):
    """Obstacle-scene variant (VERDICT r2 #3): the divergence and gradient
    use the fluid-neighbor masks (``nb_* = fluid_shifted * in_bounds``,
    rebuilt in-kernel from ``fluid_i`` with six rolls — simulation.cpp:
    297-316/322-357), the Poisson sweeps apply the scalar keep (== fluid_i
    interior, masks.py) per sweep with the packed ghost algebra, and the
    velocity epilogue applies keep_vel after its face writes, matching
    ops.bounds.set_bounds order exactly."""
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    h = grid_h(W, H, D)
    neg_half_h = float(np.float32(-0.5) * np.float32(h))
    inv_h = float(np.float32(1.0) / np.float32(h))
    inv_2h = float(np.float32(1.0) / (np.float32(2.0) * np.float32(h)))
    c_recip = float(np.float32(1.0) / np.float32(6.0))
    if wall_mode == "noslip":
        svx = (-1.0, -1.0, -1.0)
        svy = (1.0, -1.0, -1.0)
        svz = (1.0, -1.0, -1.0)
    else:
        svx = (-1.0, 1.0, 1.0)
        svy = (1.0, -1.0, 1.0)
        svz = (1.0, 1.0, -1.0)

    def body(fl_ref, kv_ref, vxo_ref, vyo_ref, vzo_ref, pp, dp, fpre):
        ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
        iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1)
        iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
        red = ((iz + iy + ix) % 2) == 1
        zero = jnp.zeros((D, H, W), dtype)
        fl = fl_ref[...]

        # nb_* masks: neighbor-is-fluid AND neighbor-in-interior
        # (scene/masks.py; obstacles never sit on the ghost shell so the
        # rolled wrap lanes are discarded by the in-bounds factor)
        nb_xp = jnp.where(ix < W - 1, _roll(fl, W - 1, 2), zero)
        nb_xm = jnp.where(ix > 0, _roll(fl, 1, 2), zero)
        nb_yp = jnp.where(iy < H - 1, _roll(fl, H - 1, 1), zero)
        nb_ym = jnp.where(iy > 0, _roll(fl, 1, 1), zero)
        nb_zp = jnp.where(iz < D - 1,
                          jnp.concatenate([fl[1:], fl[:1]], axis=0), zero)
        nb_zm = jnp.where(iz > 0,
                          jnp.concatenate([fl[D - 1:], fl[:D - 1]], axis=0),
                          zero)

        def faces(ref, sx, sy, sz):
            ref[1:-1, 1:-1, 0] = sx * ref[1:-1, 1:-1, 1]
            ref[1:-1, 1:-1, W + 1] = ref[1:-1, 1:-1, W]      # outflow copy
            ref[1:-1, 0, 1:-1] = sy * ref[1:-1, 1, 1:-1]
            ref[1:-1, H + 1, 1:-1] = sy * ref[1:-1, H, 1:-1]
            ref[0, 1:-1, 1:-1] = sz * ref[1, 1:-1, 1:-1]
            ref[D + 1, 1:-1, 1:-1] = sz * ref[D, 1:-1, 1:-1]

        # obstacle-aware divergence (simulation.cpp:297-316); div's ghost
        # faces are written by setBounds(0, div) but never read — elided
        vxv, vyv, vzv = vxo_ref[...], vyo_ref[...], vzo_ref[...]
        div_val = (
            vxv[1:-1, 1:-1, 2:] * nb_xp - vxv[1:-1, 1:-1, :-2] * nb_xm
            + vyv[1:-1, 2:, 1:-1] * nb_yp - vyv[1:-1, :-2, 1:-1] * nb_ym
            + vzv[2:, 1:-1, 1:-1] * nb_zp - vzv[:-2, 1:-1, 1:-1] * nb_zm)
        dp[...] = jnp.asarray(neg_half_h, dtype) * div_val * fl

        # Poisson with the scalar keep (== fluid interior) per sweep; ghosts
        # read the pre-keep snapshot (sign +1 scalar faces)
        pp[...] = zero
        fpre[...] = zero
        crec = jnp.asarray(c_recip, dtype)

        def half(take_red):
            """One half-sweep's pre-keep update value (writes handled by the
            caller: the black half fuses the sweep-end snapshot + keep
            multiply into its own write — bitwise-identical to the former
            separate ``fpre[...] = pp[...]; pp[...] *= fl`` passes, which
            cost two full-interior VMEM round trips per sweep (30 per
            projection; round-5 masked-flagship trace)."""
            f = pp[...]
            pre = fpre[...]
            nxp = jnp.where(ix == W - 1, pre, _roll(f, W - 1, 2))
            nxm = jnp.where(ix == 0, pre, _roll(f, 1, 2))
            nyp = jnp.where(iy == H - 1, pre, _roll(f, H - 1, 1))
            nym = jnp.where(iy == 0, pre, _roll(f, 1, 1))
            nzp = jnp.concatenate([f[1:], pre[D - 1:]], axis=0)
            nzm = jnp.concatenate([pre[:1], f[:D - 1]], axis=0)
            s = (((nxp + nxm) + nyp) + nym + nzp) + nzm
            upd = (dp[...] + s) * crec
            sel = red if take_red else jnp.logical_not(red)
            return jnp.where(sel, upd, f)

        def sweep(i, _):
            pp[...] = half(True)
            newf = half(False)          # the sweep's pre-keep field
            fpre[...] = newf
            pp[...] = newf * fl
            return 0

        jax.lax.fori_loop(0, acc, sweep, 0)

        # masked central/one-sided gradient, in ops/project.py's arithmetic
        # form (0/1 f32 mask algebra — bit-identical to the composable path)
        p_i = pp[...]
        i2h = jnp.asarray(inv_2h, dtype)
        i1h = jnp.asarray(inv_h, dtype)

        def grad(mask_p, mask_m, p_p, p_m):
            both = mask_p * mask_m
            central = (p_p - p_m) * i2h
            fwd = (p_p - p_i) * i1h
            bwd = (p_i - p_m) * i1h
            return (both * central + (mask_p - both) * fwd
                    + (mask_m - both) * bwd)

        gx = grad(nb_xp, nb_xm, _roll(p_i, W - 1, 2), _roll(p_i, 1, 2))
        gy = grad(nb_yp, nb_ym, _roll(p_i, H - 1, 1), _roll(p_i, 1, 1))
        gz = grad(nb_zp, nb_zm,
                  jnp.concatenate([p_i[1:], p_i[D - 1:]], axis=0),
                  jnp.concatenate([p_i[:1], p_i[:D - 1]], axis=0))
        kv = kv_ref[...]
        vxo_ref[1:-1, 1:-1, 1:-1] = vxo_ref[1:-1, 1:-1, 1:-1] - gx * fl
        vyo_ref[1:-1, 1:-1, 1:-1] = vyo_ref[1:-1, 1:-1, 1:-1] - gy * fl
        vzo_ref[1:-1, 1:-1, 1:-1] = vzo_ref[1:-1, 1:-1, 1:-1] - gz * fl
        # set_bounds order: faces from the pre-keep edges, then keep_vel on
        # the interior (keep == 1 on the ghost shell)
        faces(vxo_ref, *svx)
        faces(vyo_ref, *svy)
        faces(vzo_ref, *svz)
        vxo_ref[1:-1, 1:-1, 1:-1] = vxo_ref[1:-1, 1:-1, 1:-1] * kv
        vyo_ref[1:-1, 1:-1, 1:-1] = vyo_ref[1:-1, 1:-1, 1:-1] * kv
        vzo_ref[1:-1, 1:-1, 1:-1] = vzo_ref[1:-1, 1:-1, 1:-1] * kv

    def kernel(vx_ref, vy_ref, vz_ref, fl_ref, kv_ref,
               vxo_ref, vyo_ref, vzo_ref, pp, dp, fpre):
        vxo_ref[...] = vx_ref[...]
        vyo_ref[...] = vy_ref[...]
        vzo_ref[...] = vz_ref[...]
        body(fl_ref, kv_ref, vxo_ref, vyo_ref, vzo_ref, pp, dp, fpre)

    kernel.project_body = body
    return kernel


@functools.partial(jax.jit, static_argnames=("acc", "wall_mode", "interpret"))
def pallas_project_masked(vx, vy, vz, fluid_i, keep_vel_i, acc: int = 15,
                          wall_mode: str = "reference",
                          interpret: bool = False):
    """Drop-in for ``ops.project.project`` on obstacle scenes (velocity
    outputs only). ``fluid_i`` / ``keep_vel_i`` are the interior-shaped
    masks (masks.fluid_i, masks.keep_vel[1:-1,1:-1,1:-1])."""
    shape = vx.shape
    kernel = _make_project_masked_kernel(acc, wall_mode, shape, vx.dtype)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape, vx.dtype)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        scratch_shapes=[pltpu.VMEM(tuple(n - 2 for n in shape), vx.dtype)
                        for _ in range(3)],
        interpret=interpret,
        **kwargs,
    )(vx, vy, vz, fluid_i.astype(vx.dtype), keep_vel_i.astype(vx.dtype))
    return out


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
        scratch_shapes=[pltpu.VMEM(tuple(n - 2 for n in shape), vx.dtype)
                        for _ in range(2)],
        interpret=interpret,
        **kwargs,
    )(vx, vy, vz)
    return out
