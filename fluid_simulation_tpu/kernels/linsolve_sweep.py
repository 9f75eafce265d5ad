"""Per-slab fused RBGS sweep kernel for the sharded solver (Pallas TPU).

The sharded solve (parallel/sharded.py::_solve) interleaves relaxation
half-sweeps with ICI halo exchanges, so the multi-sweep VMEM-resident kernel
(kernels/linsolve_pallas.py) cannot be used directly — halos must cross chips
between the red and black halves. This kernel fuses everything *between* two
exchanges of one sweep into a single ``pallas_call`` on the local z-slab:

  red half  ->  swap in the black-phase halo planes  ->  black half  ->
  x/y boundary faces  ->  z mirror ghosts  ->  obstacle keep multiply

The cross-slab dependency of the black half (edge rows read red-updated
neighbor rows, simulation.cpp:251-273 semantics per the sharded halo protocol)
is satisfied *without* an extra mid-sweep exchange: the caller ppermutes the
neighbor's second-interior plane before the sweep and recomputes the
red-updated halo plane locally in jnp (one plane of VPU work — the same f32
inputs in the same operand order the neighbor uses, hence bit-identical), then
passes it to the kernel as the ``bp_lo/bp_hi`` operands. ICI traffic per sweep
stays at 4 planes (2 pre-sweep source planes + 2 post-bounds halo planes),
exactly matching the pure-jnp path.

Red/black parity is computed from local iotas, which equals the global parity
because the caller guarantees an even local slab depth (``Dl % 2 == 0``), so
``(i*Dl + z + y + x) % 2 == (z + y + x) % 2`` on every rank.

Numerics are identical to the jnp sharded path and the single-chip kernels:
same update expression/operand order (simulation.cpp:263-269), red
(1-based coord sum even) before black, faces then keep after the sweep
(setBounds, simulation.cpp:183-246).
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

# Tests set this to run the kernel path on CPU via the Pallas interpreter
# (the supported() gate then skips the backend check).
FORCE_INTERPRET = False


def pallas_sweep_supported(local_shape, dtype=jnp.float32) -> bool:
    """Kernel usable for this local padded slab shape? Requires an even
    interior slab depth (parity locality, see module docstring) and the
    resident footprint (field in/out alias + prev + keep + 2 planes +
    temporaries) to fit VMEM."""
    if len(local_shape) != 3 or min(local_shape) < 4:
        return False
    if (local_shape[0] - 2) % 2 != 0:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if not FORCE_INTERPRET and jax.default_backend() not in ("tpu", "axon"):
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    need = 5 * _tiled_bytes(local_shape, itemsize)
    return need <= VMEM_BUDGET_BYTES


def _make_sweep_kernel(b: int, a: float, c: float, wall_mode: str,
                       shape, dtype, apply_keep: bool):
    Dl2, H2, W2 = shape
    Dl, H, W = Dl2 - 2, H2 - 2, W2 - 2
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    if wall_mode == "noslip" and b in (1, 2, 3):
        sx = -1.0 if b == 1 else 1.0
        sy, sz = -1.0, -1.0
    else:
        sx = -1.0 if b == 1 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sz = -1.0 if b == 3 else 1.0

    def _body(prev_ref, keep_ref, bp_lo_ref, bp_hi_ref, field_ref, out_ref):
        out_ref[...] = field_ref[...]
        prev_i = prev_ref[1:-1, 1:-1, 1:-1]
        # red = 1-based global coord sum even == local (iz+iy+ix)%2 == 1 on
        # 0-based interior iotas (Dl even => rank offset is parity-neutral)
        iz = jax.lax.broadcasted_iota(jnp.int32, (Dl, H, W), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (Dl, H, W), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (Dl, H, W), 2)
        red = ((iz + iy + ix) % 2) == 1
        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)

        def half(take_red):
            f = out_ref[...]
            s = (
                (((f[1:-1, 1:-1, 2:] + f[1:-1, 1:-1, :-2])
                  + f[1:-1, 2:, 1:-1]) + f[1:-1, :-2, 1:-1])
                + f[2:, 1:-1, 1:-1]
            ) + f[:-2, 1:-1, 1:-1]
            upd = (prev_i + a_c * s) * crec
            cur = f[1:-1, 1:-1, 1:-1]
            sel = red if take_red else jnp.logical_not(red)
            out_ref[1:-1, 1:-1, 1:-1] = jnp.where(sel, upd, cur)

        half(True)
        # black-phase halo planes: red-updated neighbor rows (or the global
        # ghost planes on edge ranks) computed by the caller
        out_ref[0] = bp_lo_ref[...]
        out_ref[Dl + 1] = bp_hi_ref[...]
        half(False)

        # setBounds x/y faces on interior rows (ops/bounds.py order)
        out_ref[1:-1, 1:-1, 0] = sx * out_ref[1:-1, 1:-1, 1]
        out_ref[1:-1, 1:-1, W + 1] = out_ref[1:-1, 1:-1, W]  # x+ outflow
        out_ref[1:-1, 0, 1:-1] = sy * out_ref[1:-1, 1, 1:-1]
        out_ref[1:-1, H + 1, 1:-1] = sy * out_ref[1:-1, H, 1:-1]
        # z mirror ghosts (pre-keep sources, zero plane borders — the sharded
        # _set_bounds_ex contract); interior ranks' rows 0/Dl+1 are replaced
        # by the caller's post-bounds halo exchange afterwards
        zero_row = jnp.zeros((1, H2, W2), dtype)
        out_ref[0:1] = zero_row
        out_ref[Dl + 1:Dl + 2] = zero_row
        out_ref[0, 1:-1, 1:-1] = (
            jnp.asarray(sz, dtype) * out_ref[1, 1:-1, 1:-1])
        out_ref[Dl + 1, 1:-1, 1:-1] = (
            jnp.asarray(sz, dtype) * out_ref[Dl, 1:-1, 1:-1])
        if apply_keep:
            out_ref[...] = out_ref[...] * keep_ref[...]

    if apply_keep:
        def kernel(prev_ref, keep_ref, bp_lo_ref, bp_hi_ref, field_ref,
                   out_ref):
            _body(prev_ref, keep_ref, bp_lo_ref, bp_hi_ref, field_ref,
                  out_ref)
    else:
        def kernel(prev_ref, bp_lo_ref, bp_hi_ref, field_ref, out_ref):
            _body(prev_ref, None, bp_lo_ref, bp_hi_ref, field_ref, out_ref)
    return kernel


@functools.partial(jax.jit, static_argnames=("b", "a", "c", "wall_mode",
                                             "interpret", "apply_keep"))
def pallas_rbgs_sweep(b: int, field, prev, keep, bp_lo, bp_hi,
                      a: float, c: float, wall_mode: str = "reference",
                      interpret: bool = False, apply_keep: bool = True):
    """One fused red+black relaxation sweep (plus boundary faces and obstacle
    keep) on a local padded slab ``(Dl+2, H+2, W+2)``.

    ``bp_lo``/``bp_hi`` are the ``(H+2, W+2)`` halo planes the black half
    must read at rows 0 and Dl+1 (red-updated neighbor rows inside the
    domain, pre-sweep ghost planes at the global z edges). The output's rows
    0/Dl+1 hold the global z mirror ghosts; interior-rank callers overwrite
    them with the post-bounds halo exchange.
    """
    shape = field.shape
    kernel = _make_sweep_kernel(b, a, c, wall_mode, shape, field.dtype,
                                apply_keep=apply_keep)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    if apply_keep:
        operands = (prev, keep, bp_lo, bp_hi, field)
    else:
        operands = (prev, bp_lo, bp_hi, field)
    n_in = len(operands)
    itemsize = 2 if field.dtype == jnp.bfloat16 else 4
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, field.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={n_in - 1: 0},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * int(np.prod(shape)),
            bytes_accessed=4 * _tiled_bytes(shape, itemsize),
            transcendentals=0),
        **kwargs,
    )(*operands)


# ---------------------------------------------------------------------------
# Packed-interior variant: the local slab travels as (Dl, H, W) exact-tile
# data plus explicit ghost/halo planes, eliminating the padded layout's
# 2x lane waste (130 -> 256-lane tiles at the flagship W). Same per-sweep
# protocol and numerics as pallas_rbgs_sweep; the ghost algebra is the
# resident packed kernel's (linsolve_pallas._make_packed_kernel): x/y ghost
# planes carry sign * pre-keep edge values, spliced by roll + iota-edge
# selects; z neighbors come from the carried halo planes (red) and the
# black-phase planes (black).

def pallas_packed_sweep_supported(local_shape, dtype=jnp.float32) -> bool:
    """Same gates as the padded kernel; the packed footprint is smaller."""
    return pallas_sweep_supported(local_shape, dtype)


def _make_packed_sweep_kernel(b: int, a: float, c: float, wall_mode: str,
                              interior, dtype):
    from fluid_simulation_tpu.kernels.linsolve_pallas import _roll
    Dl, H, W = interior
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    if wall_mode == "noslip" and b in (1, 2, 3):
        sx = -1.0 if b == 1 else 1.0
        sy, sz = -1.0, -1.0
    else:
        sx = -1.0 if b == 1 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sz = -1.0 if b == 3 else 1.0

    def kernel(fk_ref, rp_ref, kp_ref, gx0, gx1, gy0, gy1,
               znlo, znhi, bplo, bphi,
               out, ogx0, ogx1, ogy0, ogy1, ogz0, ogz1, f1):
        iz = jax.lax.broadcasted_iota(jnp.int32, (Dl, H, W), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (Dl, H, W), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (Dl, H, W), 2)
        # red = 1-based global coord sum even == local parity (Dl even)
        red = ((iz + iy + ix) % 2) == 1
        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        rp = rp_ref[...]
        gx0b = gx0[...][..., None]          # (Dl, H, 1)
        gx1b = gx1[...][..., None]
        gy0b = gy0[...][:, None, :]         # (Dl, 1, W)
        gy1b = gy1[...][:, None, :]

        def halfsweep(fv, lo_plane, hi_plane, sel):
            xp = jnp.where(ix == W - 1, gx1b, _roll(fv, W - 1, 2))
            xm = jnp.where(ix == 0, gx0b, _roll(fv, 1, 2))
            yp = jnp.where(iy == H - 1, gy1b, _roll(fv, H - 1, 1))
            ym = jnp.where(iy == 0, gy0b, _roll(fv, 1, 1))
            zp = jnp.where(iz == Dl - 1, hi_plane[None],
                           jnp.concatenate([fv[1:], fv[-1:]], axis=0))
            zm = jnp.where(iz == 0, lo_plane[None],
                           jnp.concatenate([fv[:1], fv[:-1]], axis=0))
            s = (((xp + xm) + yp) + ym + zp) + zm
            upd = (rp + a_c * s) * crec
            return jnp.where(sel, upd, fv)

        f1[...] = halfsweep(fk_ref[...], znlo[...], znhi[...], red)
        f2 = halfsweep(f1[...], bplo[...], bphi[...], jnp.logical_not(red))
        # next sweep's ghost planes: sign * this sweep's pre-keep edges
        ogx0[...] = jnp.asarray(sx, dtype) * f2[:, :, 0]
        ogx1[...] = f2[:, :, W - 1]          # x+ outflow copy
        ogy0[...] = jnp.asarray(sy, dtype) * f2[:, 0, :]
        ogy1[...] = jnp.asarray(sy, dtype) * f2[:, H - 1, :]
        ogz0[...] = jnp.asarray(sz, dtype) * f2[0]
        ogz1[...] = jnp.asarray(sz, dtype) * f2[Dl - 1]
        out[...] = f2 * kp_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("b", "a", "c", "wall_mode",
                                             "interpret"))
def pallas_rbgs_sweep_packed(b: int, fk, rp, kp, gx0, gx1, gy0, gy1,
                             znlo, znhi, bp_lo, bp_hi,
                             a: float, c: float,
                             wall_mode: str = "reference",
                             interpret: bool = False):
    """One fused red+black sweep on a packed local slab.

    Inputs: ``fk`` (Dl, H, W) post-keep field, ``rp``/``kp`` rhs and keep
    interiors, ``gx0/gx1/gy0/gy1`` the x/y ghost-plane values (sign *
    pre-keep edges from the previous sweep, or the initial padded ghost
    faces), ``znlo/znhi`` the z halo planes the red half reads at local
    rows 0/Dl-1 (neighbor post-bounds planes or global mirrors), and
    ``bp_lo/bp_hi`` the black-phase planes (as in pallas_rbgs_sweep) — all
    planes (H, W)/(Dl, H)/(Dl, W) interiors.

    Returns ``(fk', gx0', gx1', gy0', gy1', gz0', gz1')`` where gz planes
    are the global z mirror values ``sz * prekeep`` of the edge rows.
    """
    interior = fk.shape
    Dl, H, W = interior
    dtype = fk.dtype
    kernel = _make_packed_sweep_kernel(b, a, c, wall_mode, interior, dtype)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    out_shape = [
        jax.ShapeDtypeStruct(interior, dtype),
        jax.ShapeDtypeStruct((Dl, H), dtype),
        jax.ShapeDtypeStruct((Dl, H), dtype),
        jax.ShapeDtypeStruct((Dl, W), dtype),
        jax.ShapeDtypeStruct((Dl, W), dtype),
        jax.ShapeDtypeStruct((H, W), dtype),
        jax.ShapeDtypeStruct((H, W), dtype),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        scratch_shapes=[pltpu.VMEM(interior, dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * int(np.prod(interior)),
            bytes_accessed=4 * _tiled_bytes(interior,
                                            2 if dtype == jnp.bfloat16 else 4),
            transcendentals=0),
        **kwargs,
    )(fk, rp, kp, gx0, gx1, gy0, gy1, znlo, znhi, bp_lo, bp_hi)
