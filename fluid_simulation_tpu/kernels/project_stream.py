"""z-streamed pressure projection for >VMEM empty scenes (Pallas TPU).

At 256^3 the whole-stage fused projection (kernels/project_pallas.py) does
not fit VMEM and the composable path's XLA div/grad glue costs ~12 ms per
projection on top of the ~13 ms streamed Poisson solve. This module streams
the two single-pass stages as z-blocked kernels and reuses the packed
per-sweep solve kernel for the Poisson loop:

  1. divergence kernel: padded velocity windows in, *packed* rhs out —
     already scaled by -0.5h (the solve never reads rhs ghost faces, so the
     reference's setBounds(0, div) ghost writes are dead here, as in
     project_pallas);
  2. Poisson: ``acc`` packed streaming sweeps
     (linsolve_stream.make_packed_sweep_call, b=0, a=1, c=6, no keep).
     p starts at zero everywhere, so every sweep runs packed — the ghost
     algebra's ``sign * fpre`` splices are exactly zero before sweep 1,
     matching p's zero init (same argument as project_pallas);
  3. gradient kernel: packed p windows + packed velocities in, packed
     projected velocities out (central/one-sided selection per
     simulation.cpp:322-357 — out-of-bounds lanes are discarded by the mask
     selects).

The caller rebuilds padded fields + setBounds faces with the fused
pad+bounds epilogue / concat tail (models/windtunnel._pad_bounds_tail),
which equals the composable path's final set_bounds. Numerics match
ops/project.py::project bitwise.

Obstacle scenes stream the same three stages masked
(pallas_project_stream_masked): the div/grad kernels rebuild the
fluid-neighbor masks ``nb_* = fluid_shifted * in_bounds`` in-kernel from
packed fluid windows (exactly kernels/project_pallas.py's masked fused
kernel, here z-blocked), the Poisson sweeps run the packed streaming solve
with the scalar keep (== fluid_i, scene/masks.py:83), and the grad kernel
subtracts ``grad * fluid`` from the velocities in-kernel (solids keep
their values; the caller's masked pad+bounds tail zeroes them, matching
set_bounds order). Reference: simulation.cpp:289-362.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    VMEM_BUDGET_BYTES, _itemsize, _tiled_bytes, _roll)
from fluid_simulation_tpu.kernels.linsolve_stream import (
    make_packed_sweep_call, make_packed_sweep_call_t,
    pallas_stream_solve_supported, temporal_stream_preferred)
from fluid_simulation_tpu.kernels.linsolve_mdma import (
    mdma_params, mdma_preferred, merged_sweep_chain)
from fluid_simulation_tpu.ops.project import grid_h

BLK = 16   # preferred z-block of the div/grad kernels
HB = 2     # halo-stream block: the kernels read only 1-2 rows of each
           # lo/hi window (r4; was 8 — pure HBM + scoped-VMEM waste)


def _pick_blk_proj(shape, dtype):
    """Largest z-block whose div AND grad stages fit VMEM: double-buffered
    windows PLUS the in-kernel concat temporaries (3 padded (blk+2)-row
    velocity concats in div, the p concat + 3 grads in grad) — the r4 hb=2
    windows made the stream terms small enough that the temporaries now
    decide the wide-row gate (blk=16 at 512x256x256 compile-OOM'd scoped
    VMEM without charging them; blk=8 runs)."""
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    it = _itemsize(dtype)
    rbp = _tiled_bytes((1,) + shape[1:], it)   # padded row
    rbi = _tiled_bytes((1, H, W), it)          # packed row
    for blk in (BLK, 8):
        if blk > D:
            continue
        hb = min(HB, blk)
        div = (2 * (3 * (blk + hb) * rbp + blk * rbi)
               + 3 * (blk + 2) * rbp)
        grad = (2 * ((blk + 2 * hb) * rbi + 3 * blk * rbi)
                + 4 * (blk + 2) * rbi)
        if max(div, grad) <= VMEM_BUDGET_BYTES:
            return blk
    return None


def pallas_project_stream_supported(shape, dtype=jnp.float32) -> bool:
    return (pallas_stream_solve_supported(shape, dtype, apply_keep=False)
            and _pick_blk_proj(shape, dtype) is not None)


def _div_kernel_maker(shape, blk, dtype):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    h = grid_h(W, H, D)
    neg_half_h = float(np.float32(-0.5) * np.float32(h))

    def kernel(vxm, vxh, vym, vyh, vzm, vzh, out):
        k = pl.program_id(0)
        # window rows = padded rows [zb, zb+blk+2); out packed rows
        # [zb, zb+blk)  (packed r <-> padded q = r+1)
        wx = jnp.concatenate([vxm[...], vxh[:2]], axis=0)
        wy = jnp.concatenate([vym[...], vyh[:2]], axis=0)
        wz = jnp.concatenate([vzm[...], vzh[:2]], axis=0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 2) + 1
        iy = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 1) + 1
        q = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 0) + k * blk + 1
        xp, xm = ix + 1 <= W, ix - 1 >= 1
        yp, ym = iy + 1 <= H, iy - 1 >= 1
        zp, zm = q + 1 <= D, q - 1 >= 1
        zero = jnp.zeros((blk, H, W), dtype)
        # padded row q at window index q - zb = local+1
        c = wx[1:blk + 1]
        div_val = (
            jnp.where(xp, c[:, 1:-1, 2:], zero)
            - jnp.where(xm, c[:, 1:-1, :-2], zero)
            + jnp.where(yp, wy[1:blk + 1][:, 2:, 1:-1], zero)
            - jnp.where(ym, wy[1:blk + 1][:, :-2, 1:-1], zero)
            + jnp.where(zp, wz[2:blk + 2][:, 1:-1, 1:-1], zero)
            - jnp.where(zm, wz[0:blk][:, 1:-1, 1:-1], zero))
        out[...] = jnp.asarray(neg_half_h, dtype) * div_val

    return kernel


def _grad_kernel_maker(shape, blk, hb, dtype):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    h = grid_h(W, H, D)
    inv_h = float(np.float32(1.0) / np.float32(h))
    inv_2h = float(np.float32(1.0) / (np.float32(2.0) * np.float32(h)))

    def kernel(plo, pmid, phi, ox, oy, oz):
        k = pl.program_id(0)
        # p window rows = packed rows [zb-1, zb+blk+1)
        pw = jnp.concatenate([plo[hb - 1:], pmid[...], phi[:1]], axis=0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 2)
        iy = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 1)
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 0) + k * blk
        xp, xm = ix < W - 1, ix > 0
        yp, ym = iy < H - 1, iy > 0
        zp, zm = r < D - 1, r > 0
        zero = jnp.zeros((blk, H, W), dtype)
        i2h = jnp.asarray(inv_2h, dtype)
        i1h = jnp.asarray(inv_h, dtype)
        p_i = pw[1:blk + 1]

        def grad(mask_p, mask_m, p_p, p_m):
            return jnp.where(
                mask_p & mask_m, (p_p - p_m) * i2h,
                jnp.where(mask_p, (p_p - p_i) * i1h,
                          jnp.where(mask_m, (p_i - p_m) * i1h, zero)))

        # gradients only — the caller subtracts them from the velocities in
        # XLA-land, on materialised kernel outputs, so neither side of the
        # bitwise-parity contract can FMA-contract the mul into the subtract
        ox[...] = grad(xp, xm, _roll(p_i, W - 1, 2),
                       _roll(p_i, 1, 2))
        oy[...] = grad(yp, ym, _roll(p_i, H - 1, 1),
                       _roll(p_i, 1, 1))
        oz[...] = grad(zp, zm, pw[2:blk + 2], pw[0:blk])

    return kernel


@functools.partial(jax.jit, static_argnames=("acc", "wall_mode", "interpret",
                                             "blk", "batched"))
def pallas_project_stream_packed(vx, vy, vz, acc: int = 15,
                                 wall_mode: str = "reference",
                                 interpret: bool = False,
                                 blk: int | None = None,
                                 batched: bool = False):
    """Projection for >VMEM empty scenes; returns the *packed* projected
    velocities ``(3, D, H, W)`` — the caller applies the pad+bounds tail.
    Bitwise-equal to ``ops.project.project(..., empty_scene=True)``'s
    interior. ``blk`` sizes the div/grad stages (auto when None); the
    Poisson sweeps use linsolve_stream's own calibrated block."""
    shape = vx.shape
    dtype = vx.dtype
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    interior = (D, H, W)
    if blk is None:
        blk = _pick_blk_proj(shape, dtype)
        if blk is None:
            raise ValueError(f"no streamed-projection block fits {shape}")
    nblk = -(-D // blk)
    hb = min(HB, blk)
    if blk % hb:
        raise ValueError(f"blk={blk} must be a multiple of hb={hb}")
    r_ = blk // hb
    nhb = -(-D // hb)
    nhb_pad = -(-D2 // hb)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)

    # ---- stage 1: divergence -> packed rhs
    pmid = pl.BlockSpec((blk,) + shape[1:], lambda k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    phi = pl.BlockSpec((hb,) + shape[1:],
                       lambda k: (jnp.minimum(k * r_ + r_, nhb_pad - 1),
                                  0, 0),
                       memory_space=pltpu.VMEM)
    rp = pl.pallas_call(
        _div_kernel_maker(shape, blk, dtype),
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct(interior, dtype),
        in_specs=[pmid, phi] * 3,
        out_specs=pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * int(np.prod(interior)),
            bytes_accessed=4 * _tiled_bytes(shape, _itemsize(dtype)),
            transcendentals=0),
        **kwargs,
    )(vx, vx, vy, vy, vz, vz)

    # ---- stage 2: Poisson, all sweeps packed (p == 0 before sweep 1).
    # Kernel ladder: merged-window manual-DMA passes (one async-copy per
    # operand per grid step + copy-elided first halfsweep: 470 vs 486
    # us/sweep at 256^3, tools/exp_mdma.py) -> temporal BlockSpec kernel
    # (2 sweeps/pass, 620 vs 837 us/sweep) -> 1-sweep packed kernel.
    fpre = jnp.zeros(interior, dtype)
    mdp = (mdma_params(shape, dtype, apply_keep=False) if interpret else
           mdma_preferred(shape, dtype, apply_keep=False, batched=batched))
    nsw_left = acc
    if mdp is not None and acc >= 2:
        fpre = merged_sweep_chain(0, fpre, rp, None, 1.0, 6.0, acc,
                                  wall_mode, interior, dtype, False,
                                  mdp[0], mdp[1], interpret)
        nsw_left = 0
    tp = temporal_stream_preferred(shape, dtype, apply_keep=False)
    if nsw_left and tp is not None and acc >= 2:
        blk_t, ksw_t = tp
        npass, nsw_left = divmod(acc, ksw_t)
        call_t = make_packed_sweep_call_t(0, 1.0, 6.0, wall_mode, interior,
                                          dtype, False, blk_t, ksw_t,
                                          interpret)

        def sweep_t(f, _):
            return call_t(f, f, f, rp, rp, rp), None

        fpre, _ = jax.lax.scan(sweep_t, fpre, None, length=npass)
    if nsw_left:
        from fluid_simulation_tpu.kernels.linsolve_stream import _pick_blk
        sweep_blk = _pick_blk(shape, dtype, apply_keep=False) or blk
        sweep_call = make_packed_sweep_call(0, 1.0, 6.0, wall_mode,
                                            interior, dtype, False,
                                            sweep_blk, interpret)

        def sweep(f, _):
            return sweep_call(f, f, f, rp, rp, rp), None

        fpre, _ = jax.lax.scan(sweep, fpre, None, length=nsw_left)

    # ---- stage 3: gradients on packed data, subtraction in XLA-land
    kmid = pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    klo = pl.BlockSpec((hb, H, W),
                       lambda k: (jnp.maximum(k * r_ - 1, 0), 0, 0),
                       memory_space=pltpu.VMEM)
    khi = pl.BlockSpec((hb, H, W),
                       lambda k: (jnp.minimum(k * r_ + r_, nhb - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    gx, gy, gz = pl.pallas_call(
        _grad_kernel_maker(shape, blk, hb, dtype),
        grid=(nblk,),
        out_shape=[jax.ShapeDtypeStruct(interior, dtype)] * 3,
        in_specs=[klo, kmid, khi],
        out_specs=[kmid] * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=9 * int(np.prod(interior)),
            bytes_accessed=5 * _tiled_bytes(interior, _itemsize(dtype)),
            transcendentals=0),
        **kwargs,
    )(fpre, fpre, fpre)
    return jnp.stack([vx[1:-1, 1:-1, 1:-1] - gx,
                      vy[1:-1, 1:-1, 1:-1] - gy,
                      vz[1:-1, 1:-1, 1:-1] - gz])


# ---------------------------------------------------------------------------
# masked (obstacle-scene) variant
# ---------------------------------------------------------------------------

def _pick_blk_masked(shape, dtype):
    """(blk_div, blk_grad): the largest z-blocks whose masked div / grad
    stages fit VMEM. The grad stage carries more live state (p + fluid
    packed windows, three padded velocity windows, three outputs, six nb
    masks) so it usually runs a smaller block than div."""
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    it = _itemsize(dtype)
    rbp = _tiled_bytes((1,) + shape[1:], it)   # padded row
    rbi = _tiled_bytes((1, H, W), it)          # packed row
    rki = _tiled_bytes((1, H, W), 1)           # packed int8 fluid row

    def fit(cost):
        for blk in (BLK, 8, 4):
            if blk > D:
                continue
            if cost(blk, min(HB, blk)) <= VMEM_BUDGET_BYTES:
                return blk
        return None

    def div_cost(blk, hb):
        # 3 padded vel windows + packed int8 fluid windows + packed out,
        # all double-buffered, + the 3 padded (blk+2)-row concat
        # temporaries + ~8 rows of live nb-mask/iota temporaries
        return (2 * (3 * (blk + hb) * rbp + (blk + 2 * hb) * rki
                     + blk * rbi) + 3 * (blk + 2) * rbp + 8 * blk * rbi)

    def grad_cost(blk, hb):
        return (2 * ((blk + 2 * hb) * (rbi + rki) + 3 * (blk + hb) * rbp
                     + 3 * blk * rbi) + 3 * (blk + 2) * rbp
                + 10 * blk * rbi)

    bd, bg = fit(div_cost), fit(grad_cost)
    return None if bd is None or bg is None else (bd, bg)


def pallas_project_stream_masked_supported(shape, dtype=jnp.float32) -> bool:
    return (pallas_stream_solve_supported(shape, dtype, apply_keep=True)
            and _pick_blk_masked(shape, dtype) is not None)


def _nb_masks(fw, blk, k, D, H, W, dtype):
    """The six fluid-neighbor masks on a z-block, from the packed fluid
    window ``fw`` (rows r-1..r+blk): ``nb_* = fluid_shifted * in_bounds``
    (scene/masks.py:96-102), in the same roll+where form as the fused
    masked kernel (project_pallas.py::_make_project_masked_kernel).
    ``fw`` must already be ``dtype`` (int8-streamed callers convert on
    load — exact 0/1, so all downstream mask algebra is bitwise
    unchanged)."""
    fl = fw[1:blk + 1]
    ix = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 0) + k * blk
    zero = jnp.zeros((blk, H, W), dtype)
    nb_xp = jnp.where(ix < W - 1, _roll(fl, W - 1, 2), zero)
    nb_xm = jnp.where(ix > 0, _roll(fl, 1, 2), zero)
    nb_yp = jnp.where(iy < H - 1, _roll(fl, H - 1, 1), zero)
    nb_ym = jnp.where(iy > 0, _roll(fl, 1, 1), zero)
    nb_zp = jnp.where(r < D - 1, fw[2:blk + 2], zero)
    nb_zm = jnp.where(r > 0, fw[0:blk], zero)
    return fl, nb_xp, nb_xm, nb_yp, nb_ym, nb_zp, nb_zm


def _div_masked_kernel_maker(shape, blk, hb, dtype):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    h = grid_h(W, H, D)
    neg_half_h = float(np.float32(-0.5) * np.float32(h))

    def kernel(vxm, vxh, vym, vyh, vzm, vzh, flo, fmid, fhi, out):
        k = pl.program_id(0)
        wx = jnp.concatenate([vxm[...], vxh[:2]], axis=0)
        wy = jnp.concatenate([vym[...], vyh[:2]], axis=0)
        wz = jnp.concatenate([vzm[...], vzh[:2]], axis=0)
        # fluid streams int8; convert per-window (exact 0/1)
        fw = jnp.concatenate([flo[hb - 1:].astype(dtype),
                              fmid[...].astype(dtype),
                              fhi[:1].astype(dtype)], axis=0)
        fl, nb_xp, nb_xm, nb_yp, nb_ym, nb_zp, nb_zm = _nb_masks(
            fw, blk, k, D, H, W, dtype)
        # obstacle-aware divergence in the composable path's exact operand
        # order (ops/project.py::divergence, simulation.cpp:297-316)
        c = wx[1:blk + 1]
        cy = wy[1:blk + 1]
        div_val = (
            c[:, 1:-1, 2:] * nb_xp - c[:, 1:-1, :-2] * nb_xm
            + cy[:, 2:, 1:-1] * nb_yp - cy[:, :-2, 1:-1] * nb_ym
            + wz[2:blk + 2][:, 1:-1, 1:-1] * nb_zp
            - wz[0:blk][:, 1:-1, 1:-1] * nb_zm)
        out[...] = jnp.asarray(neg_half_h, dtype) * div_val * fl

    return kernel


def _grad_masked_kernel_maker(shape, blk, hb, dtype):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    h = grid_h(W, H, D)
    inv_h = float(np.float32(1.0) / np.float32(h))
    inv_2h = float(np.float32(1.0) / (np.float32(2.0) * np.float32(h)))

    def kernel(plo, pmid, phi, flo, fmid, fhi,
               vxm, vxh, vym, vyh, vzm, vzh, ox, oy, oz):
        k = pl.program_id(0)
        pw = jnp.concatenate([plo[hb - 1:], pmid[...], phi[:1]], axis=0)
        fw = jnp.concatenate([flo[hb - 1:].astype(dtype),
                              fmid[...].astype(dtype),
                              fhi[:1].astype(dtype)], axis=0)
        fl, nb_xp, nb_xm, nb_yp, nb_ym, nb_zp, nb_zm = _nb_masks(
            fw, blk, k, D, H, W, dtype)
        p_i = pw[1:blk + 1]
        i2h = jnp.asarray(inv_2h, dtype)
        i1h = jnp.asarray(inv_h, dtype)

        # masked central/one-sided gradient in ops/project.py's 0/1 mask
        # algebra (bit-identical to the composable path and the fused
        # masked kernel); solids keep their velocity (the caller's masked
        # pad+bounds tail zeroes them, matching set_bounds order)
        def grad(mask_p, mask_m, p_p, p_m):
            both = mask_p * mask_m
            central = (p_p - p_m) * i2h
            fwd = (p_p - p_i) * i1h
            bwd = (p_i - p_m) * i1h
            return (both * central + (mask_p - both) * fwd
                    + (mask_m - both) * bwd)

        gx = grad(nb_xp, nb_xm, _roll(p_i, W - 1, 2), _roll(p_i, 1, 2))
        gy = grad(nb_yp, nb_ym, _roll(p_i, H - 1, 1), _roll(p_i, 1, 1))
        # z neighbors: self at the domain ends, like the fused kernel's
        # p_i[:1]/p_i[D-1:] splices — the clamped lo/hi windows hold
        # unrelated rows there, and although nb_z* = 0 masks the value out,
        # the (mask_p - both) * fwd term's signed zero follows the garbage
        # row's sign; self rows make it +0, matching the composable path
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, H, W), 0) + k * blk
        p_zp = jnp.where(r < D - 1, pw[2:blk + 2], p_i)
        p_zm = jnp.where(r > 0, pw[0:blk], p_i)
        gz = grad(nb_zp, nb_zm, p_zp, p_zm)
        # padded row q = r + 1: the last block's top row needs the hi window
        wx = jnp.concatenate([vxm[...], vxh[:2]], axis=0)
        wy = jnp.concatenate([vym[...], vyh[:2]], axis=0)
        wz = jnp.concatenate([vzm[...], vzh[:2]], axis=0)
        ox[...] = wx[1:blk + 1, 1:-1, 1:-1] - gx * fl
        oy[...] = wy[1:blk + 1, 1:-1, 1:-1] - gy * fl
        oz[...] = wz[1:blk + 1, 1:-1, 1:-1] - gz * fl

    return kernel


@functools.partial(jax.jit, static_argnames=("acc", "wall_mode", "interpret",
                                              "blk", "batched"))
def pallas_project_stream_masked(vx, vy, vz, fluid_i, acc: int = 15,
                                 wall_mode: str = "reference",
                                 interpret: bool = False,
                                 blk: int | None = None,
                                 batched: bool = False):
    """Obstacle-scene projection for >VMEM grids; returns the *packed*
    projected velocities ``(3, D, H, W)`` — the caller applies the masked
    pad+bounds tail. Bitwise-equal to ``ops.project.project(...,
    empty_scene=False)``'s interior pre-set_bounds values on fluid cells
    (solids hold ``v - 0``). ``fluid_i`` is the interior fluid mask
    (masks.fluid_i). ``blk`` overrides both stage blocks (tests)."""
    shape = vx.shape
    dtype = vx.dtype
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    interior = (D, H, W)
    if blk is None:
        picked = _pick_blk_masked(shape, dtype)
        if picked is None:
            raise ValueError(f"no masked streamed-projection block fits "
                             f"{shape}")
        blk_div, blk_grad = picked
    else:
        blk_div = blk_grad = blk
    # fluid streams as int8 everywhere (1 byte/cell of mask traffic;
    # exact 0/1 so all kernel numerics are bitwise unchanged)
    kp = fluid_i.astype(jnp.int8)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)

    def specs(blk_s):
        hb = min(HB, blk_s)
        if blk_s % hb:
            raise ValueError(f"blk={blk_s} must be a multiple of hb={hb}")
        r_ = blk_s // hb
        nblk = -(-D // blk_s)
        nhb = -(-D // hb)
        nhb_pad = -(-D2 // hb)
        pmid = pl.BlockSpec((blk_s,) + shape[1:], lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
        phi = pl.BlockSpec(
            (hb,) + shape[1:],
            lambda k, r_=r_, np_=nhb_pad: (jnp.minimum(k * r_ + r_, np_ - 1),
                                           0, 0),
            memory_space=pltpu.VMEM)
        kmid = pl.BlockSpec((blk_s, H, W), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
        klo = pl.BlockSpec(
            (hb, H, W),
            lambda k, r_=r_: (jnp.maximum(k * r_ - 1, 0), 0, 0),
            memory_space=pltpu.VMEM)
        khi = pl.BlockSpec(
            (hb, H, W),
            lambda k, r_=r_, n_=nhb: (jnp.minimum(k * r_ + r_, n_ - 1), 0, 0),
            memory_space=pltpu.VMEM)
        return hb, nblk, pmid, phi, kmid, klo, khi

    # ---- stage 1: masked divergence -> packed rhs (already * fluid)
    hb, nblk, pmid, phi, kmid, klo, khi = specs(blk_div)
    rp = pl.pallas_call(
        _div_masked_kernel_maker(shape, blk_div, hb, dtype),
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct(interior, dtype),
        in_specs=[pmid, phi] * 3 + [klo, kmid, khi],
        out_specs=kmid,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=13 * int(np.prod(interior)),
            bytes_accessed=4 * _tiled_bytes(shape, _itemsize(dtype))
            + _tiled_bytes(interior, _itemsize(dtype)),
            transcendentals=0),
        **kwargs,
    )(vx, vx, vy, vy, vz, vz, kp, kp, kp)

    # ---- stage 2: Poisson with the scalar keep (== fluid, masks.py:83);
    # p == 0 before sweep 1 so every sweep runs packed, as in the empty
    # path (same merged -> temporal -> 1-sweep ladder; kp streams int8)
    fpre = jnp.zeros(interior, dtype)
    mdp = (mdma_params(shape, dtype, apply_keep=True) if interpret else
           mdma_preferred(shape, dtype, apply_keep=True, batched=batched))
    nsw_left = acc
    if mdp is not None and acc >= 2:
        fpre = merged_sweep_chain(0, fpre, rp, kp, 1.0, 6.0, acc,
                                  wall_mode, interior, dtype, True,
                                  mdp[0], mdp[1], interpret)
        nsw_left = 0
    tp = temporal_stream_preferred(shape, dtype, apply_keep=True)
    if nsw_left and tp is not None and acc >= 2:
        blk_t, ksw_t = tp
        npass, nsw_left = divmod(acc, ksw_t)
        call_t = make_packed_sweep_call_t(0, 1.0, 6.0, wall_mode, interior,
                                          dtype, True, blk_t, ksw_t,
                                          interpret)

        def sweep_t(f, _):
            return call_t(f, f, f, rp, rp, rp, kp, kp, kp), None

        fpre, _ = jax.lax.scan(sweep_t, fpre, None, length=npass)
    if nsw_left:
        from fluid_simulation_tpu.kernels.linsolve_stream import _pick_blk
        sweep_blk = _pick_blk(shape, dtype, apply_keep=True) or blk_div
        sweep_call = make_packed_sweep_call(0, 1.0, 6.0, wall_mode,
                                            interior, dtype, True,
                                            sweep_blk, interpret)

        def sweep(f, _):
            return sweep_call(f, f, f, rp, rp, rp, kp, kp, kp), None

        fpre, _ = jax.lax.scan(sweep, fpre, None, length=nsw_left)
    # the solve's final keep multiply (set_bounds order: the composable
    # linear_solver ends post-keep; fpre here is pre-keep). kp is int8;
    # the convert fuses into this one elementwise pass.
    p_post = fpre * kp.astype(dtype)

    # ---- stage 3: masked gradients + in-kernel subtract on fluid cells
    hb, nblk, pmid, phi, kmid, klo, khi = specs(blk_grad)
    ox, oy, oz = pl.pallas_call(
        _grad_masked_kernel_maker(shape, blk_grad, hb, dtype),
        grid=(nblk,),
        out_shape=[jax.ShapeDtypeStruct(interior, dtype)] * 3,
        in_specs=[klo, kmid, khi] * 2 + [pmid, phi] * 3,
        out_specs=[kmid] * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * int(np.prod(interior)),
            bytes_accessed=3 * _tiled_bytes(shape, _itemsize(dtype))
            + 5 * _tiled_bytes(interior, _itemsize(dtype)),
            transcendentals=0),
        **kwargs,
    )(p_post, p_post, p_post, kp, kp, kp, vx, vx, vy, vy, vz, vz)
    return jnp.stack([ox, oy, oz])
