"""Merged-window (manual-DMA) packed z-streaming RBGS solve (Pallas TPU).

Round-5 attack on the big-grid "DMA-issue wall" (VERDICT r4 #1). The
BlockSpec streaming kernels (linsolve_stream.py) assemble each operand's
z-window from THREE Mosaic streams (lo/mid/hi halo blocks) because BlockSpec
offsets are multiples of the block shape — 7-10 DMA issues per grid step.
tools/exp_dma.py measured on the v5e at 256^3 (f32, blk=16, identical
bytes): the 3-window structure runs 458 us/pass vs 306 us for ONE merged
(blk+2*hb)-row window DMA'd manually per operand, and the true HBM ceiling
is ~819-870 GB/s (v5e spec; two large-block reads + write measured 874 GB/s
combined) — the old "523 GB/s platform ceiling" was itself an artifact of
small-window DMA issue overhead (~3 us per small window, ~5-7 us per grid
step baseline).

This kernel streams each operand (pre-keep field, rhs, int8 keep) through a
double-buffered VMEM scratch window with ONE ``pltpu.make_async_copy`` per
operand per grid step (the merged window is contiguous in z, the outermost
axis), and runs ``nsw`` trapezoidal sweeps per pass with exactly the ghost/
keep algebra of ``linsolve_stream._make_sweep_kernel_t`` — outputs are
bitwise-identical to the BlockSpec kernels and the rbgs oracle (same
expression tree, same operand order; asserted in tests/test_kernels.py).

Edge blocks: the canonical scratch mapping (row ``e`` <-> packed row
``k*blk - m + e``) is kept and the out-of-range scratch rows simply hold
stale data — exactly as garbage-tolerant as the BlockSpec kernels' clamped
duplicate rows: dead rows are never selected into an update and every
neighbor read that would touch them is replaced by the ``sign * fpre`` edge
select. The first/last blocks therefore DMA ``blk + m`` rows into the
valid sub-range of the window.

Reference semantics: ``acc`` sweeps of ``f = (prev + a*sum6(f))/c`` with
setBounds (faces then keep) after every sweep — simulation.cpp:251-273 /
:183-246.
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
    _rebuild_padded, _solve_signs, make_sweep1_packed_call,
    temporal_stream_preferred)


def _mdma_vmem_bytes(blk: int, nsw: int, shape, dtype, apply_keep: bool)\
        -> int:
    """Scoped-VMEM byte model: double-buffered merged in-windows (f + rhs
    f32, keep int8), Mosaic-double-buffered out stream, the ext working
    window, and ~4 window-rows of live halfsweep temporaries."""
    D, H, W = (n - 2 for n in shape)
    it = _itemsize(dtype)
    rb = _tiled_bytes((1, H, W), it)
    rk = _tiled_bytes((1, H, W), 1)
    E = blk + 4 * nsw
    wins = 2 * E * (2 * rb + (rk if apply_keep else 0))
    out = 2 * blk * rb
    ext = E * rb
    temps = 4 * E * rb
    return wins + out + ext + temps


def mdma_params(shape, dtype=jnp.float32, apply_keep: bool = True):
    """(blk, nsw) for the merged-window solve, or None. Requires packed
    depth D divisible by blk with >= 2 blocks (the edge-block DMA cases
    assume first != last).

    Depth is fixed at nsw=2 by measurement, not the byte model: at 256^3
    the per-sweep time follows the trapezoid RECOMPUTE axis past depth 2
    (470 us at nsw=2 vs 493/498/628 at 4/3/1 — tools/exp_mdma.py; the
    byte model alone would pick nsw=4). nsw=1 only when 2 cannot fit;
    larger blk preferred at fixed depth (fewer grid steps)."""
    D, H, W = (n - 2 for n in shape)
    for nsw in (2, 1):
        for blk in (32, 24, 16, 12, 8, 4):
            if D % blk or D < 2 * blk or blk < 2 * nsw:
                continue
            if _mdma_vmem_bytes(blk, nsw, shape, dtype, apply_keep) \
                    > int(0.9 * VMEM_BUDGET_BYTES):
                continue
            return (blk, nsw)
    return None


def mdma_preferred(shape, dtype=jnp.float32, apply_keep: bool = True,
                   batched: bool = False):
    """Production-dispatch gate: (blk, nsw) when the merged-window kernel
    should run this solve, else None. Manual-DMA grids are not
    vmap-batchable (vmap would prepend a grid dim the hand-written
    ``pl.ds`` window offsets know nothing about), so batched steps fall
    through to the BlockSpec streaming kernels.

    EMPTY scenes, by measurement (tools/exp_mdma.py, 256^3, one variant
    per process): empty 470.0 vs the temporal BlockSpec kernel's 486.2
    us/sweep (merged windows + lean parity + the copy-elided first
    halfsweep), but masked 519.4 vs 508.1 — with a keep stream the first
    halfsweep cannot skip the window->ext multiply pass and the merged
    windows buy nothing over BlockSpec depth 2, so where the temporal
    kernel FITS it stays the masked winner.

    KEEP scenes at wide rows, by measurement (tools/exp_mdma_keep.py):
    the BlockSpec temporal kernel never fits W > 256 rows (E-row scratch
    + lo/mid/hi window triplication — r3 notes), so the masked
    alternative there is the DEPTH-1 stream kernel, the matchup the
    empty 512 won by 18.7%. Masked mdma at 512x256x256 sphere:
    **121.4 vs 146.6 ms/step (-17.2%), bitwise-identical** (sha
    64327e17). Gate: masked mdma only when temporal_stream_preferred
    has no depth-2 offer for the shape."""
    if batched:
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    if dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if len(shape) != 3 or min(shape) < 6:
        return None
    if apply_keep and temporal_stream_preferred(
            shape, dtype, apply_keep=True) is not None:
        return None
    return mdma_params(shape, dtype, apply_keep)


def _make_sweep_kernel_m(b: int, a: float, c: float, wall_mode: str,
                         interior, blk: int, nsw: int, dtype,
                         apply_keep: bool, keep_i8: bool = True):
    D, H, W = interior
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    sx, sy, sz = _solve_signs(b, wall_mode)
    m = 2 * nsw
    E = blk + 2 * m
    nblk = D // blk

    def body(f_hbm, r_hbm, k_hbm, out, pwb, rwb, kwb, ext, sems):
        k = pl.program_id(0)
        srcs = [f_hbm, r_hbm] + ([k_hbm] if apply_keep else [])
        dsts = [pwb, rwb] + ([kwb] if apply_keep else [])

        def dma_in(slot, kk, do):
            """One merged-window DMA per operand; edge blocks transfer the
            valid (blk+m)-row sub-range, leaving dead scratch rows stale."""
            @pl.when(kk == 0)
            def _():
                for i, (s, d) in enumerate(zip(srcs, dsts)):
                    do(pltpu.make_async_copy(
                        s.at[pl.ds(0, blk + m)],
                        d.at[slot, pl.ds(m, blk + m)], sems.at[slot, i]))

            if nblk > 2:   # traced even when unreachable: emit only if real
                @pl.when((kk > 0) & (kk < nblk - 1))
                def _():
                    for i, (s, d) in enumerate(zip(srcs, dsts)):
                        do(pltpu.make_async_copy(
                            s.at[pl.ds(kk * blk - m, E)],
                            d.at[slot], sems.at[slot, i]))

            @pl.when(kk == nblk - 1)
            def _():
                for i, (s, d) in enumerate(zip(srcs, dsts)):
                    do(pltpu.make_async_copy(
                        s.at[pl.ds(kk * blk - m, blk + m)],
                        d.at[slot, pl.ds(0, blk + m)], sems.at[slot, i]))

        @pl.when(k == 0)
        def _():
            dma_in(0, 0, lambda d: d.start())

        @pl.when(k + 1 < nblk)
        def _():
            dma_in((k + 1) % 2, k + 1, lambda d: d.start())

        slot = k % 2
        dma_in(slot, k, lambda d: d.wait())

        if apply_keep:
            kw = kwb[slot].astype(dtype) if keep_i8 else kwb[slot]
            ext[...] = pwb[slot] * kw
        # empty scenes skip the window->ext copy entirely: the first (red)
        # halfsweep reads the DMA'd window ``pwb`` directly (f == pre
        # there by definition) and every ext row later halfsweeps read is
        # inside the first red halfsweep's written range [1, E-2].

        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        sxc = jnp.asarray(sx, dtype)
        syc = jnp.asarray(sy, dtype)
        szc = jnp.asarray(sz, dtype)

        # Hoisted once per grid step: x/y edge masks and the (y+x) parity
        # plane, all (1, H, W), plus broadcast-only uses — the r3 Mosaic
        # crash trigger was row-slicing hoisted VALUES at varying sublane
        # offsets (NOTES "Falsified-by-compiler"); whole-value broadcasts
        # along the untiled z axis are safe. Replaces 3 full (n, H, W)
        # iotas + a modulo per halfsweep (2*nsw per grid step) with one
        # (n, 1, 1) iota + an XOR: odd(gp+y+x) == odd(y+x) XOR odd(gp).
        iy1 = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
        ix1 = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
        yx_odd = ((iy1 + ix1) % 2) == 1
        x_hi = ix1 == W - 1
        x_lo = ix1 == 0
        y_hi = iy1 == H - 1
        y_lo = iy1 == 0

        def halfsweep(lo_e, hi_e, want_red, from_pre=False):
            n = hi_e - lo_e + 1
            src = pwb.at[slot] if from_pre else ext
            f = src[lo_e:hi_e + 1]
            pre = pwb[slot, lo_e:hi_e + 1]
            gp = (jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
                  + (k * blk - m + lo_e))
            zs = (gp % 2) == (1 if want_red else 0)
            parity = jnp.logical_xor(yx_odd, zs)
            sel = parity & (gp >= 0) & (gp <= D - 1)
            xpn = _roll(f, W - 1, 2)
            xmn = _roll(f, 1, 2)
            xp = jnp.where(x_hi, pre, xpn)
            xm = jnp.where(x_lo, sxc * pre, xmn)
            yp = jnp.where(y_hi, syc * pre, _roll(f, H - 1, 1))
            ym = jnp.where(y_lo, syc * pre, _roll(f, 1, 1))
            zp = jnp.where(gp == D - 1, szc * pre, src[lo_e + 1:hi_e + 2])
            zm = jnp.where(gp == 0, szc * pre, src[lo_e - 1:hi_e])
            s = (((xp + xm) + yp) + ym + zp) + zm
            upd = (rwb[slot, lo_e:hi_e + 1] + a_c * s) * crec
            ext[lo_e:hi_e + 1] = jnp.where(sel, upd, f)

        for s in range(1, nsw + 1):
            r = 2 * (nsw - s) + 1          # red extension beyond the block
            red_lo, red_hi = m - r, blk - 1 + m + r
            halfsweep(red_lo, red_hi, True,
                      from_pre=(s == 1 and not apply_keep))
            halfsweep(red_lo + 1, red_hi - 1, False)
            if s < nsw:
                # snapshot pre and re-apply keep on the still-active region
                pwb[slot, red_lo:red_hi + 1] = ext[red_lo:red_hi + 1]
                if apply_keep:
                    ext[red_lo:red_hi + 1] = (
                        pwb[slot, red_lo:red_hi + 1]
                        * kw[red_lo:red_hi + 1])
        out[...] = ext[m:blk + m]          # the new pre-keep field

    if apply_keep:
        def kernel(f_hbm, r_hbm, k_hbm, out, pwb, rwb, kwb, ext, sems):
            body(f_hbm, r_hbm, k_hbm, out, pwb, rwb, kwb, ext, sems)
    else:
        def kernel(f_hbm, r_hbm, out, pwb, rwb, ext, sems):
            body(f_hbm, r_hbm, None, out, pwb, rwb, None, ext, sems)
    return kernel


def make_merged_sweep_call(b, a, c, wall_mode, interior, dtype, apply_keep,
                           blk, nsw, interpret, keep_i8=True):
    """Build the merged-window pallas_call: ``call(f, rp[, kp])`` maps the
    packed pre-keep field to the pre-keep field ``nsw`` sweeps later.
    Operand protocol matches make_packed_sweep_call(_t) minus the window
    triplication (f/rhs/keep each passed ONCE, in ANY memory space)."""
    D, H, W = interior
    if D % blk or D < 2 * blk:
        raise ValueError(f"merged kernel needs blk | D and >= 2 blocks; "
                         f"got D={D} blk={blk}")
    nblk = D // blk
    m = 2 * nsw
    E = blk + 2 * m
    kernel = _make_sweep_kernel_m(b, a, c, wall_mode, interior, blk, nsw,
                                  dtype, apply_keep, keep_i8=keep_i8)
    n_in = 3 if apply_keep else 2
    kdt = jnp.int8 if keep_i8 else dtype
    scratch = [pltpu.VMEM((2, E, H, W), dtype),
               pltpu.VMEM((2, E, H, W), dtype)]
    if apply_keep:
        scratch.append(pltpu.VMEM((2, E, H, W), kdt))
    scratch += [pltpu.VMEM((E, H, W), dtype),
                pltpu.SemaphoreType.DMA((2, n_in))]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    it = _itemsize(dtype)
    keep_bytes = (_tiled_bytes(interior, 1 if keep_i8 else it)
                  if apply_keep else 0)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct((D, H, W), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * nsw * int(np.prod(interior)),
            bytes_accessed=int((2 * (1 + 2 * m / blk) + 1)
                               * _tiled_bytes(interior, it)
                               + (1 + 2 * m / blk) * keep_bytes),
            transcendentals=0),
        **kwargs,
    )


def merged_sweep_chain(b, fpre, rp, kp, a, c, nsw_total: int,
                       wall_mode: str, interior, dtype, apply_keep: bool,
                       blk: int, nsw: int, interpret: bool,
                       keep_i8: bool = True):
    """Run ``nsw_total`` packed sweeps on the pre-keep carry ``fpre`` via
    merged-window passes of ``nsw`` sweeps each (plus one remainder-depth
    pass). Shared by the solve entry point below and the streamed
    projections' Poisson stage (project_stream.py)."""
    npass, rem = divmod(nsw_total, nsw)
    if npass:
        call = make_merged_sweep_call(b, a, c, wall_mode, interior,
                                      dtype, apply_keep, blk, nsw,
                                      interpret, keep_i8=keep_i8)

        def sweep(f, _):
            ops = [f, rp] + ([kp] if apply_keep else [])
            return call(*ops), None
        fpre, _ = jax.lax.scan(sweep, fpre, None, length=npass)
    if rem:
        call_r = make_merged_sweep_call(b, a, c, wall_mode, interior,
                                        dtype, apply_keep, blk, rem,
                                        interpret, keep_i8=keep_i8)
        ops = [fpre, rp] + ([kp] if apply_keep else [])
        fpre = call_r(*ops)
    return fpre


@functools.partial(jax.jit, static_argnames=(
    "b", "a", "c", "acc", "wall_mode", "interpret", "empty_scene", "blk",
    "nsw", "keep_i8"))
def pallas_rbgs_solve_mdma(b: int, field, prev, keep, a: float, c: float,
                           acc: int = 15, wall_mode: str = "reference",
                           interpret: bool = False,
                           empty_scene: bool = False,
                           blk: int | None = None, nsw: int | None = None,
                           keep_i8: bool = True):
    """Drop-in for pallas_rbgs_solve_stream(_t): sweep 1 honours the
    caller's padded ghosts (shared sweep-1 kernel), then merged-window
    passes of ``nsw`` sweeps each, then the shared concat reconstruction.
    Bitwise-identical to the BlockSpec kernels and the rbgs oracle."""
    shape = field.shape
    dtype = field.dtype
    apply_keep = not empty_scene
    interior = tuple(n - 2 for n in shape)
    if blk is None or nsw is None:
        picked = mdma_params(shape, dtype, apply_keep)
        if picked is None:
            raise ValueError(f"no merged-window params fit {shape}")
        blk, nsw = picked

    rp = prev[1:-1, 1:-1, 1:-1]
    call1 = make_sweep1_packed_call(b, a, c, wall_mode, shape, dtype, blk,
                                    interpret)
    fpre = call1(field, field, field, rp, rp, rp)
    kdt = jnp.int8 if keep_i8 else dtype
    kp = None if empty_scene else keep[1:-1, 1:-1, 1:-1].astype(kdt)

    if acc > 1:
        fpre = merged_sweep_chain(b, fpre, rp, kp, a, c, acc - 1,
                                  wall_mode, interior, dtype, apply_keep,
                                  blk, nsw, interpret, keep_i8=keep_i8)

    return _rebuild_padded(field, fpre, kp, b, wall_mode, empty_scene)
