"""Packed-interior z-streaming RBGS solve (Pallas TPU) for >VMEM grids.

The padded-layout streaming kernels (tools/linsolve_blocked.py (retired)
and linsolve_temporal) are
VPU-bound, not HBM-bound: a 130-lane padded row tiles to 256 lanes (2x
waste at 256x128x128; 384 for 258 at 256^3), and the measured 115 ns/cell-
sweep sits ~3x above the HBM floor. This kernel streams the *interior* of
the field — whose W is a lane-tile multiple at all the power-of-two grids —
so every VPU op and every DMA moves exactly-tiled data.

Ghost handling reuses the resident packed kernel's algebra
(linsolve_pallas._make_packed_kernel): after any full sweep, every ghost
face equals ``sign * fpre`` at the edge positions, where ``fpre`` is the
sweep's *pre-keep* field (setBounds faces-then-keep, ops/bounds.py:54-61;
the ghost shell's own keep is 1 by construction, masks.py). The streamed
carry is therefore ``fpre`` itself: each sweep kernel rebuilds the
post-keep base as ``fpre * keep`` in VMEM, splices ghost reads with
``pltpu.roll`` + iota-edge ``where`` selects whose selected operand is
``sign * fpre`` *at the same position* (no slicing, no 2-D arrays), and
emits the new pre-keep field. Sweep 1 — the only sweep that must honour
the caller's arbitrary padded ghost faces — runs a dedicated kernel
(make_sweep1_packed_call) that streams PADDED field windows in and emits
the packed pre-keep field fpre_1 directly (same numerics as
tools/linsolve_blocked.py's sweep; the padded output write and the separate interior
slice of the former pre-solve both disappear — tools/exp_fixed.py).

Cross-block z halo: the field enters as three clamped z-block windows and
the red half is recomputed one row outside the block (the black half of
edge rows needs red-updated neighbors), as in tools/linsolve_blocked.py. Numerics
are identical to the rbgs oracle and every other solve kernel: same update
expression and operand order, red (1-based coord sum even) before black,
faces-then-keep per sweep (reference linearSolver + setBounds,
simulation.cpp:251-273/:183-246).
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


HB_STREAM = 2   # halo-stream rows: the kernels read only 1-2 rows of each
                # lo/hi window, so 2 rows is the traffic floor (r4; was 8 —
                # 8-row windows cost 2 extra full row-units of HBM per sweep
                # at blk=8 and bloated scoped VMEM for nothing)


def _stream_vmem_bytes(blk: int, hb: int, shape, dtype, apply_keep: bool,
                       keep_i8: bool) -> int:
    """Scoped-VMEM byte model of one packed-sweep kernel invocation,
    fitted to the compiler's meter on two chip-measured anchors:
    512x256x256/blk=8/hb=8/keep-f32 measured 97.3 MiB (model 102 — rejects
    over the 96 MiB meter, correctly) and 256^3/blk=16/hb=8/keep-f32
    compiles (model 75). Components: double-buffered in-streams
    (lo+mid+hi = blk+2hb rows per operand), double-buffered out, the two
    (blk+4)-row scratch buffers, and ~2 rows-worth of live halfsweep
    temporaries per block row."""
    D, H, W = (n - 2 for n in shape)
    it = _itemsize(dtype)
    rb = _tiled_bytes((1, H, W), it)
    rk = _tiled_bytes((1, H, W), 1) if keep_i8 else rb
    wrows = blk + 2 * hb
    streams = 2 * wrows * (2 * rb + (rk if apply_keep else 0))
    out = 2 * blk * rb
    scratch = 2 * (blk + 4) * rb
    temps = 2 * (blk + 2) * rb
    return streams + out + scratch + temps


def _pick_blk(shape, dtype, apply_keep: bool, hb: int = HB_STREAM,
              keep_i8: bool = True):
    """Packed z-block choice, or None. ``shape`` is the padded shape.

    blk is capped at 16: blk >= 24 faulted at runtime even at small
    footprints in r2 (a Mosaic limit on the ~blk+4-row temporaries, not
    modelable as bytes). Within that cap the byte model above decides;
    it reproduces every r3 empirical gate (512-wide keep-f32/hb=8 blk=8
    rejected -> blk=4; everything else blk=16 or 8) and with the r4
    hb=2 + int8-keep defaults it re-admits blk=8 at 512-wide keep rows
    and blk=16 at 512-wide empty rows."""
    D, H, W = (n - 2 for n in shape)
    for blk in (16, 8, 4):
        if blk > D or blk % hb:
            continue
        if _stream_vmem_bytes(blk, hb, shape, dtype, apply_keep,
                              keep_i8) <= VMEM_BUDGET_BYTES:
            return blk
    return None


def pallas_stream_solve_supported(shape, dtype=jnp.float32,
                                  apply_keep: bool = True) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 6:
        return False
    return _pick_blk(shape, dtype, apply_keep) is not None


def _solve_signs(b: int, wall_mode: str):
    """Face mirror signs of set_bounds for field class ``b``
    (ops/bounds.py; x+ is always the outflow copy, simulation.cpp:191)."""
    if wall_mode == "noslip" and b in (1, 2, 3):
        return (-1.0 if b == 1 else 1.0), -1.0, -1.0
    return ((-1.0 if b == 1 else 1.0),
            (-1.0 if b == 2 else 1.0),
            (-1.0 if b == 3 else 1.0))


def _rebuild_padded(field, fpre, kp, b, wall_mode, empty_scene):
    """Padded solve output from the final pre-keep interior ``fpre``:
    interior = fpre * keep, faces = set_bounds' signed mirrors of the
    pre-keep edges (x+ = outflow copy), ghost edges/corners passed through
    from ``field`` untouched (set_bounds never writes them — ops/bounds.py).

    Built with nested concats so XLA emits ONE fused output pass: the
    previous ``.at[].set`` chain materialised a full-array copy per face
    write — 2.17 ms per solve at 256^3, of which the six face writes alone
    were ~1.6 ms (tools/exp_fixed.py; same pathology the concat fallback in
    models/windtunnel._pad_bounds_tail already solved)."""
    dt = field.dtype
    sx, sy, sz = (jnp.asarray(s, dt) for s in _solve_signs(b, wall_mode))
    if not empty_scene and kp.dtype != dt:
        kp = kp.astype(dt)   # int8-streamed keep: exact 0/1 either way
    core = fpre if empty_scene else fpre * kp
    # middle z rows: x faces, then y faces with the ghost-edge columns
    lvl1 = jnp.concatenate([sx * fpre[:, :, :1], core, fpre[:, :, -1:]],
                           axis=2)                        # (D, H, W2)
    fy0 = jnp.concatenate([field[1:-1, :1, :1], sy * fpre[:, :1, :],
                           field[1:-1, :1, -1:]], axis=2)  # (D, 1, W2)
    fy1 = jnp.concatenate([field[1:-1, -1:, :1], sy * fpre[:, -1:, :],
                           field[1:-1, -1:, -1:]], axis=2)
    lvl2 = jnp.concatenate([fy0, lvl1, fy1], axis=1)      # (D, H2, W2)
    # z ghost planes: interior = sz * fpre edge plane, ring from ``field``
    fz0i = jnp.concatenate([field[:1, 1:-1, :1], sz * fpre[:1],
                            field[:1, 1:-1, -1:]], axis=2)
    fz0 = jnp.concatenate([field[:1, :1, :], fz0i, field[:1, -1:, :]],
                          axis=1)                         # (1, H2, W2)
    fz1i = jnp.concatenate([field[-1:, 1:-1, :1], sz * fpre[-1:],
                            field[-1:, 1:-1, -1:]], axis=2)
    fz1 = jnp.concatenate([field[-1:, :1, :], fz1i, field[-1:, -1:, :]],
                          axis=1)
    return jnp.concatenate([fz0, lvl2, fz1], axis=0)


def _make_sweep_kernel(b: int, a: float, c: float, wall_mode: str,
                       interior, blk: int, dtype, apply_keep: bool,
                       xshift: str = "roll", hb: int = HB_STREAM,
                       keep_i8: bool = True):
    D, H, W = interior
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    sx, sy, sz = _solve_signs(b, wall_mode)

    def _k(x):
        # keep streams as int8 (exact 0/1 -> the f32 multiply is bitwise
        # unchanged) so mask traffic costs 1 byte/cell, not 4 (VERDICT r3 #2)
        return x.astype(dtype) if keep_i8 else x

    def body(plo, pmid, phi, rlo, rmid, rhi, klo, kmid, khi, out, ext, pw):
        k = pl.program_id(0)
        # ext/pw row e <-> packed row  p = k*blk - 2 + e
        pw[0:2] = plo[hb - 2:]
        pw[2:blk + 2] = pmid[...]
        pw[blk + 2:] = phi[:2]
        # post-keep base of this sweep
        if apply_keep:
            ext[0:2] = pw[0:2] * _k(klo[hb - 2:])
            ext[2:blk + 2] = pw[2:blk + 2] * _k(kmid[...])
            ext[blk + 2:] = pw[blk + 2:] * _k(khi[:2])
        else:
            ext[...] = pw[...]
        rhs = jnp.concatenate([rlo[hb - 1:], rmid[...], rhi[:1]], axis=0)

        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        sxc = jnp.asarray(sx, dtype)
        syc = jnp.asarray(sy, dtype)
        szc = jnp.asarray(sz, dtype)

        def halfsweep(lo_e, hi_e, want_red):
            """Update ext rows [lo_e, hi_e] (packed-row masked)."""
            n = hi_e - lo_e + 1
            f = ext[lo_e:hi_e + 1]
            pre = pw[lo_e:hi_e + 1]
            iz = jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 0)
            iy = jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 1)
            ix = jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 2)
            gp = iz + (k * blk - 2 + lo_e)          # packed z row
            # red = 1-based padded coord sum even: (gp+1)+(iy+1)+(ix+1)
            parity = ((gp + iy + ix) % 2) == 1
            if not want_red:
                parity = jnp.logical_not(parity)
            sel = parity & (gp >= 0) & (gp <= D - 1)
            # ghost splices select sign * fpre at the edge position itself
            if xshift == "concat":
                # W > 128 spans lane tiles; probe whether a static
                # slice-concat shift beats the cross-tile dynamic rotate
                xpn = jnp.concatenate([f[:, :, 1:], f[:, :, -1:]], axis=2)
                xmn = jnp.concatenate([f[:, :, :1], f[:, :, :-1]], axis=2)
            else:
                xpn = _roll(f, W - 1, 2)
                xmn = _roll(f, 1, 2)
            xp = jnp.where(ix == W - 1, pre, xpn)
            xm = jnp.where(ix == 0, sxc * pre, xmn)
            yp = jnp.where(iy == H - 1, syc * pre, _roll(f, H - 1, 1))
            ym = jnp.where(iy == 0, syc * pre, _roll(f, 1, 1))
            zp = jnp.where(gp == D - 1, szc * pre, ext[lo_e + 1:hi_e + 2])
            zm = jnp.where(gp == 0, szc * pre, ext[lo_e - 1:hi_e])
            s = (((xp + xm) + yp) + ym + zp) + zm
            upd = (rhs[lo_e - 1:hi_e] + a_c * s) * crec
            ext[lo_e:hi_e + 1] = jnp.where(sel, upd, f)

        halfsweep(1, blk + 2, True)     # red on block rows +-1
        halfsweep(2, blk + 1, False)    # black on block rows
        out[...] = ext[2:blk + 2]       # the new pre-keep field

    if apply_keep:
        def kernel(plo, pmid, phi, rlo, rmid, rhi, klo, kmid, khi,
                   out, ext, pw):
            body(plo, pmid, phi, rlo, rmid, rhi, klo, kmid, khi,
                 out, ext, pw)
    else:
        def kernel(plo, pmid, phi, rlo, rmid, rhi, out, ext, pw):
            body(plo, pmid, phi, rlo, rmid, rhi, None, None, None,
                 out, ext, pw)
    return kernel


def _make_sweep1_kernel(b: int, a: float, c: float, shape, blk: int, dtype):
    """Sweep-1 kernel: PADDED field windows in (the only sweep that must
    honour the caller's true ghost faces), packed rhs windows in, PACKED
    pre-keep result out. The update expression, operand order and red/black
    phasing match tools/linsolve_blocked.py exactly; no face writes and no keep —
    the output is the pre-keep interior the packed sweeps carry
    (simulation.cpp:251-273 sweep 1)."""
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    E = blk + 2
    # halo windows: the kernel reads 1 row of lo and 3 of hi, so 4-row
    # windows (not 8) are the floor given the hb | blk grid constraint
    hb = min(4, blk)

    def kernel(flo, fmid, fhi, rlo, rmid, rhi, out, ext):
        k = pl.program_id(0)
        # ext row e <-> padded row gz = k*blk - 1 + e  (e in [0, blk+3])
        ext[0:1] = flo[hb - 1:]
        ext[1:blk + 1] = fmid[...]
        ext[blk + 1:] = fhi[:3]
        # rhs rows align with update rows e in [1, blk+2]
        rhs = jnp.concatenate([rlo[hb - 1:], rmid[...], rhi[:1]], axis=0)

        gz = jax.lax.broadcasted_iota(jnp.int32, (E, H, W), 0) + k * blk
        gy = jax.lax.broadcasted_iota(jnp.int32, (E, H, W), 1) + 1
        gx = jax.lax.broadcasted_iota(jnp.int32, (E, H, W), 2) + 1
        interior = (gz >= 1) & (gz <= D)
        parity = ((gz + gy + gx) % 2) == 0                 # masks.red_i
        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)

        def halfsweep(lo_e, hi_e, sel):
            f = ext[lo_e - 1:hi_e + 2]                     # rows +-1 halo
            s = (
                (((f[1:-1, 1:-1, 2:] + f[1:-1, 1:-1, :-2])
                  + f[1:-1, 2:, 1:-1]) + f[1:-1, :-2, 1:-1])
                + f[2:, 1:-1, 1:-1]
            ) + f[:-2, 1:-1, 1:-1]
            upd = (rhs[lo_e - 1:hi_e] + a_c * s) * crec
            ext[lo_e:hi_e + 1, 1:-1, 1:-1] = jnp.where(
                sel[lo_e - 1:hi_e], upd, f[1:-1, 1:-1, 1:-1])

        halfsweep(1, blk + 2, parity & interior)           # red on rows +-1
        halfsweep(2, blk + 1, jnp.logical_not(parity) & interior)
        out[...] = ext[2:blk + 2, 1:-1, 1:-1]

    return kernel


def make_sweep1_packed_call(b, a, c, wall_mode, shape, dtype, blk,
                            interpret):
    """Build the sweep-1 pallas_call: ``call(f, f, f, rp, rp, rp)`` maps the
    PADDED field (true ghosts) + packed rhs to the packed pre-keep field
    after one sweep. Replaces the retired blocked kernel(acc=1) + the fpre interior
    slice: the padded output write (1.5x lane-tile bytes) and the separate
    XLA slice pass both disappear (~0.9 ms of the 2.3 ms per-solve fixed
    cost at 256^3 — tools/exp_fixed.py). ``wall_mode`` is unused (no face
    writes) but kept for signature symmetry.

    ``blk`` is a hint: the kernel needs 3 rows from its hi window (hb >= 3)
    and hb | blk, so caller blocks that violate either (tests use 2) snap
    to the nearest valid size — sweep 1 runs its own grid, independent of
    the sweep loop's."""
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2

    it = _itemsize(dtype)
    rbp = _tiled_bytes((1,) + shape[1:], it)   # padded row
    rbi = _tiled_bytes((1, H, W), it)          # packed row

    def _ok(cand):
        h = min(4, cand)
        if not (h >= 3 and cand % h == 0 and cand <= D):
            return False
        # scoped-VMEM model, fitted to the chip: scratch (blk+4 padded
        # rows) + double-buffered field/rhs windows + out + ~4 live
        # halfsweep temporaries. blk=8 at 512-wide rows hits 103M on the
        # compiler's meter (96M limit); this model says 101M and rejects
        # it; the working 256^3 blk=16 scores 88M.
        need = ((cand + 4) * rbp + 2 * (cand + 2 * h) * (rbp + rbi)
                + 2 * cand * rbi + 4 * (cand + 2) * rbp)
        return need <= VMEM_BUDGET_BYTES

    if not _ok(blk):
        for cand in (16, 8, 4, 3):
            if _ok(cand):
                blk = cand
                break
        else:
            raise ValueError(f"no sweep-1 block fits D={D} rows {H}x{W}")
    interior = (D, H, W)
    nblk = -(-D // blk)
    hb = min(4, blk)   # must match _make_sweep1_kernel's hb
    r = blk // hb
    nhb = -(-D // hb)
    nhb_pad = -(-D2 // hb)
    kernel = _make_sweep1_kernel(b, a, c, shape, blk, dtype)
    fmid = pl.BlockSpec((blk,) + shape[1:], lambda k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    flo = pl.BlockSpec((hb,) + shape[1:],
                       lambda k: (jnp.maximum(k * r - 1, 0), 0, 0),
                       memory_space=pltpu.VMEM)
    fhi = pl.BlockSpec((hb,) + shape[1:],
                       lambda k: (jnp.minimum(k * r + r, nhb_pad - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    rmid = pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    rlo = pl.BlockSpec((hb, H, W),
                       lambda k: (jnp.maximum(k * r - 1, 0), 0, 0),
                       memory_space=pltpu.VMEM)
    rhi = pl.BlockSpec((hb, H, W),
                       lambda k: (jnp.minimum(k * r + r, nhb - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct(interior, dtype),
        in_specs=[flo, fmid, fhi, rlo, rmid, rhi],
        out_specs=rmid,
        scratch_shapes=[pltpu.VMEM((blk + 4,) + shape[1:], dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * int(np.prod(interior)),
            bytes_accessed=int(2.5 * _tiled_bytes(shape, _itemsize(dtype))
                               + 2 * _tiled_bytes(interior,
                                                  _itemsize(dtype))),
            transcendentals=0),
        **kwargs,
    )


def make_packed_sweep_call(b, a, c, wall_mode, interior, dtype, apply_keep,
                           blk, interpret, xshift="roll", hb=None,
                           keep_i8=True):
    """Build the per-sweep pallas_call: ``call(f, f, f, rp, rp, rp[, kp, kp,
    kp])`` maps the pre-keep field to the next sweep's pre-keep field.
    Shared by the solve wrapper below and the streamed projection
    (kernels/project_stream.py). With ``keep_i8`` the kp operands are int8.

    lo/hi halo streams use hb-row blocks (hb | blk): the kernel reads only
    1-2 rows of each, so hb=2 (HB_STREAM) is the traffic floor — at blk=8
    the per-sweep HBM drops from 7 to 4 row-units (f 1.5 + rhs 1.5 + out 1)
    and at blk=16 from 5 to 3.5; the r3 hb=8 windows were pure waste."""
    D, H, W = interior
    nblk = -(-D // blk)
    if hb is None:
        # smallest divisor of blk that is >= 2 (the kernel reads 2 rows of
        # each halo window, and the grid maps need hb | blk) — 2 for every
        # production block, 3/blk only for odd test blocks
        hb = next(h for h in range(HB_STREAM, blk + 1) if blk % h == 0)
    if blk % hb or hb < 2:
        raise ValueError(f"hb={hb} must divide blk={blk} and be >= 2")
    kernel = _make_sweep_kernel(b, a, c, wall_mode, interior, blk,
                                dtype, apply_keep, xshift=xshift, hb=hb,
                                keep_i8=keep_i8)
    r = blk // hb
    nhb = -(-D // hb)
    mid = pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                       memory_space=pltpu.VMEM)
    lo = pl.BlockSpec((hb, H, W),
                      lambda k: (jnp.maximum(k * r - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((hb, H, W),
                      lambda k: (jnp.minimum(k * r + r, nhb - 1), 0, 0),
                      memory_space=pltpu.VMEM)
    n_stream = 3 if apply_keep else 2
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
        in_specs=[lo, mid, hi] * n_stream,
        out_specs=mid,
        scratch_shapes=[pltpu.VMEM((blk + 4, H, W), dtype)
                        for _ in range(2)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * int(np.prod(interior)),
            bytes_accessed=int((3 + 4 * hb / blk)
                               * _tiled_bytes(interior, it)
                               + (1 + 2 * hb / blk) * keep_bytes),
            transcendentals=0),
        **kwargs,
    )


@functools.partial(jax.jit, static_argnames=(
    "b", "a", "c", "acc", "wall_mode", "interpret", "empty_scene", "blk",
    "xshift", "keep_i8"))
def pallas_rbgs_solve_stream(b: int, field, prev, keep, a: float, c: float,
                             acc: int = 15, wall_mode: str = "reference",
                             interpret: bool = False,
                             empty_scene: bool = False,
                             blk: int | None = None, xshift: str = "roll",
                             keep_i8: bool = True):
    """Drop-in equivalent of ``pallas_rbgs_solve_blocked`` on packed-interior
    streamed data. ``blk`` overrides the auto-sized z-block (tests).
    ``keep_i8`` streams the keep mask as int8 (1 byte/cell vs 4; the mask is
    exact 0/1 so the f32 multiply is bitwise unchanged — VERDICT r3 #2).

    Requires ``keep == 1`` on the ghost shell (true for every mask from
    ``build_masks``; see the resident packed kernel's contract)."""
    shape = field.shape
    dtype = field.dtype
    apply_keep = not empty_scene
    interior = tuple(n - 2 for n in shape)
    D, H, W = interior
    if blk is None:
        blk = _pick_blk(shape, dtype, apply_keep, keep_i8=keep_i8)
        if blk is None:
            raise ValueError(f"no stream-solve block fits {shape}")
    if blk < 2:
        raise ValueError("blk must be >= 2")
    nblk = -(-D // blk)

    # sweep 1 reads the caller's true padded ghosts, WITHOUT the keep
    # multiply: its packed output is exactly the pre-keep field fpre_1
    rp = prev[1:-1, 1:-1, 1:-1]
    call1 = make_sweep1_packed_call(b, a, c, wall_mode, shape, dtype, blk,
                                    interpret)
    fpre = call1(field, field, field, rp, rp, rp)
    kdt = jnp.int8 if keep_i8 else dtype
    kp = None if empty_scene else keep[1:-1, 1:-1, 1:-1].astype(kdt)

    if acc > 1:
        call = make_packed_sweep_call(b, a, c, wall_mode, interior, dtype,
                                      apply_keep, blk, interpret,
                                      xshift=xshift, keep_i8=keep_i8)

        def sweep(f, _):
            ops = [f, f, f, rp, rp, rp]
            if apply_keep:
                ops += [kp, kp, kp]
            return call(*ops), None

        fpre, _ = jax.lax.scan(sweep, fpre, None, length=acc - 1)

    return _rebuild_padded(field, fpre, kp, b, wall_mode, empty_scene)


# ---------------------------------------------------------------------------
# temporally-blocked variant: ksw sweeps per HBM pass (trapezoidal tiling)
# ---------------------------------------------------------------------------

def _make_sweep_kernel_t(b: int, a: float, c: float, wall_mode: str,
                         interior, blk: int, ksw: int, dtype,
                         apply_keep: bool, keep_i8: bool = True):
    """ksw full sweeps per streaming pass on the packed pre-keep carry.

    The z-block streaming sweep is HBM-bound at the platform's ~350-430
    GB/s pallas-streaming ceiling (tools/exp_hbm.py), so per-sweep HBM must
    shrink: each pass reads the windows once and emits ksw sweeps, with the
    red/black working region shrinking 1 row per half-sweep (the wavefront
    dependency of RBGS — kernels/linsolve_temporal.py's trapezoid, here on
    the packed ghost algebra of _make_sweep_kernel). Numerics identical to
    ksw sequential 1-sweep passes: sweep s's region is exactly contained in
    sweep s-1's valid region, and ghost/keep handling matches per sweep.

    Geometry: m = 2*ksw; scratch row e <-> packed row p = k*blk - m + e;
    ext/pw span [block-m, block+blk+m-1] (E = blk + 2m rows). Requires
    hb >= m with the lo/hi halo streams exactly covering m rows each side
    (hb = m, r = blk // hb with hb | blk)."""
    D, H, W = interior
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    sx, sy, sz = _solve_signs(b, wall_mode)
    m = 2 * ksw
    E = blk + 2 * m

    def body(plo, pmid, phi, rlo, rmid, rhi, klo, kmid, khi, out, ext, pw):
        k = pl.program_id(0)
        # scratch row e <-> packed row p = k*blk - m + e
        pw[0:m] = plo[...]
        pw[m:blk + m] = pmid[...]
        pw[blk + m:] = phi[...]
        if apply_keep:
            # int8-streamed keep converts on load (exact 0/1 -> the f32
            # multiplies are bitwise unchanged; 1 byte/cell of mask traffic)
            if keep_i8:
                kw_lo = klo[...].astype(dtype)
                kw_mid = kmid[...].astype(dtype)
                kw_hi = khi[...].astype(dtype)
            else:
                kw_lo, kw_mid, kw_hi = klo[...], kmid[...], khi[...]

        def apply_k(e0, e1):
            """ext[e0:e1] = pw[e0:e1] * keep(rows), piecewise over the
            three window sources."""
            if not apply_keep:
                ext[e0:e1] = pw[e0:e1]
                return
            # rows [0, m) from klo, [m, blk+m) from kmid, rest from khi
            a0, a1 = e0, min(e1, m)
            if a0 < a1:
                ext[a0:a1] = pw[a0:a1] * kw_lo[a0:a1]
            b0, b1 = max(e0, m), min(e1, blk + m)
            if b0 < b1:
                ext[b0:b1] = pw[b0:b1] * kw_mid[b0 - m:b1 - m]
            c0, c1 = max(e0, blk + m), e1
            if c0 < c1:
                ext[c0:c1] = pw[c0:c1] * kw_hi[c0 - blk - m:c1 - blk - m]

        apply_k(0, E)
        rhs = jnp.concatenate([rlo[...], rmid[...], rhi[...]], axis=0)

        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        sxc = jnp.asarray(sx, dtype)
        syc = jnp.asarray(sy, dtype)
        szc = jnp.asarray(sz, dtype)

        def halfsweep(lo_e, hi_e, want_red):
            n = hi_e - lo_e + 1
            f = ext[lo_e:hi_e + 1]
            pre = pw[lo_e:hi_e + 1]
            iz = jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 0)
            iy = jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 1)
            ix = jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 2)
            gp = iz + (k * blk - m + lo_e)
            parity = ((gp + iy + ix) % 2) == 1
            if not want_red:
                parity = jnp.logical_not(parity)
            sel = parity & (gp >= 0) & (gp <= D - 1)
            xpn = _roll(f, W - 1, 2)
            xmn = _roll(f, 1, 2)
            xp = jnp.where(ix == W - 1, pre, xpn)
            xm = jnp.where(ix == 0, sxc * pre, xmn)
            yp = jnp.where(iy == H - 1, syc * pre, _roll(f, H - 1, 1))
            ym = jnp.where(iy == 0, syc * pre, _roll(f, 1, 1))
            zp = jnp.where(gp == D - 1, szc * pre, ext[lo_e + 1:hi_e + 2])
            zm = jnp.where(gp == 0, szc * pre, ext[lo_e - 1:hi_e])
            s = (((xp + xm) + yp) + ym + zp) + zm
            upd = (rhs[lo_e:hi_e + 1] + a_c * s) * crec
            ext[lo_e:hi_e + 1] = jnp.where(sel, upd, f)

        for s in range(1, ksw + 1):
            r = 2 * (ksw - s) + 1          # red extension beyond the block
            red_lo, red_hi = m - r, blk - 1 + m + r
            halfsweep(red_lo, red_hi, True)
            halfsweep(red_lo + 1, red_hi - 1, False)
            if s < ksw:
                # snapshot pre and re-apply keep on the still-active region
                e0, e1 = red_lo + 1 - 1, red_hi - 1 + 1 + 1  # region +-0
                pw[red_lo:red_hi + 1] = ext[red_lo:red_hi + 1]
                apply_k(red_lo, red_hi + 1)
        out[...] = ext[m:blk + m]          # the new pre-keep field

    if apply_keep:
        def kernel(plo, pmid, phi, rlo, rmid, rhi, klo, kmid, khi,
                   out, ext, pw):
            body(plo, pmid, phi, rlo, rmid, rhi, klo, kmid, khi,
                 out, ext, pw)
    else:
        def kernel(plo, pmid, phi, rlo, rmid, rhi, out, ext, pw):
            body(plo, pmid, phi, rlo, rmid, rhi, None, None, None,
                 out, ext, pw)
    return kernel


def _pick_blk_t(shape, dtype, apply_keep: bool, ksw: int):
    """Temporal block choice: E-row ext/pw scratch + m-row halo streams.
    Budget mirrors _pick_blk's empirical 22-unit calibration, scaled by the
    larger windows."""
    D, H, W = (n - 2 for n in shape)
    it = _itemsize(dtype)
    rb = _tiled_bytes((1, H, W), it)
    m = 2 * ksw
    for blk in (16, 8):
        if blk > D or blk % m:
            continue
        E = blk + 2 * m
        nops = 3 if apply_keep else 2
        need = (2 * nops * (blk + 2 * m) * rb    # in streams, dbuf
                + 2 * blk * rb                   # out stream, dbuf
                + 2 * E * rb                     # ext + pw scratch
                + 8 * E * rb)                    # halfsweep temporaries
        if need <= int(0.9 * VMEM_BUDGET_BYTES):
            return blk
    return None


# Calibrated on-chip (tools/exp_temporal3.py, one v5e): at 256^3 the
# ksw=2/blk=16 temporal pass runs 620 us/sweep vs 837 for the 1-sweep
# stream (HBM-bound at the ~370 GB/s pallas-streaming ceiling); at
# 256x128x128 it is neutral (148 vs 144), and higher ksw or other blocks
# lose (ksw=4: 835, ksw=3: 768, blk=24: 674, blk=32: VMEM compile fail).
TEMPORAL_MIN_CELLS = 8 * 1024 * 1024


def temporal_stream_preferred(shape, dtype=jnp.float32,
                              apply_keep: bool = True):
    """(blk, ksw) when the temporal kernel is the measured winner for this
    shape, else None."""
    D, H, W = (n - 2 for n in shape)
    if D * H * W < TEMPORAL_MIN_CELLS or D % 16:
        return None
    if not pallas_stream_solve_supported(shape, dtype, apply_keep):
        return None
    # the calibrated (16, 2) choice must also FIT. Calibrated by row size,
    # not the byte model (_pick_blk_t's model rejects 256^3/blk=16, which
    # runs and wins on the chip): the largest validated row is 256^3's
    # 256x256 f32 plane; 512-wide rows (2x the bytes) blow VMEM in the
    # E-row scratch + halfsweep temporaries and must take the 1-sweep
    # stream kernel instead.
    D, H, W = (n - 2 for n in shape)
    if _tiled_bytes((1, H, W), _itemsize(dtype)) > 256 * 256 * 4:
        return None
    return (16, 2)


def make_packed_sweep_call_t(b, a, c, wall_mode, interior, dtype,
                             apply_keep, blk, nsw, interpret,
                             keep_i8=True):
    """Per-pass pallas_call running ``nsw`` sweeps (the temporal variant of
    make_packed_sweep_call, same operand protocol; kp operands are int8
    under ``keep_i8``). Shared with the streamed projection's Poisson
    loop."""
    D, H, W = interior
    nblk = -(-D // blk)
    mm = 2 * nsw
    kernel = _make_sweep_kernel_t(b, a, c, wall_mode, interior, blk,
                                  nsw, dtype, apply_keep, keep_i8=keep_i8)
    nmb = -(-D // mm)
    mid = pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                       memory_space=pltpu.VMEM)
    rr = blk // mm
    lo = pl.BlockSpec((mm, H, W),
                      lambda k: (jnp.maximum(k * rr - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((mm, H, W),
                      lambda k: (jnp.minimum(k * rr + rr, nmb - 1),
                                 0, 0),
                      memory_space=pltpu.VMEM)
    n_stream = 3 if apply_keep else 2
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    E = blk + 2 * mm
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct((D, H, W), dtype),
        in_specs=[lo, mid, hi] * n_stream,
        out_specs=mid,
        scratch_shapes=[pltpu.VMEM((E, H, W), dtype) for _ in range(2)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * nsw * int(np.prod(interior)),
            bytes_accessed=(3 + 4 * mm // blk) * _tiled_bytes(
                interior, _itemsize(dtype)),
            transcendentals=0),
        **kwargs,
    )


@functools.partial(jax.jit, static_argnames=(
    "b", "a", "c", "acc", "wall_mode", "interpret", "empty_scene", "blk",
    "ksw", "keep_i8"))
def pallas_rbgs_solve_stream_t(b: int, field, prev, keep, a: float, c: float,
                               acc: int = 15, wall_mode: str = "reference",
                               interpret: bool = False,
                               empty_scene: bool = False,
                               blk: int | None = None, ksw: int = 4,
                               keep_i8: bool = True):
    """Temporally-blocked drop-in for pallas_rbgs_solve_stream: ksw sweeps
    per streaming pass (plus a remainder pass)."""
    shape = field.shape
    dtype = field.dtype
    apply_keep = not empty_scene
    interior = tuple(n - 2 for n in shape)
    D, H, W = interior
    if blk is None:
        blk = _pick_blk_t(shape, dtype, apply_keep, ksw)
        if blk is None:
            raise ValueError(f"no temporal-stream block fits {shape}")
    m = 2 * ksw
    if blk % m:
        raise ValueError(f"blk {blk} must be a multiple of m={m}")

    rp = prev[1:-1, 1:-1, 1:-1]
    call1 = make_sweep1_packed_call(b, a, c, wall_mode, shape, dtype, blk,
                                    interpret)
    fpre = call1(field, field, field, rp, rp, rp)
    kdt = jnp.int8 if keep_i8 else dtype
    kp = None if empty_scene else keep[1:-1, 1:-1, 1:-1].astype(kdt)

    nsw_left = acc - 1
    if nsw_left > 0:
        npass, rem = divmod(nsw_left, ksw)
        if npass:
            call = make_packed_sweep_call_t(b, a, c, wall_mode, interior,
                                            dtype, apply_keep, blk, ksw,
                                            interpret, keep_i8=keep_i8)

            def sweep(f, _):
                ops = [f, f, f, rp, rp, rp]
                if apply_keep:
                    ops += [kp, kp, kp]
                return call(*ops), None
            fpre, _ = jax.lax.scan(sweep, fpre, None, length=npass)
        if rem:
            # remainder sweeps through the 1-sweep kernel (same numerics)
            call1 = make_packed_sweep_call(b, a, c, wall_mode, interior,
                                           dtype, apply_keep,
                                           _pick_blk(shape, dtype,
                                                     apply_keep,
                                                     keep_i8=keep_i8) or blk,
                                           interpret, keep_i8=keep_i8)

            def sweep1(f, _):
                ops = [f, f, f, rp, rp, rp]
                if apply_keep:
                    ops += [kp, kp, kp]
                return call1(*ops), None
            fpre, _ = jax.lax.scan(sweep1, fpre, None, length=rem)

    return _rebuild_padded(field, fpre, kp, b, wall_mode, empty_scene)
