"""Color-packed (x-checkerboard) red-black GS solve (Pallas TPU).

FALSIFIED EXPERIMENT — lives in tools/, not the package (VERDICT r3 #8):
measured 3.5x SLOWER than the packed resident kernel at 256x64x64 and
neutral at 256^3 (NOTES.md "Falsified: color-packed (x-checkerboard)
sweeps"). Kept because the packing algebra is reusable and the parity test
(tests/test_kernels.py::test_cpack_solve_matches_packed_interpret) guards
the shared ghost-splice expressions it exercises.

The resident/streamed packed kernels compute every half-sweep over the FULL
grid and discard half the lanes with the red/black select — ~2x more VPU
work than the useful update — and at W=256 their ±1 lane shifts cross two
128-lane tiles (the measured 256^3 wall, NOTES.md). This kernel stores the
two colors as separate interleave-packed arrays

    R[z, y, i] = f[z, y, 2*i + pr(z, y)],      pr = (1 + z + y) % 2
    B[z, y, i] = f[z, y, 2*i + 1 - pr(z, y)]   (0-based interior coords,
                                                red = (z+y+x) % 2 == 1)

so each half-sweep updates a whole (D, H, W/2) array with no color select,
and at W = 256 the half arrays are exact single-tile 128-lane rows. The
checkerboard makes every y/z neighbor of a red cell the *lane-aligned*
black cell (row parity pr flips with y and z), and the two x neighbors are
the aligned black lane plus one ±1-lane roll whose direction alternates
with row parity:

    red  xsum: pr=0 -> B[i] + B[i-1];  pr=1 -> B[i] + B[i+1]
    black xsum: pr=0 -> R[i] + R[i+1]; pr=1 -> R[i] + R[i-1]

Ghost reads (after any full sweep every ghost face equals ``sign * fpre``
at the edge position, fpre = pre-keep snapshot — kernels/linsolve_pallas.py
ghost algebra) stay *within the same color half*: the mirror source of an
edge cell is the cell itself (y/z faces) or the same-parity edge lane
(x faces), so each fix is an aligned iota-edge where on Rpre/Bpre.

Neighbor sum order matches the packed kernel exactly
((((xp + xm) + yp) + ym + zp) + zm), so results are bitwise-equal to
``pallas_rbgs_solve(packed=True)`` / the rbgs jnp oracle (asserted in
tests/test_kernels.py and on-chip by tools/exp_cpack.py).

Sweep 1 must honour the caller's arbitrary input ghosts; it runs in the
existing padded kernel (acc=1) outside, and the pre-keep edge values sweeps
2+ need are recovered from that output's ghost faces (ghost = sign * pre =>
pre = sign * ghost). Reference semantics: linearSolver + setBounds,
simulation.cpp:251-273/:183-246.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    VMEM_BUDGET_BYTES, _itemsize, _roll, _tiled_bytes, pallas_rbgs_solve)


# ---------------------------------------------------------------------------
# host-side (XLA) packing helpers
# ---------------------------------------------------------------------------

def _pr2d(D: int, H: int):
    """(D, H, 1) int32 row parity: red cells of row (z, y) sit at
    x % 2 == pr."""
    iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, 1), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, 1), 1)
    return (1 + iz + iy) % 2


def pack_colors(f_i: jnp.ndarray):
    """(D, H, W) interior -> (R, B) halves, W even."""
    D, H, W = f_i.shape
    pr = _pr2d(D, H)
    ev, od = f_i[:, :, 0::2], f_i[:, :, 1::2]
    R = jnp.where(pr == 0, ev, od)
    B = jnp.where(pr == 0, od, ev)
    return R, B


def unpack_colors(R: jnp.ndarray, B: jnp.ndarray):
    """Inverse of pack_colors."""
    D, H, Wh = R.shape
    pr = _pr2d(D, H)
    ev = jnp.where(pr == 0, R, B)
    od = jnp.where(pr == 0, B, R)
    return jnp.stack([ev, od], axis=-1).reshape(D, H, 2 * Wh)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def cpack_solve_supported(shape, dtype=jnp.float32) -> bool:
    """Padded ``shape``; requires even W, resident VMEM fit, and wide
    enough rows that color packing actually wins (W/2 >= 128: below that
    the half arrays pad back to 128 lanes and the saving evaporates —
    the round-1 'checkerboard at W=128' dead end)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    D, H, W = (n - 2 for n in shape)
    if W % 2 or (W // 2) % 128:
        return False
    it = _itemsize(dtype)
    half = _tiled_bytes((D, H, W // 2), it)
    # R,B in/out aliased + PR,PB (+K halves) + Rpre,Bpre scratch + temps
    return 10 * half <= VMEM_BUDGET_BYTES


def _make_cpack_kernel(b: int, nsweep: int, a: float, c: float,
                       wall_mode: str, interior, dtype,
                       apply_keep: bool = True):
    D, H, W = interior
    Wh = W // 2
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    if wall_mode == "noslip" and b in (1, 2, 3):
        sx, sy, sz = (-1.0 if b == 1 else 1.0), -1.0, -1.0
    else:
        sx = -1.0 if b == 1 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sz = -1.0 if b == 3 else 1.0

    def _body(pr_r, pb_r, kr_r, kb_r, r_io, b_io, rpre_s, bpre_s):
        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        sxc = jnp.asarray(sx, dtype)
        syc = jnp.asarray(sy, dtype)
        szc = jnp.asarray(sz, dtype)
        iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, Wh), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, Wh), 1)
        i2 = jax.lax.broadcasted_iota(jnp.int32, (D, H, Wh), 2)
        pr0 = ((iz + iy) % 2) == 1          # pr == 0  <=>  (1+z+y)%2 == 0
        PR = pr_r[...]
        PB = pb_r[...]

        def half(upd_red):
            """Update one color from the other + its own pre edges."""
            other = b_io[...] if upd_red else r_io[...]
            pre = rpre_s[...] if upd_red else bpre_s[...]
            prev = PR if upd_red else PB
            # B[i-1] / B[i+1] with the x-ghost edge fixes (aligned pre)
            p1 = _roll(other, 1, 2)                       # other[i-1]
            m1 = _roll(other, Wh - 1, 2)                  # other[i+1]
            p1 = jnp.where(i2 == 0, sxc * pre, p1)
            m1 = jnp.where(i2 == Wh - 1, pre, m1)         # x+ outflow
            if upd_red:
                xp = jnp.where(pr0, other, m1)
                xm = jnp.where(pr0, p1, other)
            else:
                xp = jnp.where(pr0, m1, other)
                xm = jnp.where(pr0, other, p1)
            yp = jnp.where(iy == H - 1, syc * pre, _roll(other, H - 1, 1))
            ym = jnp.where(iy == 0, syc * pre, _roll(other, 1, 1))
            zp = jnp.concatenate([other[1:], szc * pre[D - 1:]], axis=0)
            zm = jnp.concatenate([szc * pre[:1], other[:D - 1]], axis=0)
            s = (((xp + xm) + yp) + ym + zp) + zm
            upd = (prev + a_c * s) * crec
            if upd_red:
                r_io[...] = upd
            else:
                b_io[...] = upd

        def sweep(k, _):
            half(True)
            half(False)
            rpre_s[...] = r_io[...]
            bpre_s[...] = b_io[...]
            if apply_keep:
                r_io[...] = r_io[...] * kr_r[...]
                b_io[...] = b_io[...] * kb_r[...]
            return 0

        jax.lax.fori_loop(0, nsweep, sweep, 0)
        # the final pre-keep state rides out through the aliased pre refs

    if apply_keep:
        def kernel(pr_r, pb_r, kr_r, kb_r, r0, b0, rp0, bp0,
                   r_o, b_o, rp_o, bp_o):
            r_o[...] = r0[...]
            b_o[...] = b0[...]
            rp_o[...] = rp0[...]
            bp_o[...] = bp0[...]
            _body(pr_r, pb_r, kr_r, kb_r, r_o, b_o, rp_o, bp_o)
    else:
        def kernel(pr_r, pb_r, r0, b0, rp0, bp0,
                   r_o, b_o, rp_o, bp_o):
            r_o[...] = r0[...]
            b_o[...] = b0[...]
            rp_o[...] = rp0[...]
            bp_o[...] = bp0[...]
            _body(pr_r, pb_r, None, None, r_o, b_o, rp_o, bp_o)
    return kernel


@functools.partial(jax.jit, static_argnames=("b", "a", "c", "acc",
                                              "wall_mode", "interpret",
                                              "empty_scene"))
def pallas_rbgs_solve_cpack(b: int, field: jnp.ndarray, prev: jnp.ndarray,
                            keep, a: float, c: float, acc: int = 15,
                            wall_mode: str = "reference",
                            interpret: bool = False,
                            empty_scene: bool = False) -> jnp.ndarray:
    """Drop-in equivalent of ``pallas_rbgs_solve`` (padded in/out layout).

    Sweep 1 runs in the padded kernel (arbitrary caller ghosts); sweeps
    2..acc run color-packed. The pre-keep edge values sweeps 2+ read are
    recovered from sweep 1's ghost faces (ghost = sign * pre)."""
    shape = field.shape
    D, H, W = (n - 2 for n in shape)
    Wh = W // 2
    dtype = field.dtype
    if acc < 1:
        return field
    f1 = pallas_rbgs_solve(b, field, prev, keep, a, c, acc=1,
                           wall_mode=wall_mode, interpret=interpret,
                           empty_scene=empty_scene, packed=True)
    if acc == 1:
        return f1

    if wall_mode == "noslip" and b in (1, 2, 3):
        sx, sy, sz = (-1.0 if b == 1 else 1.0), -1.0, -1.0
    else:
        sx = -1.0 if b == 1 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sz = -1.0 if b == 3 else 1.0

    f_i = f1[1:-1, 1:-1, 1:-1]
    # pre-keep edge recovery: ghost = sign * pre  =>  pre = sign * ghost
    # (sign^2 = 1; x+ face is the sign-free outflow copy)
    fpre = f_i
    fpre = fpre.at[:, :, 0].set(np.float32(sx) * f1[1:-1, 1:-1, 0])
    fpre = fpre.at[:, :, -1].set(f1[1:-1, 1:-1, -1])
    fpre = fpre.at[:, 0, :].set(np.float32(sy) * f1[1:-1, 0, 1:-1])
    fpre = fpre.at[:, -1, :].set(np.float32(sy) * f1[1:-1, -1, 1:-1])
    fpre = fpre.at[0, :, :].set(np.float32(sz) * f1[0, 1:-1, 1:-1])
    fpre = fpre.at[-1, :, :].set(np.float32(sz) * f1[-1, 1:-1, 1:-1])
    # NOTE corner/edge cells belong to several faces; the reference writes
    # faces in x, y, z order and later faces overwrite earlier ones —
    # but each ghost face still mirrors the same pre value (the mirror
    # source of an (x-edge ∧ y-edge) cell is itself either way), so the
    # order above only needs to match for recovering *values*, which are
    # equal across faces. Verified bitwise vs the packed kernel in tests.

    R0, B0 = pack_colors(f_i)
    Rp0, Bp0 = pack_colors(fpre)
    PR, PB = pack_colors(prev[1:-1, 1:-1, 1:-1])
    operands = [PR, PB]
    if not empty_scene:
        KR, KB = pack_colors(keep[1:-1, 1:-1, 1:-1].astype(dtype))
        operands += [KR, KB]
    operands += [R0, B0, Rp0, Bp0]
    n_in = len(operands)

    kernel = _make_cpack_kernel(b, acc - 1, a, c, wall_mode, (D, H, W),
                                dtype, apply_keep=not empty_scene)
    half_shape = jax.ShapeDtypeStruct((D, H, Wh), dtype)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    R, Bc, Rpre, Bpre = pl.pallas_call(
        kernel,
        out_shape=[half_shape] * 4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        input_output_aliases={n_in - 4: 0, n_in - 3: 1,
                              n_in - 2: 2, n_in - 1: 3},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * (acc - 1) * D * H * W,
            bytes_accessed=n_in * _tiled_bytes((D, H, Wh), _itemsize(dtype)),
            transcendentals=0),
        **kwargs,
    )(*operands)

    out_i = unpack_colors(R, Bc)
    pre = unpack_colors(Rpre, Bpre)
    return _rebuild_padded(field, f1, out_i, pre, sx, sy, sz)


def _rebuild_padded(field, f1, out_i, pre, sx, sy, sz):
    # rebuild the padded layout: final ghost faces = signed mirrors of the
    # final pre-keep edges (identical to the packed kernel's face writes);
    # ghost EDGES/CORNERS (two+ ghost coords) are never rewritten by any
    # face write and carry the caller's input values — start from f1, which
    # inherited them (the padded kernel's out_ref[...] = field_ref[...])
    out = f1
    out = out.at[1:-1, 1:-1, 1:-1].set(out_i)
    out = out.at[1:-1, 1:-1, 0].set(np.float32(sx) * pre[:, :, 0])
    out = out.at[1:-1, 1:-1, -1].set(pre[:, :, -1])
    out = out.at[1:-1, 0, 1:-1].set(np.float32(sy) * pre[:, 0, :])
    out = out.at[1:-1, -1, 1:-1].set(np.float32(sy) * pre[:, -1, :])
    out = out.at[0, 1:-1, 1:-1].set(np.float32(sz) * pre[0])
    out = out.at[-1, 1:-1, 1:-1].set(np.float32(sz) * pre[-1])
    return out


# ---------------------------------------------------------------------------
# streaming variant (>VMEM grids, the 256^3 class)
# ---------------------------------------------------------------------------

def _pick_blk_cpack(shape, dtype, apply_keep: bool):
    """z-block choice for the streaming kernel, or None. Budget mirrors
    linsolve_stream's empirically-calibrated row-unit model on half-width
    rows: per block row we stream ~5 half-windows double-buffered plus the
    ext/pw scratch; 22 half-row units is conservative."""
    D, H, W = (n - 2 for n in shape)
    if W % 2 or (W // 2) % 128:
        return None
    it = _itemsize(dtype)
    rb = _tiled_bytes((1, H, W // 2), it)
    units = 22 if apply_keep else 19
    for blk in (16, 8):
        if blk > D:
            continue
        if units * blk * rb <= VMEM_BUDGET_BYTES:
            return blk
    return None


def cpack_stream_supported(shape, dtype=jnp.float32,
                           apply_keep: bool = True) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 6:
        return False
    return _pick_blk_cpack(shape, dtype, apply_keep) is not None


def _make_cpack_sweep_kernel(b: int, a: float, c: float, wall_mode: str,
                             interior, blk: int, dtype, apply_keep: bool):
    """One full color-packed sweep over a z-block grid.

    Carried state between sweeps: the PRE-KEEP halves (Rpre, Bpre). The
    kernel assembles the post-keep black base (Bpre * KB — the only
    post-keep values any sweep reads; a red cell's post-keep value is never
    a red-update input, its neighbors are all black), updates red on block
    rows ±1 (the halo recompute that meets the cross-block z dependency),
    then black on the block rows, and emits the new pre-keep halves."""
    D, H, W = interior
    Wh = W // 2
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    if wall_mode == "noslip" and b in (1, 2, 3):
        sx, sy, sz = (-1.0 if b == 1 else 1.0), -1.0, -1.0
    else:
        sx = -1.0 if b == 1 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sz = -1.0 if b == 3 else 1.0
    hb = min(8, blk)

    def body(bplo, bpmid, bphi, rplo, rpmid, rphi, prlo, prmid, prhi,
             pbmid, kblo, kbmid, kbhi, out_r, out_b, extb, pwr, newr):
        k = pl.program_id(0)
        # scratch row e <-> interior z row  gz = k*blk - 2 + e
        pwb_lo = bplo[hb - 2:]
        pwb_hi = bphi[:2]
        if apply_keep:
            extb[0:2] = pwb_lo * kblo[hb - 2:]
            extb[2:blk + 2] = bpmid[...] * kbmid[...]
            extb[blk + 2:] = pwb_hi * kbhi[:2]
        else:
            extb[0:2] = pwb_lo
            extb[2:blk + 2] = bpmid[...]
            extb[blk + 2:] = pwb_hi
        # Bpre window (ghost reads in the black half, rows [2, blk+1])
        pwb_mid = bpmid
        # Rpre window rows [1, blk+2]
        pwr[0:2] = rplo[hb - 2:]
        pwr[2:blk + 2] = rpmid[...]
        pwr[blk + 2:] = rphi[:2]
        rhs_r = jnp.concatenate([prlo[hb - 1:], prmid[...], prhi[:1]],
                                axis=0)          # rows [1, blk+2]

        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        sxc = jnp.asarray(sx, dtype)
        syc = jnp.asarray(sy, dtype)
        szc = jnp.asarray(sz, dtype)

        def xsel(other_rows, pre_rows, iy, i2, pr0, upd_red):
            p1 = _roll(other_rows, 1, 2)
            m1 = _roll(other_rows, Wh - 1, 2)
            p1 = jnp.where(i2 == 0, sxc * pre_rows, p1)
            m1 = jnp.where(i2 == Wh - 1, pre_rows, m1)
            if upd_red:
                xp = jnp.where(pr0, other_rows, m1)
                xm = jnp.where(pr0, p1, other_rows)
            else:
                xp = jnp.where(pr0, m1, other_rows)
                xm = jnp.where(pr0, other_rows, p1)
            return xp, xm

        def iotas(n, lo_e):
            iz = jax.lax.broadcasted_iota(jnp.int32, (n, H, Wh), 0)
            iy = jax.lax.broadcasted_iota(jnp.int32, (n, H, Wh), 1)
            i2 = jax.lax.broadcasted_iota(jnp.int32, (n, H, Wh), 2)
            gz = iz + (k * blk - 2 + lo_e)
            pr0 = ((gz + iy) % 2) == 1       # pr == 0 <=> (1+z+y)%2 == 0
            return gz, iy, i2, pr0

        # ---- red half on scratch rows [1, blk+2]
        nR = blk + 2
        gz, iy, i2, pr0 = iotas(nR, 1)
        other = extb[1:blk + 3]
        pre = pwr[1:blk + 3]
        xp, xm = xsel(other, pre, iy, i2, pr0, True)
        yp = jnp.where(iy == H - 1, syc * pre, _roll(other, H - 1, 1))
        ym = jnp.where(iy == 0, syc * pre, _roll(other, 1, 1))
        zp = jnp.where(gz == D - 1, szc * pre, extb[2:blk + 4])
        zm = jnp.where(gz == 0, szc * pre, extb[0:blk + 2])
        s = (((xp + xm) + yp) + ym + zp) + zm
        updR = (rhs_r + a_c * s) * crec
        inb = (gz >= 0) & (gz <= D - 1)
        newr[1:blk + 3] = jnp.where(inb, updR, pre)

        # ---- black half on scratch rows [2, blk+1] (the block rows)
        nB = blk
        gz, iy, i2, pr0 = iotas(nB, 2)
        other = newr[2:blk + 2]
        pre = pwb_mid[...]
        xp, xm = xsel(other, pre, iy, i2, pr0, False)
        yp = jnp.where(iy == H - 1, syc * pre, _roll(other, H - 1, 1))
        ym = jnp.where(iy == 0, syc * pre, _roll(other, 1, 1))
        zp = jnp.where(gz == D - 1, szc * pre, newr[3:blk + 3])
        zm = jnp.where(gz == 0, szc * pre, newr[1:blk + 1])
        s = (((xp + xm) + yp) + ym + zp) + zm
        updB = (pbmid[...] + a_c * s) * crec
        inb = (gz >= 0) & (gz <= D - 1)
        out_b[...] = jnp.where(inb, updB, pre)
        out_r[...] = newr[2:blk + 2]

    if apply_keep:
        def kernel(bplo, bpmid, bphi, rplo, rpmid, rphi, prlo, prmid, prhi,
                   pbmid, kblo, kbmid, kbhi, out_r, out_b, extb, pwr, newr):
            body(bplo, bpmid, bphi, rplo, rpmid, rphi, prlo, prmid, prhi,
                 pbmid, kblo, kbmid, kbhi, out_r, out_b, extb, pwr, newr)
    else:
        def kernel(bplo, bpmid, bphi, rplo, rpmid, rphi, prlo, prmid, prhi,
                   pbmid, out_r, out_b, extb, pwr, newr):
            body(bplo, bpmid, bphi, rplo, rpmid, rphi, prlo, prmid, prhi,
                 pbmid, None, None, None, out_r, out_b, extb, pwr, newr)
    return kernel


def make_cpack_sweep_call(b, a, c, wall_mode, interior, dtype, apply_keep,
                          blk, interpret):
    """Per-sweep pallas_call over the color halves:
    ``call(Bpre x3, Rpre x3, PR x3, PB, [KB x3])`` -> (Rpre', Bpre')."""
    D, H, W = interior
    Wh = W // 2
    nblk = -(-D // blk)
    kernel = _make_cpack_sweep_kernel(b, a, c, wall_mode, interior, blk,
                                      dtype, apply_keep)
    hb = min(8, blk)
    r = blk // hb
    nhb = -(-D // hb)
    mid = pl.BlockSpec((blk, H, Wh), lambda k: (k, 0, 0),
                       memory_space=pltpu.VMEM)
    lo = pl.BlockSpec((hb, H, Wh),
                      lambda k: (jnp.maximum(k * r - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((hb, H, Wh),
                      lambda k: (jnp.minimum(k * r + r, nhb - 1), 0, 0),
                      memory_space=pltpu.VMEM)
    in_specs = [lo, mid, hi] * 3 + [mid]
    if apply_keep:
        in_specs += [lo, mid, hi]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    half = jax.ShapeDtypeStruct((D, H, Wh), dtype)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=[half, half],
        in_specs=in_specs,
        out_specs=[mid, mid],
        scratch_shapes=[pltpu.VMEM((blk + 4, H, Wh), dtype)
                        for _ in range(3)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * int(np.prod(interior)),
            bytes_accessed=(5 if apply_keep else 4)
            * _tiled_bytes(interior, _itemsize(dtype)),
            transcendentals=0),
        **kwargs,
    )


@functools.partial(jax.jit, static_argnames=(
    "b", "a", "c", "acc", "wall_mode", "interpret", "empty_scene", "blk"))
def pallas_rbgs_solve_cpack_stream(b: int, field, prev, keep, a: float,
                                   c: float, acc: int = 15,
                                   wall_mode: str = "reference",
                                   interpret: bool = False,
                                   empty_scene: bool = False,
                                   blk: int | None = None):
    """Streaming color-packed solve for >VMEM grids (the 256^3 wall:
    half-width rows make the x shifts single-tile and halve per-sweep VPU
    work — NOTES.md r3). Drop-in equivalent of pallas_rbgs_solve_stream."""
    from tools.linsolve_blocked import (
        pallas_rbgs_solve_blocked)
    shape = field.shape
    dtype = field.dtype
    apply_keep = not empty_scene
    interior = tuple(n - 2 for n in shape)
    D, H, W = interior
    if blk is None:
        blk = _pick_blk_cpack(shape, dtype, apply_keep)
        if blk is None:
            raise ValueError(f"no cpack-stream block fits {shape}")

    # sweep 1 on the padded layout without the keep multiply: its interior
    # is exactly the pre-keep field fpre_1 (linsolve_stream's trick)
    pre1 = pallas_rbgs_solve_blocked(b, field, prev, None, a, c, acc=1,
                                     wall_mode=wall_mode,
                                     interpret=interpret, empty_scene=True)
    fpre = pre1[1:-1, 1:-1, 1:-1]
    Rp, Bp = pack_colors(fpre)
    PR, PB = pack_colors(prev[1:-1, 1:-1, 1:-1])
    KB = None
    if apply_keep:
        _, KB = pack_colors(keep[1:-1, 1:-1, 1:-1].astype(dtype))

    if acc > 1:
        call = make_cpack_sweep_call(b, a, c, wall_mode, interior, dtype,
                                     apply_keep, blk, interpret)

        def sweep(carry, _):
            Rp, Bp = carry
            ops = [Bp, Bp, Bp, Rp, Rp, Rp, PR, PR, PR, PB]
            if apply_keep:
                ops += [KB, KB, KB]
            Rp2, Bp2 = call(*ops)
            return (Rp2, Bp2), None

        (Rp, Bp), _ = jax.lax.scan(sweep, (Rp, Bp), None, length=acc - 1)
        fpre = unpack_colors(Rp, Bp)

    if wall_mode == "noslip" and b in (1, 2, 3):
        sx, sy, sz = (-1.0 if b == 1 else 1.0), -1.0, -1.0
    else:
        sx = -1.0 if b == 1 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sz = -1.0 if b == 3 else 1.0
    kp = None if empty_scene else keep[1:-1, 1:-1, 1:-1].astype(dtype)
    out_i = fpre if empty_scene else fpre * kp
    return _rebuild_padded(field, field, out_i, fpre, sx, sy, sz)
