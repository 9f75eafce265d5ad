"""Temporally-blocked z-streaming RBGS solve (Pallas TPU) for >VMEM grids.

A 1-sweep padded streaming kernel (tools/linsolve_blocked.py, retired) moves ~8 field
transfers of HBM per sweep; a 15-sweep solve at 256^3 is ~12 GB of traffic
and the step is HBM-bound. This kernel performs ``ksw`` full sweeps per
streaming pass with *recompute overlap* (trapezoidal time tiling): each
z-block window carries a ``2*ksw+1``-row halo and recomputes the halo rows'
intermediate sweeps locally, so a pass reads the field+rhs windows once and
writes once — HBM per sweep drops ~``ksw``-fold at the cost of
``1 + ~4*ksw/blk`` redundant VPU work.

Numerics are identical to ``ksw`` sequential sweeps of the rbgs jnp path /
the other kernels (same update expression and operand order, red before
black, faces then keep per sweep — reference linearSolver + setBounds,
simulation.cpp:251-273/:183-246): the wavefront dependency of red/black GS
grows 2 rows per sweep, so a window seeded with ``2*(ksw-s)+1`` extra valid
rows reproduces sweep ``s`` exactly on its shrinking core region.

Window assembly: the field/rhs(/keep) enter as three streams of different
block heights — the mid block (``blk`` rows) plus lo/hi halo blocks
(``hb`` rows, ``hb | blk``, index maps ``k*blk/hb - 1`` / ``+blk/hb``
clamped) — avoiding the 3x full-block windows of the 1-sweep kernel.
Ghost-face bookkeeping per sweep: x/y ghost lanes are rewritten (masked to
interior rows) over the whole active region; the z ghost rows (global rows
0 and D+1) are refreshed from their mirror source at statically-known
window positions under ``pl.when`` on the block id.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    VMEM_BUDGET_BYTES, _itemsize, _tiled_bytes)


def _row_bytes(shape, itemsize):
    return _tiled_bytes((1,) + tuple(shape[1:]), itemsize)


def pick_params(shape, dtype=jnp.float32, apply_keep: bool = True):
    """Choose (blk, hb, ksw) fitting the VMEM budget, or None.

    Budget model: double-buffered in/out streams (field+rhs(+keep) over
    mid+2 halo blocks, out over mid) + ext/rhs(/keep) window scratch +
    ~4 rows-regions of halfsweep temporaries.
    """
    it = _itemsize(dtype)
    rb = _row_bytes(shape, it)
    nops = 3 if apply_keep else 2
    best = None
    # 90% margin: the byte model tracks Mosaic's true stack use only
    # approximately — at 256^3 the unshaved budget admitted a config the
    # chip rejected by 484 KB (r3 measurement)
    budget = int(0.9 * VMEM_BUDGET_BYTES)
    for ksw in (6, 5, 4, 3, 2):
        hb = 2 * ksw + 2            # smallest even halo covering the skew
        for blk in (64, 48, 32, 24, 16, 8):
            if blk < hb or blk % hb:
                continue
            E = blk + 2 * hb
            need = (2 * (blk + 2 * hb) * nops * rb   # in streams, dbuf
                    + 2 * blk * rb                   # out stream, dbuf
                    + nops * E * rb                  # window scratch
                    + 4 * (blk + 4 * ksw) * rb)      # halfsweep temporaries
            if need <= budget:
                return blk, hb, ksw
    return best


def pallas_temporal_solve_supported(shape, dtype=jnp.float32,
                                    apply_keep: bool = True) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    return pick_params(shape, dtype, apply_keep) is not None


def _make_pass_kernel(b: int, a: float, c: float, wall_mode: str,
                      shape, blk: int, hb: int, ksw: int, dtype,
                      apply_keep: bool):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    E = blk + 2 * hb
    nblk = -(-D2 // blk)
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    if wall_mode == "noslip" and b in (1, 2, 3):
        sx = -1.0 if b == 1 else 1.0
        sy, sz = -1.0, -1.0
    else:
        sx = -1.0 if b == 1 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sz = -1.0 if b == 3 else 1.0

    def body(refs):
        if apply_keep:
            (flo, fmid, fhi, rlo, rmid, rhi, klo, kmid, khi,
             out, ext, extr, extk) = refs
        else:
            (flo, fmid, fhi, rlo, rmid, rhi, out, ext, extr) = refs
            extk = None
        k = pl.program_id(0)
        ext[0:hb] = flo[...]
        ext[hb:hb + blk] = fmid[...]
        ext[hb + blk:] = fhi[...]
        extr[0:hb] = rlo[...]
        extr[hb:hb + blk] = rmid[...]
        extr[hb + blk:] = rhi[...]
        if apply_keep:
            extk[0:hb] = klo[...]
            extk[hb:hb + blk] = kmid[...]
            extk[hb + blk:] = khi[...]

        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        szc = jnp.asarray(sz, dtype)
        # global padded row of ext row e is g = k*blk - hb + e
        gofs = k * blk - hb

        def rowmask(lo_e, n, extra_cols=0):
            """(n, 1[,1]) interior-row mask for ext rows [lo_e, lo_e+n)."""
            shp = (n,) + (1,) * (1 + extra_cols)
            g = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + (gofs + lo_e)
            return (g >= 1) & (g <= D)

        def halfsweep(lo_e, hi_e, want_even_parity):
            n = hi_e - lo_e + 1
            f = ext[lo_e - 1:hi_e + 2]
            s = (
                (((f[1:-1, 1:-1, 2:] + f[1:-1, 1:-1, :-2])
                  + f[1:-1, 2:, 1:-1]) + f[1:-1, :-2, 1:-1])
                + f[2:, 1:-1, 1:-1]
            ) + f[:-2, 1:-1, 1:-1]
            upd = (extr[lo_e:hi_e + 1, 1:-1, 1:-1] + a_c * s) * crec
            gz = (jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 0)
                  + (gofs + lo_e))
            gy = jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 1) + 1
            gx = jax.lax.broadcasted_iota(jnp.int32, (n, H, W), 2) + 1
            parity = ((gz + gy + gx) % 2) == 0      # red = masks.red_i
            if not want_even_parity:
                parity = jnp.logical_not(parity)
            sel = parity & (gz >= 1) & (gz <= D)
            ext[lo_e:hi_e + 1, 1:-1, 1:-1] = jnp.where(
                sel, upd, f[1:-1, 1:-1, 1:-1])

        for s_idx in range(1, ksw + 1):
            m = ksw - s_idx
            lo_e, hi_e = hb - 2 * m, hb + blk - 1 + 2 * m
            halfsweep(lo_e - 1, hi_e + 1, True)     # red
            halfsweep(lo_e, hi_e, False)            # black
            # x/y ghost lanes over the active rows (interior rows only)
            n = hi_e - lo_e + 1
            rows = ext[lo_e:hi_e + 1]
            rint = rowmask(lo_e, n)
            ext[lo_e:hi_e + 1, 1:-1, 0] = jnp.where(
                rint, sx * rows[:, 1:-1, 1], rows[:, 1:-1, 0])
            ext[lo_e:hi_e + 1, 1:-1, W + 1] = jnp.where(
                rint, rows[:, 1:-1, W], rows[:, 1:-1, W + 1])
            ext[lo_e:hi_e + 1, 0, 1:-1] = jnp.where(
                rint, sy * rows[:, 1, 1:-1], rows[:, 0, 1:-1])
            ext[lo_e:hi_e + 1, H + 1, 1:-1] = jnp.where(
                rint, sy * rows[:, H, 1:-1], rows[:, H + 1, 1:-1])
            # z ghost rows: global row 0 mirrors row 1, row D+1 mirrors row
            # D (post-black pre-keep values, like every other kernel). Their
            # window position is static given the block id.
            for kk in range(nblk):
                e0 = 0 - (kk * blk - hb)
                if 1 <= e0 <= E - 2:
                    @pl.when(k == kk)
                    def _(e0=e0):
                        ext[e0, 1:-1, 1:-1] = szc * ext[e0 + 1, 1:-1, 1:-1]
                eD = (D + 1) - (kk * blk - hb)
                if 1 <= eD <= E - 2:
                    @pl.when(k == kk)
                    def _(eD=eD):
                        ext[eD, 1:-1, 1:-1] = szc * ext[eD - 1, 1:-1, 1:-1]
            if apply_keep:
                rm = rowmask(lo_e, n, extra_cols=1)
                ext[lo_e:hi_e + 1] = jnp.where(
                    rm, ext[lo_e:hi_e + 1] * extk[lo_e:hi_e + 1],
                    ext[lo_e:hi_e + 1])

        out[...] = ext[hb:hb + blk]

    if apply_keep:
        def kernel(flo, fmid, fhi, rlo, rmid, rhi, klo, kmid, khi,
                   out, ext, extr, extk):
            body((flo, fmid, fhi, rlo, rmid, rhi, klo, kmid, khi,
                  out, ext, extr, extk))
    else:
        def kernel(flo, fmid, fhi, rlo, rmid, rhi, out, ext, extr):
            body((flo, fmid, fhi, rlo, rmid, rhi, out, ext, extr))
    return kernel


@functools.partial(jax.jit, static_argnames=(
    "b", "a", "c", "acc", "wall_mode", "interpret", "empty_scene",
    "blk", "hb", "ksw"))
def pallas_rbgs_solve_temporal(b: int, field, prev, keep, a: float, c: float,
                               acc: int = 15, wall_mode: str = "reference",
                               interpret: bool = False,
                               empty_scene: bool = False,
                               blk: int | None = None, hb: int | None = None,
                               ksw: int | None = None):
    """Drop-in equivalent of ``pallas_rbgs_solve_blocked`` with ``ksw``
    sweeps per streaming pass. ``blk``/``hb``/``ksw`` override the
    auto-picked parameters (tests/tuning)."""
    shape = field.shape
    dtype = field.dtype
    apply_keep = not empty_scene
    if blk is None or hb is None or ksw is None:
        picked = pick_params(shape, dtype, apply_keep)
        if picked is None:
            raise ValueError(f"no temporal-solve params fit {shape}")
        blk, hb, ksw = picked
    if blk % hb or hb < 2 * ksw + 1:
        raise ValueError(f"need hb | blk and hb >= 2*ksw+1; "
                         f"got blk={blk} hb={hb} ksw={ksw}")
    D2 = shape[0]
    nblk = -(-D2 // blk)
    nhb = -(-D2 // hb)
    r = blk // hb

    def make_call(nsw):
        kernel = _make_pass_kernel(b, a, c, wall_mode, shape, blk, hb, nsw,
                                   dtype, apply_keep)
        spec_mid = pl.BlockSpec((blk,) + shape[1:], lambda k: (k, 0, 0),
                                memory_space=pltpu.VMEM)
        spec_lo = pl.BlockSpec(
            (hb,) + shape[1:],
            lambda k: (jnp.maximum(k * r - 1, 0), 0, 0),
            memory_space=pltpu.VMEM)
        spec_hi = pl.BlockSpec(
            (hb,) + shape[1:],
            lambda k: (jnp.minimum(k * r + r, nhb - 1), 0, 0),
            memory_space=pltpu.VMEM)
        in_specs = [spec_lo, spec_mid, spec_hi] * (3 if apply_keep else 2)
        E = blk + 2 * hb
        scratch = [pltpu.VMEM((E,) + shape[1:], dtype)
                   for _ in range(3 if apply_keep else 2)]
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_BUDGET_BYTES)
        return pl.pallas_call(
            kernel,
            grid=(nblk,),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((blk,) + shape[1:], lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=20 * nsw * int(np.prod(shape)),
                bytes_accessed=(4 + 4 * 2 * hb // blk) * _tiled_bytes(
                    shape, _itemsize(dtype)),
                transcendentals=0),
            **kwargs,
        )

    npass, rem = divmod(acc, ksw)
    call = make_call(ksw)

    def one_pass(f, _):
        ops = (f, f, f, prev, prev, prev)
        if apply_keep:
            ops = ops + (keep, keep, keep)
        return call(*ops), None

    if npass:
        field, _ = jax.lax.scan(one_pass, field, None, length=npass)
    if rem:
        call_r = make_call(rem)
        ops = (field, field, field, prev, prev, prev)
        if apply_keep:
            ops = ops + (keep, keep, keep)
        field = call_r(*ops)
    return field
