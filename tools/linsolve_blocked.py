"""z-blocked red-black Gauss-Seidel sweep (Pallas TPU) for >VMEM grids.

RETIRED EXPERIMENT (round 5, VERDICT r4 #7): this padded-layout streaming
kernel was the round-2 bottom rung of the solve ladder, but the packed
stream/temporal kernels (kernels/linsolve_stream.py, linsolve_temporal.py)
admit every shape this gate admits (coverage asserted in
tests/test_kernels.py::test_solve_dispatch_gates) and beat it ~3x, so the
dispatch rung was deleted and the kernel demoted out of the package. It
stays here, tested (tests/test_kernels.py blocked-solve tests), as the
reference implementation of 3-window z-halo streaming.

The VMEM-resident solver (kernels/linsolve_pallas.py) needs the whole padded
field (plus rhs/keep) on chip; at 256^3 one tiled field is ~104 MB, so large
grids fell back to pure-XLA sweeps (VERDICT r1 missing#1). This kernel streams
the grid through VMEM in z-slabs instead: one ``pallas_call`` performs ONE
full sweep (red half, black half, boundary faces, obstacle keep) over a grid
of z-blocks, and the ``acc``-sweep loop runs as a ``lax.scan`` of such calls.

Halo handling without overlapping BlockSpecs: the field and rhs are each
passed three times with block index maps ``k-1, k, k+1`` (clamped), so the
kernel sees a 3-slab window and assembles the 2-row halos it needs:

- the red half-sweep must also be computed on the rows one outside the block
  (the black half of boundary rows reads red-updated neighbors), which in
  turn reads field rows two outside — all inside the 3-slab window;
- face writes read their source row from the extended window, so z-faces work
  even when the ghost row and its source row land in different blocks.

Numerics are identical to the rbgs jnp path (ops/linsolve.py) and the
resident kernel: same update expression/operand order, red
(= 1-based coord sum even, masks.red_i) before black, faces then keep after
every sweep (reference linearSolver + setBounds, simulation.cpp:251-273 /
:183-246).
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


def _pick_block(shape, itemsize=4) -> int:
    """Largest z-block size whose pipeline footprint fits VMEM: ~8 operand
    blocks (3 field windows + 3 rhs windows + keep + out), double-buffered,
    plus ~8 blocks' worth of in-kernel temporaries (ext/Fr/masks)."""
    row_bytes = _tiled_bytes((1,) + tuple(shape[1:]), itemsize)
    budget = VMEM_BUDGET_BYTES
    b = budget // (24 * row_bytes)
    # >= 2 so the 2-row halo fits in one neighboring block's window
    return max(2, min(int(b), 64, shape[0]))


def pallas_blocked_solve_supported(shape, dtype=jnp.float32) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    # one z-row (plus temporaries) must fit comfortably in VMEM
    return (_tiled_bytes((3,) + tuple(shape[1:]), itemsize) * 24
            <= VMEM_BUDGET_BYTES)


def _make_sweep_kernel(b: int, a: float, c: float, wall_mode: str,
                       shape, blk: int, dtype, apply_keep: bool):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    if wall_mode == "noslip" and b in (1, 2, 3):
        sx = -1.0 if b == 1 else 1.0
        sy, sz = -1.0, -1.0
    else:
        sx = -1.0 if b == 1 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sz = -1.0 if b == 3 else 1.0
    # block indices holding the two z-ghost faces and their source rows
    k_z0, r_z0 = 0, 0                       # ghost row gz=0 (source gz=1)
    k_zD, r_zD = (D + 1) // blk, (D + 1) % blk   # ghost row gz=D+1

    def body(prevm_ref, mid_ref, nxt_ref, rprevm_ref, rmid_ref, rnxt_ref,
             keep_ref, out_ref, ext_ref):
        k = pl.program_id(0)
        # extended window in scratch: field rows [k*blk-2, k*blk+blk+2);
        # rhs rows [k*blk-1, k*blk+blk+1) as a value. At the clamped
        # first/last blocks the out-of-range rows hold duplicated data that
        # the interior masks below keep out of every update and face write.
        # (Scratch-ref stores at static slices — Mosaic has no scatter, so
        # value-level .at[].set is unavailable in kernels.)
        ext_ref[0:2] = prevm_ref[blk - 2:, :, :]
        ext_ref[2:blk + 2] = mid_ref[...]
        ext_ref[blk + 2:] = nxt_ref[:2, :, :]
        rhs = jnp.concatenate(
            [rprevm_ref[blk - 1:, :, :], rmid_ref[...], rnxt_ref[:1, :, :]],
            axis=0)                                        # (blk+2, H2, W2)

        # padded (1-based-interior) global coordinates of the update region:
        # ext rows 1..blk+2  <->  gz = k*blk-1 .. k*blk+blk
        E = blk + 2
        gz = (jax.lax.broadcasted_iota(jnp.int32, (E, H, W), 0)
              + k * blk - 1)
        gy = jax.lax.broadcasted_iota(jnp.int32, (E, H, W), 1) + 1
        gx = jax.lax.broadcasted_iota(jnp.int32, (E, H, W), 2) + 1
        interior = (gz >= 1) & (gz <= D)
        parity = ((gz + gy + gx) % 2) == 0                 # masks.red_i
        red = parity & interior
        black = jnp.logical_not(parity) & interior
        a_c = jnp.asarray(a_lit, dtype)
        crec = jnp.asarray(crec_lit, dtype)
        rhs_i = rhs[:, 1:-1, 1:-1]

        def halfsweep(sel):
            f = ext_ref[...]                               # (blk+4, H2, W2)
            s = (
                (((f[1:-1, 1:-1, 2:] + f[1:-1, 1:-1, :-2])
                  + f[1:-1, 2:, 1:-1]) + f[1:-1, :-2, 1:-1])
                + f[2:, 1:-1, 1:-1]
            ) + f[:-2, 1:-1, 1:-1]
            upd = (rhs_i + a_c * s) * crec
            ext_ref[1:-1, 1:-1, 1:-1] = jnp.where(
                sel, upd, f[1:-1, 1:-1, 1:-1])

        halfsweep(red)
        halfsweep(black)

        out_ref[...] = ext_ref[2:blk + 2]                  # the block's rows
        # faces (set_bounds order: x, y, z — ops/bounds.py:54-61); x/y faces
        # only on rows whose gz is interior. (blk, 1) mask broadcasts over
        # the face's free axis (H or W).
        rz = (jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + k * blk)
        rint = (rz >= 1) & (rz <= D)
        out_ref[:, 1:-1, 0] = jnp.where(
            rint, sx * out_ref[:, 1:-1, 1], out_ref[:, 1:-1, 0])
        out_ref[:, 1:-1, W + 1] = jnp.where(
            rint, out_ref[:, 1:-1, W], out_ref[:, 1:-1, W + 1])
        out_ref[:, 0, 1:-1] = jnp.where(
            rint, sy * out_ref[:, 1, 1:-1], out_ref[:, 0, 1:-1])
        out_ref[:, H + 1, 1:-1] = jnp.where(
            rint, sy * out_ref[:, H, 1:-1], out_ref[:, H + 1, 1:-1])

        # z faces: sources read from the post-black extended window (ext row
        # e = out row e-2), so a source row in the neighboring block works
        @pl.when(k == k_z0)
        def _():
            out_ref[r_z0, 1:-1, 1:-1] = (
                jnp.asarray(sz, dtype) * ext_ref[r_z0 + 3, 1:-1, 1:-1])

        @pl.when(k == k_zD)
        def _():
            out_ref[r_zD, 1:-1, 1:-1] = (
                jnp.asarray(sz, dtype) * ext_ref[r_zD + 1, 1:-1, 1:-1])

        if apply_keep:
            out_ref[...] = out_ref[...] * keep_ref[...]

    if apply_keep:
        return body

    def body_nokeep(prevm_ref, mid_ref, nxt_ref, rprevm_ref, rmid_ref,
                    rnxt_ref, out_ref, ext_ref):
        return body(prevm_ref, mid_ref, nxt_ref, rprevm_ref, rmid_ref,
                    rnxt_ref, None, out_ref, ext_ref)

    return body_nokeep


@functools.partial(jax.jit, static_argnames=("b", "a", "c", "acc",
                                             "wall_mode", "interpret",
                                             "empty_scene", "blk"))
def pallas_rbgs_solve_blocked(b: int, field, prev, keep, a: float, c: float,
                              acc: int = 15, wall_mode: str = "reference",
                              interpret: bool = False,
                              empty_scene: bool = False,
                              blk: int | None = None):
    """Drop-in equivalent of ``pallas_rbgs_solve`` for grids too large for
    the VMEM-resident kernel: ``acc`` scanned z-blocked sweep kernels.
    ``blk`` overrides the auto-sized z-block (tests)."""
    shape = field.shape
    dtype = field.dtype
    if blk is None:
        blk = _pick_block(shape, itemsize=2 if dtype == jnp.bfloat16 else 4)
    # The z+ ghost face (gz = D+1) reads its source row gz = D from the same
    # block's post-black window; that window's own black recomputation of a
    # row BELOW the block lacks the red halo. Keep the source row in-block by
    # never letting gz = D+1 start a block.
    D = shape[0] - 2
    while 2 <= blk <= D + 1 and (D + 1) % blk == 0:
        blk += 1
    nblk = pl.cdiv(shape[0], blk)
    kernel = _make_sweep_kernel(b, a, c, wall_mode, shape, blk, dtype,
                                apply_keep=not empty_scene)

    spec_m = pl.BlockSpec((blk,) + shape[1:], lambda k: (k, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((blk,) + shape[1:],
                          lambda k: (jnp.maximum(k - 1, 0), 0, 0),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((blk,) + shape[1:],
                          lambda k: (jnp.minimum(k + 1, nblk - 1), 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [spec_p, spec_m, spec_n, spec_p, spec_m, spec_n]
    if not empty_scene:
        in_specs.append(spec_m)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk,) + shape[1:], lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((blk + 4,) + shape[1:], dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * int(np.prod(shape)),
            bytes_accessed=8 * _tiled_bytes(shape), transcendentals=0),
        **kwargs,
    )

    def sweep(f, _):
        if empty_scene:
            return call(f, f, f, prev, prev, prev), None
        return call(f, f, f, prev, prev, prev, keep), None

    field, _ = jax.lax.scan(sweep, field, None, length=acc)
    return field
