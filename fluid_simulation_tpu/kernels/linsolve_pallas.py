"""VMEM-resident fused red-black Gauss-Seidel solver (Pallas TPU).

One kernel invocation runs all ``acc`` sweeps of
``f = (prev + a*sum6(f)) / c`` with red-black ordering and the full boundary
treatment (reference ``linearSolver`` + ``setBounds``,
simulation.cpp:251-273/:183-246) applied after every sweep — while the field,
rhs, and obstacle-keep mask stay in VMEM. HBM traffic for a 15-sweep solve
drops from ~45 full-array transfers (XLA path: red half, black half, boundary
passes, each read+write) to exactly one read of (field, prev, keep) and one
write of field.

The field buffer is aliased in/out (``input_output_aliases``) so VMEM holds
three f32 arrays; at the default 128x64x64 grid that is 3 x 4.9 MB tiled.
Red/black parity is recomputed from iotas each half-sweep (cheap VPU work)
instead of loading a mask array.

Falls back to the jnp path (ops/linsolve.py) off-TPU or when the grid would
not fit in VMEM — decided by ``pallas_solve_supported``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Conservative per-core VMEM budget for our three resident buffers plus
# Mosaic temporaries. v5e VMEM is 128 MiB-class on paper but the practical
# ceiling for a single kernel is much lower; this value is validated by the
# kernel test at the default grid and revisited when larger grids need the
# two-pass path.
VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def _roll(x, shift: int, axis: int):
    """pltpu.roll with a bf16 workaround: Mosaic's dynamic_rotate supports
    only 32-bit data ("Rotate with non-32-bit data" compile error on chip).
    A roll is a pure permutation, and bf16->f32->bf16 is value-exact, so the
    upcast changes no bits."""
    if x.dtype == jnp.bfloat16:
        return pltpu.roll(x.astype(jnp.float32), shift, axis).astype(
            jnp.bfloat16)
    return pltpu.roll(x, shift, axis)


def _tiled_bytes(shape, itemsize=4):
    d = list(shape)
    d[-1] = -(-d[-1] // 128) * 128
    # native tiles: f32 (8, 128), bf16 (16, 128), int8 (32, 128)
    sub = {4: 8, 2: 16, 1: 32}[itemsize]
    d[-2] = -(-d[-2] // sub) * sub
    return int(np.prod(d)) * itemsize


def _itemsize(dtype) -> int:
    if dtype == jnp.int8:
        return 1
    return 2 if dtype == jnp.bfloat16 else 4


def pallas_solve_supported(shape, dtype=jnp.float32) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    # padded field(in/out alias)+prev+keep resident, plus the packed-kernel
    # scratch (field/prev/keep interior copies) and ~2 packed temporaries
    it = _itemsize(dtype)
    need = (4 * _tiled_bytes(shape, it)
            + 5 * _tiled_bytes(tuple(n - 2 for n in shape), it))
    return need <= VMEM_BUDGET_BYTES


def _make_kernel(b: int, acc: int, a: float, c: float, wall_mode: str,
                 shape, dtype, apply_keep: bool = True):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    # python-float literals embed in the kernel as constants (pallas kernels
    # cannot capture traced/ndarray values from the enclosing scope)
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    sx, sy, sz = _face_signs(b, wall_mode)

    def kernel(prev_ref, keep_ref, field_ref, out_ref):
        _kernel_body(prev_ref, keep_ref, field_ref, out_ref)

    def kernel_nokeep(prev_ref, field_ref, out_ref):
        _kernel_body(prev_ref, None, field_ref, out_ref)

    def _kernel_body(prev_ref, keep_ref, field_ref, out_ref):
        out_ref[...] = field_ref[...]
        prev_i = prev_ref[1:-1, 1:-1, 1:-1]
        # red = cells whose 1-based coordinate sum is even (masks.py red_i)
        iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
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

        def sweep(i, _):
            half(True)
            half(False)
            # setBounds (simulation.cpp:183-246): faces then obstacle keep
            out_ref[1:-1, 1:-1, 0] = sx * out_ref[1:-1, 1:-1, 1]
            out_ref[1:-1, 1:-1, W + 1] = out_ref[1:-1, 1:-1, W]  # outflow
            out_ref[1:-1, 0, 1:-1] = sy * out_ref[1:-1, 1, 1:-1]
            out_ref[1:-1, H + 1, 1:-1] = sy * out_ref[1:-1, H, 1:-1]
            out_ref[0, 1:-1, 1:-1] = sz * out_ref[1, 1:-1, 1:-1]
            out_ref[D + 1, 1:-1, 1:-1] = sz * out_ref[D, 1:-1, 1:-1]
            if apply_keep:
                out_ref[...] = out_ref[...] * keep_ref[...]
            return 0

        jax.lax.fori_loop(0, acc, sweep, 0)

    return kernel if apply_keep else kernel_nokeep


def _face_signs(b: int, wall_mode: str):
    """Ghost-face mirror signs for field type ``b`` (setBounds,
    simulation.cpp:183-216; noslip variant per ops/bounds.py)."""
    if wall_mode == "noslip" and b in (1, 2, 3):
        # matches ops/bounds._set_bounds_noslip: x- mirrors (negated only for
        # vx so the inlet survives); y/z walls negate every component
        return (-1.0 if b == 1 else 1.0), -1.0, -1.0
    return ((-1.0 if b == 1 else 1.0),
            (-1.0 if b == 2 else 1.0),
            (-1.0 if b == 3 else 1.0))


def _make_packed_kernel(b: int, acc: int, a: float, c: float, wall_mode: str,
                        shape, dtype, apply_keep: bool = True):
    """Packed-interior variant: all sweep arithmetic runs on (D, H, W)
    arrays, which tile VMEM exactly when the interior dims are tile
    multiples — at the flagship 128x64x64 the padded (66, 66, 130) layout
    tiles to 256 lanes (~2x VPU waste on every op, measured 35.4 vs
    18.0 us/sweep; NOTES.md), so packing halves the solve cost.

    Ghost handling: after any full sweep, every ghost face is a signed
    mirror of the *pre-keep* edge value (setBounds, ops/bounds.py:54-61),
    so the packed sweeps read ghosts as ``sign * fpre`` at the edge
    positions, where ``fpre`` is a pre-keep snapshot of the previous sweep
    — spliced in with ``pltpu.roll`` + iota-edge selects (x/y) and axis-0
    concats (z). Only the FIRST sweep sees arbitrary input ghosts (whatever
    state the caller passed), so sweep 1 runs in the legacy padded form and
    the remaining ``acc-1`` sweeps run packed. Value-identical to the
    padded kernel by construction, including the subtle case that solid
    cells carry nonzero intermediate values within a sweep (keep applies at
    sweep end) and neighbors read their stale pre-keep mirrors."""
    signs = _face_signs(b, wall_mode)
    if apply_keep:
        def kernel(prev_ref, keep_ref, field_ref, out_ref, fp, pp, kp, fpre):
            _packed_body(prev_ref, keep_ref, field_ref, out_ref,
                         fp, pp, kp, fpre, shape=shape, dtype=dtype,
                         signs=signs, a=a, c=c, acc=acc,
                         apply_keep=apply_keep)
    else:
        def kernel(prev_ref, field_ref, out_ref, fp, pp):
            _packed_body(prev_ref, None, field_ref, out_ref,
                         fp, pp, None, None, shape=shape, dtype=dtype,
                         signs=signs, a=a, c=c, acc=acc,
                         apply_keep=apply_keep)
    return kernel


def _packed_body(prev_ref, keep_ref, field_ref, out_ref, fp, pp, kp, fpre,
                 *, shape, dtype, signs, a, c, acc, apply_keep):
    """The packed-interior solve on one field (see _make_packed_kernel's
    docstring for the ghost algebra). Module-level so the fused multi-field
    kernel (``pallas_rbgs_solve3``) can run it per field with per-field
    signs; op order is untouched, so values stay bitwise-identical to the
    single-field kernel."""
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    sx, sy, sz = signs

    out_ref[...] = field_ref[...]
    prev_i = prev_ref[1:-1, 1:-1, 1:-1]
    iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
    red = ((iz + iy + ix) % 2) == 1
    a_c = jnp.asarray(a_lit, dtype)
    crec = jnp.asarray(crec_lit, dtype)
    sxc = jnp.asarray(sx, dtype)
    syc = jnp.asarray(sy, dtype)
    szc = jnp.asarray(sz, dtype)

    # ---- sweep 1, legacy padded form: the only sweep that reads the
    # caller's (arbitrary) input ghost faces
    def half_padded(take_red):
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

    half_padded(True)
    half_padded(False)
    if apply_keep:
        fpre[...] = out_ref[1:-1, 1:-1, 1:-1]  # pre-keep snapshot
        out_ref[...] = out_ref[...] * keep_ref[...]
        kp[...] = keep_ref[1:-1, 1:-1, 1:-1]
    fp[...] = out_ref[1:-1, 1:-1, 1:-1]
    pp[...] = prev_i

    # ---- sweeps 2..acc, packed: ghosts are signed mirrors of fpre at
    # the edge positions (see docstring). Every ghost splice reads the
    # updated cell's OWN position — which is the color being updated
    # and hence still holds its sweep-start value in ``f`` — so
    # without a keep multiply the pre-keep snapshot is ``f`` itself
    # and the fpre scratch + per-sweep copy are dropped (empty-scene
    # kernels only; with keep, fp is post-keep and fpre is required).
    def half(take_red):
        f = fp[...]
        pre = fpre[...] if apply_keep else f
        # pltpu.roll takes non-negative shifts: roll by size-1 == -1
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
        if apply_keep:
            fpre[...] = fp[...]                # pre-keep snapshot
            fp[...] = fp[...] * kp[...]
        return 0

    jax.lax.fori_loop(0, acc - 1, sweep, 0)
    out_ref[1:-1, 1:-1, 1:-1] = fp[...]
    # final ghost faces = signed mirrors of the final pre-keep edges
    # (identical to the legacy kernel's face writes); without keep the
    # final fp IS the pre-keep field
    fin = fpre if apply_keep else fp
    out_ref[1:-1, 1:-1, 0] = sxc * fin[:, :, 0]
    out_ref[1:-1, 1:-1, W + 1] = fin[:, :, W - 1]      # x+ outflow
    out_ref[1:-1, 0, 1:-1] = syc * fin[:, 0, :]
    out_ref[1:-1, H + 1, 1:-1] = syc * fin[:, H - 1, :]
    out_ref[0, 1:-1, 1:-1] = szc * fin[0]
    out_ref[D + 1, 1:-1, 1:-1] = szc * fin[D - 1]


def _packed_scratch(shape, dtype, apply_keep):
    from jax.experimental.pallas import tpu as pltpu
    D, H, W = (n - 2 for n in shape)
    n = 4 if apply_keep else 2                     # fp, pp, (kp, fpre)
    return [pltpu.VMEM((D, H, W), dtype) for _ in range(n)]


@functools.partial(jax.jit, static_argnames=("b", "a", "c", "acc",
                                              "wall_mode", "interpret",
                                              "empty_scene", "packed"))
def pallas_rbgs_solve(b: int, field: jnp.ndarray, prev: jnp.ndarray,
                      keep, a: float, c: float, acc: int = 15,
                      wall_mode: str = "reference",
                      interpret: bool = False,
                      empty_scene: bool = False,
                      packed: bool = False) -> jnp.ndarray:
    """Drop-in equivalent of ``linear_solver(..., solver='rbgs')`` for the
    padded-field layout; ``keep`` is the padded obstacle multiplier
    (masks.keep_vel for velocity components, masks.keep_scalar otherwise).
    With ``empty_scene`` the keep input is dropped entirely (exact identity
    when no solids; saves one VMEM-resident array and one VPU pass/sweep).
    ``interpret=True`` runs the Pallas interpreter (CPU tests).

    ``packed=True`` selects the interior-tiled kernel (3.7x faster at the
    flagship grid). It requires ``keep == 1`` on the ghost shell — true for
    every mask from ``build_masks`` (masks.py: keep arrays are ones with
    only the interior overwritten); arbitrary keep inputs with zeros on
    ghost faces would diverge from the legacy kernel there."""
    shape = field.shape
    make = _make_packed_kernel if packed else _make_kernel
    kernel = make(b, acc, a, c, wall_mode, shape, field.dtype,
                  apply_keep=not empty_scene)
    flops = 10 * acc * 2 * int(np.prod(shape))
    kwargs = {}
    if packed:
        kwargs["scratch_shapes"] = _packed_scratch(shape, field.dtype,
                                                   not empty_scene)
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    n_in = 2 if empty_scene else 3
    operands = (prev, field) if empty_scene else (prev, keep, field)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, field.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={n_in - 1: 0},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * _tiled_bytes(shape),
            transcendentals=0),
        **kwargs,
    )(*operands)


def pallas_solve3_supported(shape, dtype=jnp.float32) -> bool:
    """Gate for the fused 3-field solve: three resident (field, prev) pairs
    plus one shared keep and the reused packed scratch must fit VMEM."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    it = _itemsize(dtype)
    need = (7 * _tiled_bytes(shape, it)          # 3x(prev,field/out) + keep
            + 5 * _tiled_bytes(tuple(n - 2 for n in shape), it))
    return need <= VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnames=("bs", "a", "c", "acc",
                                              "wall_mode", "interpret",
                                              "empty_scene"))
def pallas_rbgs_solve3(bs, f1, f2, f3, p1, p2, p3, keep,
                       a: float, c: float, acc: int = 15,
                       wall_mode: str = "reference",
                       interpret: bool = False,
                       empty_scene: bool = False):
    """Three independent packed solves (same ``a``/``c``, field types
    ``bs = (b1, b2, b3)``) fused into ONE pallas_call — the step's three
    velocity diffusions (simulation.cpp:115-117) ride a single kernel
    launch, amortizing the per-call fixed cost (VMEM priming + grid setup,
    ~35 us/call measured by tools/exp_overhead.py) that three back-to-back
    resident solves each pay.

    Values are bitwise-identical to three ``pallas_rbgs_solve(..,
    packed=True)`` calls: each field runs the exact ``_packed_body`` with
    its own signs, sequentially, sharing only the scratch buffers (dead
    between fields). ``keep`` is the single shared multiplier (velocity
    components all use masks.keep_vel); ``None`` with ``empty_scene``."""
    shape = f1.shape
    dtype = f1.dtype
    apply_keep = not empty_scene
    D, H, W = (n - 2 for n in shape)

    def body(refs):
        if apply_keep:
            (p1r, p2r, p3r, keepr, f1r, f2r, f3r,
             o1, o2, o3, fp, pp, kp, fpre) = refs
        else:
            p1r, p2r, p3r, f1r, f2r, f3r, o1, o2, o3, fp, pp = refs
            keepr = kp = fpre = None
        for b, pr, fr, orf in ((bs[0], p1r, f1r, o1),
                               (bs[1], p2r, f2r, o2),
                               (bs[2], p3r, f3r, o3)):
            _packed_body(pr, keepr, fr, orf, fp, pp, kp, fpre,
                         shape=shape, dtype=dtype,
                         signs=_face_signs(b, wall_mode),
                         a=a, c=c, acc=acc, apply_keep=apply_keep)

    if apply_keep:
        def kernel(p1r, p2r, p3r, keepr, f1r, f2r, f3r, o1, o2, o3,
                   fp, pp, kp, fpre):
            body((p1r, p2r, p3r, keepr, f1r, f2r, f3r, o1, o2, o3,
                  fp, pp, kp, fpre))
        operands = (p1, p2, p3, keep, f1, f2, f3)
    else:
        def kernel(p1r, p2r, p3r, f1r, f2r, f3r, o1, o2, o3, fp, pp):
            body((p1r, p2r, p3r, f1r, f2r, f3r, o1, o2, o3, fp, pp))
        operands = (p1, p2, p3, f1, f2, f3)

    n_in = len(operands)
    flops = 3 * 10 * acc * 2 * int(np.prod(shape))
    kwargs = {"scratch_shapes": _packed_scratch(shape, dtype, apply_keep)}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    out = jax.ShapeDtypeStruct(shape, dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(out, out, out),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        input_output_aliases={n_in - 3: 0, n_in - 2: 1, n_in - 1: 2},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=12 * _tiled_bytes(shape),
            transcendentals=0),
        **kwargs,
    )(*operands)
