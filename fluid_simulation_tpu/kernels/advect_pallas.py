"""Operator-split semi-Lagrangian advection on Mosaic lane-gathers.

The compat trilinear backtrace is an arbitrary 3-D gather — XLA's take runs
it at ~5-9 ns/element and it dominates the step (4 advects x 8 corners).
Mosaic *can* do dynamic gathers along the lane (last) axis at ~2.3 ns/element,
but only within one 128-lane tile and not across sublanes. This module
exploits that with dimensional splitting (the classic alternative for
semi-Lagrangian transport): three 1-D advection passes, each a per-lane
linear-interpolation gather along the last axis, with cheap transposes
between passes:

    A(z,y,x) = lerp_x(prev(z,y,:),  x - dt*W*vx)
    B(z,y,x) = lerp_y(A(z,:,x),     y - dt*H*vy)
    out      = lerp_z(B(:,y,x),     z - dt*D*vz)

Split advection is NOT the compat trilinear operator (mode='compat' keeps
that); it is the standard production formulation for smoke solvers and is
exposed as ``mode='split'``.

Kernel constraints honored here:
- gather axis <= 128 lanes -> the x pass (W+2 = 130 at the flagship size)
  uses two overlapping 128-lane windows and selects by index;
- index arrays must be the same 2-D shape as the gathered window.

Interior-only outputs per pass (ghost x/y lanes are never needed downstream;
ghost y/z *rows* are carried where a later pass samples them).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_dtype(dtype):
    """Mosaic dynamic_gather needs index/result bitwidths to match; sub-32-bit
    data (bf16) is gathered through an f32 upcast (cheap VPU casts)."""
    return jnp.float32 if jnp.dtype(dtype).itemsize < 4 else dtype


def _lerp_kernel_single(arr_ref, xb_ref, out_ref):
    """C <= 128: out[r, c] = lerp(arr[r, i0], arr[r, i0+1], frac)."""
    C = arr_ref.shape[1]
    xb = xb_ref[...]
    # clamp guards the padded rows of a partial final grid block, whose index
    # lanes are undefined
    i0 = jnp.clip(jnp.floor(xb).astype(jnp.int32), 0, C - 2)
    gd = _gather_dtype(arr_ref.dtype)
    s = (xb - i0.astype(xb.dtype)).astype(gd)
    arr = arr_ref[...].astype(gd)
    a = jnp.take_along_axis(arr, i0, axis=1)
    b = jnp.take_along_axis(arr, i0 + 1, axis=1)
    out_ref[...] = (a * (1.0 - s) + b * s).astype(out_ref.dtype)


def _window_offsets(C: int):
    """Offsets of overlapping 128-lane source windows covering ``i0`` in
    ``[0, C-2]`` with ``i0+1`` inside the window: window j at offset ``off``
    serves ``off <= i0 <= off+126``. Stride 127; the last window is clamped
    to end at lane C-1."""
    offs, off = [], 0
    while True:
        off = min(off, C - 128)
        offs.append(off)
        if off + 126 >= C - 2:
            return offs
        off += 127


def _make_lerp_kernel_nwindow(C: int):
    """C > 128: gather through ceil((C-1)/127) overlapping 128-lane windows,
    selecting per lane by which window holds ``i0`` (and ``i0+1``). The
    output block is <= 128 lanes wide (callers chunk wider outputs over the
    grid). Cost grows linearly in the window count — 2 windows at the
    flagship W2=130, 3 at 256^3's 258."""
    offs = _window_offsets(C)

    def kernel(arr_ref, xb_ref, out_ref):
        xb = xb_ref[...]
        i0 = jnp.clip(jnp.floor(xb).astype(jnp.int32), 0, C - 2)
        gd = _gather_dtype(arr_ref.dtype)
        s = (xb - i0.astype(xb.dtype)).astype(gd)
        a = jnp.zeros(xb.shape, gd)
        b = jnp.zeros(xb.shape, gd)
        for j, off in enumerate(offs):
            w = arr_ref[:, off:off + 128].astype(gd)
            # window j serves i0 in [off, off+126]; earlier windows win ties
            use = i0 <= off + 126 if j == 0 else (
                (i0 >= off) & (i0 <= off + 126) if j < len(offs) - 1
                else i0 >= off)
            li = jnp.clip(i0 - off, 0, 126)
            a = jnp.where(use, jnp.take_along_axis(w, li, axis=1), a)
            b = jnp.where(use, jnp.take_along_axis(w, li + 1, axis=1), b)
        out_ref[...] = (a * (1.0 - s) + b * s).astype(out_ref.dtype)

    return kernel


# widest gather axis the n-window kernel accepts: window count (= VPU gather
# passes) grows linearly with C; past this the XLA take fallback is no worse
LANE_LERP_MAX_C = 1664  # 13 windows


def _make_lerp_kernel_stack(Bn: int, C: int):
    """Stacked variant: ``Bn`` source fields share ONE index plane. The
    index math (floor/clip/frac) runs once; each field is gathered with the
    same per-lane indices. Values are bitwise-identical per field to the
    2-D kernels above (same expression tree). Block layout — full-``Bn``
    3-D blocks with an in-kernel ``range(Bn)`` loop — is the `_lane_pass`
    layout, the one stacked form proven stable inside kernel-dense scans
    (leading *grid* dims with squeezed blocks fault Mosaic; NOTES.md)."""
    offs = _window_offsets(C) if C > 128 else None

    def kernel(arr_ref, xb_ref, out_ref):
        xb = xb_ref[...]
        i0 = jnp.clip(jnp.floor(xb).astype(jnp.int32), 0, C - 2)
        gd = _gather_dtype(arr_ref.dtype)
        s = (xb - i0.astype(xb.dtype)).astype(gd)
        if offs is not None:
            # per-window local indices + boundary masks are shared by all
            # Bn fields: gather every window, then one nested boundary
            # select — cheaper on the VPU than per-window use-masks +
            # where chains (this pass is select-bound, not gather- or
            # DMA-bound at 256-class widths), and value-identical: the
            # first window containing i0 wins and overlapping windows
            # hold the same source lanes
            lis = [jnp.clip(i0 - off, 0, 126) for off in offs]
            inws = [i0 <= off + 126 for off in offs[:-1]]
        for b in range(Bn):
            if offs is None:
                arr = arr_ref[b].astype(gd)
                a = jnp.take_along_axis(arr, i0, axis=1)
                bb = jnp.take_along_axis(arr, i0 + 1, axis=1)
            else:
                ga, gb = [], []
                for off, li in zip(offs, lis):
                    w = arr_ref[b][:, off:off + 128].astype(gd)
                    ga.append(jnp.take_along_axis(w, li, axis=1))
                    gb.append(jnp.take_along_axis(w, li + 1, axis=1))
                a, bb = ga[-1], gb[-1]
                for j in range(len(offs) - 2, -1, -1):
                    a = jnp.where(inws[j], ga[j], a)
                    bb = jnp.where(inws[j], gb[j], bb)
            out_ref[b] = (a * (1.0 - s) + bb * s).astype(out_ref.dtype)

    return kernel


def lane_lerp_stack(arr3d: jnp.ndarray, xb2d: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """``lane_lerp`` over a (Bn, R, C) stack sharing one (R, Co) index plane.

    Replaces the ``tile()`` broadcast of the index plane across the stack —
    a physical Bn-fold materialisation that at 256^3 wrote + re-read
    ~0.6 GB per velocity-advect pass (profile_phases: lane_lerp pass
    3.9 ms of a 17.4 ms advect). Outputs are bitwise-equal per field to
    ``lane_lerp(arr3d[b], tile(xb2d))``."""
    Bn, R, C = arr3d.shape
    Ro, Co = xb2d.shape
    if R != Ro:
        raise ValueError(f"row mismatch {arr3d.shape} vs {xb2d.shape}")
    if C > LANE_LERP_MAX_C:
        raise ValueError(f"gather axis too wide for the lane kernel: {C}")
    if C <= 128 and Co != C:
        raise ValueError("single-window path needs idx width == C")
    C_BLK = min(Co, 128)
    n_chunks = pl.cdiv(Co, C_BLK)
    # VMEM row budget: double-buffered arr (Bn, RB, C) + xb (RB, CB) +
    # out (Bn, RB, CB), lane dims tile-rounded (same accounting as
    # _lane_pass, which runs this block shape on-chip)
    # bf16 blocks are promoted to f32 inside the kernel (gather dtype),
    # so their scoped-VMEM cost is bf16 block + f32 copy = 6 B/elem
    it = 6 if arr3d.dtype == jnp.bfloat16 else 4
    ct = -(-C // 128) * 128
    cbt = -(-C_BLK // 128) * 128
    per_row = 2 * (Bn * ct * it + cbt * 4 + Bn * cbt * it)
    R_BLK = max(64, (48 * 1024 * 1024) // per_row) // 8 * 8
    R_BLK = min(R, R_BLK)
    kernel = _make_lerp_kernel_stack(Bn, C)
    grid = (pl.cdiv(R, R_BLK), n_chunks)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Bn, R, Co), arr3d.dtype),
        in_specs=[
            pl.BlockSpec((Bn, R_BLK, C), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_BLK, C_BLK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bn, R_BLK, C_BLK), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(arr3d, xb2d)


def lane_lerp(arr2d: jnp.ndarray, xb2d: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """1-D linear-interpolation gather along the last axis.

    ``xb2d``'s width is the output width (any width; outputs wider than 128
    are chunked over the grid for the n-window path). Indices must satisfy
    ``0 <= floor(xb) <= C-2`` (callers clamp like simulation.cpp:388-390).
    """
    R, C = arr2d.shape
    Ro, Co = xb2d.shape
    if R != Ro:
        raise ValueError(f"row mismatch {arr2d.shape} vs {xb2d.shape}")
    if C > LANE_LERP_MAX_C:
        raise ValueError(f"gather axis too wide for the lane kernel: {C}")
    # block over rows: bounds VMEM independent of the row count (the default
    # scoped-vmem budget is ~43 MB; a whole stacked flagship pass needs 63 MB)
    if C <= 128:
        if Co != C:
            raise ValueError("single-window path needs idx width == C")
        R_BLK = min(R, 4096)
        grid = (pl.cdiv(R, R_BLK),)
        return pl.pallas_call(
            _lerp_kernel_single,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((R, Co), arr2d.dtype),
            in_specs=[
                pl.BlockSpec((R_BLK, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_BLK, Co), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R_BLK, Co), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(arr2d, xb2d)
    # n-window path: each kernel instance sees the full source rows plus one
    # <=128-lane chunk of the output/index block
    kernel = _make_lerp_kernel_nwindow(C)
    C_BLK = min(Co, 128)
    # sublane dim of a partial block must be a multiple of 8
    R_BLK = max(512, (4096 * 128) // (-(-C // 128) * 128)) // 8 * 8
    R_BLK = min(R, R_BLK)
    grid = (pl.cdiv(R, R_BLK), pl.cdiv(Co, C_BLK))
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((R, Co), arr2d.dtype),
        in_specs=[
            pl.BlockSpec((R_BLK, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_BLK, C_BLK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_BLK, C_BLK), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(arr2d, xb2d)


def lane_lerp_supported(padded_shape) -> bool:
    D2, H2, W2 = padded_shape[-3:]
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # every pass's gather axis must fit the n-window kernel
    return max(W2, H2, D2) <= LANE_LERP_MAX_C


# ---------------------------------------------------------------------------
# Fused backtrace+gather pass: the index math (iota - dt*N*v, clamp,
# floor/frac — simulation.cpp:384-390 per axis) runs inside the kernel from
# the velocity component itself, so XLA never materialises full-size index
# arrays between passes (at the flagship that was ~6.3 MB written + read per
# pass for the 3-stack). Values are bit-identical to the lane_lerp path: the
# same f32 expression tree evaluates in the same order, only in VMEM.
# ---------------------------------------------------------------------------


def _make_pass_kernel(Bn: int, C: int, dtN: float, N: int, n_chunks: int):
    """Gather-lerp along lanes with in-kernel backtrace.

    arr_ref: (Bn, RB, C) source rows; v_ref: (RB, CB) velocity chunk;
    out_ref: (Bn, RB, CB). Lane l of chunk j is padded coordinate
    ``j*CB + l``; interior coordinates are 1..N (padded index == coordinate,
    ops/advect.py backtrace). Ghost-lane outputs compute clamped garbage and
    are sliced away by the caller — they never feed later passes' interiors
    (gathers along other axes read only same-lane values)."""
    offs = _window_offsets(C) if C > 128 else [0]
    lo = float(np.float32(0.5))
    hi = float(np.float32(np.float32(N) + np.float32(0.5)))
    dtN_l = float(np.float32(dtN))

    def kernel(arr_ref, v_ref, out_ref):
        CB = v_ref.shape[1]
        j = pl.program_id(1) if n_chunks > 1 else 0
        lane = jax.lax.broadcasted_iota(jnp.int32, v_ref.shape, 1)
        xi = (lane + j * CB).astype(jnp.float32)
        v = v_ref[...].astype(jnp.float32)
        # bitcast round-trip forces the product to round to f32 before the
        # subtract: the in-kernel compiler otherwise contracts mul+sub into
        # an FMA, whose single rounding moves xb ~1 ulp off the lane_lerp
        # path and can flip a floor() across a cell boundary
        prod = jnp.float32(dtN_l) * v
        prod = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(prod, jnp.int32), jnp.float32)
        xb = jnp.clip(xi - prod, jnp.float32(lo), jnp.float32(hi))
        i0 = jnp.clip(jnp.floor(xb).astype(jnp.int32), 0, C - 2)
        s = xb - i0.astype(jnp.float32)
        for b in range(Bn):
            gd = _gather_dtype(arr_ref.dtype)
            if C <= 128:
                arr = arr_ref[b].astype(gd)
                a = jnp.take_along_axis(arr, i0, axis=1)
                bb = jnp.take_along_axis(arr, i0 + 1, axis=1)
            else:
                a = jnp.zeros(i0.shape, gd)
                bb = jnp.zeros(i0.shape, gd)
                for wj, off in enumerate(offs):
                    w = arr_ref[b][:, off:off + 128].astype(gd)
                    use = i0 <= off + 126 if wj == 0 else (
                        (i0 >= off) & (i0 <= off + 126)
                        if wj < len(offs) - 1 else i0 >= off)
                    li = jnp.clip(i0 - off, 0, 126)
                    a = jnp.where(use, jnp.take_along_axis(w, li, axis=1), a)
                    bb = jnp.where(use,
                                   jnp.take_along_axis(w, li + 1, axis=1), bb)
            out_ref[b] = (a * (1.0 - s) + bb * s).astype(out_ref.dtype)

    return kernel


def _lane_pass(arr3d: jnp.ndarray, v2d: jnp.ndarray, dtN: float, N: int,
               interpret: bool = False) -> jnp.ndarray:
    """One fused advection pass: ``out[b, r, c] = lerp(arr[b, r, :],
    clip(c - dtN*v[r, c], 0.5, N+0.5))`` along the lane axis.

    ``arr3d`` is (Bn, R, C) — stacked fields sharing one velocity; ``v2d``
    is (R, C) in the *same padded layout* (the backtrace only reads the
    lane's own velocity). Returns (Bn, R, C) full width."""
    Bn, R, C = arr3d.shape
    if v2d.shape != (R, C):
        raise ValueError(f"velocity shape {v2d.shape} != rows {(R, C)}")
    if C > LANE_LERP_MAX_C:
        raise ValueError(f"gather axis too wide for the lane kernel: {C}")
    C_BLK = C if C <= 128 else 128
    n_chunks = pl.cdiv(C, C_BLK)
    # row block from a VMEM byte budget: double-buffered arr-in (Bn, RB, C)
    # + v (RB, CB) + out (Bn, RB, CB), lane dims tile-rounded
    # bf16 blocks are promoted to f32 inside the kernel (gather dtype),
    # so their scoped-VMEM cost is bf16 block + f32 copy = 6 B/elem
    it = 6 if arr3d.dtype == jnp.bfloat16 else 4
    ct = -(-C // 128) * 128
    cbt = -(-C_BLK // 128) * 128
    per_row = 2 * (Bn * ct + cbt + Bn * cbt) * it
    R_BLK = max(64, (48 * 1024 * 1024) // per_row) // 8 * 8
    R_BLK = min(R, R_BLK)
    kernel = _make_pass_kernel(Bn, C, dtN, N, n_chunks)
    grid = (pl.cdiv(R, R_BLK), n_chunks)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Bn, R, C), arr3d.dtype),
        in_specs=[
            pl.BlockSpec((Bn, R_BLK, C), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_BLK, C_BLK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bn, R_BLK, C_BLK), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(arr3d, v2d)


@functools.partial(jax.jit, static_argnames=("dt_", "interpret"))
def advect_split_fused(prev: jnp.ndarray, vx: jnp.ndarray, vy: jnp.ndarray,
                       vz: jnp.ndarray, dt_: float,
                       interpret: bool = False) -> jnp.ndarray:
    """advect_split with the backtrace fused into each pass kernel.

    Same expression tree as ``advect_split``; outputs agree to ~1-2 ulp
    (measured max 2.4e-7 on randomized fields). Exact bit-parity is not
    attainable: the in-kernel compiler and the outside-XLA path make
    different FMA-contraction choices for the lerp (the backtrace product
    is barriered below, which removes the *index* flips). 'split' mode has
    no bit-parity contract — goldens ride 'compat' — so the cheaper fused
    form is the production path (advect_split_auto)."""
    squeeze = prev.ndim == 3
    if squeeze:
        prev = prev[None]
    Bn, D2, H2, W2 = prev.shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    # dt*N products in f32, matching advect_split's
    # ``np.float32(dt) * np.float32(N)`` exactly (1-ulp parity matters: a
    # differently-rounded coefficient can move a floor() across a cell)
    dt = np.float32(dt_)

    # ---- x pass: lanes = x, rows = (z, y) incl. ghosts
    A = _lane_pass(prev.reshape(Bn, D2 * H2, W2),
                   vx.reshape(D2 * H2, W2), float(dt * np.float32(W)), W,
                   interpret=interpret).reshape(Bn, D2, H2, W2)

    # ---- y pass: lanes = y, rows = (z, x) incl. ghost x lanes
    At = jnp.swapaxes(A, 2, 3)                       # (Bn, D2, W2, H2)
    vyT = jnp.swapaxes(vy, 1, 2)                     # (D2, W2, H2)
    B = _lane_pass(At.reshape(Bn, D2 * W2, H2),
                   vyT.reshape(D2 * W2, H2), float(dt * np.float32(H)), H,
                   interpret=interpret).reshape(Bn, D2, W2, H2)

    # ---- z pass: lanes = z, rows = (y, x)
    Bt = jnp.transpose(B, (0, 3, 2, 1))              # (Bn, H2, W2, D2)
    vzT = jnp.transpose(vz, (1, 2, 0))               # (H2, W2, D2)
    Cc = _lane_pass(Bt.reshape(Bn, H2 * W2, D2),
                    vzT.reshape(H2 * W2, D2), float(dt * np.float32(D)), D,
                    interpret=interpret).reshape(Bn, H2, W2, D2)
    out = jnp.transpose(Cc, (0, 3, 1, 2))[:, 1:-1, 1:-1, 1:-1]
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Transposing y/z passes: gather along a non-lane axis by transposing VMEM
# blocks *inside* the kernel instead of materialising XLA transposes of the
# whole field between passes. On the v5e, 2-D value transposes, strided
# middle-row ref loads (a_ref[b, :, s, :]) and stores are exact and cost
# below slope-timing noise at (258, 8, 128)-class blocks
# (tools/exp_transpose.py probe/probe3). This removes, per y/z pass:
#   - the materialised swapaxes/transpose of the (Bn, D2, *, *) stack
#     (HBM round trip), and
#   - the 1.5-2x lane-tile tax of gathering along a padded (N+2)-wide axis
#     (258 lanes tile to 384): the natural-layout blocks keep the exact
#     interior width on lanes and the padded axis on sublanes (258 -> 264,
#     ~2% instead of 50%).
# ---------------------------------------------------------------------------


def _gather_lerp_T(at, it_f, G2: int, Go: int, gd):
    """Lerp-gather along the lane axis of a transposed block.

    ``at``: (NB, G2) source lanes (gather axis), ``it_f``: (NB, Go) f32
    coordinates. Returns (NB, Go) in ``gd``. Same expression tree as
    ``_make_lerp_kernel_stack`` (floor/clip/frac, nested-select window
    combine, a*(1-s)+b*s), so values are bitwise-identical to the
    ``lane_lerp`` path for the same coordinates."""
    i0 = jnp.clip(jnp.floor(it_f).astype(jnp.int32), 0, G2 - 2)
    s = (it_f - i0.astype(it_f.dtype)).astype(gd)
    if G2 <= 128:
        # single window: gather width must equal the source width; pad the
        # index lanes with edge duplicates and slice after (the two pad
        # lanes compute real in-bounds values that are simply discarded)
        pad = G2 - Go
        i0p = jnp.concatenate([i0] + [i0[:, -1:]] * pad, axis=1)
        a = jnp.take_along_axis(at, i0p, axis=1)[:, :Go]
        b = jnp.take_along_axis(at, i0p + 1, axis=1)[:, :Go]
        return a * (1.0 - s[:, :Go]) + b * s[:, :Go]
    offs = _window_offsets(G2)
    outs = []
    for c0 in range(0, Go, 128):
        i0c = i0[:, c0:c0 + 128]
        sc = s[:, c0:c0 + 128]
        lis = [jnp.clip(i0c - off, 0, 126) for off in offs]
        inws = [i0c <= off + 126 for off in offs[:-1]]
        ga, gb = [], []
        for off, li in zip(offs, lis):
            w = at[:, off:off + 128]
            ga.append(jnp.take_along_axis(w, li, axis=1))
            gb.append(jnp.take_along_axis(w, li + 1, axis=1))
        a, bb = ga[-1], gb[-1]
        for j in range(len(offs) - 2, -1, -1):
            a = jnp.where(inws[j], ga[j], a)
            bb = jnp.where(inws[j], gb[j], bb)
        outs.append(a * (1.0 - sc) + bb * sc)
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def _t_pass_supported(G2: int, N: int) -> bool:
    """One transposing pass is usable when the gather axis either fits a
    single 128-lane window or chunks the interior evenly (the in-kernel
    output chunking has no partial-chunk path)."""
    Go = G2 - 2
    return G2 <= LANE_LERP_MAX_C and (G2 <= 128 or Go % 128 == 0)


def _make_y_kernel_T(Bn: int, SB: int, G2: int):
    Go = G2 - 2

    def kernel(a_ref, i_ref, o_ref):
        gd = _gather_dtype(a_ref.dtype)
        for s in range(SB):
            it = jnp.swapaxes(i_ref[s], 0, 1)               # (NB, Go) f32
            for b in range(Bn):
                at = jnp.swapaxes(a_ref[b, s], 0, 1).astype(gd)  # (NB, G2)
                res = _gather_lerp_T(at, it, G2, Go, gd)
                o_ref[b, s] = jnp.swapaxes(res, 0, 1).astype(o_ref.dtype)

    return kernel


def _make_z_kernel_T(Bn: int, SB: int, G2: int):
    Go = G2 - 2

    def kernel(a_ref, i_ref, o_ref):
        gd = _gather_dtype(a_ref.dtype)
        for s in range(SB):
            it = jnp.swapaxes(i_ref[:, s, :], 0, 1)         # (NB, Go) f32
            for b in range(Bn):
                at = jnp.swapaxes(
                    a_ref[b, :, s, :], 0, 1).astype(gd)     # (NB, G2)
                res = _gather_lerp_T(at, it, G2, Go, gd)
                o_ref[b, :, s, :] = jnp.swapaxes(res, 0, 1).astype(
                    o_ref.dtype)

    return kernel


def _t_vmem_kwargs(interpret):
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


def _lerp_pass_yT(arr4: jnp.ndarray, yb3: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Gather-lerp along axis 2 of ``arr4`` (Bn, S2, G2, N) at natural-layout
    coordinates ``yb3`` (S2, Go, N). Returns (Bn, S2, Go, N)."""
    Bn, S2, G2, N = arr4.shape
    Go = G2 - 2
    if yb3.shape != (S2, Go, N):
        raise ValueError(f"idx shape {yb3.shape} != {(S2, Go, N)}")
    NB = min(N, 128)
    # bf16 -> 6 B/elem: bf16 block + in-kernel f32 promoted copy
    it = 6 if arr4.dtype == jnp.bfloat16 else 4
    g2t = -(-G2 // 8) * 8
    nbt = -(-NB // 128) * 128
    per_s = 2 * (Bn * g2t * nbt * it + Go * nbt * 4 + Bn * Go * nbt * it)
    SB = max(1, (40 * 1024 * 1024) // per_s)
    SB = min(S2, SB)
    grid = (pl.cdiv(S2, SB), pl.cdiv(N, NB))
    return pl.pallas_call(
        _make_y_kernel_T(Bn, SB, G2),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Bn, S2, Go, N), arr4.dtype),
        in_specs=[
            pl.BlockSpec((Bn, SB, G2, NB), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, Go, NB), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bn, SB, Go, NB), lambda i, j: (0, i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **_t_vmem_kwargs(interpret),
    )(arr4, yb3)


def _lerp_pass_zT(arr4: jnp.ndarray, zb3: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Gather-lerp along axis 1 of ``arr4`` (Bn, G2, S, N) at natural-layout
    coordinates ``zb3`` (Go, S, N). Returns (Bn, Go, S, N)."""
    Bn, G2, S, N = arr4.shape
    Go = G2 - 2
    if zb3.shape != (Go, S, N):
        raise ValueError(f"idx shape {zb3.shape} != {(Go, S, N)}")
    NB = min(N, 128)
    # bf16 -> 6 B/elem: bf16 block + in-kernel f32 promoted copy
    it = 6 if arr4.dtype == jnp.bfloat16 else 4
    nbt = -(-NB // 128) * 128
    # SB is the sublane dim of every block here: keep it a multiple of 8
    per_s = 2 * (Bn * G2 * nbt * it + Go * nbt * 4 + Bn * Go * nbt * it)
    SB = max(8, (40 * 1024 * 1024) // per_s // 8 * 8)
    SB = min(S, SB)
    grid = (pl.cdiv(S, SB), pl.cdiv(N, NB))
    return pl.pallas_call(
        _make_z_kernel_T(Bn, SB, G2),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Bn, Go, S, N), arr4.dtype),
        in_specs=[
            pl.BlockSpec((Bn, G2, SB, NB), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Go, SB, NB), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bn, Go, SB, NB), lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **_t_vmem_kwargs(interpret),
    )(arr4, zb3)


def advect_split_t_supported(padded_shape) -> bool:
    """Gate for the transposing-pass variant: the x pass needs the lane
    kernel, the y/z passes need their gather axes to chunk evenly."""
    D2, H2, W2 = padded_shape[-3:]
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return (W2 <= LANE_LERP_MAX_C and _t_pass_supported(H2, W2 - 2)
            and _t_pass_supported(D2, W2 - 2))


@functools.partial(jax.jit, static_argnames=("dt_", "interpret"))
def advect_split_t(prev: jnp.ndarray, vx: jnp.ndarray, vy: jnp.ndarray,
                   vz: jnp.ndarray, dt_: float,
                   interpret: bool = False) -> jnp.ndarray:
    """``advect_split`` with natural-layout y/z passes (in-kernel block
    transposes instead of materialised XLA transposes). Outputs are bitwise
    identical to ``advect_split``: the coordinate arrays are computed by the
    same XLA expressions (only in natural layout — a pure permutation) and
    the kernels run the same gather/lerp expression tree."""
    squeeze = prev.ndim == 3
    if squeeze:
        prev = prev[None]
    Bn, D2, H2, W2 = prev.shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    dt = np.float32(dt_)
    ct = jnp.float32

    def lerp(arr3d_rows, idx2d):
        if Bn == 1:
            return lane_lerp(arr3d_rows[0], idx2d,
                             interpret=interpret)[None]
        return lane_lerp_stack(arr3d_rows, idx2d, interpret=interpret)

    # ---- x pass: identical to advect_split (lanes are already x)
    xi = _coords(W, ct).reshape(1, 1, W)
    xb = jnp.clip(xi - jnp.asarray(dt * np.float32(W), ct)
                  * vx[:, :, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(W) + np.float32(0.5), ct))
    if W2 <= 128:
        xb_full = jnp.concatenate(
            [xb[:, :, :1], xb, xb[:, :, -1:]], axis=2)
        a = lerp(prev.reshape(Bn, D2 * H2, W2),
                 xb_full.reshape(D2 * H2, W2))[:, :, 1:-1]
    else:
        a = lerp(prev.reshape(Bn, D2 * H2, W2),
                 xb.reshape(D2 * H2, W))
    A = a.reshape(Bn, D2, H2, W)

    # ---- y pass: natural layout, gather along axis 2
    yi = _coords(H, ct).reshape(1, H, 1)
    yb = jnp.clip(yi - jnp.asarray(dt * np.float32(H), ct)
                  * vy[:, 1:-1, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(H) + np.float32(0.5), ct))
    B = _lerp_pass_yT(A, yb, interpret=interpret)      # (Bn, D2, H, W)

    # ---- z pass: natural layout, gather along axis 1
    zi = _coords(D, ct).reshape(D, 1, 1)
    zb = jnp.clip(zi - jnp.asarray(dt * np.float32(D), ct)
                  * vz[1:-1, 1:-1, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(D) + np.float32(0.5), ct))
    out = _lerp_pass_zT(B, zb, interpret=interpret)    # (Bn, D, H, W)
    return out[0] if squeeze else out


def _coords(n: int, dtype):
    return jnp.arange(1, n + 1, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("dt_", "interpret"))
def advect_split(prev: jnp.ndarray, vx: jnp.ndarray, vy: jnp.ndarray,
                 vz: jnp.ndarray, dt_: float,
                 interpret: bool = False) -> jnp.ndarray:
    """Split advection of padded field(s) through (vx, vy, vz).

    ``prev`` is one padded field (D2, H2, W2) or a stack (B, D2, H2, W2) of
    fields advected through the *same* velocity (the per-pass gather indices
    are computed once and shared). Returns advected interior(s)
    (B?, D, H, W); the caller applies solid masking and boundaries.
    Displacements use the velocity at the output cell (simultaneous/fast
    style), per-axis scaling and clamps as the reference
    (simulation.cpp:384-390).
    """
    squeeze = prev.ndim == 3
    if squeeze:
        prev = prev[None]
    Bn = prev.shape[0]
    _, D2, H2, W2 = prev.shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    dt = np.float32(dt_)

    def lerp(arr3d_rows, idx2d):
        """One pass over the (Bn, rows, C) stack with ONE shared index
        plane: the stacked kernel for real stacks, the 2-D kernel for a
        single field (the density advect keeps its proven program shape)."""
        if Bn == 1:
            return lane_lerp(arr3d_rows[0], idx2d,
                             interpret=interpret)[None]
        return lane_lerp_stack(arr3d_rows, idx2d, interpret=interpret)

    # coordinate math always in f32: identical for f32 fields, and for bf16
    # fields it keeps backtrace positions at full precision (bf16 coords are
    # ~1-cell coarse at 256-wide axes) and keeps the kernels' ALU in f32/i32
    # (v5e LLO rejects some bf16 vector ALU, and Mosaic dynamic_gather needs
    # 32-bit data to pair with i32 indices)
    ct = jnp.float32

    # ---- x pass: rows = (z, y) incl. ghost rows; out width W
    xi = _coords(W, ct).reshape(1, 1, W)
    xb = jnp.clip(xi - jnp.asarray(dt * np.float32(W), ct)
                  * vx[:, :, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(W) + np.float32(0.5), ct))
    if W2 <= 128:
        # single-window kernel wants idx width == W2: edge-pad, slice after
        xb_full = jnp.concatenate(
            [xb[:, :, :1], xb, xb[:, :, -1:]], axis=2)
        a = lerp(prev.reshape(Bn, D2 * H2, W2),
                 xb_full.reshape(D2 * H2, W2))[:, :, 1:-1]
    else:
        a = lerp(prev.reshape(Bn, D2 * H2, W2),
                 xb.reshape(D2 * H2, W))
    A = a.reshape(Bn, D2, H2, W)

    # ---- y pass: transpose y to lanes; rows = (z incl. ghosts, x interior)
    yi = _coords(H, ct).reshape(1, H, 1)
    yb = jnp.clip(yi - jnp.asarray(dt * np.float32(H), ct)
                  * vy[:, 1:-1, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(H) + np.float32(0.5), ct))  # (D2, H, W)
    At = jnp.swapaxes(A, 2, 3)                       # (B, D2, W, H2)
    ybt = jnp.swapaxes(yb, 1, 2)                     # (D2, W, H)
    # the single-window kernel wants idx width == H2; the two extra output
    # lanes are edge-duplicated indices and sliced away below
    ybt_full = jnp.concatenate(
        [ybt[:, :, :1], ybt, ybt[:, :, -1:]], axis=2)        # (D2, W, H2)
    b = lerp(At.reshape(Bn, D2 * W, H2),
             ybt_full.reshape(D2 * W, H2))
    B = jnp.swapaxes(b.reshape(Bn, D2, W, H2), 2, 3)[:, :, 1:-1, :]

    # ---- z pass: transpose z to lanes; rows = (y, x)
    zi = _coords(D, ct).reshape(D, 1, 1)
    zb = jnp.clip(zi - jnp.asarray(dt * np.float32(D), ct)
                  * vz[1:-1, 1:-1, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(D) + np.float32(0.5), ct))
    Bt = jnp.transpose(B, (0, 2, 3, 1))              # (B, H, W, D2)
    zbt = jnp.transpose(zb, (1, 2, 0))               # (H, W, D)
    zbt_full = jnp.concatenate(
        [zbt[:, :, :1], zbt, zbt[:, :, -1:]], axis=2)        # (H, W, D2)
    c = lerp(Bt.reshape(Bn, H * W, D2),
             zbt_full.reshape(H * W, D2))
    out = jnp.transpose(c.reshape(Bn, H, W, D2), (0, 3, 1, 2))[:, 1:-1]
    return out[0] if squeeze else out


def advect_split_jnp(prev, vx, vy, vz, dt_):
    """XLA fallback of advect_split (CPU, or grids outside the lane-kernel
    limits): same three passes with jnp.take_along_axis. Accepts the same
    optional leading stack axis as advect_split."""
    squeeze = prev.ndim == 3
    if squeeze:
        prev = prev[None]
    dtype = prev.dtype
    _, D2, H2, W2 = prev.shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    dt = np.float32(dt_)
    ct = jnp.float32   # f32 coordinate math, like advect_split

    def lerp(arr, coords, axis):
        i0 = jnp.floor(coords).astype(jnp.int32)
        s = coords - i0.astype(ct)
        i0b = jnp.broadcast_to(i0[None], arr.shape[:1] + i0.shape)
        a = jnp.take_along_axis(arr, i0b, axis=axis)
        b = jnp.take_along_axis(arr, i0b + 1, axis=axis)
        return (a * (1.0 - s) + b * s).astype(dtype)

    xi = _coords(W, ct).reshape(1, 1, W)
    xb = jnp.clip(xi - jnp.asarray(dt * np.float32(W), ct)
                  * vx[:, :, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(W) + np.float32(0.5), ct))
    A = lerp(prev, xb, axis=3)

    yi = _coords(H, ct).reshape(1, H, 1)
    yb = jnp.clip(yi - jnp.asarray(dt * np.float32(H), ct)
                  * vy[:, 1:-1, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(H) + np.float32(0.5), ct))
    B = lerp(A, yb, axis=2)

    zi = _coords(D, ct).reshape(D, 1, 1)
    zb = jnp.clip(zi - jnp.asarray(dt * np.float32(D), ct)
                  * vz[1:-1, 1:-1, 1:-1].astype(ct), jnp.asarray(0.5, ct),
                  jnp.asarray(np.float32(D) + np.float32(0.5), ct))
    out = lerp(B, zb, axis=1)
    return out[0] if squeeze else out


def advect_split_auto(prev, vx, vy, vz, dt_, use_pallas=True, prefer_t=True):
    """Dispatch to the Mosaic lane kernels when supported, XLA otherwise.

    The production path is ``advect_split_t`` (natural-layout y/z passes
    with in-kernel block transposes): process-isolated full-step A/B on
    the v5e (tools/exp_advect_t.py, identical 20-step state SHA per size)
    measures tpass vs the materialised-transpose ``advect_split`` at
    0.985 vs 1.043 ms/step (128x64x64), 13.38 vs 13.71 (256x128x128),
    58.6 vs 65.0 (256^3) and 176.0 vs 190.4 (512x256x256) — removing the
    XLA transpose round trips and the padded-axis lane-tile tax wins at
    every measured size. NOT the fused-backtrace variant either:
    tools/exp_advect_ab2.py measured fused 1.210 vs 0.965 at flagship and
    87.0 vs 69.9 at 256^3 — the in-kernel backtrace recompute plus its
    per-window i32/f32 operand pressure costs more than the index-array
    HBM traffic it removes. ``advect_split_fused`` stays opt-in.

    ``prefer_t=False`` skips the t-pass and keeps the lane_lerp path: in
    steps whose masked solves run the depth-1 lo/mid/hi BlockSpec
    z-streaming kernels, the transpose programs eat the mix's exposed
    small-window DMA issue rate (~1.5 ms flat at 256x128x128 sphere:
    17.0 vs 15.6 ms/step). With the merged-window manual-DMA masked
    solves (3 issues/grid-step) the penalty is gone and the t-pass wins
    everywhere measured — 13.22 vs 13.88 at 256x128x128 sphere
    (tools/exp_advect_mix.py). The caller routes on the solve-kernel
    MIX, not size (models/windtunnel.py::_advect_prefer_t)."""
    if use_pallas and prefer_t and advect_split_t_supported(prev.shape):
        return advect_split_t(prev, vx, vy, vz, float(dt_))
    if use_pallas and lane_lerp_supported(prev.shape):
        return advect_split(prev, vx, vy, vz, float(dt_))
    return advect_split_jnp(prev, vx, vy, vz, float(dt_))


def advect_split_reference(prev, vx, vy, vz, dt_):
    """NumPy oracle for advect_split (tests): same three passes, computed
    with take_along_axis directly on each axis."""
    prev = np.asarray(prev, np.float32)
    vx, vy, vz = (np.asarray(v, np.float32) for v in (vx, vy, vz))
    D2, H2, W2 = prev.shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    dt = np.float32(dt_)

    def lerp(arr, coords, axis):
        i0 = np.floor(coords).astype(np.int64)
        s = (coords - i0).astype(np.float32)
        a = np.take_along_axis(arr, i0, axis=axis)
        b = np.take_along_axis(arr, i0 + 1, axis=axis)
        return a * (1 - s) + b * s

    xi = np.arange(1, W + 1, dtype=np.float32)
    xb = np.clip(xi[None, None, :] - dt * np.float32(W)
                 * vx[:, :, 1:-1], 0.5, W + 0.5)          # (D2, H2, W)
    A = lerp(prev, xb, axis=2)                            # (D2, H2, W)

    yi = np.arange(1, H + 1, dtype=np.float32)
    yb = np.clip(yi[None, :, None] - dt * np.float32(H)
                 * vy[:, 1:-1, 1:-1], 0.5, H + 0.5)       # (D2, H, W)
    B = lerp(A, yb, axis=1)                               # (D2, H, W)

    zi = np.arange(1, D + 1, dtype=np.float32)
    zb = np.clip(zi[:, None, None] - dt * np.float32(D)
                 * vz[1:-1, 1:-1, 1:-1], 0.5, D + 0.5)    # (D, H, W)
    return lerp(B, zb, axis=0)                            # (D, H, W)
