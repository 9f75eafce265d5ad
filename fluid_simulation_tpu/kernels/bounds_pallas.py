"""Fused pad-and-setBounds epilogue for the split/fast advection tails.

After the advection passes produce interior samples ``smp`` (B, D, H, W),
the step must rebuild padded fields: zero ghost shell, interior values
(masked by ``fluid_i`` and ``keep`` for obstacle scenes), and the six ghost
faces of ``setBounds`` (simulation.cpp:183-246). The composable tail
(``zeros.at[].set`` + ``set_bounds``'s six ``.at[].set`` faces) costs
~0.22 ms at 128x64x64 — XLA materialises full-array copies around the face
writes. This kernel emits each padded field in one VMEM pass (~40 us).

Semantics per component (== ops/bounds.set_bounds on a zeros-padded field):
- interior  = smp * fluid_i * keep   (masks omitted for empty scenes)
- ghost faces mirror the *pre-keep* interior edge (set_bounds writes faces
  before the keep multiply; the ghost shell's own keep is 1 by construction,
  masks.py) with the b-dependent signs; x+ is always an outflow copy.
- ghost edges/corners stay zero (the reference never writes them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    VMEM_BUDGET_BYTES, _itemsize, _tiled_bytes)


def pallas_pad_bounds_supported(padded_shape, nfields: int,
                                dtype=jnp.float32) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    D2, H2, W2 = padded_shape
    if min(D2, H2, W2) < 4:
        return False
    it = _itemsize(dtype)
    interior = (D2 - 2, H2 - 2, W2 - 2)
    need = (nfields + 2) * _tiled_bytes(interior, it) \
        + (nfields + 1) * _tiled_bytes(padded_shape, it)
    return need <= VMEM_BUDGET_BYTES


def _signs(b: int, wall_mode: str):
    if wall_mode == "noslip" and b in (1, 2, 3):
        return (-1.0 if b == 1 else 1.0), -1.0, -1.0
    return ((-1.0 if b == 1 else 1.0), (-1.0 if b == 2 else 1.0),
            (-1.0 if b == 3 else 1.0))


def _make_kernel(bs, wall_mode: str, shape, dtype, masked: bool):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    nf = len(bs)

    def kernel(*refs):
        smp_ref = refs[0]
        if masked:
            fluid_ref, keep_ref = refs[1], refs[2]
            outs = refs[3:3 + nf]
        else:
            outs = refs[1:1 + nf]
        for i, b in enumerate(bs):
            sx, sy, sz = (jnp.asarray(s, dtype)
                          for s in _signs(b, wall_mode))
            iv = smp_ref[i * D:(i + 1) * D]
            if masked:
                iv = iv * fluid_ref[...]
            out = outs[i]
            out[...] = jnp.zeros(shape, dtype)
            out[1:-1, 1:-1, 1:-1] = iv * keep_ref[...] if masked else iv
            out[1:-1, 1:-1, 0] = sx * iv[:, :, 0]
            out[1:-1, 1:-1, W + 1] = iv[:, :, W - 1]     # x+ outflow copy
            out[1:-1, 0, 1:-1] = sy * iv[:, 0, :]
            out[1:-1, H + 1, 1:-1] = sy * iv[:, H - 1, :]
            out[0, 1:-1, 1:-1] = sz * iv[0]
            out[D + 1, 1:-1, 1:-1] = sz * iv[D - 1]

    return kernel


# ---------------------------------------------------------------------------
# z-streamed variant for grids beyond the resident kernel's VMEM gate: the
# XLA concat fallback in models/windtunnel._pad_bounds_tail costs ~2.15 ms
# for the 3-field tail at 256^3 (profile_phases) vs a ~1.4 ms streaming
# floor (packed reads + 1.5x-lane-tiled padded writes). Used by the advect
# tails and the streamed projection's epilogue.
# ---------------------------------------------------------------------------

_HB = 8   # z-halo stream block (dim-1 z-planes fault Mosaic/LLO; NOTES.md)


def _pick_blk_pad(interior, nfields, dtype, masked):
    """Largest z-block (multiple of _HB dividing D) whose double-buffered
    windows fit VMEM."""
    D, H, W = interior
    it = _itemsize(dtype)
    rbi = _tiled_bytes((1, H, W), it)
    rbp = _tiled_bytes((1, H + 2, W + 2), it)
    for blk in (32, 16, 8):
        if blk > D or D % blk or blk % _HB:
            continue
        nin = nfields + (2 if masked else 0)
        need = 2 * ((blk + _HB) * rbi * nin + blk * rbp * nfields)
        if need <= VMEM_BUDGET_BYTES:
            return blk
    return None


def pallas_pad_bounds_stream_supported(padded_shape, nfields: int,
                                       dtype=jnp.float32,
                                       masked: bool = False) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    D2, H2, W2 = padded_shape
    if min(D2, H2, W2) < 4:
        return False
    interior = (D2 - 2, H2 - 2, W2 - 2)
    return _pick_blk_pad(interior, nfields, dtype, masked) is not None


def _make_stream_kernel(bs, wall_mode: str, shape, dtype, masked: bool,
                        blk: int, nblk: int):
    """Per-block builder. Output block k covers padded rows
    [k*blk, k*blk+blk); padded row gz draws on interior row r = gz-1, so
    each field streams a mid window (packed rows [kb, kb+blk)) plus an
    _HB-row lo window ending at kb — ``src`` row l is then interior row
    kb+l-1 at a STATIC window position for every k (the lo window's last
    row is kb-1 even for the clamped final block, because blk | D). Row 0
    of block 0 and row 1 of the final (partial, 2-row) block are the z
    ghost planes, rebuilt whole under pl.when."""
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    nf = len(bs)
    hb = _HB

    def kernel(*refs):
        k = pl.program_id(0)
        if masked:
            flo, fmid, klo, kmid = refs[:4]
            ins = refs[4:4 + 2 * nf]
        else:
            ins = refs[:2 * nf]
        outs = refs[-nf:]
        if masked:
            flu = jnp.concatenate([flo[hb - 1:], fmid[0:blk - 1]], axis=0)
            kp = jnp.concatenate([klo[hb - 1:], kmid[0:blk - 1]], axis=0)
        for i, b in enumerate(bs):
            sx, sy, sz = (jnp.asarray(s, dtype)
                          for s in _signs(b, wall_mode))
            lo, mid = ins[2 * i], ins[2 * i + 1]
            src = jnp.concatenate([lo[hb - 1:], mid[0:blk - 1]], axis=0)
            iv = src * flu if masked else src
            out = outs[i]
            out[...] = jnp.zeros((blk, H2, W2), dtype)
            out[:, 1:H + 1, 1:W + 1] = iv * kp if masked else iv
            out[:, 1:H + 1, 0:1] = sx * iv[:, :, 0:1]
            out[:, 1:H + 1, W + 1:W + 2] = iv[:, :, W - 1:W]  # x+ outflow
            out[:, 0:1, 1:W + 1] = sy * iv[:, 0:1, :]
            out[:, H + 1:H + 2, 1:W + 1] = sy * iv[:, H - 1:H, :]

            @pl.when(k == 0)
            def _():
                # padded row 0 = z- ghost plane of interior row 0 (mid[0])
                zsrc = mid[0:1] * flu[1:2] if masked else mid[0:1]
                out[0:1] = jnp.zeros((1, H2, W2), dtype)
                out[0:1, 1:H + 1, 1:W + 1] = sz * zsrc

            @pl.when(k == nblk - 1)
            def _():
                # local row 1 = padded row D+1 = z+ ghost plane of interior
                # row D-1 = the lo window's last row (blk | D)
                zsrc = lo[hb - 1:hb] * flu[0:1] if masked else lo[hb - 1:hb]
                out[1:2] = jnp.zeros((1, H2, W2), dtype)
                out[1:2, 1:H + 1, 1:W + 1] = sz * zsrc

    return kernel


@functools.partial(jax.jit, static_argnames=("bs", "wall_mode", "interpret",
                                             "blk"))
def pallas_pad_bounds_stream(smp: jnp.ndarray, bs: tuple,
                             wall_mode: str = "reference",
                             fluid_i=None, keep_i=None,
                             interpret: bool = False,
                             blk: int | None = None):
    """Streamed drop-in for :func:`pallas_pad_bounds` at >VMEM grids.

    Same contract and bitwise-identical values (pure data movement plus
    exact +-1 sign multiplies, in the fallback's operand order). Requires
    ``blk | D`` (gate :func:`pallas_pad_bounds_stream_supported`)."""
    if smp.ndim == 3:
        smp = smp[None]
    B, D, H, W = smp.shape
    if B != len(bs):
        raise ValueError(f"{B} fields vs bs={bs}")
    shape = (D + 2, H + 2, W + 2)
    dtype = smp.dtype
    masked = fluid_i is not None
    if blk is None:
        blk = _pick_blk_pad((D, H, W), B, dtype, masked)
    if blk is None or D % blk or blk % _HB or blk > D:
        raise ValueError(f"no stream pad-bounds block for D={D} blk={blk}")
    hb = _HB
    r_ = blk // hb
    nbi = D // blk
    nblk = nbi + 1          # cdiv(D+2, blk) given blk | D and blk >= 2
    kernel = _make_stream_kernel(bs, wall_mode, shape, dtype, masked, blk,
                                 nblk)
    lo_spec = pl.BlockSpec((hb, H, W),
                           lambda k: (jnp.maximum(k * r_ - 1, 0), 0, 0),
                           memory_space=pltpu.VMEM)
    mid_spec = pl.BlockSpec((blk, H, W),
                            lambda k: (jnp.minimum(k, nbi - 1), 0, 0),
                            memory_space=pltpu.VMEM)
    operands, in_specs = [], []
    if masked:
        fi = fluid_i.astype(dtype)
        ki = keep_i.astype(dtype)
        operands += [fi, fi, ki, ki]
        in_specs += [lo_spec, mid_spec, lo_spec, mid_spec]
    for i in range(B):
        operands += [smp[i], smp[i]]
        in_specs += [lo_spec, mid_spec]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    it = _itemsize(dtype)
    nin = B + (2 if masked else 0)
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=[jax.ShapeDtypeStruct(shape, dtype)] * B,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((blk,) + shape[1:], lambda k: (k, 0, 0),
                                memory_space=pltpu.VMEM)] * B,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * H * W,
            bytes_accessed=int((1 + hb / blk) * nin
                               * _tiled_bytes((D, H, W), it)
                               + B * _tiled_bytes(shape, it)),
            transcendentals=0),
        **kwargs,
    )(*operands)
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("bs", "wall_mode", "interpret"))
def pallas_pad_bounds(smp: jnp.ndarray, bs: tuple,
                      wall_mode: str = "reference",
                      fluid_i=None, keep_i=None,
                      interpret: bool = False):
    """Rebuild padded, boundary-conditioned fields from advected interiors.

    ``smp`` is (B, D, H, W) stacked interior samples (or (D, H, W) for one
    field); ``bs`` the per-field reference tags (e.g. ``(1, 2, 3)`` for the
    velocity stack, ``(0,)`` for density). For obstacle scenes pass
    ``fluid_i`` (interior fluid mask) and ``keep_i`` — the *interior* of
    the per-class keep multiplier (``masks.keep_vel``/``keep_scalar``; its
    ghost shell is 1 by construction and never materialises here). Returns
    a tuple of B padded arrays, equal to
    ``set_bounds(b, zeros.at[interior].set(smp_b * fluid_i), masks, ...)``.
    """
    if smp.ndim == 3:
        smp = smp[None]
    B, D, H, W = smp.shape
    if B != len(bs):
        raise ValueError(f"{B} fields vs bs={bs}")
    shape = (D + 2, H + 2, W + 2)
    dtype = smp.dtype
    masked = fluid_i is not None
    kernel = _make_kernel(bs, wall_mode, shape, dtype, masked)
    operands = [smp.reshape(B * D, H, W)]
    if masked:
        operands += [fluid_i.astype(dtype), keep_i.astype(dtype)]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape, dtype)] * B,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * B,
        interpret=interpret,
        **kwargs,
    )(*operands)
    return tuple(outs)
