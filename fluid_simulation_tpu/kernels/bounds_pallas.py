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
