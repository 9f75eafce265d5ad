"""Exact compat-mode trilinear corner fetch as a Mosaic kernel.

The compat advection (ops/advect.py, mirroring simulation.cpp:367-424) is an
arbitrary 3-D gather: XLA's per-index row gather runs it at ~2.06 ms per
advect at the flagship size and the four advects dominate the compat step
(VERDICT r2 weak #2). This kernel removes the XLA gather from the hot path
while keeping compat's golden-parity contract, by construction:

- XLA computes the backtrace coordinates, ``i0 = floor(xb)`` and the *window
  offsets* ``dz = floor(zb) - z`` / ``dy = floor(yb) - y`` (exact integer
  ops on the very arrays the fallback path uses).
- The reference clamp (simulation.cpp:388-390) bounds the backtrace reach by
  ``dt*N*|v|`` cells; when the transverse velocities are small the
  ``dz``/``dy`` offsets lie in a static window ``[-K, K]`` / ``[-KY, KY]``.
  NOTE (measured, tools/exp_compat_advect.py + exp_compat2.py): at the
  reference's flagship speed this premise FAILS — vy/vz reach ~+-3 even in
  an empty tunnel (projection of the inlet jet), so offsets reach 13-18
  cells and the per-4-slab spread is 17-31 (no dynamic-base salvage). The
  kernel is therefore OPT-IN via ``SimParams.advect_window`` for
  low-speed/small-dt flows, where it is 5.2x faster than the XLA gather
  (0.40 vs 2.08 ms/advect at 128x64x64, slope-timed on one v5e).
- The kernel fetches the 8 trilinear corners with ONLY static row-shifted
  slices, integer-predicate selects, and <=128-lane ``take_along_axis``
  gathers — zero floating-point arithmetic in-kernel, so the fetched corners
  are bit-identical to the XLA gather's on every backend (pure selection
  cannot round).
- The trilinear lerp stays *outside* in XLA, shared verbatim with the
  fallback path (``ops.advect._lerp8``), so the advected values are
  bit-identical too.
- A runtime uniform predicate (``lax.cond``) falls back to the XLA gather
  whenever any backtrace escapes the window — the same
  bounded-window/exact-fallback pattern as parallel/sharded.py's
  ``_z_lerp_dispatch``. Either branch returns the same values; only speed
  differs.

Geometry: rows are flattened padded (z, y) pairs — a (dz, dy) neighbor shift
is the single static row shift ``dz*H2 + dy`` (never crossing a z-slab for
in-window reads, since ``j0 + b`` stays inside the padded y range). The z
axis is blocked over the grid with one leading/trailing slab-block of halo,
realized by pre-padding z with ``ZB`` slabs so the three input windows are
plain block indices ``i, i+1, i+2`` (no clamped index maps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid_simulation_tpu.kernels.advect_pallas import (
    LANE_LERP_MAX_C, _gather_dtype, _window_offsets)

# VMEM ceiling for the adaptive z-block choice (empirical Mosaic budget is
# ~43 MB of scoped vmem; leave headroom for double buffering).
_VMEM_CEIL = 30 * 1024 * 1024


def _pick_zb(H2: int, C: int, K: int) -> int | None:
    """Largest z-slab block with a safe VMEM estimate. Slices into the
    3-window concat need ``ZB >= K + 2`` rows of slack (see module doc)."""
    ct = -(-C // 128) * 128
    for zb in (8, 4, 2):
        if zb < K + 2:
            continue
        rb = zb * H2
        # zcat (3 rb rows) + 8 corner accumulators + in/out blocks + temps,
        # all f32 in the worst case, double-buffered pipeline overhead ~2x
        est = 2 * 4 * rb * (3 * ct + 3 * ct + 14 * ct)
        if est <= _VMEM_CEIL * 2:
            return zb
    return None


def corner_fetch_supported(padded_shape, dtype=jnp.float32, K: int = 1,
                           KY: int = 1) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    D2, H2, W2 = padded_shape[-3:]
    if W2 > LANE_LERP_MAX_C or min(D2, H2, W2) < 4:
        return False
    return _pick_zb(H2, W2, K) is not None


def _make_corner_kernel(K: int, KY: int, C: int, RB: int, H2: int):
    """Kernel body: 8 corner planes from bounded-window row selects + lane
    gathers. Inputs: three row-blocks (w_prev, w_cur, w_next) of the padded
    field, plus i0/dz/dy integer blocks at output-chunk width."""
    offs = _window_offsets(C) if C > 128 else [0]

    def gather_pair(row_block, i0):
        """(row[i0], row[i0+1]) through <=128-lane windows; window j serves
        bases ``off <= i0 <= off+126`` so the +1 lane stays inside."""
        gd = row_block.dtype
        if C <= 128:
            return (jnp.take_along_axis(row_block, i0, axis=1),
                    jnp.take_along_axis(row_block, i0 + 1, axis=1))
        g0 = jnp.zeros(i0.shape, gd)
        g1 = jnp.zeros(i0.shape, gd)
        for wj, off in enumerate(offs):
            w = row_block[:, off:off + 128]
            use = i0 <= off + 126 if wj == 0 else (
                (i0 >= off) & (i0 <= off + 126)
                if wj < len(offs) - 1 else i0 >= off)
            li = jnp.clip(i0 - off, 0, 126)
            g0 = jnp.where(use, jnp.take_along_axis(w, li, axis=1), g0)
            g1 = jnp.where(use, jnp.take_along_axis(w, li + 1, axis=1), g1)
        return g0, g1

    def kernel(wp_ref, wc_ref, wn_ref, i0_ref, dz_ref, dy_ref, out_ref):
        gd = _gather_dtype(wc_ref.dtype)
        zcat = jnp.concatenate(
            [wp_ref[...], wc_ref[...], wn_ref[...]], axis=0).astype(gd)
        # clip guards undefined lanes of partial final grid blocks
        i0 = jnp.clip(i0_ref[...], 0, C - 2)
        dzv = dz_ref[...]
        dyv = dy_ref[...]
        eq_z = {d: dzv == d for d in range(-K, K + 1)}
        eq_y = {d: dyv == d for d in range(-KY, KY + 1)}

        # corner accumulators in trilinear_gather's offset order:
        # (dz_corner a, dy_corner b, dx_corner g) -> index 4*a + 2*b + g
        acc = [jnp.zeros(i0.shape, gd) for _ in range(8)]
        for dzp in range(-K, K + 2):          # combined row shift dz + a
            for dyp in range(-KY, KY + 2):    # combined row shift dy + b
                row = zcat[RB + dzp * H2 + dyp:2 * RB + dzp * H2 + dyp, :]
                g0, g1 = gather_pair(row, i0)
                for a in (0, 1):
                    for b in (0, 1):
                        dz, dy = dzp - a, dyp - b
                        if not (-K <= dz <= K and -KY <= dy <= KY):
                            continue
                        p = eq_z[dz] & eq_y[dy]
                        i = 4 * a + 2 * b
                        acc[i] = jnp.where(p, g0, acc[i])
                        acc[i + 1] = jnp.where(p, g1, acc[i + 1])
        for i in range(8):
            out_ref[i] = acc[i].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("K", "KY", "interpret"))
def corner_fetch(prev: jnp.ndarray, i0p: jnp.ndarray, dzp: jnp.ndarray,
                 dyp: jnp.ndarray, K: int = 1, KY: int = 1,
                 interpret: bool = False) -> jnp.ndarray:
    """Fetch the 8 trilinear corner planes of ``prev`` (padded (D2,H2,W2)).

    ``i0p``/``dzp``/``dyp`` are int32 arrays in *padded-row geometry*
    ``(D2, H2, Wc)`` where ``Wc`` is ``W2`` when ``W2 <= 128`` (x ghost
    lanes carry safe dummies) else the interior width ``W``. ``i0p`` holds
    absolute x corner bases in ``[0, W2-2]``; ``dzp``/``dyp`` hold the z/y
    window offsets, which MUST lie in ``[-K, K]`` / ``[-KY, KY]`` wherever
    the result is consumed (callers guarantee this via the uniform
    predicate; out-of-window rows produce unspecified values, never OOB
    reads). Returns ``(8, D2, H2, Wc)`` corner planes in
    ``ops.advect.trilinear_gather``'s offset order.
    """
    D2, H2, W2 = prev.shape
    Wc = i0p.shape[-1]
    ZB = _pick_zb(H2, W2, K)
    if ZB is None:
        raise ValueError(f"unsupported geometry {prev.shape} for K={K}")
    nz = -(-D2 // ZB)
    RB = ZB * H2
    # one halo slab-block each side; back-pad also rounds D2 up to nz blocks
    prev2d = jnp.pad(
        prev, ((ZB, (nz + 1) * ZB - D2), (0, 0), (0, 0))).reshape(-1, W2)

    def coords2d(arr):
        return jnp.pad(
            arr, ((0, nz * ZB - D2), (0, 0), (0, 0))).reshape(-1, Wc)

    i2d, dz2d, dy2d = coords2d(i0p), coords2d(dzp), coords2d(dyp)
    CB = Wc if Wc <= 128 else 128
    nc = -(-Wc // CB)
    kernel = _make_corner_kernel(K, KY, W2, RB, H2)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(nz, nc),
        out_shape=jax.ShapeDtypeStruct((8, nz * RB, Wc), prev.dtype),
        in_specs=[
            pl.BlockSpec((RB, W2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, W2), lambda i, j: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, W2), lambda i, j: (i + 2, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, CB), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, CB), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, CB), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, RB, CB), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(prev2d, prev2d, prev2d, i2d, dz2d, dy2d)
    return out[:, :D2 * H2, :].reshape(8, D2, H2, Wc)


def trilinear_gather_pallas(prev: jnp.ndarray, xb, yb, zb, K: int = 1,
                            KY: int = 1, interpret: bool = False):
    """Drop-in for ``ops.advect.trilinear_gather`` on TPU: kernel corner
    fetch + the shared XLA lerp, with an exact ``lax.cond`` fallback to the
    XLA gather when any backtrace escapes the (K, KY) window. Bit-identical
    to the fallback on every input (asserted in tests)."""
    from fluid_simulation_tpu.ops.advect import _lerp8, trilinear_gather

    D2, H2, W2 = prev.shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    i0 = jnp.floor(xb).astype(jnp.int32)
    j0 = jnp.floor(yb).astype(jnp.int32)
    k0 = jnp.floor(zb).astype(jnp.int32)
    sx = xb - i0.astype(xb.dtype)
    sy = yb - j0.astype(yb.dtype)
    sz = zb - k0.astype(zb.dtype)
    yi = jnp.arange(1, H + 1, dtype=jnp.int32).reshape(1, H, 1)
    zi = jnp.arange(1, D + 1, dtype=jnp.int32).reshape(D, 1, 1)
    dz = k0 - zi
    dy = j0 - yi
    ok = jnp.logical_and(
        jnp.all(jnp.abs(dz) <= K), jnp.all(jnp.abs(dy) <= KY))

    Wc = W2 if W2 <= 128 else W

    def pad_geom(arr, xdup: bool):
        out = jnp.zeros((D2, H2, Wc), arr.dtype)
        if Wc == W2:
            return out.at[1:-1, 1:-1, 1:-1].set(arr)
        return out.at[1:-1, 1:-1, :].set(arr)

    def kernel_branch(prev, i0, dz, dy, sx, sy, sz):
        g = corner_fetch(prev, pad_geom(i0, True), pad_geom(dz, False),
                         pad_geom(dy, False), K=K, KY=KY,
                         interpret=interpret)
        if Wc == W2:
            g = g[:, 1:-1, 1:-1, 1:-1]
        else:
            g = g[:, 1:-1, 1:-1, :]
        return _lerp8(g[0], g[1], g[2], g[3], g[4], g[5], g[6], g[7],
                      sx, sy, sz, prev.dtype)

    def xla_branch(prev, i0, dz, dy, sx, sy, sz):
        return trilinear_gather(prev, xb, yb, zb)

    return jax.lax.cond(ok, kernel_branch, xla_branch,
                        prev, i0, dz, dy, sx, sy, sz)
