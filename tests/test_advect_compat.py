"""Compat corner-fetch kernel (kernels/advect_compat.py) vs the XLA gather.

The kernel performs no floating-point arithmetic (selects + lane gathers
only), so the fetched corner PLANES must match the gather bitwise — even in
interpret mode. The full advect path (corner fetch + shared ``_lerp8``) is
compared at 1-2 ulp here: the ``lax.cond``-traced lerp gets FMA-contracted
by XLA while the eager reference lerp does not. On the chip, where both
paths compile inside one jit program, bitwise equality of the full path is
asserted by tools/exp_compat_advect.py (see NOTES.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fluid_simulation_tpu.ops.advect import backtrace, trilinear_gather
from fluid_simulation_tpu.kernels.advect_compat import (
    corner_fetch, trilinear_gather_pallas)


def _random_case(shape, vmag_y, vmag_z, seed=0, dtype=jnp.float32):
    """Padded field + backtraced coords with y/z displacement bounded by
    dt*N*vmag (vmag in velocity units)."""
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    rng = np.random.default_rng(seed)
    prev = jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)
    vx = jnp.asarray(rng.normal(scale=2.0, size=(D, H, W)).astype(np.float32))
    vy = jnp.asarray(
        rng.normal(scale=vmag_y, size=(D, H, W)).astype(np.float32))
    vz = jnp.asarray(
        rng.normal(scale=vmag_z, size=(D, H, W)).astype(np.float32))
    dt = 0.05
    xb, yb, zb = backtrace(vx, vy, vz, dt, W, H, D, jnp.float32)
    return prev, xb, yb, zb


def _corner_planes_case(shape, K, KY, seed, dtype=jnp.float32,
                        zero_yz=False):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    if zero_yz:
        rng = np.random.default_rng(seed)
        prev = jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)
        vx = jnp.asarray(
            rng.normal(scale=3.0, size=(D, H, W)).astype(np.float32))
        zero = jnp.zeros((D, H, W), jnp.float32)
        xb, yb, zb = backtrace(vx, zero, zero, 0.05, W, H, D, jnp.float32)
    else:
        prev, xb, yb, zb = _random_case(
            shape, vmag_y=2.0 / H2, vmag_z=2.0 / D2, seed=seed, dtype=dtype)
    i0 = np.floor(np.asarray(xb)).astype(np.int32)
    j0 = np.floor(np.asarray(yb)).astype(np.int32)
    k0 = np.floor(np.asarray(zb)).astype(np.int32)
    yi = np.arange(1, H + 1, dtype=np.int32)[None, :, None]
    zi = np.arange(1, D + 1, dtype=np.int32)[:, None, None]
    assert np.abs(k0 - zi).max() <= K and np.abs(j0 - yi).max() <= KY

    Wc = W2 if W2 <= 128 else W

    def pad_geom(a):
        out = np.zeros((D2, H2, Wc), np.int32)
        if Wc == W2:
            out[1:-1, 1:-1, 1:-1] = a
        else:
            out[1:-1, 1:-1, :] = a
        return jnp.asarray(out)

    g = corner_fetch(prev, pad_geom(i0), pad_geom(k0 - zi), pad_geom(j0 - yi),
                     K=K, KY=KY, interpret=True)
    g = np.asarray(g, np.float32)
    g = g[:, 1:-1, 1:-1, 1:-1] if Wc == W2 else g[:, 1:-1, 1:-1, :]
    pnp = np.asarray(prev, np.float32)
    for idx, (a, b, c) in enumerate(
            [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
             (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]):
        np.testing.assert_array_equal(g[idx], pnp[k0 + a, j0 + b, i0 + c])


@pytest.mark.parametrize("shape", [(10, 18, 34), (8, 10, 130), (6, 10, 162)])
def test_corner_planes_bitwise(shape):
    """Fetched corners equal prev[k0+a, j0+b, i0+g] exactly — single-window,
    flagship-width (W2=130, 2 gather windows) and chunked (Wc=W=160, 2
    output chunks) geometries."""
    _corner_planes_case(shape, K=1, KY=1, seed=5)


def test_corner_planes_zero_window():
    """K = KY = 0: the empty-tunnel case (vy == vz == 0 identically)."""
    _corner_planes_case((10, 18, 34), K=0, KY=0, seed=3, zero_yz=True)


def test_corner_planes_bf16():
    _corner_planes_case((8, 10, 130), K=1, KY=1, seed=11,
                        dtype=jnp.bfloat16)


@pytest.mark.parametrize("shape", [(10, 18, 34), (6, 10, 162)])
def test_full_path_matches_xla(shape):
    """Corner fetch + shared lerp vs the XLA gather path: equal to 1-2 ulp
    in interpret mode (FMA contraction inside the traced cond; see module
    docstring — bitwise asserted on-chip)."""
    D2, H2, W2 = shape
    prev, xb, yb, zb = _random_case(shape, vmag_y=2.0 / H2, vmag_z=2.0 / D2)
    ours = np.asarray(trilinear_gather_pallas(prev, xb, yb, zb, K=1, KY=1,
                                              interpret=True))
    ref = np.asarray(trilinear_gather(prev, xb, yb, zb))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-7)


def test_advect_window_param_wiring():
    """SimParams.advect_window=1 (the opt-in) produces the same fields as
    the default: on CPU the backend gate routes to the XLA gather, and on
    TPU the lax.cond fallback is exact — bit-identical either way."""
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import WindTunnel

    outs = []
    for win in (0, 1):
        p = SimParams(width=16, height=8, depth=8, div_stats=False,
                      mode="compat", advect_window=win)
        wt = WindTunnel(p)
        final, _ = wt.simulate(steps=3)
        outs.append(np.asarray(final.dens))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_window_escape_falls_back():
    """Backtraces past the window trip the uniform predicate -> XLA branch
    (same gather, traced: 1-ulp class agreement)."""
    shape = (10, 18, 34)
    prev, xb, yb, zb = _random_case(shape, vmag_y=2.0, vmag_z=2.0, seed=7)
    j0 = np.floor(np.asarray(yb))
    yi = np.arange(1, shape[1] - 1)[None, :, None]
    assert np.abs(j0 - yi).max() > 1
    ours = np.asarray(trilinear_gather_pallas(prev, xb, yb, zb, K=1, KY=1,
                                              interpret=True))
    ref = np.asarray(trilinear_gather(prev, xb, yb, zb))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-7)
