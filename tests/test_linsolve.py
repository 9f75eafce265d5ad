"""Linear solver: wavefront GS == sequential GS; all solvers share the fixed
point; diffusion coefficients match the reference's f32 arithmetic."""

import numpy as np
import jax.numpy as jnp

from fluid_simulation_tpu.ops.linsolve import (
    linear_solver, diffusion_coeffs)
from fluid_simulation_tpu.scene.masks import build_masks
from fluid_simulation_tpu.scene.primitives import empty_obstacles

W, H, D = 6, 5, 4


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    prev = rng.normal(size=(D + 2, H + 2, W + 2)).astype(np.float32)
    f = rng.normal(size=(D + 2, H + 2, W + 2)).astype(np.float32)
    masks = build_masks(jnp.asarray(empty_obstacles(W, H, D)))
    return jnp.asarray(f), jnp.asarray(prev), masks


def _seq_gs_sweep(f, prev, a, c_recip):
    """Sequential lexicographic Gauss-Seidel, exactly the reference's loop
    nest and operand order (simulation.cpp:258-270), as the oracle."""
    f = f.copy()
    for i in range(1, W + 1):          # x outermost (collapse(3) order)
        for j in range(1, H + 1):
            for l in range(1, D + 1):
                s = np.float32(
                    ((((f[l, j, i + 1] + f[l, j, i - 1]) + f[l, j + 1, i])
                      + f[l, j - 1, i]) + f[l + 1, j, i]) + f[l - 1, j, i])
                f[l, j, i] = np.float32(prev[l, j, i] + np.float32(a) * s) * c_recip
    return f


def _np_bounds_scalar(f):
    f = f.copy()
    f[1:-1, 1:-1, 0] = f[1:-1, 1:-1, 1]
    f[1:-1, 1:-1, -1] = f[1:-1, 1:-1, -2]
    f[1:-1, 0, 1:-1] = f[1:-1, 1, 1:-1]
    f[1:-1, -1, 1:-1] = f[1:-1, -2, 1:-1]
    f[0, 1:-1, 1:-1] = f[1, 1:-1, 1:-1]
    f[-1, 1:-1, 1:-1] = f[-2, 1:-1, 1:-1]
    return f


def test_wavefront_matches_sequential_gs():
    f, prev, masks = _setup()
    a, c = 0.7, 1.0 + 6.0 * 0.7
    got = np.asarray(linear_solver(0, f, prev, a, c, masks, acc=3,
                                   solver="gs_wavefront"))
    want = np.asarray(f)
    c_recip = np.float32(1.0) / np.float32(c)
    for _ in range(3):
        want = _seq_gs_sweep(want, np.asarray(prev), a, c_recip)
        want = _np_bounds_scalar(want)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_solvers_share_fixed_point():
    f, prev, masks = _setup(1)
    a, c = 0.5, 4.0
    sols = {
        s: np.asarray(linear_solver(0, f, prev, a, c, masks, acc=200, solver=s))
        for s in ("jacobi", "rbgs", "gs_wavefront")
    }
    np.testing.assert_allclose(sols["jacobi"], sols["rbgs"], atol=1e-4)
    np.testing.assert_allclose(sols["rbgs"], sols["gs_wavefront"], atol=1e-4)


def test_rbgs_converges_faster_than_jacobi():
    f, prev, masks = _setup(2)
    a, c = 1.0, 6.0

    def resid(sol):
        s = (
            sol[1:-1, 1:-1, 2:] + sol[1:-1, 1:-1, :-2]
            + sol[1:-1, 2:, 1:-1] + sol[1:-1, :-2, 1:-1]
            + sol[2:, 1:-1, 1:-1] + sol[:-2, 1:-1, 1:-1])
        prev_i = np.asarray(prev)[1:-1, 1:-1, 1:-1]
        return float(np.abs(sol[1:-1, 1:-1, 1:-1] - (prev_i + a * s) / c).max())

    rj = resid(np.asarray(linear_solver(0, f, prev, a, c, masks, acc=8, solver="jacobi")))
    rr = resid(np.asarray(linear_solver(0, f, prev, a, c, masks, acc=8, solver="rbgs")))
    assert rr < rj


def test_diffusion_coeffs_reference_arithmetic():
    # a = dt*diff*W*H*D at the default 128x64x64 (simulation.cpp:282)
    a, c = diffusion_coeffs(128, 64, 64, 0.05, 2.0e-5)
    assert np.isclose(a, 0.524288, rtol=1e-6)
    assert np.isclose(c, 1.0 + 6.0 * 0.524288, rtol=1e-6)
