"""Full-step behavior: shapes, finiteness, inlet mass budget, solid cells,
projection effectiveness, fast-vs-compat agreement."""

import numpy as np
import jax.numpy as jnp

from fluid_simulation_tpu.config import SimParams
from fluid_simulation_tpu.models.windtunnel import WindTunnel
from fluid_simulation_tpu.ops.project import divergence, grid_h
from fluid_simulation_tpu.scene.primitives import empty_obstacles, add_sphere

PARAMS = SimParams(width=16, height=8, depth=8, solver="rbgs")


def test_empty_tunnel_runs_and_is_finite():
    wt = WindTunnel(PARAMS)
    _, stats = wt.simulate(steps=5)
    dens_sums = np.asarray(stats.density_sum)
    assert dens_sums.shape == (5,)
    assert np.all(np.isfinite(dens_sums))
    for f in wt.state:
        assert np.all(np.isfinite(np.asarray(f)))
    # density only enters through the inlet plane: sum bounded by total added
    # (outflow face only copies; advection clamp keeps mass roughly bounded)
    added_per_step = PARAMS.inlet_density * PARAMS.height * PARAMS.depth
    assert 0.0 < dens_sums[-1] < 30 * added_per_step


def test_density_monotone_early():
    wt = WindTunnel(PARAMS)
    _, stats = wt.simulate(steps=4)
    s = np.asarray(stats.density_sum)
    assert np.all(np.diff(s) > 0)  # tunnel still filling


def test_solid_cells_stay_zero():
    obs = add_sphere(empty_obstacles(16, 8, 8), cx=8, cy=4, cz=4, radius=2.5)
    wt = WindTunnel(PARAMS, obstacles=obs)
    wt.simulate(steps=5)
    solid = np.asarray(obs) >= 0.5
    for f in wt.state:
        assert np.all(np.asarray(f)[solid] == 0.0)


def test_projection_reduces_divergence():
    from fluid_simulation_tpu.ops.project import project
    wt = WindTunnel(PARAMS)  # masks only; use a fresh random velocity field
    # The reference's collocated discretization (central-difference gradient
    # vs 7-point Poisson stencil) cannot damp checkerboard modes, so use a
    # smooth field: low-frequency sines, the regime real flows live in.
    shape = PARAMS.padded_shape
    z, y, x = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                          np.arange(shape[2]), indexing="ij")
    vx = jnp.asarray(np.sin(2 * np.pi * x / shape[2]).astype(np.float32))
    vy = jnp.asarray(np.cos(2 * np.pi * y / shape[1]).astype(np.float32))
    vz = jnp.asarray(np.sin(2 * np.pi * z / shape[0]).astype(np.float32))
    h = grid_h(16, 8, 8)
    before = np.abs(np.asarray(divergence(vx, vy, vz, wt.masks, h))).mean()
    vx2, vy2, vz2, _, _ = project(vx, vy, vz, wt.masks, acc=50, solver="rbgs")
    after = np.abs(np.asarray(divergence(vx2, vy2, vz2, wt.masks, h))).mean()
    assert after < 0.4 * before


def test_fast_mode_tracks_compat():
    # 'fast' uses simultaneous advection — documented as *semantically* the
    # same transport, not bit-compatible (models/windtunnel.py). Require the
    # same qualitative behavior: monotone fill, same order of magnitude.
    wt_c = WindTunnel(PARAMS)
    wt_f = WindTunnel(PARAMS.replace(mode="fast"))
    _, st_c = wt_c.simulate(steps=5)
    _, st_f = wt_f.simulate(steps=5)
    a = np.asarray(st_c.density_sum)
    b = np.asarray(st_f.density_sum)
    assert np.all(np.diff(a) > 0) and np.all(np.diff(b) > 0)
    assert 0.4 < b[-1] / a[-1] < 2.5
    for f in wt_f.state:
        assert np.all(np.isfinite(np.asarray(f)))


def test_vorticity_confinement_runs():
    wt = WindTunnel(PARAMS.replace(vorticity=2.0, wall_mode="noslip"))
    _, stats = wt.simulate(steps=4)
    assert np.all(np.isfinite(np.asarray(stats.density_sum)))


def test_bfloat16_mode_runs():
    wt = WindTunnel(PARAMS.replace(dtype="bfloat16"))
    _, stats = wt.simulate(steps=3)
    assert np.all(np.isfinite(np.asarray(stats.density_sum)))
    assert wt.state.vx.dtype == jnp.bfloat16


def test_cell_edit_api():
    # single-cell helpers (simulation.cpp:155-178)
    wt = WindTunnel(PARAMS)
    wt.add_obstacle(5, 4, 4)
    assert wt.obstacles[4, 4, 5] == 1.0
    wt.add_density(3, 2, 2, 0.5)
    wt.add_density(3, 2, 2, 0.25)
    assert np.isclose(np.asarray(wt.state.dens)[2, 2, 3], 0.75)
    wt.set_velocity(4, 3, 3, 1.0, 2.0, 3.0)
    assert np.asarray(wt.state.vy)[3, 3, 4] == 2.0
    wt.simulate(steps=2)  # edited state still simulates
    assert np.all(np.asarray(wt.state.vx)[np.asarray(wt.obstacles) >= 0.5] == 0)
    import pytest
    with pytest.raises(ValueError):
        wt.add_obstacle(0, 1, 1)


def test_empty_scene_with_solids_rejected():
    """empty_scene=True statically skips obstacle masking; combining it with
    solids is a silent-wrong-physics hazard and must raise (VERDICT r1
    weak#8, config.py contract)."""
    import pytest
    obs = add_sphere(empty_obstacles(16, 8, 8), 8, 4, 4, 2.0)
    with pytest.raises(ValueError, match="empty_scene"):
        WindTunnel(PARAMS.replace(empty_scene=True), obstacles=obs)
    # the safe direction still auto-derives: no solids -> upgraded to True
    wt = WindTunnel(PARAMS)
    assert wt.params.empty_scene


def test_pad_bounds_tail_fallback_matches_set_bounds():
    """The concat-built fallback of _pad_bounds_tail (used when the fused
    kernel's VMEM gate fails, e.g. 256^3) equals zeros.at[].set + set_bounds
    bitwise, for velocity stacks and scalars, empty and obstacle scenes."""
    import numpy as np
    from fluid_simulation_tpu.models.windtunnel import _pad_bounds_tail
    from fluid_simulation_tpu.ops.bounds import set_bounds
    from fluid_simulation_tpu.scene.masks import build_masks
    from fluid_simulation_tpu.scene.primitives import add_sphere, empty_obstacles

    W, H, D = 16, 8, 8
    obs = add_sphere(empty_obstacles(W, H, D), 5, 4, 4, 2.0)
    masks = build_masks(jnp.asarray(obs))
    rng = np.random.default_rng(5)
    for bs, empty, wall in (((1, 2, 3), False, "reference"),
                            ((1, 2, 3), True, "noslip"),
                            ((0,), False, "reference"),
                            ((0,), True, "reference")):
        p = PARAMS.replace(empty_scene=empty, wall_mode=wall)
        smp = jnp.asarray(
            rng.normal(size=(len(bs), D, H, W)).astype(np.float32))
        got = _pad_bounds_tail(smp, bs, masks, p)
        for i, b in enumerate(bs):
            s = smp[i] if empty else smp[i] * masks.fluid_i
            f = jnp.zeros((D + 2, H + 2, W + 2), jnp.float32)
            f = f.at[1:-1, 1:-1, 1:-1].set(s)
            ref = set_bounds(b, f, masks, wall, empty_scene=empty)
            np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref),
                                          err_msg=f"bs={bs} b={b}")


def test_prestep_kernel_stays_retired():
    """The fused prestep kernel must stay OUT of the package and the
    production dispatch: combined with the lane-lerp split advection in one
    scanned program it faults Mosaic (UNAVAILABLE at the first scan), and it
    measures slower than the masked-fused-projection chain anyway (1.185 vs
    1.038 ms/step on the v5e sphere scene — NOTES.md "Retired: fused prestep
    kernel", tools/exp_obstacle_bisect.py). Round 5 moved it to
    tools/prestep_pallas.py (VERDICT r4 #7); guard against it creeping back."""
    import importlib.util

    assert importlib.util.find_spec(
        "fluid_simulation_tpu.kernels.prestep_pallas") is None
    import fluid_simulation_tpu.models.windtunnel as wtm
    import inspect
    assert "pallas_prestep" not in inspect.getsource(wtm.simulation_step)
