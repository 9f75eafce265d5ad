"""Batched design sweep (BASELINE config 4): vmapped scenes == individual."""

import numpy as np

from fluid_simulation_tpu.config import SimParams
from fluid_simulation_tpu.models.sweep import batch_masks, design_sweep, drag_proxy
from fluid_simulation_tpu.models.windtunnel import WindTunnel
from fluid_simulation_tpu.scene.primitives import (
    add_box, add_sphere, empty_obstacles)

P = SimParams(width=16, height=8, depth=8, acc=5)


def _geometries():
    # 8 obstacle geometries in one vmapped batch (BASELINE config 4)
    base = empty_obstacles(16, 8, 8)
    return [
        base,
        add_sphere(base, 8, 4, 4, 2.0),
        add_box(base, 6, 9, 3, 5, 3, 5),
        add_sphere(base, 6, 4, 4, 1.5),
        add_sphere(base, 10, 5, 4, 1.8),
        add_box(base, 4, 6, 2, 6, 2, 6),
        add_sphere(base, 8, 3, 5, 1.2),
        add_box(base, 9, 12, 4, 6, 3, 5),
    ]


def test_design_sweep_matches_individual_runs():
    geoms = _geometries()
    bm = batch_masks(geoms)
    final, stats = design_sweep(bm, P, steps=4)
    sums = np.asarray(stats.density_sum)       # (steps, B)
    assert sums.shape == (4, len(geoms))

    for b, obs in enumerate(geoms):
        wt = WindTunnel(P, obstacles=obs)
        _, st = wt.simulate(steps=4)
        np.testing.assert_allclose(sums[:, b], np.asarray(st.density_sum),
                                   rtol=2e-5)
        for leaf_batch, leaf in zip(final, wt.state):
            a = np.asarray(leaf_batch)[b]
            r = np.asarray(leaf)
            np.testing.assert_allclose(a, r, atol=5e-5 * (np.abs(r).max() + 1e-9))


def test_sweep_routes_agree():
    """Auto-routing (VERDICT r2 #6): both execution routes of the batch axis
    run the same step and must agree; 'auto' must resolve to one of them."""
    geoms = _geometries()[:3]
    bm = batch_masks(geoms)
    f_v, s_v = design_sweep(bm, P, steps=3, route="vmap")
    f_s, s_s = design_sweep(bm, P, steps=3, route="sequential")
    f_m, s_m = design_sweep(bm, P, steps=3, route="map")
    np.testing.assert_allclose(np.asarray(s_v.density_sum),
                               np.asarray(s_s.density_sum), rtol=1e-6)
    for a, b in zip(f_v, f_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # map route == vmap route bitwise: both run the batched=True step
    np.testing.assert_array_equal(np.asarray(s_m.density_sum),
                                  np.asarray(s_v.density_sum))
    assert np.asarray(s_m.density_sum).shape == (3, 3)   # (steps, B)
    for a, b in zip(f_m, f_v):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    big = SimParams(width=128, height=64, depth=64)
    assert big.n_cells >= 256 * 1024          # flagship auto-routes off vmap
    assert P.n_cells < 256 * 1024             # test grid auto-routes vmap


def test_drag_proxy_orders_geometries():
    geoms = _geometries()
    bm = batch_masks(geoms)
    final, _ = design_sweep(bm, P, steps=8)
    import jax
    drags = np.asarray(jax.vmap(lambda s: drag_proxy(s, P))(final))
    assert drags.shape == (len(geoms),)
    assert np.all(np.isfinite(drags))
    # the empty tunnel must have the least momentum deficit of all geometries
    assert np.argmin(drags) == 0
