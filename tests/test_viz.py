"""Visualization layer: colormap parity with matplotlib, slice rendering,
marching tetrahedra, streamlines, frame composition, PNG export, 3-D scene."""

import os

import numpy as np
import pytest

from fluid_simulation_tpu.config import SimParams, ViewerParams
from fluid_simulation_tpu.viz.colormap import (
    DENSITY_CMAP_COLORS, apply_colormap, build_lut, overlay_obstacle)
from fluid_simulation_tpu.viz.marching import (
    generate_obstacle_mesh, marching_tetrahedra)
from fluid_simulation_tpu.viz.slices import render_slice, render_frame_device
from fluid_simulation_tpu.viz.streamlines import generate_streamlines
from fluid_simulation_tpu.viz.viewer2d import compose_frame


def test_lut_matches_matplotlib_reference_cmap():
    # the reference builds this cmap via matplotlib (gui.py:38-41); our LUT
    # must match that construction closely
    from matplotlib.colors import LinearSegmentedColormap
    cmap = LinearSegmentedColormap.from_list(
        "density_cmap",
        ["white", "lightgreen", "green", "deepskyblue", "blue", "darkred",
         "red"])
    lut = build_lut(256)
    t = np.linspace(0, 1, 256)
    ref = (np.asarray(cmap(t))[:, :3] * 255)
    assert np.abs(lut.astype(float) - ref).max() <= 2.0


def test_apply_colormap_endpoints():
    lut = build_lut()
    img = apply_colormap(np.array([[-1.0, 0.0, 1.0, 2.0]]), 0.0, 1.0, lut)
    np.testing.assert_array_equal(img[0, 0], (255, 255, 255))  # clipped white
    np.testing.assert_array_equal(img[0, 2], (255, 0, 0))      # red
    np.testing.assert_array_equal(img[0, 3], (255, 0, 0))      # clipped red


def test_overlay_obstacle_darkens():
    rgb = np.full((4, 4, 3), 200, np.uint8)
    obs = np.zeros((4, 4)); obs[1, 1] = 1.0
    out = overlay_obstacle(rgb, obs, alpha=0.2)
    np.testing.assert_array_equal(out[1, 1], (160, 160, 160))
    np.testing.assert_array_equal(out[0, 0], (200, 200, 200))


def test_device_render_matches_host():
    rng = np.random.default_rng(0)
    field = rng.uniform(0, 0.012, size=(6, 8, 10)).astype(np.float32)
    obs = np.zeros_like(field); obs[3, 4, 5] = 1.0
    host = render_slice(field, obs, z=3, kind="dens")
    dev = np.asarray(render_frame_device(field, obs, z=3, kind="dens"))
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1


def test_marching_tetrahedra_sphere():
    n = 24
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    r = np.sqrt(((g - (n - 1) / 2) ** 2).sum(axis=0))
    vol = (r < 7.0).astype(np.float32)
    verts, faces = marching_tetrahedra(vol, level=0.5)
    assert len(verts) > 100 and len(faces) == len(verts) // 3
    d = np.linalg.norm(verts - (n - 1) / 2, axis=1)
    assert abs(d.mean() - 7.0) < 0.6          # surface sits at the radius
    assert d.std() < 0.5                       # and is thin


def test_marching_empty_contract():
    mesh = generate_obstacle_mesh(np.zeros((5, 5, 5), np.float32))
    assert mesh["vertexes"].size == 0          # GUI/utils.py:32-38 behavior


def test_streamlines_vortex():
    # swirling field around a small solid core: passes every filter
    n = 32
    obs = np.zeros((n, n, n), np.float32)
    obs[15:17, 15:17, :] = 1.0                 # solid column along z
    x, y, _ = np.meshgrid(*[np.arange(n, dtype=np.float32)] * 3, indexing="ij")
    vx = -(y - n / 2) * 1.0
    vy = (x - n / 2) * 1.0
    vz = np.zeros_like(vx)
    p = ViewerParams(streamline_density=16, integration_steps=60,
                     streamline_proximity=30)
    lines, colors = generate_streamlines(vx, vy, vz, obs, p)
    assert len(lines) > 0 and len(lines) == len(colors)
    for ln in lines:
        assert len(ln) > 5
        assert np.isfinite(ln).all()
        # never inside the solid core
        ii = ln.astype(int)
        assert not obs[ii[:, 0], ii[:, 1], ii[:, 2]].any()
    assert all(c.shape == (4,) for c in colors)


def test_streamlines_no_obstacle_empty():
    n = 16
    z = np.zeros((n, n, n), np.float32)
    lines, colors = generate_streamlines(z + 1.0, z, z, z)
    assert lines == [] and colors == []        # GUI/utils.py:134-136


@pytest.fixture(scope="module")
def small_dump(tmp_path_factory):
    from fluid_simulation_tpu.io.dump import run_and_dump
    from fluid_simulation_tpu.models.windtunnel import WindTunnel
    from fluid_simulation_tpu.scene.primitives import empty_obstacles, add_box
    d = str(tmp_path_factory.mktemp("dump") / "data")
    p = SimParams(width=16, height=8, depth=8, acc=6)
    obs = add_box(empty_obstacles(16, 8, 8), 6, 9, 3, 5, 3, 5)
    wt = WindTunnel(p, obstacles=obs)
    run_and_dump(wt, steps=6, out_dir=d, chunk=3)
    return d


def test_compose_frame(small_dump):
    from fluid_simulation_tpu.io.dump import read_run
    run = read_run(small_dump)
    img = compose_frame(run, frame=5, z=5, field="Density", vectors=True,
                        skip=4)
    assert img.shape == (10, 18, 3) and img.dtype == np.uint8
    # vectors drew some yellow pixels somewhere
    yellow = (img[..., 0] == 255) & (img[..., 1] == 255) & (img[..., 2] == 0)
    assert yellow.any()
    img2 = compose_frame(run, frame=5, z=5, field="Velocity X", vectors=True)
    assert img2.shape == (10, 18, 3)


def test_build_scene_headless(small_dump):
    from fluid_simulation_tpu.viz.viewer3d import build_scene, check_data_dir
    assert check_data_dir(small_dump) is None
    assert check_data_dir("/nonexistent_dir_xyz") is not None
    p = ViewerParams(streamline_density=8, integration_steps=40)
    scene = build_scene(small_dump, p)
    assert len(scene["verts"]) > 0             # box obstacle surface found
    assert scene["faces"].shape[1] == 3
    assert scene["dims"] == (18, 10, 10)       # padded dims, viewer order


def test_background_geometry():
    """Grid/axes/domain-bbox line sets (GUI/gl_widget.py:93-182 analog,
    VERDICT r1 C27 gap)."""
    from fluid_simulation_tpu.viz.viewer3d import background_geometry
    bg = background_geometry(20, 10, 10, grid_step=5, axis_len=20.0)
    assert set(bg) == {"grid", "bbox", "axis_x", "axis_y", "axis_z"}
    for segs, rgba, width in bg.values():
        assert segs.ndim == 3 and segs.shape[1:] == (2, 3)
        assert segs.dtype == np.float32 and len(rgba) == 4 and width > 0
    # bbox spans corner (-1,-1,-1) .. (W-1, H-1, D-1), 12 edges
    bbox = bg["bbox"][0]
    assert bbox.shape[0] == 12
    assert bbox.min() == -1.0 and bbox.reshape(-1, 3).max(axis=0).tolist() \
        == [19.0, 9.0, 9.0]
    # grid lines stay inside their coordinate planes (one coord fixed at -1)
    grid = bg["grid"][0]
    assert ((grid[:, 0] == -1.0) | (grid[:, 1] == -1.0)).any(axis=-1).all()
    # axes: unit-color RGB, length 20 from the domain corner
    ax = bg["axis_x"][0][0]
    np.testing.assert_array_equal(ax[1] - ax[0], [20.0, 0.0, 0.0])


def test_export_pngs(small_dump, tmp_path):
    from fluid_simulation_tpu.viz.export import export_pngs
    out = str(tmp_path / "pngs")
    n = export_pngs(small_dump, out)
    assert n == 18                             # 6 frames x 3 fields
    assert os.path.exists(os.path.join(out, "density", "0.png"))
    assert os.path.exists(os.path.join(out, "velocity_x", "5.png"))


def test_matplotlib_viewer_fallback_headless(small_dump, monkeypatch):
    # the PyQt6-less fallback path must come up and tear down headlessly
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, "show", lambda *a, **k: None)
    from fluid_simulation_tpu.viz.viewer2d import _launch_matplotlib
    from fluid_simulation_tpu.io.dump import read_run
    assert _launch_matplotlib(read_run(small_dump)) == 0
    from fluid_simulation_tpu.viz.viewer3d import _launch_matplotlib as l3
    assert l3(small_dump, None, None) == 0
    plt.close("all")
