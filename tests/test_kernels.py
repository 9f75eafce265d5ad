"""Pallas kernels vs the jnp oracle.

CPU suite runs the kernels in interpreter mode; on a real TPU the same
comparison was measured bitwise-identical (max abs diff 0.0 at 32x16x16 and
128x64x64, see kernels/linsolve_pallas.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    pallas_rbgs_solve, pallas_solve_supported)
from fluid_simulation_tpu.ops.linsolve import linear_solver
from fluid_simulation_tpu.scene.masks import build_masks
from fluid_simulation_tpu.scene.primitives import add_sphere, empty_obstacles

W, H, D = 16, 8, 8


def _setup():
    obs = add_sphere(empty_obstacles(W, H, D), W // 3, H // 2, D // 2, 2.5)
    masks = build_masks(jnp.asarray(obs))
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(D + 2, H + 2, W + 2)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(D + 2, H + 2, W + 2)).astype(np.float32))
    return f, g, masks


@pytest.mark.parametrize("b", [0, 1, 2, 3])
def test_pallas_solve_matches_oracle(b):
    f, g, masks = _setup()
    ref = linear_solver(b, f, g, 1.0, 6.0, masks, acc=7, solver="rbgs")
    keep = masks.keep_vel if b in (1, 2, 3) else masks.keep_scalar
    got = pallas_rbgs_solve(b, f, g, keep, 1.0, 6.0, acc=7, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("b,kw", [
    (0, {}), (1, {}), (2, dict(wall_mode="noslip")),
    (3, dict(empty_scene=True)), (0, dict(acc=1))])
def test_packed_solve_matches_oracle(b, kw):
    """Packed-interior kernel variant (exact-tile layout, ghost planes in
    scratch): value-identical to the oracle in every mode."""
    f, g, masks = _setup()
    acc = kw.pop("acc", 6)
    empty = kw.get("empty_scene", False)
    ref = linear_solver(b, f, g, 1.0, 6.0, masks, acc=acc, solver="rbgs",
                        wall_mode=kw.get("wall_mode", "reference"),
                        empty_scene=empty)
    keep = None if empty else (
        masks.keep_vel if b in (1, 2, 3) else masks.keep_scalar)
    got = pallas_rbgs_solve(b, f, g, keep, 1.0, 6.0, acc=acc, interpret=True,
                            packed=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("empty,wm", [
    (False, "reference"), (True, "reference"), (False, "noslip")])
def test_fused_solve3_matches_three_calls(empty, wm):
    """pallas_rbgs_solve3 (one call, three fields) is bitwise-equal to three
    packed solves with b=1,2,3. On-chip the same held at the flagship grid
    (tools/exp_diffuse3.py: identical 20-step state SHA); the fused kernel is
    gated off in the step dispatch (measured neutral — see
    models/windtunnel._diffuse3_applicable)."""
    from fluid_simulation_tpu.kernels.linsolve_pallas import pallas_rbgs_solve3
    f, g, masks = _setup()
    rng = np.random.default_rng(3)
    shape = f.shape
    fs = [f] + [jnp.asarray(rng.normal(size=shape).astype(np.float32))
                for _ in range(2)]
    ps = [g] + [jnp.asarray(rng.normal(size=shape).astype(np.float32))
                for _ in range(2)]
    keep = None if empty else masks.keep_vel
    ref = [pallas_rbgs_solve(b, fs[i], ps[i], keep, 1.0, 6.0, acc=5,
                             wall_mode=wm, interpret=True, packed=True,
                             empty_scene=empty)
           for i, b in enumerate((1, 2, 3))]
    got = pallas_rbgs_solve3((1, 2, 3), *fs, *ps, keep, 1.0, 6.0, acc=5,
                             wall_mode=wm, interpret=True, empty_scene=empty)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref[i]))


def test_pallas_solve_noslip_mode():
    f, g, masks = _setup()
    ref = linear_solver(2, f, g, 0.5, 4.0, masks, acc=5, solver="rbgs",
                        wall_mode="noslip")
    got = pallas_rbgs_solve(2, f, g, masks.keep_vel, 0.5, 4.0, acc=5,
                            wall_mode="noslip", interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_supported_gate():
    # CPU backend in the suite -> never claims support
    assert not pallas_solve_supported((10, 10, 18))


def test_fused_projection_matches_composable():
    # kernels/project_pallas.py (empty scenes): bitwise vs the ops path,
    # both wall modes (TPU run measured max diff 0.0 at the flagship size too)
    from fluid_simulation_tpu.kernels.project_pallas import pallas_project_empty
    from fluid_simulation_tpu.ops.project import project

    masks = build_masks(jnp.asarray(empty_obstacles(W, H, D)))
    rng = np.random.default_rng(3)
    shape = (D + 2, H + 2, W + 2)
    vx, vy, vz = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
                  for _ in range(3))
    for wm in ("reference", "noslip"):
        ref = project(vx, vy, vz, masks, acc=6, solver="rbgs", wall_mode=wm,
                      empty_scene=True)
        got = pallas_project_empty(vx, vy, vz, acc=6, wall_mode=wm,
                                   interpret=True)
        for a, b in zip(got, ref[:3]):
            # interpreter-vs-XLA-CPU FMA contraction can differ by 1 ulp;
            # the real-TPU comparison at the flagship size is exactly 0.0
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-6)


def test_blocked_solve_matches_oracle():
    """z-blocked streaming solver (tools/linsolve_blocked.py, retired) == rbgs
    oracle, including a z-block size that does not divide D+2 and both a
    solids scene and the empty fast path."""
    from tools import linsolve_blocked as lb

    f, g, masks = _setup()
    for b in (0, 2):
        ref = linear_solver(b, f, g, 1.0, 6.0, masks, acc=5, solver="rbgs")
        keep = masks.keep_vel if b else masks.keep_scalar
        got = lb.pallas_rbgs_solve_blocked(b, f, g, keep, 1.0, 6.0, acc=5,
                                           interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bfloat16_kernels_match_oracle():
    """VERDICT r1 weak#6: bf16 accepted by the Pallas solve/project kernels.
    Interpret mode == the jnp oracle in bf16 (same expressions, same order);
    the supported() gates account for bf16 (16,128) tiling."""
    from tools import linsolve_blocked as lb
    from fluid_simulation_tpu.kernels.project_pallas import pallas_project_empty
    from fluid_simulation_tpu.ops.project import project

    obs = add_sphere(empty_obstacles(W, H, D), W // 3, H // 2, D // 2, 2.5)
    masks = build_masks(jnp.asarray(obs), dtype=jnp.bfloat16)
    rng = np.random.default_rng(11)
    shape = (D + 2, H + 2, W + 2)
    f, g = (jnp.asarray(rng.normal(size=shape)).astype(jnp.bfloat16)
            for _ in range(2))

    ref = linear_solver(1, f, g, 1.0, 6.0, masks, acc=5, solver="rbgs")
    assert ref.dtype == jnp.bfloat16
    got = pallas_rbgs_solve(1, f, g, masks.keep_vel, 1.0, 6.0, acc=5,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))
    got_blk = lb.pallas_rbgs_solve_blocked(1, f, g, masks.keep_vel, 1.0, 6.0,
                                           acc=5, interpret=True, blk=3)
    np.testing.assert_array_equal(np.asarray(got_blk, np.float32),
                                  np.asarray(ref, np.float32))

    em = build_masks(jnp.asarray(empty_obstacles(W, H, D)),
                     dtype=jnp.bfloat16)
    vx, vy, vz = (jnp.asarray(rng.normal(size=shape)).astype(jnp.bfloat16)
                  for _ in range(3))
    refp = project(vx, vy, vz, em, acc=4, solver="rbgs", empty_scene=True)
    gotp = pallas_project_empty(vx, vy, vz, acc=4, interpret=True)
    for a, b in zip(gotp, refp[:3]):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0, atol=1e-2)


def test_blocked_solve_block_sizes():
    """Every halo interaction: block sizes from 1 row to whole-grid, empty
    scene, noslip, z-ghost straddling block edges."""
    from tools import linsolve_blocked as lb
    from fluid_simulation_tpu.scene.primitives import empty_obstacles

    masks = build_masks(jnp.asarray(empty_obstacles(W, H, D)))
    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.normal(size=(D + 2, H + 2, W + 2)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(D + 2, H + 2, W + 2)).astype(np.float32))
    ref = linear_solver(3, f, g, 0.8, 5.8, masks, acc=4, solver="rbgs",
                        wall_mode="noslip", empty_scene=True)
    # blk >= 2 (halo spans one neighbor); 3 exercises the (D+1)%blk==0
    # auto-adjustment, D+2 the single-block degenerate case
    for blk in (2, 3, 4, 5, 7, D + 2):
        got = lb.pallas_rbgs_solve_blocked(3, f, g, None, 0.8, 5.8, acc=4,
                                           wall_mode="noslip", interpret=True,
                                           empty_scene=True, blk=blk)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"blk={blk}")


@pytest.mark.parametrize("bs,wall_mode,masked", [
    ((1, 2, 3), "reference", False),
    ((1, 2, 3), "reference", True),
    ((1, 2, 3), "noslip", True),
    ((0,), "reference", True),
    ((0,), "reference", False),
])
def test_pad_bounds_matches_composable(bs, wall_mode, masked):
    """Fused pad+setBounds epilogue == zeros.at[].set + set_bounds, for
    velocity stacks and scalars, empty and obstacle scenes, both wall
    modes (kernels/bounds_pallas.py)."""
    from fluid_simulation_tpu.kernels.bounds_pallas import pallas_pad_bounds
    from fluid_simulation_tpu.ops.bounds import set_bounds

    _, _, masks = _setup()
    rng = np.random.default_rng(11)
    smp = jnp.asarray(rng.normal(size=(len(bs), D, H, W)).astype(np.float32))
    kw = {}
    if masked:
        keep = masks.keep_vel if bs[0] in (1, 2, 3) else masks.keep_scalar
        kw = dict(fluid_i=masks.fluid_i, keep_i=keep[1:-1, 1:-1, 1:-1])
    got = pallas_pad_bounds(smp, bs, wall_mode, interpret=True, **kw)
    for i, b in enumerate(bs):
        s = smp[i] * masks.fluid_i if masked else smp[i]
        f = jnp.zeros((D + 2, H + 2, W + 2), jnp.float32)
        f = f.at[1:-1, 1:-1, 1:-1].set(s)
        ref = set_bounds(b, f, masks, wall_mode, empty_scene=not masked)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref),
                                      err_msg=f"b={b}")


@pytest.mark.parametrize("b,kw,blkp", [
    (0, {}, (4, 4, 1)),
    (1, {}, (6, 6, 2)),
    (2, dict(wall_mode="noslip"), (6, 6, 2)),
    (3, dict(empty_scene=True), (6, 6, 2)),
    (0, {}, (12, 6, 2)),        # single-block degenerate case
    (1, dict(empty_scene=True), (4, 4, 1)),
    (0, dict(acc=7), (8, 8, 3)),  # remainder pass (7 = 2*3 + 1)
])
def test_temporal_solve_matches_oracle(b, kw, blkp):
    """Temporally-blocked multi-sweep streaming solve == rbgs oracle for
    every halo/ghost interaction (kernels/linsolve_temporal.py)."""
    from fluid_simulation_tpu.kernels.linsolve_temporal import (
        pallas_rbgs_solve_temporal)

    f, g, masks = _setup()
    acc = kw.pop("acc", 6)
    empty = kw.get("empty_scene", False)
    blk, hb, ksw = blkp
    ref = linear_solver(b, f, g, 1.0, 6.0, masks, acc=acc, solver="rbgs",
                        wall_mode=kw.get("wall_mode", "reference"),
                        empty_scene=empty)
    keep = None if empty else (
        masks.keep_vel if b in (1, 2, 3) else masks.keep_scalar)
    got = pallas_rbgs_solve_temporal(b, f, g, keep, 1.0, 6.0, acc=acc,
                                     interpret=True, blk=blk, hb=hb,
                                     ksw=ksw, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                  err_msg=f"blk={blk} hb={hb} ksw={ksw}")


@pytest.mark.parametrize("b,kw,blk", [
    (0, {}, 2),
    (1, {}, 4),
    (2, dict(wall_mode="noslip"), 4),
    (3, dict(empty_scene=True), 4),
    (0, {}, 8),                      # whole-grid single block
    (1, dict(empty_scene=True), 3),  # partial final block (8 % 3)
])
def test_stream_solve_matches_oracle(b, kw, blk):
    """Packed-interior streaming solve == rbgs oracle across block sizes,
    scenes and wall modes (kernels/linsolve_stream.py)."""
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream)

    f, g, masks = _setup()
    acc = kw.pop("acc", 6)
    empty = kw.get("empty_scene", False)
    ref = linear_solver(b, f, g, 1.0, 6.0, masks, acc=acc, solver="rbgs",
                        wall_mode=kw.get("wall_mode", "reference"),
                        empty_scene=empty)
    keep = None if empty else (
        masks.keep_vel if b in (1, 2, 3) else masks.keep_scalar)
    got = pallas_rbgs_solve_stream(b, f, g, keep, 1.0, 6.0, acc=acc,
                                   interpret=True, blk=blk, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                  err_msg=f"blk={blk}")


@pytest.mark.parametrize("wall_mode,blk", [
    ("reference", 8), ("noslip", 8), ("reference", 4)])
def test_project_stream_matches_composable(wall_mode, blk):
    """z-streamed projection (div kernel -> packed sweeps -> grad kernel +
    pad-bounds tail) == the composable empty-scene project, bitwise
    (kernels/project_stream.py)."""
    from fluid_simulation_tpu.kernels.project_stream import (
        pallas_project_stream_packed)
    from fluid_simulation_tpu.models.windtunnel import _pad_bounds_tail
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.ops.project import project
    from fluid_simulation_tpu.scene.primitives import empty_obstacles

    masks = build_masks(jnp.asarray(empty_obstacles(W, H, D)))
    rng = np.random.default_rng(13)
    shp = (D + 2, H + 2, W + 2)

    def mkfield():
        # zero the ghost shell except faces, as in any real run (the
        # composable path passes ghost edges through; the tail zeroes them)
        a = rng.normal(size=shp).astype(np.float32)
        m = np.zeros(shp, np.float32)
        m[1:-1, 1:-1, :] = 1.0
        m[1:-1, :, 1:-1] = 1.0
        m[:, 1:-1, 1:-1] = 1.0
        return jnp.asarray(a * m)

    vx, vy, vz = mkfield(), mkfield(), mkfield()
    ref = project(vx, vy, vz, masks, acc=5, solver="rbgs",
                  wall_mode=wall_mode, use_pallas=False, empty_scene=True)
    smp = pallas_project_stream_packed(vx, vy, vz, acc=5,
                                       wall_mode=wall_mode,
                                       interpret=True, blk=blk)
    p = SimParams(width=W, height=H, depth=D, empty_scene=True,
                  wall_mode=wall_mode)
    got = _pad_bounds_tail(smp, (1, 2, 3), masks, p)
    for i in range(3):
        # interpreter-vs-XLA-CPU FMA contraction can differ by 1 ulp on the
        # gradient subtraction (same allowance as the fused projection test)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref[i]),
                                   rtol=0, atol=1e-6,
                                   err_msg=f"component {i} blk={blk}")


@pytest.mark.parametrize("wall_mode,blk", [
    ("reference", 8), ("noslip", 8), ("reference", 4)])
def test_project_stream_masked_matches_composable(wall_mode, blk):
    """Masked z-streamed projection (obstacle div -> keep-masked packed
    sweeps -> masked grad + masked pad-bounds tail) == the composable
    obstacle-scene project (kernels/project_stream.py)."""
    from fluid_simulation_tpu.kernels.project_stream import (
        pallas_project_stream_masked)
    from fluid_simulation_tpu.models.windtunnel import _pad_bounds_tail
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.ops.project import project

    obs = add_sphere(empty_obstacles(W, H, D), W // 3, H // 2, D // 2, 2.5)
    masks = build_masks(jnp.asarray(obs))
    rng = np.random.default_rng(29)
    shp = (D + 2, H + 2, W + 2)

    def mkfield():
        a = rng.normal(size=shp).astype(np.float32)
        m = np.zeros(shp, np.float32)
        m[1:-1, 1:-1, :] = 1.0
        m[1:-1, :, 1:-1] = 1.0
        m[:, 1:-1, 1:-1] = 1.0
        return jnp.asarray(a * m)

    vx, vy, vz = mkfield(), mkfield(), mkfield()
    ref = project(vx, vy, vz, masks, acc=5, solver="rbgs",
                  wall_mode=wall_mode, use_pallas=False, empty_scene=False)
    smp = pallas_project_stream_masked(vx, vy, vz, masks.fluid_i, acc=5,
                                       wall_mode=wall_mode,
                                       interpret=True, blk=blk)
    p = SimParams(width=W, height=H, depth=D, empty_scene=False,
                  wall_mode=wall_mode)
    got = _pad_bounds_tail(smp, (1, 2, 3), masks, p)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref[i]),
                                   rtol=0, atol=1e-6,
                                   err_msg=f"component {i} blk={blk}")


@pytest.mark.parametrize("scene", ["sphere", "empty"])
def test_confinement_kernel_matches_oracle(scene):
    """Fused vorticity-confinement kernel == ops.vorticity.apply_confinement
    (kernels/vorticity_pallas.py)."""
    from fluid_simulation_tpu.kernels.vorticity_pallas import (
        pallas_confinement)
    from fluid_simulation_tpu.ops.vorticity import apply_confinement

    if scene == "sphere":
        obs = add_sphere(empty_obstacles(W, H, D), W // 3, H // 2, D // 2,
                         2.5)
    else:
        obs = empty_obstacles(W, H, D)
    masks = build_masks(jnp.asarray(obs))
    rng = np.random.default_rng(7)
    shp = (D + 2, H + 2, W + 2)
    vx, vy, vz = (jnp.asarray(rng.normal(size=shp).astype(np.float32))
                  for _ in range(3))
    ref = apply_confinement(vx, vy, vz, masks, 5.0, 0.05)
    got = pallas_confinement(vx, vy, vz, masks.keep_vel[1:-1, 1:-1, 1:-1],
                             5.0, 0.05, interpret=True)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref[i]),
                                   rtol=0, atol=1e-6,
                                   err_msg=f"component {i}")


def test_stream_solve_bfloat16():
    """bf16 accepted by the packed streaming solve (interpret): finite and
    close to the f32 oracle at bf16 resolution."""
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream)

    f, g, masks = _setup()
    ref = linear_solver(0, f, g, 1.0, 6.0, masks, acc=4, solver="rbgs")
    got = pallas_rbgs_solve_stream(
        0, f.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
        masks.keep_scalar.astype(jnp.bfloat16), 1.0, 6.0, acc=4,
        interpret=True, blk=4)
    assert got.dtype == jnp.bfloat16
    a = np.asarray(got, np.float32)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, np.asarray(ref), rtol=0.1, atol=0.05)


def test_solve_dispatch_gates():
    """The solve-kernel ladder picks the right implementation per shape:
    resident packed for <=VMEM grids, packed streaming for >VMEM grids,
    with the CPU backend falling back to jnp (gates are backend-aware)."""
    from fluid_simulation_tpu.kernels.linsolve_pallas import (
        pallas_solve_supported)
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        _pick_blk, pallas_stream_solve_supported)

    # backend-independent pieces: VMEM accounting and block choice
    flagship = (66, 66, 130)
    big = (258, 130, 130)
    huge = (258, 258, 258)
    # the stream kernel's block choice across grid classes
    assert _pick_blk(flagship, jnp.float32, True) is not None
    assert _pick_blk(big, jnp.float32, False) == 16
    assert _pick_blk(huge, jnp.float32, False) == 16
    # keep at 256^3 stays on the known-working blk=16
    assert _pick_blk(huge, jnp.float32, True) == 16
    # wide rows (>2 lane tiles): the r4 hb=2 halo windows + int8 keep
    # shrink the scoped-VMEM footprint enough to re-admit blk=16 empty and
    # blk=8 keep (chip-validated r4; under the r3 hb=8/f32-keep windows
    # these were 8 and 4 — 512x256x256 masked at blk=8 measured 97.3M
    # scoped VMEM vs the 96M meter)
    wide = (258, 258, 514)
    assert _pick_blk(wide, jnp.float32, False) == 16
    assert _pick_blk(wide, jnp.float32, True) == 8
    # ... and the old window shapes still reproduce the r3 gates
    assert _pick_blk(wide, jnp.float32, False, hb=8, keep_i8=False) == 8
    assert _pick_blk(wide, jnp.float32, True, hb=2, keep_i8=False) == 8
    # a pathological row size exceeds the stream budget
    assert _pick_blk((10, 1026, 2050), jnp.float32, False) is None
    # on CPU both TPU gates must refuse (tests run the jnp oracle)
    assert not pallas_solve_supported(flagship)
    assert not pallas_stream_solve_supported(big)

    # VERDICT r4 #7: the padded z-blocked kernel's dispatch rung was deleted
    # (kernel demoted to tools/linsolve_blocked.py). Its gate must be fully
    # shadowed: every shape/dtype/keep config the blocked byte model admits
    # must be admitted by the resident, stream, or temporal model too
    # (all models are backend-independent; the backend check is shared).
    import itertools
    from fluid_simulation_tpu.kernels.linsolve_pallas import (
        VMEM_BUDGET_BYTES, _itemsize, _tiled_bytes)
    from fluid_simulation_tpu.kernels.linsolve_temporal import pick_params

    def blocked_admits(shape, dtype):
        # shape logic of tools/linsolve_blocked.pallas_blocked_solve_supported
        it = _itemsize(dtype)
        return (len(shape) == 3 and min(shape) >= 4
                and _tiled_bytes((3,) + tuple(shape[1:]), it) * 24
                <= VMEM_BUDGET_BYTES)

    def resident_admits(shape, dtype):
        it = _itemsize(dtype)
        need = (4 * _tiled_bytes(shape, it)
                + 5 * _tiled_bytes(tuple(n - 2 for n in shape), it))
        return min(shape) >= 4 and need <= VMEM_BUDGET_BYTES

    dims = (4, 6, 10, 18, 34, 66, 130, 258, 514)
    uncovered = []
    for shape in itertools.product(dims, dims, dims):
        for dtype in (jnp.float32, jnp.bfloat16):
            for keep in (False, True):
                if not blocked_admits(shape, dtype):
                    continue
                ok = (resident_admits(shape, dtype)
                      or (min(shape) >= 6
                          and _pick_blk(shape, dtype, keep) is not None)
                      or pick_params(shape, dtype, keep) is not None)
                if not ok:
                    uncovered.append((shape, str(dtype), keep))
    assert not uncovered, f"blocked-only shapes exist: {uncovered[:5]}"


def test_cpack_solve_matches_packed_interpret():
    """Color-packed (x-checkerboard) solve == packed resident kernel:
    bitwise with a keep mask; empty-scene differs only by interpret-mode
    FMA contraction (~1 ulp; bitwise on chip per tools/exp_cpack.py)."""
    import importlib.util
    import pathlib

    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.linsolve_pallas import pallas_rbgs_solve

    # cpack is a falsified experiment kept OUT of the package (VERDICT r3
    # item 8): load it from tools/ where it now lives
    _p = pathlib.Path(__file__).resolve().parents[1] / "tools" / \
        "linsolve_cpack.py"
    _spec = importlib.util.spec_from_file_location("linsolve_cpack", _p)
    _mod = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    pallas_rbgs_solve_cpack = _mod.pallas_rbgs_solve_cpack
    pack_colors = _mod.pack_colors
    unpack_colors = _mod.unpack_colors

    rng = np.random.default_rng(7)
    f = rng.normal(size=(6, 5, 8)).astype(np.float32)
    R, B = pack_colors(jnp.asarray(f))
    np.testing.assert_array_equal(np.asarray(unpack_colors(R, B)), f)

    for shape, b, empty, acc in [((8, 6, 10), 1, True, 5),
                                 ((8, 6, 10), 0, False, 5),
                                 ((6, 8, 12), 2, False, 15),
                                 ((10, 4, 8), 3, True, 15)]:
        D2, H2, W2 = shape
        field = rng.normal(size=shape).astype(np.float32)
        prev = rng.normal(size=shape).astype(np.float32)
        if empty:
            keep = None
        else:
            keep = np.ones(shape, np.float32)
            sol = rng.random(size=(D2 - 2, H2 - 2, W2 - 2)) < 0.2
            keep[1:-1, 1:-1, 1:-1] = (~sol).astype(np.float32)
        kj = None if empty else jnp.asarray(keep)
        want = np.asarray(pallas_rbgs_solve(
            b, jnp.asarray(field), jnp.asarray(prev), kj, 0.3, 2.8,
            acc=acc, interpret=True, empty_scene=empty, packed=True))
        got = np.asarray(pallas_rbgs_solve_cpack(
            b, jnp.asarray(field), jnp.asarray(prev), kj, 0.3, 2.8,
            acc=acc, interpret=True, empty_scene=empty))
        atol = 0.0 if not empty else 2e-7
        np.testing.assert_allclose(got, want, rtol=0, atol=atol,
                                   err_msg=f"{shape} b={b} empty={empty}")


def test_masked_projection_matches_composable_interpret():
    """Obstacle-scene fused projection (VERDICT r2 #3): bitwise vs
    ops.project.project on sphere+box scenes, both wall modes."""
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.project_pallas import (
        pallas_project_masked)
    from fluid_simulation_tpu.ops.project import project
    from fluid_simulation_tpu.scene.masks import build_masks
    from fluid_simulation_tpu.scene.primitives import (
        add_box, add_sphere, empty_obstacles)

    rng = np.random.default_rng(5)
    for dims, wall in [((12, 8, 8), "reference"), ((10, 10, 6), "noslip")]:
        W, H, D = dims
        obs = add_sphere(empty_obstacles(W, H, D), W // 2, H // 2, D // 2,
                         min(W, H, D) // 4)
        obs = add_box(np.asarray(obs), 1, 3, 1, 3, 1, 3)
        masks = build_masks(np.asarray(obs, np.float32))
        shape = (D + 2, H + 2, W + 2)
        vx, vy, vz = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
                      for _ in range(3))
        want = project(vx, vy, vz, masks, acc=6, solver="rbgs",
                       wall_mode=wall, use_pallas=False,
                       empty_scene=False)[:3]
        got = pallas_project_masked(vx, vy, vz, masks.fluid_i,
                                    masks.keep_vel[1:-1, 1:-1, 1:-1],
                                    acc=6, wall_mode=wall, interpret=True)
        for name, a, b in zip("xyz", want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"v{name} {dims} {wall}")


def test_prestep_fused_matches_chain_interpret():
    """diffuse(1..3)+project in one kernel == the composable chain
    (bitwise; ~1 ulp interpret-FMA noise on empty scenes)."""
    import jax.numpy as jnp
    from tools.prestep_pallas import pallas_prestep
    from fluid_simulation_tpu.ops.linsolve import diffuse, diffusion_coeffs
    from fluid_simulation_tpu.ops.project import project
    from fluid_simulation_tpu.scene.masks import build_masks
    from fluid_simulation_tpu.scene.primitives import (
        add_sphere, empty_obstacles)

    rng = np.random.default_rng(9)
    for dims, wall, empty in [((12, 8, 8), "reference", True),
                              ((12, 8, 8), "reference", False),
                              ((10, 10, 6), "noslip", False)]:
        W, H, D = dims
        obs = np.asarray(empty_obstacles(W, H, D)) if empty else np.asarray(
            add_sphere(empty_obstacles(W, H, D), W // 2, H // 2, D // 2, 2))
        masks = build_masks(np.asarray(obs, np.float32))
        shape = (D + 2, H + 2, W + 2)
        vx, vy, vz = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
                      for _ in range(3))
        a, c = diffusion_coeffs(W, H, D, 0.05, 2e-5)
        kw = dict(acc=6, solver="rbgs", wall_mode=wall, use_pallas=False,
                  empty_scene=empty)
        wx = diffuse(1, vx, vx, masks, 0.05, 2e-5, **kw)
        wy = diffuse(2, vy, vy, masks, 0.05, 2e-5, **kw)
        wz = diffuse(3, vz, vz, masks, 0.05, 2e-5, **kw)
        want = project(wx, wy, wz, masks, acc=6, solver="rbgs",
                       wall_mode=wall, use_pallas=False,
                       empty_scene=empty)[:3]
        fl = None if empty else masks.fluid_i
        kv = None if empty else masks.keep_vel[1:-1, 1:-1, 1:-1]
        got = pallas_prestep(vx, vy, vz, fl, kv, float(a), float(c), acc=6,
                             wall_mode=wall, interpret=True)
        for name, aa, bb in zip("xyz", want, got):
            np.testing.assert_allclose(
                np.asarray(bb), np.asarray(aa), rtol=0, atol=3e-7,
                err_msg=f"v{name} {dims} {wall} empty={empty}")


def test_temporal_packed_stream_matches_oracle_interpret():
    """ksw-sweeps-per-pass packed stream == the resident packed kernel
    (bitwise), across block sizes, remainders, and keep configs."""
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.linsolve_pallas import pallas_rbgs_solve
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream_t)

    rng = np.random.default_rng(11)
    for shape, b, empty, acc, blk, ksw in [
            ((18, 6, 10), 1, True, 9, 8, 2),
            ((18, 6, 10), 0, False, 9, 8, 2),
            ((34, 6, 10), 2, False, 15, 16, 4),
            ((20, 6, 10), 3, False, 5, 4, 2)]:
        D2, H2, W2 = shape
        field = rng.normal(size=shape).astype(np.float32)
        prev = rng.normal(size=shape).astype(np.float32)
        if empty:
            kj = None
        else:
            keep = np.ones(shape, np.float32)
            sol = rng.random(size=(D2 - 2, H2 - 2, W2 - 2)) < 0.2
            keep[1:-1, 1:-1, 1:-1] = (~sol).astype(np.float32)
            kj = jnp.asarray(keep)
        want = np.asarray(pallas_rbgs_solve(
            b, jnp.asarray(field), jnp.asarray(prev), kj, 0.3, 2.8,
            acc=acc, interpret=True, empty_scene=empty, packed=True))
        got = np.asarray(pallas_rbgs_solve_stream_t(
            b, jnp.asarray(field), jnp.asarray(prev), kj, 0.3, 2.8,
            acc=acc, interpret=True, empty_scene=empty, blk=blk, ksw=ksw))
        np.testing.assert_array_equal(
            got[1:-1, 1:-1, 1:-1], want[1:-1, 1:-1, 1:-1],
            err_msg=f"{shape} b={b} empty={empty} blk={blk} ksw={ksw}")


def test_mdma_solve_matches_oracle_interpret():
    """Merged-window manual-DMA solve (kernels/linsolve_mdma.py) == rbgs
    oracle (bitwise), across nsw depths, remainders, keep configs, wall
    modes, and edge-block geometries (first/last-block partial DMAs)."""
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.linsolve_mdma import (
        mdma_params, pallas_rbgs_solve_mdma)
    from fluid_simulation_tpu.ops.linsolve import linear_solver
    from fluid_simulation_tpu.scene.masks import build_masks
    from fluid_simulation_tpu.scene.primitives import (
        add_sphere, empty_obstacles)

    rng = np.random.default_rng(3)
    for (W, H, D), blk, nsw, empty, wall, b, acc in [
            ((16, 8, 8), 4, 2, False, "reference", 2, 6),
            ((16, 8, 8), 4, 1, False, "reference", 1, 6),
            ((16, 8, 8), 2, 1, True, "noslip", 3, 5),
            ((16, 8, 12), 4, 2, True, "reference", 0, 6),
            ((16, 8, 12), 6, 3, False, "reference", 0, 7),
            ((16, 8, 20), 4, 2, False, "reference", 2, 9)]:
        obs = (empty_obstacles(W, H, D) if empty else
               add_sphere(empty_obstacles(W, H, D), W // 2, H // 2,
                          D // 2, 2.4))
        masks = build_masks(np.asarray(obs, np.float32))
        shape = (D + 2, H + 2, W + 2)
        f = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        g = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref = linear_solver(b, f, g, 0.9, 6.4, masks, acc=acc,
                            solver="rbgs", wall_mode=wall,
                            empty_scene=empty)
        keep = masks.keep_vel if b else masks.keep_scalar
        got = pallas_rbgs_solve_mdma(
            b, f, g, keep, 0.9, 6.4, acc=acc, wall_mode=wall,
            empty_scene=empty, blk=blk, nsw=nsw, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref),
            err_msg=f"{(W, H, D)} blk={blk} nsw={nsw} empty={empty} "
                    f"wall={wall} b={b}")
    # param model: every production big-grid shape gets a config, and the
    # packed depth divides the block (the edge-DMA contract)
    for shp in ((258, 130, 130), (130, 130, 258), (258, 258, 258),
                (258, 258, 514)):
        for keep_cfg in (False, True):
            picked = mdma_params(shp, jnp.float32, keep_cfg)
            assert picked is not None, (shp, keep_cfg)
            blk, nsw = picked
            assert (shp[0] - 2) % blk == 0 and blk >= 2 * nsw


@pytest.mark.parametrize("bs,wall_mode,masked,blk", [
    ((1, 2, 3), "reference", False, 8),
    ((1, 2, 3), "reference", True, 8),
    ((1, 2, 3), "noslip", True, 8),
    ((0,), "reference", True, 8),
    ((0,), "reference", False, 8),
])
def test_pad_bounds_stream_matches_resident(bs, wall_mode, masked, blk):
    """z-streamed pad+setBounds == the resident kernel (itself tested
    against the composable path above), for D=blk (2 blocks) and D=3*blk
    (4 blocks, exercising interior + both z-plane specials)."""
    from fluid_simulation_tpu.kernels.bounds_pallas import (
        pallas_pad_bounds, pallas_pad_bounds_stream)
    rng = np.random.default_rng(13)
    for Dt in (blk, 3 * blk):
        obs = add_sphere(empty_obstacles(W, H, Dt), W // 3, H // 2,
                         Dt // 2, 2.5)
        masks = build_masks(jnp.asarray(obs))
        smp = jnp.asarray(
            rng.normal(size=(len(bs), Dt, H, W)).astype(np.float32))
        kw = {}
        if masked:
            keep = masks.keep_vel if bs[0] in (1, 2, 3) else masks.keep_scalar
            kw = dict(fluid_i=masks.fluid_i, keep_i=keep[1:-1, 1:-1, 1:-1])
        want = pallas_pad_bounds(smp, bs, wall_mode, interpret=True, **kw)
        got = pallas_pad_bounds_stream(smp, bs, wall_mode, interpret=True,
                                       blk=blk, **kw)
        for i in range(len(bs)):
            np.testing.assert_array_equal(
                np.asarray(got[i]), np.asarray(want[i]),
                err_msg=f"b={bs[i]} D={Dt}")


def test_production_dispatch_traces_on_tpu_backend(monkeypatch):
    """Abstractly trace the PRODUCTION (interpret=False, backend='tpu')
    step at every bench grid class, empty and masked.

    Kernel selection — the mdma/temporal/stream ladders, `_pick_blk` byte
    models, advect routing — is plain Python that runs at trace time, and
    every numeric CPU test either passes interpret=True or is routed off
    the Pallas kernels by the backend gates. A trace-time bug in the
    production branch (round 5 shipped a missing `mdma_preferred` import
    in project_stream.py that crashed every big-grid TPU run while the
    suite stayed green) is only visible when the TPU dispatch itself is
    traced. `jax.eval_shape` does exactly that for free: abstract eval
    runs all the dispatch Python and the Pallas index maps without
    compiling Mosaic or touching memory."""
    import jax
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (
        FluidState, simulation_step)
    from fluid_simulation_tpu.scene.masks import SceneMasks

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # Masked merged-window gate (round 5, tools/exp_mdma_keep.py): engages
    # exactly where the BlockSpec temporal kernel cannot fit (wide rows:
    # obstacle 512x256x256 146.6 -> 121.4 ms/step, bitwise), never where
    # the temporal kernel is the measured masked winner (256^3: 519 vs 508
    # us/sweep).
    from fluid_simulation_tpu.kernels.linsolve_mdma import mdma_preferred
    assert mdma_preferred((258, 258, 514), jnp.float32,
                          apply_keep=True) == (8, 2)
    assert mdma_preferred((258, 258, 258), jnp.float32,
                          apply_keep=True) is None
    assert mdma_preferred((258, 258, 258), jnp.float32,
                          apply_keep=False) == (16, 2)

    for (W, H, D) in ((128, 64, 64), (128, 128, 256), (256, 256, 256),
                      (256, 256, 512)):
        padded = (D + 2, H + 2, W + 2)
        interior = (D, H, W)
        p = jax.ShapeDtypeStruct(padded, jnp.float32)
        i = jax.ShapeDtypeStruct(interior, jnp.float32)
        state = FluidState(vx=p, vy=p, vz=p, dens=p)
        masks = SceneMasks(solid=p, keep_scalar=p, keep_vel=p, fluid_i=i,
                           red_i=i, nb_xp=i, nb_xm=i, nb_yp=i, nb_ym=i,
                           nb_zp=i, nb_zm=i)
        for empty in (True, False):
            params = SimParams(width=W, height=H, depth=D, mode="split",
                               empty_scene=empty, div_stats=False)
            out = jax.eval_shape(
                lambda s, m, prm=params: simulation_step(s, m, prm),
                state, masks)
            assert out[0].vx.shape == padded, (W, H, D, empty)
