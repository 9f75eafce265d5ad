"""Golden parity vs the compiled, unmodified reference solver.

Fixtures in tests/golden/ are produced by ``tools/make_goldens.py`` from the
actual C++ binary at OMP_NUM_THREADS=1 (deterministic sequential GS). With
``solver='gs_wavefront'`` our sweep is numerically identical to the
reference's, so early steps agree to f32 ulp level; the high-Reynolds jet is
chaotic, so later steps are compared statistically (SURVEY.md §7 "GS parity" —
even two reference runs at >1 thread differ pointwise).

Measured divergence-onset for the empty 32x16x16 scenario (this repo, g++
12.2 -O2 vs XLA CPU): step1 vx 9.5e-7, step5 vx 6.0e-4, growing ~2.5x/step.
Thresholds below have ~10x headroom.
"""

import os

import numpy as np
import pytest

from fluid_simulation_tpu.config import SimParams
from fluid_simulation_tpu.models.windtunnel import WindTunnel
from fluid_simulation_tpu.scene.primitives import empty_obstacles, add_box

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing — run tools/make_goldens.py")
    return np.load(path)


def _run(golden, obstacles=None, steps=20):
    p = SimParams(width=int(golden["W"]), height=int(golden["H"]),
                  depth=int(golden["D"]), solver="gs_wavefront")
    wt = WindTunnel(p, obstacles=obstacles)
    states = []
    sums = []
    for i in range(steps):
        stats = wt.step()
        sums.append(float(stats.density_sum))
        states.append(wt.state)
    return wt, states, np.array(sums, dtype=np.float64)


@pytest.mark.parametrize("scenario", ["empty_32x16x16", "box_32x16x16"])
def test_golden_parity(scenario):
    g = _golden(scenario)
    obstacles = None
    if scenario.startswith("box"):
        obstacles = add_box(empty_obstacles(32, 16, 16), 10, 15, 6, 9, 6, 9)
        np.testing.assert_array_equal(obstacles, g["obs"])

    wt, states, sums = _run(g, obstacles)

    # ulp-level agreement before chaos sets in
    vx5 = np.asarray(states[4].vx)
    dens5 = np.asarray(states[4].dens)
    assert np.abs(vx5 - g["vx_step5"]).max() < 5e-3
    assert np.abs(dens5 - g["dens_step5"]).max() < 1e-5

    # integrated mass trajectory: tight pre-chaos, 1% through the chaotic tail
    golden_sums = g["dens_sums"]
    np.testing.assert_allclose(sums[:8], golden_sums[:8], rtol=2e-4)
    np.testing.assert_allclose(sums, golden_sums, rtol=1e-2)

    # final-state statistics: the chaotic regime — distributions must match.
    # Tolerance accommodates ulp-level compiler (FMA-fusion) differences
    # amplified over 20 chaotic steps: measured 2-6% on the secondary
    # components' moments; extremes are extreme-value noise (loose bound).
    for key, mine in [("vx_final", states[-1].vx), ("vy_final", states[-1].vy),
                      ("vz_final", states[-1].vz), ("dens_final", states[-1].dens)]:
        ref = g[key].astype(np.float64)
        m = np.asarray(mine, np.float64)
        assert abs(np.abs(m).mean() - np.abs(ref).mean()) \
            / (np.abs(ref).mean() + 1e-12) < 0.08, key
        assert abs(m.std() - ref.std()) / (ref.std() + 1e-12) < 0.08, key
        scale = np.abs(ref).max() + 1e-12
        tol = 0.08 if key in ("vx_final", "dens_final") else 0.40
        assert abs(m.max() - ref.max()) / scale < tol, key
        assert abs(m.min() - ref.min()) / scale < tol, key


def test_golden_first_step_near_bitwise():
    g = _golden("empty_32x16x16")
    wt, states, _ = _run(g, steps=1)
    # one step: every op chain in compat mode agrees with the C++ to ~ulp
    # (differences only from compiler-level FMA/rounding choices)
    # golden arrays store frames; step-1 frame == index 0 of the dump
    # (we only stored step5/final, so re-derive bound from dens_sums[0])
    assert abs(float(np.asarray(states[0].dens).astype(np.float64).sum())
               - g["dens_sums"][0]) < 1e-5
