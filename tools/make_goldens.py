#!/usr/bin/env python3
"""Regenerate golden fixtures from the *unmodified* reference solver.

Compiles /root/reference/{simulation,object_loader}.cpp (read-only, never
copied) together with a tiny scenario driver, runs it single-threaded
(OMP_NUM_THREADS=1 makes the in-place Gauss-Seidel sweep deterministic and
sequential — see SURVEY.md §5 "race detection"), and stores compact .npz
fixtures under tests/golden/:

- empty_32x16x16: final frame of all 5 fields + per-step density sums, 20 steps
- box_32x16x16:   same, with a 6x4x4 solid box
- sphere_voxels_64x32x32: obstacle mask voxelized from a synthesized
  icosphere STL (for IoU comparison — the reference voxelizer is
  intentionally randomized, object_loader.cpp:396-423)

Usage: python tools/make_goldens.py [--keep-build]
"""

import argparse
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

DRIVER = r"""
// Scenario driver for golden generation. Links against the unmodified
// reference translation units; the reference's own main() is renamed via
// -Dmain=ref_main at compile time.
#include "simulation.h"
#include <cstdlib>
#include <cstring>

int main(int argc, char** argv) {
    // argv: W H D steps scenario [stl scale rx ry rz tx ty tz]
    int W = atoi(argv[1]), H = atoi(argv[2]), D = atoi(argv[3]);
    int steps = atoi(argv[4]);
    const char* scenario = argv[5];
    Simulation sim(W, H, D, steps);
    if (!strcmp(scenario, "box")) {
        // solid box x in [10..15], y in [6..9], z in [6..9] (1-based cells)
        for (int x = 10; x <= 15; ++x)
            for (int y = 6; y <= 9; ++y)
                for (int z = 6; z <= 9; ++z)
                    sim.addObstacle(x, y, z);
    } else if (!strcmp(scenario, "stl")) {
        loadSTLIntoObstacles(argv[6], sim,
                             atof(argv[7]), atof(argv[8]), atof(argv[9]),
                             atof(argv[10]), atof(argv[11]), atof(argv[12]),
                             atof(argv[13]));
    }
    sim.run();
    return 0;
}
"""


def build(tmp):
    drv = os.path.join(tmp, "driver.cpp")
    with open(drv, "w") as f:
        f.write(DRIVER)
    exe = os.path.join(tmp, "golden.out")
    cmd = [
        "g++", "-std=c++20", "-O2", "-fopenmp",
        "-I", REF,
        "-Dmain=ref_main", "-c", os.path.join(REF, "simulation.cpp"),
        "-o", os.path.join(tmp, "simulation.o"),
    ]
    subprocess.run(cmd, check=True)
    subprocess.run([
        "g++", "-std=c++20", "-O2", "-fopenmp", "-I", REF,
        "-c", os.path.join(REF, "object_loader.cpp"),
        "-o", os.path.join(tmp, "object_loader.o"),
    ], check=True)
    subprocess.run([
        "g++", "-std=c++20", "-O2", "-fopenmp", "-I", REF,
        drv, os.path.join(tmp, "simulation.o"), os.path.join(tmp, "object_loader.o"),
        "-o", exe,
    ], check=True)
    return exe


def run_scenario(exe, tmp, name, W, H, D, steps, extra=()):
    wd = os.path.join(tmp, name)
    os.makedirs(os.path.join(wd, "data"), exist_ok=True)
    env = dict(os.environ, OMP_NUM_THREADS="1")
    args = [exe, str(W), str(H), str(D), str(steps)] + list(extra)
    out = subprocess.run(args, cwd=wd, env=env, check=True,
                         capture_output=True, text=True).stdout
    print(out)
    shape = (steps, D + 2, H + 2, W + 2)
    fields = {}
    for key, fn in [("dens", "data.bin"), ("obs", "obs.bin"),
                    ("vx", "v_x.bin"), ("vy", "v_y.bin"), ("vz", "v_z.bin")]:
        arr = np.fromfile(os.path.join(wd, "data", fn), dtype=np.float32)
        fields[key] = arr.reshape(shape)
    return fields, out


def div_residual_grid_units(vx, vy, vz, obs):
    """Post-projection divergence residual of one padded frame, in grid
    units: 0.5 * sum of fluid-neighbor central differences per interior
    fluid cell — the obstacle-aware stencil of simulation.cpp:297-316
    without the h scaling (BASELINE.md residual row's convention).
    Returns (max, mean) of |residual| over fluid interior cells."""
    solid = obs >= 0.5
    fluid = ~solid

    def nb(f, dz, dy, dx):
        return f[1 + dz:f.shape[0] - 1 + dz,
                 1 + dy:f.shape[1] - 1 + dy,
                 1 + dx:f.shape[2] - 1 + dx]

    fl = fluid.astype(np.float32)
    div = 0.5 * (
        nb(vx, 0, 0, 1) * nb(fl, 0, 0, 1) - nb(vx, 0, 0, -1) * nb(fl, 0, 0, -1)
        + nb(vy, 0, 1, 0) * nb(fl, 0, 1, 0) - nb(vy, 0, -1, 0) * nb(fl, 0, -1, 0)
        + nb(vz, 1, 0, 0) * nb(fl, 1, 0, 0) - nb(vz, -1, 0, 0) * nb(fl, -1, 0, 0))
    r = np.abs(div)[fluid[1:-1, 1:-1, 1:-1]]
    return float(r.max()), float(r.mean())


def save_step_golden(name, fields, W, H, D, steps):
    dens_sums = fields["dens"].astype(np.float64).sum(axis=(1, 2, 3))
    div_max, div_mean = div_residual_grid_units(
        fields["vx"][-1], fields["vy"][-1], fields["vz"][-1],
        fields["obs"][-1])
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, name + ".npz"),
        W=W, H=H, D=D, steps=steps,
        dens_final=fields["dens"][-1], obs=fields["obs"][-1],
        vx_final=fields["vx"][-1], vy_final=fields["vy"][-1],
        vz_final=fields["vz"][-1],
        dens_sums=dens_sums.astype(np.float64),
        # early frames too, to catch divergence onset, not just the endpoint:
        # the full step-1 state (near-bitwise comparable, VERDICT r1 weak#2)
        # and the step-5 probes
        dens_step1=fields["dens"][0], vx_step1=fields["vx"][0],
        vy_step1=fields["vy"][0], vz_step1=fields["vz"][0],
        dens_step5=fields["dens"][4], vx_step5=fields["vx"][4],
        # post-projection divergence residual of the final frame (grid
        # units; BASELINE.md row) for residual-parity checks
        div_max=div_max, div_mean=div_mean,
    )
    print(f"saved {name}: final dens sum {dens_sums[-1]:.6f}, "
          f"div residual max {div_max:.3f} mean {div_mean:.4f}")


def make_icosphere_stl(path, radius=10.0, subdiv=1):
    """Binary STL of an icosphere (our own generator; any watertight mesh
    works — the fixture only needs to be stable and non-axis-aligned)."""
    phi = (1 + 5 ** 0.5) / 2
    verts = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
    ], dtype=np.float64)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    verts = [v / np.linalg.norm(v) for v in verts]
    for _ in range(subdiv):
        new_faces, cache = [], {}
        verts = list(verts)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (verts[a] + verts[b]) / 2
                verts.append(m / np.linalg.norm(m))
                cache[key] = len(verts) - 1
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new_faces
    verts = np.array(verts) * radius

    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(faces)))
        for a, b, c in faces:
            v1, v2, v3 = verts[a], verts[b], verts[c]
            n = np.cross(v2 - v1, v3 - v1)
            n = n / (np.linalg.norm(n) + 1e-30)
            f.write(struct.pack("<3f", *n))
            for v in (v1, v2, v3):
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep-build", action="store_true")
    ap.add_argument("--only", help="generate just this fixture name")
    args = ap.parse_args()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="refgolden_")
    print("build dir:", tmp)
    exe = build(tmp)

    def want(name):
        return args.only is None or args.only == name

    if want("empty_32x16x16"):
        f, _ = run_scenario(exe, tmp, "empty", 32, 16, 16, 20,
                            extra=["empty"])
        save_step_golden("empty_32x16x16", f, 32, 16, 16, 20)

    if want("box_32x16x16"):
        f, _ = run_scenario(exe, tmp, "box", 32, 16, 16, 20, extra=["box"])
        save_step_golden("box_32x16x16", f, 32, 16, 16, 20)

    # BASELINE config 1 scale: 64^3 empty wind tunnel (the reference solver
    # at its fixed acc=15 GS; the rebuild compares its 20-iter Jacobi run
    # statistically — solver class differs by design, SURVEY.md §7)
    if want("empty_64x64x64"):
        f, _ = run_scenario(exe, tmp, "empty64", 64, 64, 64, 20,
                            extra=["empty"])
        save_step_golden("empty_64x64x64", f, 64, 64, 64, 20)

    if want("sphere_voxels_64x32x32"):
        stl = os.path.join(tmp, "icosphere.stl")
        make_icosphere_stl(stl, radius=10.0, subdiv=1)
        f, _ = run_scenario(exe, tmp, "stl", 64, 32, 32, 1,
                            extra=["stl", stl, "1.0", "30", "45", "60",
                                   "2", "1", "-1"])
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, "sphere_voxels_64x32x32.npz"),
            obs=f["obs"][0], radius=10.0, subdiv=1,
            scale=1.0, rot=(30.0, 45.0, 60.0), translate=(2.0, 1.0, -1.0))
        print("saved sphere_voxels_64x32x32:", int(f["obs"][0].sum()),
              "solid cells")

    if want("stl_flow_64x32x32"):
        # STL -> voxelize -> 20-step flow, end-to-end through the reference
        # binary (the untested main() path, simulation.cpp:441-448 —
        # VERDICT r2 #9). The icosphere STL fixture itself is saved next to
        # the golden so the rebuild voxelizes the very same mesh.
        stl = os.path.join(GOLDEN_DIR, "icosphere_r10.stl")
        make_icosphere_stl(stl, radius=10.0, subdiv=1)
        f, _ = run_scenario(exe, tmp, "stlflow", 64, 32, 32, 20,
                            extra=["stl", stl, "1.0", "30", "45", "60",
                                   "2", "1", "-1"])
        save_step_golden("stl_flow_64x32x32", f, 64, 32, 32, 20)

    # the empty driver is overwritten with 'empty' scenario name default
    if not args.keep_build:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
