"""Iso-surface extraction: vectorized marching tetrahedra.

The reference extracts the obstacle surface with
``skimage.measure.marching_cubes(obs, level=0.5)`` (GUI/utils.py:17). skimage
is not a dependency here, so this is an in-house implementation. Marching
*tetrahedra* (each cube split into 6 tets around the 0-6 diagonal) was chosen
over classic marching cubes: it needs no 256-case table, has no ambiguous
cases, and vectorizes cleanly over all cells at once. Output contract matches
``generate_obstacle_mesh`` (GUI/utils.py:10-38): dict with ``vertexes``,
``faces``, ``vertex_colors`` (solid gray).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# cube corner offsets, corner id = bit pattern (x, y, z)
_CORNERS = np.array([
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
], dtype=np.float32)

# six tetrahedra around the 0-6 diagonal
_TETS = np.array([
    (0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
    (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6),
], dtype=np.int64)

# tet edges by local vertex pairs
_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
                  dtype=np.int64)

# case -> up to 2 triangles of edge ids (-1 = unused). Case bit i set means
# tet vertex i is above the level. Complementary cases share the edge set.
_CASE_TRIS = -np.ones((16, 2, 3), dtype=np.int64)
_CASE_TRIS[1, 0] = (0, 1, 2)                          # v0
_CASE_TRIS[14, 0] = (0, 2, 1)
_CASE_TRIS[2, 0] = (0, 3, 4)                          # v1
_CASE_TRIS[13, 0] = (0, 4, 3)
_CASE_TRIS[4, 0] = (1, 4 + 1, 3)                      # v2: edges 1,5,3
_CASE_TRIS[11, 0] = (1, 3, 5)
_CASE_TRIS[8, 0] = (2, 4, 5)                          # v3
_CASE_TRIS[7, 0] = (2, 5, 4)
_CASE_TRIS[3] = [(1, 2, 4), (1, 4, 3)]                # v0+v1
_CASE_TRIS[12] = [(1, 4, 2), (1, 3, 4)]
_CASE_TRIS[5] = [(0, 2, 5), (0, 5, 3)]                # v0+v2
_CASE_TRIS[10] = [(0, 5, 2), (0, 3, 5)]
_CASE_TRIS[9] = [(0, 1, 5), (0, 5, 4)]                # v0+v3
_CASE_TRIS[6] = [(0, 5, 1), (0, 4, 5)]


def marching_tetrahedra(volume: np.ndarray, level: float = 0.5) -> tuple:
    """Extract the iso-surface of a 3-D scalar volume.

    Returns ``(verts, faces)``: verts (N, 3) float32 in voxel coordinates
    (axis order = volume axis order, like skimage), faces (M, 3) int. Vertices
    are emitted per-triangle (not deduplicated) — fine for the GL fill +
    wireframe rendering the viewer does.
    """
    v = np.asarray(volume, dtype=np.float32)
    if v.ndim != 3 or min(v.shape) < 2:
        raise ValueError(f"need a 3-D volume with every dim >= 2, got {v.shape}")
    if not ((v.max() > level) and (v.min() <= level)):
        raise ValueError("level does not intersect the volume")

    nx, ny, nz = v.shape
    # corner values of every cube, (C, 8)
    blocks = [v[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
              for dx, dy, dz in _CORNERS.astype(int)]
    vals = np.stack([b.reshape(-1) for b in blocks], axis=1)

    bx, by, bz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = np.stack([bx.reshape(-1), by.reshape(-1), bz.reshape(-1)],
                    axis=1).astype(np.float32)              # (C, 3)

    # only cubes straddling the level contribute
    vmin = vals.min(axis=1)
    vmax = vals.max(axis=1)
    active = (vmin <= level) & (vmax > level)
    vals = vals[active]
    base = base[active]

    tris_out = []
    for tet in _TETS:
        tv = vals[:, tet]                                    # (C, 4)
        tp = base[:, None, :] + _CORNERS[tet][None, :, :]    # (C, 4, 3)
        case = ((tv > level) << np.arange(4)).sum(axis=1)    # (C,)
        for t_i in range(2):
            edge_ids = _CASE_TRIS[case, t_i]                 # (C, 3)
            emit = edge_ids[:, 0] >= 0
            if not emit.any():
                continue
            eids = edge_ids[emit]                            # (E, 3)
            cv = tv[emit]
            cp = tp[emit]
            a = _EDGES[eids][..., 0]                         # (E, 3)
            b = _EDGES[eids][..., 1]
            rows = np.arange(len(eids))[:, None]
            va = cv[rows, a]
            vb = cv[rows, b]
            pa = cp[rows, a]
            pb = cp[rows, b]
            t = (level - va) / np.where(vb == va, 1e-30, vb - va)
            t = np.clip(t, 0.0, 1.0)[..., None]
            tris_out.append(pa + t * (pb - pa))              # (E, 3, 3)

    if not tris_out:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    tris = np.concatenate(tris_out, axis=0)
    verts = tris.reshape(-1, 3)
    faces = np.arange(len(verts), dtype=np.int64).reshape(-1, 3)
    return verts, faces


def generate_obstacle_mesh(obs_data: np.ndarray, level: float = 0.5) -> Dict:
    """GUI/utils.py:10-38 contract: mesh dict with solid gray colors; empty
    mesh when there is nothing to extract (its bare-except behavior)."""
    try:
        verts, faces = marching_tetrahedra(obs_data, level)
    except ValueError:
        return {"vertexes": np.array([]), "faces": np.array([]),
                "vertex_colors": np.array([])}
    colors = np.ones((len(verts), 4), dtype=np.float32)
    colors[:, :3] = 0.5
    return {"vertexes": verts, "faces": faces, "vertex_colors": colors}
