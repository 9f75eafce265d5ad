"""Analytic obstacle primitives.

The reference can only voxelize an STL mesh (``object_loader.cpp:270-452``) or
poke single cells (``Simulation::addObstacle``, ``simulation.cpp:155-158``).
These helpers build common test/benchmark shapes directly on the padded grid —
used by BASELINE config 2 (sphere obstacle) and the vmapped design sweep
(config 4).

Coordinates follow the reference's 1-based interior convention: a cell
``(x, y, z)`` with ``1 <= x <= W`` maps to padded index ``[z, y, x]``.
"""

from __future__ import annotations

import numpy as np


def empty_obstacles(width: int, height: int, depth: int) -> np.ndarray:
    """All-fluid padded obstacle field (matches a failed STL load,
    object_loader.cpp:282-285 — the solver degrades to an empty tunnel)."""
    return np.zeros((depth + 2, height + 2, width + 2), dtype=np.float32)


def _cell_centers(width: int, height: int, depth: int):
    x = np.arange(1, width + 1, dtype=np.float32)
    y = np.arange(1, height + 1, dtype=np.float32)
    z = np.arange(1, depth + 1, dtype=np.float32)
    return np.meshgrid(z, y, x, indexing="ij")  # (Z, Y, X) grids


def add_box(obs: np.ndarray, x0: int, x1: int, y0: int, y1: int, z0: int, z1: int) -> np.ndarray:
    """Mark the inclusive cell range [x0..x1]x[y0..y1]x[z0..z1] solid."""
    D2, H2, W2 = obs.shape
    x0, x1 = max(1, x0), min(W2 - 2, x1)
    y0, y1 = max(1, y0), min(H2 - 2, y1)
    z0, z1 = max(1, z0), min(D2 - 2, z1)
    out = obs.copy()
    out[z0:z1 + 1, y0:y1 + 1, x0:x1 + 1] = 1.0
    return out


def add_sphere(obs: np.ndarray, cx: float, cy: float, cz: float, radius: float) -> np.ndarray:
    """Mark cells whose center lies inside the sphere solid."""
    D2, H2, W2 = obs.shape
    Z, Y, X = _cell_centers(W2 - 2, H2 - 2, D2 - 2)
    inside = (X - cx) ** 2 + (Y - cy) ** 2 + (Z - cz) ** 2 <= radius ** 2
    out = obs.copy()
    out[1:-1, 1:-1, 1:-1] = np.where(inside, 1.0, out[1:-1, 1:-1, 1:-1])
    return out


def add_cylinder(obs: np.ndarray, cx: float, cy: float, radius: float,
                 z0: int = None, z1: int = None) -> np.ndarray:
    """Z-aligned cylinder (classic 'flow past a cylinder' scene)."""
    D2, H2, W2 = obs.shape
    depth = D2 - 2
    z0 = 1 if z0 is None else max(1, z0)
    z1 = depth if z1 is None else min(depth, z1)
    Z, Y, X = _cell_centers(W2 - 2, H2 - 2, depth)
    inside = ((X - cx) ** 2 + (Y - cy) ** 2 <= radius ** 2) & (Z >= z0) & (Z <= z1)
    out = obs.copy()
    out[1:-1, 1:-1, 1:-1] = np.where(inside, 1.0, out[1:-1, 1:-1, 1:-1])
    return out
