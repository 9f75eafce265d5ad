"""The shared density colormap as a LUT.

The reference defines the same LinearSegmentedColormap three times
(gui.py:38-41, GUI/config.py:15-18, make_pngs.py:22-25): white -> lightgreen
-> green -> deepskyblue -> blue -> darkred -> red, evenly spaced. Here it is
one 256-entry LUT usable from NumPy (viewers) and from jitted device code
(on-device frame rendering), with no matplotlib dependency.
"""

from __future__ import annotations

import numpy as np

# CSS color values of the reference's stop list, evenly spaced on [0, 1]
DENSITY_CMAP_COLORS = np.array([
    (255, 255, 255),   # white
    (144, 238, 144),   # lightgreen
    (0, 128, 0),       # green
    (0, 191, 255),     # deepskyblue
    (0, 0, 255),       # blue
    (139, 0, 0),       # darkred
    (255, 0, 0),       # red
], dtype=np.float64)


def build_lut(n: int = 256) -> np.ndarray:
    """(n, 3) uint8 LUT, linear interpolation between the stops (matching
    matplotlib's LinearSegmentedColormap.from_list on the same colors)."""
    stops = np.linspace(0.0, 1.0, len(DENSITY_CMAP_COLORS))
    t = np.linspace(0.0, 1.0, n)
    out = np.empty((n, 3), dtype=np.uint8)
    for c in range(3):
        out[:, c] = np.clip(
            np.interp(t, stops, DENSITY_CMAP_COLORS[:, c]) + 0.5, 0, 255
        ).astype(np.uint8)
    return out


_DEFAULT_LUT = build_lut()


def apply_colormap(data: np.ndarray, vmin: float, vmax: float,
                   lut: np.ndarray = None) -> np.ndarray:
    """Map an array to RGB uint8 through the LUT with clipping normalization
    (the gui.py:61-69 semantics)."""
    lut = _DEFAULT_LUT if lut is None else lut
    t = np.clip((np.asarray(data, np.float32) - vmin) / (vmax - vmin), 0.0, 1.0)
    idx = (t * (len(lut) - 1) + 0.5).astype(np.int32)
    return lut[idx]


def overlay_obstacle(rgb: np.ndarray, obs: np.ndarray,
                     alpha: float = 0.2) -> np.ndarray:
    """Darken pixels where the obstacle mask is set (gui.py:72-79)."""
    out = rgb.copy()
    mask = np.asarray(obs) > 0.5
    out[mask] = (out[mask].astype(np.float32) * (1.0 - alpha)).astype(np.uint8)
    return out
