"""Sx (wind-shelter) geometry planners — driver-side constants.

The Sx descriptor needs, per (azimuth, radius) configuration, the set of
source-pixel offsets each target looks at and their physical distances.
The reference computes these once on the driver (reference
topo.py:832-853 via _sx_distance:861-878, _sx_source_idx_delta:881-892,
_sx_bresenhamlines:895-925) and closes the numba kernel over them.  The
engine does the same: these pure-numpy planners produce the offset/
distance tables that are (a) broadcast into the Arrow tile kernel for the
2-D form and (b) turned into lag-expression banks for the 1-D form.

These are re-derivations from the published semantics; golden-value
parity with the reference pytest suite (reference test/test_topo.py:6-67)
is pinned in ``tests/test_geometry.py``.
"""

from __future__ import annotations

import numpy as np


def sx_distance(radius: float, dx: float, dy: float) -> np.ndarray:
    """Distance-from-center (meters) over a (2*radius_pxl+1)-sized window.

    radius_pxl = max(radius/|dy|, radius/|dx|); the window side length is
    ceil(2*radius_pxl + 1) cells and the center sits at index
    floor((2*radius_pxl+1)/2).  Entry (j, i) is the Euclidean ground
    distance between cell (j, i) and the center given grid spacings
    (dy, dx).  Mirrors reference topo.py:861-878 (float64).
    """
    rp = max(radius / abs(dy), radius / abs(dx))
    span = 2.0 * rp + 1.0
    n = int(np.ceil(span))
    center = float(np.floor(span / 2.0))
    offsets = np.arange(n, dtype=np.float64) - center
    return np.hypot(offsets[:, None] * dy, offsets[None, :] * dx)


def sx_source_idx_delta(azimuths, radius: float, dx: float, dy: float) -> np.ndarray:
    """(dy_idx, dx_idx) integer offsets of the pixels lying at ``radius``
    meters from a target in each azimuth direction.

    Azimuth 0° points along +y; rounding is banker's (np.rint), pinning
    the goldens of reference test/test_topo.py:57-67 (topo.py:881-892).
    """
    az = np.radians(np.asarray(azimuths, dtype=np.float64))
    d_row = np.rint(radius / dy * np.cos(az))
    d_col = np.rint(radius / dx * np.sin(az))
    return np.stack([d_row, d_col], axis=-1).astype(np.int64)


def sx_bresenham_lines(start: np.ndarray, end: np.ndarray) -> np.ndarray:
    """All integer grid cells on the straight lines from each ``start``
    point toward the single ``end`` point, stopping *before* the end.

    Vectorized: each line is sampled at unit steps of its dominant axis,
    rounded to the nearest cell; trailing samples whose L1 distance to
    the end increases step-over-step are dropped (lines never overshoot),
    and the end cell itself is excluded — the "stop before center"
    semantics pinned by reference test/test_topo.py:31-54
    (topo.py:895-925).  Output rows are ordered line-by-line.
    """
    start = np.asarray(start, dtype=np.int64)
    end = np.asarray(end, dtype=np.int64)
    seg = end[None, :] - start  # (n_lines, 2)
    span = np.abs(seg).max(axis=1)  # dominant-axis length per line
    n_steps = int(span.max()) if span.size else 0
    if n_steps == 0:
        return np.empty((0, 2), dtype=np.int64)

    denom = np.where(span == 0, 1, span).astype(np.float64)[:, None]
    unit = seg.astype(np.float64) / denom  # per-line step vector
    t = np.arange(1, n_steps + 1, dtype=np.float64)
    pts = start[:, None, :].astype(np.float64) + unit[:, None, :] * t[None, :, None]
    pts = np.rint(pts).astype(np.int64)  # (n_lines, n_steps, 2)

    l1 = np.abs(pts - end[None, None, :]).sum(axis=2)  # (n_lines, n_steps)
    keep = np.empty_like(l1, dtype=bool)
    keep[:, 0] = True
    keep[:, 1:] = np.diff(l1, axis=1) <= 0
    flat = pts[keep]  # row-major: line 0's kept steps, then line 1's, ...
    at_end = (flat == end[None, :]).all(axis=1)
    return flat[~at_end]


def sx_offsets(
    azimuth: float,
    radius: float,
    dx: float,
    dy: float,
    height: float = 10.0,
    azimuth_arc: float = 10.0,
    azimuth_steps: int = 15,
    radius_min: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Full Sx plan: (offsets, distances) for one azimuth configuration.

    Returns centered integer offsets (n, 2) of every candidate source
    cell in the sector fan, with their ground distances (meters);
    offsets closer than ``radius_min`` are excluded.  Mirrors the
    assembly in reference topo.py:826-853.
    """
    if azimuth_arc == 0:
        azimuth_steps = 1
    azimuths = np.linspace(
        azimuth - azimuth_arc / 2.0, azimuth + azimuth_arc / 2.0, azimuth_steps
    )
    dist = sx_distance(radius, dx, dy)
    center = np.floor(np.array(dist.shape, dtype=np.float64) / 2.0)
    source = (center[None, :] + sx_source_idx_delta(azimuths, radius, dx, dy)).astype(
        np.int64
    )
    lines = sx_bresenham_lines(source, center.astype(np.int64))
    d = dist[lines[:, 0], lines[:, 1]]
    ok = ~(d < radius_min)
    offsets = lines[ok] - center.astype(np.int64)[None, :]
    return offsets, d[ok]
