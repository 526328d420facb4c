"""Scale/frame planners — meters→pixels→window-frame bounds.

Re-derivations (not ports) of the reference's driver-side planning math:
``round_up_to_odd`` (reference helpers.py:108-111), ``scale_to_pixel``
(helpers.py:68-105) and ``get_sigmas`` (helpers.py:114-134).  In the
engine these produce the ``rowsBetween(-k, k)`` frame half-widths and
Gaussian sigmas consumed by :mod:`topo_descriptors_spark.operators.window`.

Golden-value parity with the reference's own pytest suite is pinned in
``tests/test_planner.py`` (reference test/test_helpers.py:6-11).
"""

from __future__ import annotations

import numpy as np

from topo_descriptors_spark.config import CFG


def round_up_to_odd(f) -> np.ndarray:
    """Nearest odd integer(s) for float input, as int64.

    Semantics pinned by reference test/test_helpers.py:6-11: uses
    banker's rounding on (f-1)/2 — e.g. 2.2 -> 3, 0.8 -> 1, 4.4 -> 5.
    """
    half = np.round((np.asarray(f, dtype=np.float64) - 1.0) / 2.0)
    return (half * 2 + 1).astype(np.int64)


def grid_resolution(coords: np.ndarray) -> np.ndarray:
    """Per-point resolution of a monotone coordinate vector.

    Equivalent of ``np.gradient`` over the coordinate axis (reference
    helpers.py:100-101): central differences in the interior, one-sided
    at the edges.  Works on 1-D vectors.
    """
    c = np.asarray(coords, dtype=np.float64)
    if c.size < 2:
        return np.zeros_like(c)
    res = np.empty_like(c)
    res[1:-1] = (c[2:] - c[:-2]) / 2.0
    res[0] = c[1] - c[0]
    res[-1] = c[-1] - c[-2]
    return res


def scales_to_frames(scales_m, resolution_m: float) -> list[int]:
    """Convert scales in meters to odd pixel diameters for a grid with a
    uniform resolution, then to window-frame half-widths.

    Returns the odd diameters (the reference's ``scales_pxl``); callers
    derive the frame half-width as ``k = d // 2`` →
    ``Window.rowsBetween(-k, k)``.
    """
    return [int(d) for d in round_up_to_odd(np.asarray(scales_m, float) / resolution_m)]


def frame_half_width(scale_pxl: int) -> int:
    """Odd pixel diameter → symmetric frame half-width k for rowsBetween(-k, k)."""
    return int(scale_pxl) // 2


def get_sigmas(smth_factors, scales_pxl) -> list[float | None]:
    """Smoothing factors × scales → Gaussian sigmas (None/0 factor → None).

    sigma = factor * scale_pxl / CFG.scale_std (reference helpers.py:114-134,
    conf:5 — scale_std = 4).
    """
    out: list[float | None] = []
    for fact, scale in zip(smth_factors, scales_pxl):
        if fact is None or fact == 0:
            out.append(None)
        else:
            out.append(float(fact) * float(scale) / CFG.scale_std)
    return out


def gaussian_weights(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Normalized 1-D Gaussian weights, radius = int(truncate*sigma + 0.5).

    Pure-numpy equivalent of the scipy gaussian_filter1d kernel (order 0)
    that the reference smooths with (reference topo.py:631-635); scipy is
    not available in this environment so the kernel is rebuilt from the
    definition.  Returned array has length 2*radius+1 and sums to 1.
    """
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return w / w.sum()
