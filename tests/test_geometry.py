"""Golden-parity tests for the Sx geometry planners.

Expected values are the reference's own pinned goldens
(reference test/test_topo.py:6-67).
"""

import numpy as np

from topo_descriptors_spark.functions import geometry


def test_sx_distance_golden():
    out = geometry.sx_distance(150.0, dx=50.0, dy=40.0)
    expected_first_row = np.array(
        [
            256.1249695,
            219.31712199,
            188.67962264,
            167.63054614,
            160.0,
            167.63054614,
            188.67962264,
            219.31712199,
            256.1249695,
        ]
    )
    assert out.shape == (9, 9)
    assert out.dtype == np.float64
    assert np.allclose(out[0, :], expected_first_row)
    # symmetric about the center
    assert np.allclose(out, out[::-1, ::-1])
    assert out[4, 4] == 0.0


def test_sx_bresenham_lines_golden():
    start = np.array([[8, 9], [17, 22]])
    end = np.array([15, 15])
    out = geometry.sx_bresenham_lines(start, end)
    expected = np.array(
        [
            [9, 10],
            [10, 11],
            [11, 12],
            [12, 12],
            [13, 13],
            [14, 14],
            [17, 21],
            [16, 20],
            [16, 19],
            [16, 18],
            [16, 17],
            [15, 16],
        ]
    )
    assert out.dtype == np.int64
    assert np.array_equal(out, expected)


def test_sx_source_idx_delta_golden():
    out = geometry.sx_source_idx_delta(
        np.array([3.0, 4.0, 5.0, 6.0]), radius=500, dx=20, dy=30
    )
    expected = np.array([[17, 1], [17, 2], [17, 2], [17, 3]])
    assert out.dtype == np.int64
    assert np.array_equal(out, expected)


def test_sx_offsets_plan():
    offsets, dists = geometry.sx_offsets(
        azimuth=0.0, radius=200.0, dx=50.0, dy=50.0, radius_min=50.0
    )
    assert offsets.shape[0] == dists.shape[0]
    assert offsets.shape[0] > 0
    # no offset closer than radius_min, none beyond window
    assert (dists >= 50.0).all()
    # azimuth 0 looks along +y: all source offsets have positive row delta
    assert (offsets[:, 0] > 0).all()
    # the center itself is never a source
    assert not ((offsets == 0).all(axis=1)).any()
