"""Bandwidth-probe control in bench.py (VERDICT r7 #1, second control).

The scaling header's box-state control must measure REAL DRAM traffic:
an untouched ``np.zeros`` buffer is backed by the copy-on-write zero
page, so copying it re-reads one cached 4 KiB page and over-reports
bandwidth ~1.5x (measured on this box).  These tests pin the probe's
contract — structure, sane magnitudes, and that its buffer is actually
faulted in — without asserting absolute GB/s (box-dependent).

No SparkSession needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_probe_shape_and_sanity():
    out = bench.memory_bandwidth_probe(n_mib=32, repeats=3)
    assert set(out) == {"gbs_median", "gbs_spread"}
    lo, hi = out["gbs_spread"]
    # DRAM copy on any real machine is between 0.1 and 1000 GB/s; the
    # zero-page bug showed up as a fast-outlier so also pin median<=hi
    assert 0.1 < lo <= out["gbs_median"] <= hi < 1000


def test_quiet_floor_is_committed_and_plausible():
    # the floor is calibration data the scaling report keys off; a
    # refactor that drops or zeroes it would silently disable the
    # machine-reject of contended days
    assert 1.0 < bench.BANDWIDTH_QUIET_GBS < 20.0


def test_probe_buffer_is_faulted_not_zero_page():
    # regression pin for the run-1 flaw: the probe source must fill the
    # buffer before timing (np.empty+fill or equivalent), never time a
    # copy of an untouched np.zeros allocation
    import inspect

    src = inspect.getsource(bench.memory_bandwidth_probe)
    assert "fill" in src and "np.zeros(" not in src
