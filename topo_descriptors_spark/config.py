"""Engine configuration.

Mirrors the reference's two config knobs (reference
config/topo_descriptors.conf:1-5, loaded in __init__.py:15): values at or
below ``min_elevation`` are nulled at load, and Gaussian smoothing sigma is
``scale_pxl / scale_std``.  Here they are plain Python — job-level params
that flow into Catalyst as literals, not a config file dependency.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # Values <= min_elevation are nulled at scan time (reference helpers.py:31).
    min_elevation: float = -100.0
    # Number of standard deviations per unit scale (reference conf:5).
    scale_std: float = 4.0
    # Default tile side (rows/positions per tile partition) for 2-D kernels.
    tile_size: int = 256
    # Default salt fan-out for skewed entity buckets.
    default_salt: int = 8
    # Kernel area above which the tile convolution switches to FFT
    # (the reference lets scipy.signal.convolve choose; topo.py:175).
    fft_kernel_area_threshold: int = 225
    # Spark tuning defaults (applied by session.get_spark).
    shuffle_partitions: int = 32
    max_partition_bytes: str = "128m"
    spark_extra: dict = field(default_factory=dict)


CFG = EngineConfig()
