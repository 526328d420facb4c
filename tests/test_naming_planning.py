"""Naming-convention parity + UTM scale planning + crop-with-halo rule."""

import numpy as np

from pyspark.sql import functions as F

from topo_descriptors_spark.functions import naming
from topo_descriptors_spark.functions.planner import scale_to_pixel, utm_from_latlon
from topo_descriptors_spark.operators import window as W
from topo_descriptors_spark.sources.io import crop_with_halo


def test_names_match_reference_conventions():
    # formats pinned to reference topo.py:83-85,184-188,310-314,456-463,647-655,956-960
    assert naming.dem_name(500) == "DEM_500M"
    assert naming.tpi_name(2000, 1) == "TPI_2000M_SMTHFACT1"
    assert naming.tpi_name(2000, None) == "TPI_2000M"
    assert naming.std_name(200, 0.5) == "STD_200M_SMTHFACT0.5"
    assert naming.valley_ridge_names(1000, "VALLEY", 0.5) == [
        "VALLEY_NORM_1000M_SMTHFACT0.5",
        "VALLEY_DIR_1000M_SMTHFACT0.5",
    ]
    assert naming.gradient_names(200, 1) == [
        "WE_DERIVATIVE_200M_SIGRATIO1",
        "SN_DERIVATIVE_200M_SIGRATIO1",
        "SLOPE_200M_SIGRATIO1",
        "ASPECT_200M_SIGRATIO1",
    ]
    assert naming.sx_name(500, 0) == "SX_RADIUS500_AZIMUTH0"


def test_utm_differential_accuracy():
    # what resolution estimation relies on: projected distances between
    # nearby points must match geodesy.  0.01 deg of latitude ~ 1112 m of
    # northing; 0.01 deg of longitude at 46.95N ~ 111320*cos(lat)*0.01 m
    lat, lon = 46.948, 7.447
    e0, n0 = utm_from_latlon(np.array([lat]), np.array([lon]))
    e1, n1 = utm_from_latlon(np.array([lat + 0.01]), np.array([lon]))
    e2, n2 = utm_from_latlon(np.array([lat]), np.array([lon + 0.01]))
    d_north = np.hypot(e1 - e0, n1 - n0)[0]
    d_east = np.hypot(e2 - e0, n2 - n0)[0]
    assert abs(d_north - 1112.0) < 5.0
    expected_east = 111320 * np.cos(np.radians(lat)) * 0.01
    assert abs(d_east - expected_east) < 5.0
    # southern hemisphere gets the 10,000 km false northing
    _, n_s = utm_from_latlon(np.array([-33.9]), np.array([18.4]))
    assert 0 < n_s[0] < 10_000_000


def test_scale_to_pixel_projected_and_wgs84():
    # projected 50 m grid: 450 m -> 9 px
    x = np.arange(0, 5000, 50.0)
    y = np.arange(0, 4000, 50.0)
    scales, res = scale_to_pixel([450], x, y, crs="epsg:21781")
    assert scales == [9]
    assert np.allclose(res["x"], 50.0)
    # WGS84 grid: resolution derived via UTM reprojection
    lats = np.arange(46.30, 46.40, 0.0005)
    lons = np.arange(8.2, 8.3, 0.0005)
    scales, res = scale_to_pixel([500], lons, lats, crs="EPSG:4326")
    assert scales == [11]  # mean res ~47 m


def test_crop_with_halo_preserves_boundary_context(spark):
    # windowed mean over rowsBetween(-2, 2); cropping to [10, 20] BEFORE
    # computing changes results at the crop border; crop_with_halo must not
    base = spark.range(100).select(
        F.lit("e").alias("entity_id"),
        F.col("id").alias("pos"),
        F.sin(F.col("id").cast("double")).alias("value"),
    )

    def compute(df):
        return W.rolling_std(df, [5], value="value", entity="entity_id", order="pos")

    full = compute(base).where(F.col("pos").between(10, 20)).toPandas()
    good = crop_with_halo(base, "pos", 10, 20, halo=2, compute=compute).toPandas()
    naive = compute(base.where(F.col("pos").between(10, 20))).toPandas()

    f = full.sort_values("pos")["std_5"].to_numpy()
    g = good.sort_values("pos")["std_5"].to_numpy()
    n = naive.sort_values("pos")["std_5"].to_numpy()
    assert np.allclose(f, g, atol=1e-12)
    assert not np.allclose(f, n, atol=1e-12)  # the naive plan is wrong
