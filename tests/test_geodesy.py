"""Geodesy kernel unit tests (pure numpy): ECEF↔LLH round trips, geodetic
pixel area sanity against the spherical-cap closed form."""

from __future__ import annotations

import numpy as np

from raster_processor_spark.functions import geodesy as g


def test_llh_xyz_roundtrip():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89.5, 89.5, 5000)
    lon = rng.uniform(-180, 180, 5000)
    h = rng.uniform(-500, 9000, 5000)
    x, y, z = g.llh2xyz_np(lat, lon, h)
    lat2, lon2, h2 = g.xyz2llh_np(x, y, z)
    assert np.allclose(lat, lat2, atol=1e-9)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(h, h2, atol=1e-6)


def test_xyz_known_points():
    # equator/prime meridian at h=0 → (a, 0, 0)
    x, y, z = g.llh2xyz_np([0.0], [0.0], [0.0])
    assert np.isclose(x[0], g.WGS84_A) and np.isclose(y[0], 0) and np.isclose(z[0], 0)
    # north pole → z = b = a(1-f)
    x, y, z = g.llh2xyz_np([90.0], [0.0], [0.0])
    b = g.WGS84_A * (1 - g.WGS84_F)
    assert np.isclose(z[0], b) and np.isclose(np.hypot(x[0], y[0]), 0, atol=1e-6)


def test_wgs84_px_area_totals_earth_surface():
    # sum of 1-degree band areas over the full sphere ≈ WGS84 surface area
    lats = np.arange(-89.5, 90, 1.0)
    band = g.wgs84_px_area_np(lats, 1.0, 360.0)
    total = band.sum()
    wgs84_surface = 5.10065622e14  # m^2, published value
    assert abs(total - wgs84_surface) / wgs84_surface < 1e-4


def test_haversine_known_distance():
    # quarter meridian ≈ 10,001.96 km (spherical approx within 0.3%)
    d = g.haversine_m_np(np.array([0.0]), np.array([0.0]), np.array([90.0]), np.array([0.0]))
    assert abs(d[0] - 1.00019e7) / 1.00019e7 < 0.003
