"""Geodesy column expressions (reference: src/SWOTRaster/raster_crs.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# WGS84 constants (raster_crs.py:23-26)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)


def lon_360to180_col(lon: Column) -> Column:
    """Wrap [0,360) → [-180,180) (raster_crs.py:234-236 lon_360to180)."""
    return F.pmod(lon + 180.0, F.lit(360.0)) - 180.0


def lon_360to180_sql(lon_sql: str) -> str:
    # DuckDB % keeps the dividend sign; inputs here are >= -180 so +360 first
    return f"(((({lon_sql}) + 180.0 + 360.0) % 360.0) - 180.0)"


def wgs84_px_area_np(lat: np.ndarray, dlat_deg: float, dlon_deg: float) -> np.ndarray:
    """Geodetic area (m^2) of a dlat x dlon cell centered at lat — the
    reference's per-pixel geodetic area for water-area aggregation
    (raster_crs.py:30-46 wgs84_px_area), re-derived from the same spherical-
    excess integral on the WGS84 ellipsoid."""
    lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
    dlat = np.deg2rad(dlat_deg)
    dlon = np.deg2rad(dlon_deg)
    e = np.sqrt(WGS84_E2)

    def zone(phi):
        s = np.sin(phi)
        return s / (2.0 * (1.0 - WGS84_E2 * s * s)) + np.arctanh(e * s) / (4.0 * e)

    band = zone(lat + dlat / 2.0) - zone(lat - dlat / 2.0)
    return 2.0 * WGS84_A * WGS84_A * (1.0 - WGS84_E2) * band * (dlon / (2.0 * np.pi)) * np.pi


def haversine_m_np(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (spherical, mean radius)."""
    r = 6371008.8
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    dphi = p2 - p1
    dlmb = np.deg2rad(lon2) - np.deg2rad(lon1)
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * r * np.arcsin(np.sqrt(a))
