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
        # ∫ cosφ/(1-e²sin²φ)² dφ = s/(2(1-e²s²)) + atanh(es)/(2e), s=sinφ
        s = np.sin(phi)
        return s / (2.0 * (1.0 - WGS84_E2 * s * s)) + np.arctanh(e * s) / (2.0 * e)

    band = zone(lat + dlat / 2.0) - zone(lat - dlat / 2.0)
    return 2.0 * WGS84_A * WGS84_A * (1.0 - WGS84_E2) * band * (dlon / (2.0 * np.pi)) * np.pi


def llh2xyz_np(lat_deg, lon_deg, h) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Geodetic → ECEF on WGS84 (raster_crs.py:282-296 llh2xyz semantics)."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    h = np.asarray(h, dtype=np.float64)
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
    x = (n + h) * cos_lat * np.cos(lon)
    y = (n + h) * cos_lat * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + h) * sin_lat
    return x, y, z


def xyz2llh_np(x, y, z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ECEF → geodetic, exact closed form (Vermeille 2002, the same published
    algorithm the reference implements at raster_crs.py:239-279)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    a2 = WGS84_A * WGS84_A
    e2 = WGS84_E2
    e4 = e2 * e2
    p = (x * x + y * y) / a2
    q = (1.0 - e2) * z * z / a2
    r = (p + q - e4) / 6.0
    s = e4 * p * q / (4.0 * r ** 3)
    t = np.cbrt(1.0 + s + np.sqrt(s * (2.0 + s)))
    u = r * (1.0 + t + 1.0 / t)
    v = np.sqrt(u * u + e4 * q)
    w = e2 * (u + v - q) / (2.0 * v)
    k = np.sqrt(u + v + w * w) - w
    d = k * np.sqrt(x * x + y * y) / (k + e2)
    hyp = np.sqrt(d * d + z * z)
    lat = 2.0 * np.arctan2(z, d + hyp)
    h = (k + e2 - 1.0) / k * hyp
    lon = np.arctan2(y, x)
    return np.rad2deg(lat), np.rad2deg(lon), h


def haversine_m_np(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (spherical, mean radius)."""
    r = 6371008.8
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    dphi = p2 - p1
    dlmb = np.deg2rad(lon2) - np.deg2rad(lon1)
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * r * np.arcsin(np.sqrt(a))
