"""Unit tests for the pure-numpy cell index kernels (no Spark)."""

from __future__ import annotations

import numpy as np

from raster_processor_spark import cellindex as ci
from raster_processor_spark import geo
from raster_processor_spark import polygons as pg


def _rand_latlon(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-90, 90, n), rng.uniform(-180, 180, n)


def test_quad_encode_decode_roundtrip():
    lat, lon = _rand_latlon(10_000)
    for res in (0, 3, 7, 9, 12):
        c = ci.quad_encode(lat, lon, res)
        r, yb, xb = ci.quad_decode(c)
        assert np.all(r == res)
        assert np.all(yb >= 0) and np.all(yb < (1 << res))
        assert np.all(xb >= 0) and np.all(xb < (1 << (res + 1)))
        # center of the cell re-encodes to the same cell
        clat, clon = ci.quad_center(c)
        assert np.array_equal(ci.quad_encode(clat, clon, res), c)


def test_quad_parent_prefix_property():
    lat, lon = _rand_latlon(10_000)
    c9 = ci.quad_encode(lat, lon, 9)
    for pres in (8, 7, 5):
        assert np.array_equal(ci.quad_parent(c9, pres), ci.quad_encode(lat, lon, pres))


def test_quad_ring_counts_and_symmetry():
    c = int(ci.quad_encode(np.array([10.0]), np.array([20.0]), 7)[0])
    assert list(ci.quad_ring(c, 0)) == [c]
    r1 = ci.quad_ring(c, 1)
    assert len(r1) == 8
    r2 = ci.quad_ring(c, 2)
    assert len(r2) == 16
    # every ring-1 neighbor has c in ITS ring 1
    for n in r1:
        assert c in ci.quad_ring(int(n), 1)


def test_quad_ring_antimeridian_wrap():
    # cell at lon ~ -180 edge: ring must wrap, not clip, in x
    c = int(ci.quad_encode(np.array([0.0]), np.array([-179.99]), 7)[0])
    r1 = ci.quad_ring(c, 1)
    assert len(r1) == 8  # nothing dropped in x
    _, _, xb = ci.quad_decode(r1)
    nx = 1 << 8
    assert (xb.max() == nx - 1) and (xb.min() == 0)


def test_quad_ring_pole_clamp():
    c = int(ci.quad_encode(np.array([89.9]), np.array([0.0]), 7)[0])
    r1 = ci.quad_ring(c, 1)
    assert len(r1) == 5  # top row clipped off-pole


def test_hex_center_roundtrip_and_rings():
    lat, lon = _rand_latlon(5_000)
    for res in (5, 7, 9):
        c = ci.hex_encode(lat, lon, res)
        clat, clon = ci.hex_center(c)
        assert np.array_equal(ci.hex_encode(clat, clon, res), c)
    assert [len(ci.hex_ring_offsets(k)) for k in range(4)] == [1, 6, 12, 18]
    assert len(ci.hex_disk_offsets(3)) == 1 + 6 + 12 + 18


def test_hex_cells_partition_space():
    # nearest-center property: every point is closer to its own hex center
    # than to any neighboring center (sanity of cube rounding)
    lat, lon = _rand_latlon(2_000, seed=3)
    res = 6
    c = ci.hex_encode(lat, lon, res)
    clat, clon = ci.hex_center(c)
    size = 180.0 / (1 << res)
    d_own = (lat - clat) ** 2 + (lon - clon) ** 2
    # own-center distance bounded by circumradius
    assert np.all(np.sqrt(d_own) <= size + 1e-9)


def test_geo_skew_hot_box():
    keys = np.arange(100_000, dtype=np.int64)
    lat, lon = geo.lat_np(keys), geo.lon_np(keys)
    hot = keys % 10 == 0
    assert np.all(lat[hot] >= 10.0) and np.all(lat[hot] < 11.3)
    assert np.all(lon[hot] >= 20.0) and np.all(lon[hot] < 22.5)
    assert np.all(lat >= -90) and np.all(lat < 90)
    assert np.all(lon >= -180) and np.all(lon < 180)


def test_pip_ray_cast_vs_matplotlib_free_reference():
    # brute-force winding check on a grid against the star polygons
    edges = pg.polygon_edges_np(4)
    verts = pg.polygons_np(4)
    for p in range(4):
        cx, cy = verts[p].mean(axis=0)
        px = np.array([cx, cx + 10.0, cx, cx + 0.01])
        py = np.array([cy, cy + 10.0, cy + 100.0, cy + 0.01])
        inside = pg.pip_ray_cast_np(px, py, edges[p])
        assert inside[0] and not inside[1] and not inside[2] and inside[3]
    # concavity: the star's inner notch point between two spikes is OUTSIDE
    p = 0
    cx, cy = verts[p].mean(axis=0)
    scale = abs(verts[p][0, 0] - cx)  # spike radius
    notch = np.array([[cx + 0.62 * scale, cy + 0.62 * scale]])
    inside = pg.pip_ray_cast_np(notch[:, 0], notch[:, 1], edges[p])
    assert not inside[0]
