"""Property-based tests (hypothesis) over the pure numpy kernels — the
engine's upgrade on the reference's test strategy (SURVEY.md §5: the
reference ships no randomized tests; these pin the kernel invariants the
oracle queries rely on, across the whole input domain rather than fixture
points)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raster_processor_spark import cellindex as ci
from raster_processor_spark.functions import geodesy as geod

lats = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
res_levels = st.integers(min_value=1, max_value=12)


@settings(max_examples=200, deadline=None)
@given(lats, lons, res_levels)
def test_quad_roundtrip_contains_point(lat, lon, res):
    """decode(encode(p)) yields the cell rectangle containing p."""
    cell = ci.quad_encode(np.array([lat]), np.array([lon]), res)
    r, yb, xb = ci.quad_decode(cell)
    assert int(r[0]) == res
    ny, nx = 1 << res, 1 << (res + 1)
    dy, dx = 180.0 / ny, 360.0 / nx
    y0 = yb[0] * dy - 90.0
    x0 = xb[0] * dx - 180.0
    # symmetric boundary tolerance: the bin is DEFINED by the float
    # expression floor((lat+90)/180*ny) (replayed identically in the SQL
    # twin), and points within one ulp of a cell edge can land either side
    assert y0 - 1e-9 <= lat <= y0 + dy + 1e-9
    assert x0 - 1e-9 <= lon <= x0 + dx + 1e-9


@settings(max_examples=200, deadline=None)
@given(lats, lons, res_levels, res_levels)
def test_quad_parent_is_prefix_consistent(lat, lon, r1, r2):
    """Encoding at the coarser res equals taking the parent of the finer
    encoding — the prefix-hierarchy property partition pruning relies on."""
    lo, hi = min(r1, r2), max(r1, r2)
    fine = ci.quad_encode(np.array([lat]), np.array([lon]), hi)
    coarse = ci.quad_encode(np.array([lat]), np.array([lon]), lo)
    assert int(ci.quad_parent(fine, lo)[0]) == int(coarse[0])


@settings(max_examples=200, deadline=None)
@given(lats, lons, res_levels)
def test_quad_center_reencodes_to_same_cell(lat, lon, res):
    cell = ci.quad_encode(np.array([lat]), np.array([lon]), res)
    cy, cx = ci.quad_center(cell)
    again = ci.quad_encode(cy, cx, res)
    assert int(again[0]) == int(cell[0])


@settings(max_examples=200, deadline=None)
@given(lats, lons, st.floats(min_value=-5000, max_value=9000, allow_nan=False))
def test_llh_xyz_roundtrip(lat, lon, h):
    """Vermeille inverse recovers lat/lon/h to sub-mm / 1e-9 deg."""
    x, y, z = geod.llh2xyz_np(np.array([lat]), np.array([lon]), np.array([h]))
    lat2, lon2, h2 = geod.xyz2llh_np(x, y, z)
    assert abs(lat2[0] - lat) < 1e-9
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(h2[0] - h) < 1e-6


@settings(max_examples=200, deadline=None)
@given(lats, lons)
def test_haversine_identity_and_symmetry(lat, lon):
    lat2, lon2 = min(lat + 1.0, 89.999), max(lon - 1.0, -179.999)
    a = geod.haversine_m_np(
        np.array([lat]), np.array([lon]), np.array([lat2]), np.array([lon2])
    )
    b = geod.haversine_m_np(
        np.array([lat2]), np.array([lon2]), np.array([lat]), np.array([lon])
    )
    zero = geod.haversine_m_np(
        np.array([lat]), np.array([lon]), np.array([lat]), np.array([lon])
    )
    assert abs(a[0] - b[0]) < 1e-6
    assert zero[0] < 1e-6
    assert a[0] >= 0


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=100_000))
def test_packing_size_class_bounds(n_tokens):
    """size_class is the least power of two >= n_tokens (clamped), so a
    non-overflow doc always fits its slot and a bin of capacity//s slots
    never exceeds capacity in tokens."""
    from raster_processor_spark.operators.packing import CAPACITY, MIN_SLOT

    s = MIN_SLOT
    while s < CAPACITY and s < n_tokens:
        s *= 2
    s = min(s, CAPACITY)
    if n_tokens <= CAPACITY:
        assert s >= n_tokens
        assert s == MIN_SLOT or s // 2 < n_tokens
    per_bin = max(CAPACITY // s, 1)
    assert per_bin * s <= CAPACITY


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**62))
def test_sampling_mix_range_and_determinism(k):
    from raster_processor_spark.operators.sampling import MIX_P, MIX_ROUNDS

    def mix(v: int) -> int:
        v %= MIX_P
        for a, b in MIX_ROUNDS:
            v = (v * a + b) % MIX_P
        return v

    m1, m2 = mix(k), mix(k)
    assert m1 == m2
    assert 0 <= m1 < MIX_P
    # every intermediate product is int64-safe
    assert (MIX_P - 1) * max(a for a, _ in MIX_ROUNDS) < 2**63
