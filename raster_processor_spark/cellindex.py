"""Hierarchical discrete global grid cell index — pure numpy, from scratch.

Two schemes, mirroring the reference's grid-bin assignment (the reference bins
points into raster cells with ``i = round((y - y_min)/res)`` — see
/root/reference/src/SWOTRaster/products.py:1145-1146 — and derives UTM zone ids
arithmetically, raster_crs.py:59-135):

* **quadcell** (S2-style): at resolution r, the lat/lon box [-90,90]x[-180,180)
  is an equirectangular 2^r x 2^(r+1) grid. Exact parent/child prefix property
  (parent bin = child bin >> 1) → partition pruning, multi-res rollups, and
  salting all work on integer arithmetic. Fully SQL-expressible, so every
  quadcell operator has a DuckDB oracle.

* **hexcell** (H3-style): pointy-top axial hex grid at resolution r with
  circumradius 180/2^r degrees; cube-rounded vectorized assignment and exact
  axial k-rings. Used for the hex k-ring kNN path.

Cell id packing (both schemes, fits int64, SQL-expressible):
    cell_id = res * 2^50 + ybin * 2^25 + xbin        (0 <= res <= 15)
hex ids use (q + 2^24) / (r + 2^24) offsets in place of xbin/ybin.

All encoders are vectorized numpy ufunc pipelines; the Spark entry points are
Arrow-batched pandas UDFs (north-star requirement: batched cell encoding, no
per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RES_SHIFT = 2**50
Y_SHIFT = 2**25
HEX_OFFSET = 2**24

SQRT3 = np.sqrt(3.0)


# ---------------------------------------------------------------- quadcell ---

def quad_bins(lat: np.ndarray, lon: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Equirectangular bins at resolution ``res``: 2^res rows, 2^(res+1) cols."""
    ny = 1 << res
    nx = 1 << (res + 1)
    ybin = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * ny).astype(np.int64)
    xbin = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * nx).astype(np.int64)
    np.clip(ybin, 0, ny - 1, out=ybin)
    np.clip(xbin, 0, nx - 1, out=xbin)
    return ybin, xbin


def quad_encode(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    ybin, xbin = quad_bins(lat, lon, res)
    return res * RES_SHIFT + ybin * Y_SHIFT + xbin


def quad_decode(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell_id → (res, ybin, xbin)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    res = cell_id // RES_SHIFT
    rem = cell_id - res * RES_SHIFT
    ybin = rem // Y_SHIFT
    xbin = rem - ybin * Y_SHIFT
    return res, ybin, xbin


def quad_parent(cell_id: np.ndarray, parent_res: int) -> np.ndarray:
    """Exact hierarchy: shift both bins down by the res delta."""
    res, ybin, xbin = quad_decode(cell_id)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell res")
    return parent_res * RES_SHIFT + (ybin >> shift) * Y_SHIFT + (xbin >> shift)


def quad_center(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell center (lat, lon) — the analogue of the reference's cell-center
    coordinates used for point-in-polygon cropping (products.py:1157-1210)."""
    res, ybin, xbin = quad_decode(cell_id)
    ny = np.left_shift(np.int64(1), res).astype(np.float64)
    nx = 2.0 * ny
    lat = (ybin + 0.5) / ny * 180.0 - 90.0
    lon = (xbin + 0.5) / nx * 360.0 - 180.0
    return lat, lon


def quad_ring(cell_id: int, k: int) -> np.ndarray:
    """Chebyshev ring k around a quadcell (the square annulus at distance k);
    k=0 → the cell itself. Longitude wraps; latitude clamps (off-pole rows
    dropped). Mirrors the reference's neighbor gather semantics
    (geoloc_raster.py:72-76 nearest-cell feedback)."""
    res, ybin, xbin = quad_decode(np.asarray([cell_id]))
    res, ybin, xbin = int(res[0]), int(ybin[0]), int(xbin[0])
    ny, nx = 1 << res, 1 << (res + 1)
    if k == 0:
        offsets = [(0, 0)]
    else:
        offsets = []
        for dx in range(-k, k + 1):
            offsets.append((dx, -k))
            offsets.append((dx, k))
        for dy in range(-k + 1, k):
            offsets.append((-k, dy))
            offsets.append((k, dy))
    out = []
    for dx, dy in offsets:
        yy = ybin + dy
        if yy < 0 or yy >= ny:
            continue
        xx = (xbin + dx) % nx
        out.append(res * RES_SHIFT + yy * Y_SHIFT + xx)
    return np.asarray(sorted(out), dtype=np.int64)


def quad_disk_offsets(k: int) -> np.ndarray:
    """All (dy, dx) offsets with Chebyshev distance <= k, shape (n, 2)."""
    rng = np.arange(-k, k + 1)
    dy, dx = np.meshgrid(rng, rng, indexing="ij")
    return np.stack([dy.ravel(), dx.ravel()], axis=1)


# ----------------------------------------------------------------- hexcell ---

def hex_axial(lat: np.ndarray, lon: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized pointy-top axial hex assignment with cube rounding.

    Hex circumradius size = 180 / 2^res degrees; x=lon, y=lat treated planar
    (the reference similarly bins in projected planar coordinates,
    products.py:1102-1155)."""
    size = 180.0 / (1 << res)
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    qf = (SQRT3 / 3.0 * x - 1.0 / 3.0 * y) / size
    rf = (2.0 / 3.0 * y) / size
    # cube round
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_encode(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    q, r = hex_axial(lat, lon, res)
    return res * RES_SHIFT + (r + HEX_OFFSET) * Y_SHIFT + (q + HEX_OFFSET)


def hex_decode(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell_id = np.asarray(cell_id, dtype=np.int64)
    res = cell_id // RES_SHIFT
    rem = cell_id - res * RES_SHIFT
    r = rem // Y_SHIFT - HEX_OFFSET
    q = rem % Y_SHIFT - HEX_OFFSET
    return res, q, r


def hex_center(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    res, q, r = hex_decode(cell_id)
    size = 180.0 / np.left_shift(np.int64(1), res).astype(np.float64)
    lon = size * (SQRT3 * q + SQRT3 / 2.0 * r)
    lat = size * (1.5 * r)
    return lat, lon


def hex_ring_offsets(k: int) -> np.ndarray:
    """Axial (dq, dr) offsets of hex ring k (6k cells; k=0 → [(0,0)])."""
    if k == 0:
        return np.zeros((1, 2), dtype=np.int64)
    dirs = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)
    cur = np.array([-k, k], dtype=np.int64)  # start at direction 4 scaled by k
    out = []
    for d in range(6):
        for _ in range(k):
            out.append(cur.copy())
            cur += dirs[d]
    return np.asarray(out, dtype=np.int64)


def hex_disk_offsets(k: int) -> np.ndarray:
    return np.concatenate([hex_ring_offsets(i) for i in range(k + 1)], axis=0)


# ------------------------------------------------------- SQL twin snippets ---

def quad_cell_sql(lat_sql: str, lon_sql: str, res: int) -> str:
    """The exact quad_encode arithmetic as ANSI SQL (DuckDB oracle twin).

    GREATEST/LEAST clamp mirrors np.clip; FLOOR on doubles mirrors np.floor.
    """
    ny = 1 << res
    nx = 1 << (res + 1)
    yb = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat_sql}) + 90.0) / 180.0 * {ny}) AS BIGINT), 0), {ny - 1})"
    )
    xb = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon_sql}) + 180.0) / 360.0 * {nx}) AS BIGINT), 0), {nx - 1})"
    )
    return f"(CAST({res} AS BIGINT) * {RES_SHIFT} + {yb} * {Y_SHIFT} + {xb})"


def quad_parent_sql(cell_sql: str, child_res: int, parent_res: int) -> str:
    """Parent cell id from a child cell id, pure integer arithmetic.

    Portable across Spark SQL and DuckDB: integer division is spelled
    CAST(FLOOR(a / b)) — every divisor is a power of two, so the double
    division is exact (operands < 2^53) and FLOOR is bit-correct.
    """
    shift = child_res - parent_res
    d = 1 << shift

    def idiv(a: str, b: int) -> str:
        return f"CAST(FLOOR(({a}) / {b}.0) AS BIGINT)"

    rem = f"(({cell_sql}) % {RES_SHIFT})"
    yb = idiv(rem, Y_SHIFT)
    xb = f"({rem} % {Y_SHIFT})"
    return (
        f"(CAST({parent_res} AS BIGINT) * {RES_SHIFT}"
        f" + {idiv(yb, d)} * {Y_SHIFT} + {idiv(xb, d)})"
    )
