"""Cell-encoding Spark surface.

The hot path is an Arrow-batched pandas UDF over the pure-numpy encoders
(north star: "assigned to H3 (res 7-9) and S2 cells via batched Arrow/pandas
UDF cell encoding"); batch size is pinned to the reference's 100k chunking
(session.ARROW_BATCH_ROWS). Parent/rollup math is a pure column expression —
integer arithmetic stays JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from raster_processor_spark import cellindex as ci


def quad_cell_udf(res: int):
    """pandas UDF (lat, lon) → quadcell id at ``res``; iterator form so the
    per-batch setup cost is amortized across Arrow batches."""

    @F.pandas_udf(LongType())
    def _encode(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for lat, lon in it:
            yield pd.Series(ci.quad_encode(lat.to_numpy(), lon.to_numpy(), res))

    return _encode


def hex_cell_udf(res: int):
    @F.pandas_udf(LongType())
    def _encode(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for lat, lon in it:
            yield pd.Series(ci.hex_encode(lat.to_numpy(), lon.to_numpy(), res))

    return _encode


def quad_parent_col(cell: Column, child_res: int, parent_res: int) -> Column:
    """JVM-side parent-cell arithmetic (no UDF): exact prefix hierarchy."""
    shift = child_res - parent_res
    d = 1 << shift
    rem = F.pmod(cell, F.lit(ci.RES_SHIFT))
    yb = F.floor(rem / ci.Y_SHIFT).cast("long")
    xb = F.pmod(rem, F.lit(ci.Y_SHIFT))
    return (
        F.lit(parent_res).cast("long") * ci.RES_SHIFT
        + F.floor(yb / d).cast("long") * ci.Y_SHIFT
        + F.floor(xb / d).cast("long")
    )


def quad_cell_col(lat: Column, lon: Column, res: int) -> Column:
    """Pure-column quadcell encode (JVM-side twin of the pandas UDF; used when
    the plan benefits from staying inside whole-stage codegen, e.g. tiny
    dimension tables where Arrow round-trip overhead dominates)."""
    ny = 1 << res
    nx = 1 << (res + 1)
    yb = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * ny).cast("long"), F.lit(0)),
        F.lit(ny - 1),
    )
    xb = F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * nx).cast("long"), F.lit(0)),
        F.lit(nx - 1),
    )
    return F.lit(res).cast("long") * ci.RES_SHIFT + yb * ci.Y_SHIFT + xb
