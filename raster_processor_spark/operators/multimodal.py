"""Multimodal (image) operators: decode / feature-extract over opaque binary
columns via Arrow-batched mapInPandas — the Spark-side plumbing (schema,
batching, partitioning) is real; the pixel math is the from-scratch numpy
codec (codec.py). External decode libraries are absent in this container and
stubbed behind NotImplementedError in codec.decode.

Reference analogue: the pixel values the SWOT processor aggregates are
already-decoded radar samples; here decode happens inside the engine
(north star: "zonal aggregation (mean/sum/count of decoded pixel blocks per
polygon)").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raster_processor_spark import codec

DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("px_mean", T.DoubleType(), False),
        T.StructField("px_std", T.DoubleType(), False),
        T.StructField("px_min", T.IntegerType(), False),
        T.StructField("px_max", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("phash_check", T.LongType(), False),
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Per-image decoded-pixel statistics.

    Iterator-of-batches mapInPandas: one decode pass per Arrow batch, numpy
    per image (ragged shapes prevent full vectorization across images; the
    per-image ops are vectorized numpy)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "image_id", "px_mean", "px_std", "px_min", "px_max",
                "n_bytes", "phash_check",
            )}
            for iid, buf, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = codec.decode(buf, int(w), int(h), fmt)
                m, s, lo, hi = codec.pixel_stats(px)
                out["image_id"].append(iid)
                out["px_mean"].append(m)
                out["px_std"].append(s)
                out["px_min"].append(lo)
                out["px_max"].append(hi)
                out["n_bytes"].append(len(buf))
                out["phash_check"].append(codec.phash64(px))
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "w", "h", "fmt"]
    return images.select(*cols).mapInPandas(run, DECODE_STATS_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("thumb", T.BinaryType(), False),
        T.StructField("tw", T.IntegerType(), False),
        T.StructField("th", T.IntegerType(), False),
    ]
)


def resize_thumbs(images: DataFrame, target: int = 8) -> DataFrame:
    """Nearest-neighbor resize to target x target (pure-numpy strided
    sampling), re-encoded raw — the decode→transform→re-encode plumbing a
    multimodal pipeline needs."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"image_id": [], "thumb": [], "tw": [], "th": []}
            for iid, buf, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = codec.decode(buf, int(w), int(h), fmt)
                ys = (np.arange(target) * h // target).astype(int)
                xs = (np.arange(target) * w // target).astype(int)
                thumb = px[np.ix_(ys, xs)]
                out["image_id"].append(iid)
                out["thumb"].append(codec.encode(thumb, "raw"))
                out["tw"].append(target)
                out["th"].append(target)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, RESIZE_SCHEMA
    )


def with_georef(images: DataFrame) -> DataFrame:
    """Georeference image rows from phash (FIXTURES.md F1 derived lat/lon)."""
    from raster_processor_spark import geo

    key = F.pmod(F.col("phash"), F.lit(1_000_003))
    return images.withColumn("lat", geo.lat_col(key)).withColumn(
        "lon", geo.lon_col(key)
    )


# ------------------------------------------------------- golden SQL oracles --
# decode_stats / resize_thumbs are pure functions of the image ids (seeded
# codec), so their DuckDB oracle is a precomputed expected table from the
# same numpy golden, joined to the documents ids actually present — a hard
# value check, not a rows-only smoke test.


def _expected_decode_rows(n: int) -> list[tuple]:
    rows = []
    for i in range(n):
        iid = f"img_{i:012d}"
        w, h = codec.dims_for(iid)
        fmt = codec.fmt_for(iid)
        px = codec.gen_pixels(iid, w, h)
        buf = codec.encode(px, fmt)
        m, s, lo, hi = codec.pixel_stats(codec.decode(buf, w, h, fmt))
        rows.append((iid, m, s, lo, hi, len(buf)))
    return rows


def decode_stats_oracle_sql(n: int) -> str:
    vals = ",\n".join(
        # repr quoted as a string: DuckDB parses a bare numeric literal as
        # DECIMAL first, which loses the last bit of the double; the
        # string→double parse is correctly rounded and round-trips exactly.
        f"('{iid}', CAST('{m!r}' AS DOUBLE), CAST('{s!r}' AS DOUBLE), "
        f"CAST({lo} AS INTEGER), CAST({hi} AS INTEGER), CAST({nb} AS BIGINT))"
        for iid, m, s, lo, hi, nb in _expected_decode_rows(n)
    )
    return f"""
WITH expected(image_id, px_mean, px_std, px_min, px_max, n_bytes) AS (
  VALUES {vals}
),
ids AS (SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id
        FROM documents)
SELECT e.image_id, e.px_mean, e.px_std, e.px_min, e.px_max, e.n_bytes
FROM expected e JOIN ids USING (image_id)
"""


def _expected_resize_rows(n: int, target: int) -> list[tuple]:
    rows = []
    for i in range(n):
        iid = f"img_{i:012d}"
        w, h = codec.dims_for(iid)
        fmt = codec.fmt_for(iid)
        px = codec.gen_pixels(iid, w, h)
        buf = codec.encode(px, fmt)
        dec = codec.decode(buf, w, h, fmt)
        ys = (np.arange(target) * h // target).astype(int)
        xs = (np.arange(target) * w // target).astype(int)
        thumb = dec[np.ix_(ys, xs)]
        rows.append((iid, target, target, len(codec.encode(thumb, "raw"))))
    return rows


def resize_oracle_sql(n: int, target: int) -> str:
    vals = ",\n".join(
        f"('{iid}', CAST({tw} AS INTEGER), CAST({th} AS INTEGER), CAST({nb} AS INTEGER))"
        for iid, tw, th, nb in _expected_resize_rows(n, target)
    )
    return f"""
WITH expected(image_id, tw, th, thumb_bytes) AS (
  VALUES {vals}
),
ids AS (SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS image_id
        FROM documents WHERE doc_id < {n})
SELECT e.image_id, e.tw, e.th, e.thumb_bytes
FROM expected e JOIN ids USING (image_id)
"""
