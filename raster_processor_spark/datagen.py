"""Deterministic synthetic image+caption table generator (FIXTURES.md F1).

Produces the exact BASELINE.json input_hint shape:
  (image_id:string, bytes:binary, w:int, h:int, fmt:string,
   caption:string, phash:long)

Generation is distributed: a range DataFrame is mapped through an Arrow-
batched generator (mapInPandas), so bench-scale tables are produced by the
cluster, not the driver. Content is a pure function of image_id — any two
runs (or executors) produce byte-identical rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raster_processor_spark import codec

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def _gen_batch(ids: pd.Series) -> pd.DataFrame:
    rows = []
    for i in ids:
        image_id = f"img_{int(i):012d}"
        w, h = codec.dims_for(image_id)
        fmt = codec.fmt_for(image_id)
        px = codec.gen_pixels(image_id, w, h)
        rows.append(
            {
                "image_id": image_id,
                "bytes": codec.encode(px, fmt),
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": codec.caption_for(image_id),
                "phash": codec.phash64(px),
            }
        )
    return pd.DataFrame(rows)


def images_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    # >= 2 files per core at the largest local level: parquet row groups are
    # the split unit, and ~48 MB single-group files cap downstream
    # parallelism at file count regardless of cluster size
    if partitions is None:
        partitions = max(64, n // 25_000)
    base = spark.range(0, n, 1, partitions)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _gen_batch(pdf["id"])

    return base.mapInPandas(gen, IMAGES_SCHEMA)


def images_from_ids(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize the image table from an existing id DataFrame (one image
    per id, image_id = img_{id:012d}) — fully distributed, no driver count:
    the id column streams through the same Arrow-batched generator as
    images_df."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _gen_batch(pdf[id_col])

    return ids_df.select(id_col).mapInPandas(gen, IMAGES_SCHEMA)


def write_images(spark: SparkSession, n: int, path: str, partitions: int | None = None) -> None:
    images_df(spark, n, partitions).write.mode("overwrite").parquet(path)


def key_col() -> F.Column:
    """The georeferencing key of an image row: its numeric id suffix.

    Kept SQL-expressible (substring+cast) so tile assignment has an exact
    single-node twin."""
    return F.substring(F.col("image_id"), 5, 12).cast("long")
