"""Cell-local kNN via sorted ring expansion (north star: "cell-local kNN via
sorted H3 k-ring expansion"; reference analogue: nearest-cell gather,
geoloc_raster.py:72-76, and nearest-grid interpolation,
make_raster_region_maps.py:112-117).

Algorithm (driver-coordinated iterative DataFrame loop — the standard pattern
for grid-index kNN on Spark):

  1. assign every point its quadcell at a density-chosen resolution
     (quadcells are square in degrees, so a Chebyshev ring R bounds
     euclidean distance: any point outside disk(R) is > R*s away);
  2. for ring radius R in an escalating schedule: explode each unresolved
     query's disk(R) offsets, equi-join candidates on cell id, then ONE
     window pass computes rank, candidate count, and the kth distance —
     a query is resolved iff it has >= k candidates AND its kth distance is
     strictly inside R*s (the correctness guarantee);
  3. the unresolved tail (sparse regions) falls back to a broadcast
     brute-force pass — bounded, tiny at scale.

Distance: planar squared degrees (dx*dx + dy*dy) — a single-rounding double
expression, bit-identical in Spark / DuckDB / numpy, deterministic ties by
neighbor key. At 10^12 scale the candidate join is an equi-join on cell ids
co-located by the tiling partitioning; disk(R) explode multiplies the QUERY
side only, and each ring round is one shuffle (rank/count/kth fuse into a
single Exchange).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raster_processor_spark import cellindex as ci


def _disk_offsets_df(spark, ring: int) -> DataFrame:
    offs = ci.quad_disk_offsets(ring)
    return spark.createDataFrame(
        [(int(dy), int(dx)) for dy, dx in offs], "dy BIGINT, dx BIGINT"
    )


def knn_join(
    points: DataFrame,
    k: int,
    res: int | None = None,
    rings: tuple[int, ...] = (2, 8),
) -> DataFrame:
    """points: DataFrame(key, lat, lon) → (key, neighbor_key, dist2, rank).

    ``res`` defaults to a density heuristic (~8 points per cell, so ring 2
    usually resolves in one round)."""
    spark = points.sparkSession
    pts = points.select("key", "lat", "lon")
    n = pts.count()
    if res is None:
        # 2^(2res+1) cells total; aim for ~8 points per cell
        res = max(2, min(12, int(math.log2(max(n, 16) / 8.0) / 2)))
    s = 180.0 / (1 << res)  # cell size in degrees (square)

    ny, nx = 1 << res, 1 << (res + 1)
    ybin = F.least(
        F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * ny).cast("long"), F.lit(0)),
        F.lit(ny - 1),
    )
    xbin = F.least(
        F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * nx).cast("long"), F.lit(0)),
        F.lit(nx - 1),
    )
    indexed = pts.withColumn("ybin", ybin).withColumn("xbin", xbin).cache()
    indexed.count()
    corpus = indexed.select(
        F.col("key").alias("nkey"),
        F.col("lat").alias("nlat"),
        F.col("lon").alias("nlon"),
        F.col("ybin").alias("nyb"),
        F.col("xbin").alias("nxb"),
    )

    unresolved = indexed
    accepted: DataFrame | None = None

    for ring in rings:
        offs = _disk_offsets_df(spark, ring)
        q = unresolved.select(
            F.col("key").alias("qkey"),
            F.col("lat").alias("qlat"),
            F.col("lon").alias("qlon"),
            "ybin",
            "xbin",
        )
        # explode the query side by disk offsets (lon wraps, lat clamps)
        probes = (
            q.crossJoin(F.broadcast(offs))
            .withColumn("nyb", F.col("ybin") + F.col("dy"))
            .withColumn("nxb", F.pmod(F.col("xbin") + F.col("dx"), F.lit(nx)))
            .where((F.col("nyb") >= 0) & (F.col("nyb") < ny))
            .select("qkey", "qlat", "qlon", "nyb", "nxb")
        )
        cand = probes.join(corpus, ["nyb", "nxb"], "inner").where(
            F.col("qkey") != F.col("nkey")
        )
        dx = F.col("nlon") - F.col("qlon")
        dy2 = F.col("nlat") - F.col("qlat")
        scored = cand.withColumn("dist2", dx * dx + dy2 * dy2)
        # ONE shuffle: rank + count + kth-distance over the same partitioning
        w_rank = Window.partitionBy("qkey").orderBy(
            F.col("dist2").asc(), F.col("nkey").asc()
        )
        w_all = Window.partitionBy("qkey")
        limit = (ring * s) * (ring * s)
        ranked = (
            scored.withColumn("rank", F.row_number().over(w_rank))
            .withColumn("_cnt", F.count(F.lit(1)).over(w_all))
            .withColumn(
                "_kth",
                F.max(F.when(F.col("rank") <= k, F.col("dist2"))).over(w_all),
            )
            .withColumn(
                "_ok", (F.col("_cnt") >= k) & (F.col("_kth") < limit)
            )
        )
        # cache the (tiny, <= k rows/query) accepted set and derive the
        # resolved-key set FROM it — a query is _ok iff it emits rows here,
        # so the expensive candidate join + window evaluates ONCE per round
        # instead of once for `got` and again for `resolved_keys`
        got = ranked.where(F.col("_ok") & (F.col("rank") <= k)).select(
            "qkey", "nkey", "dist2", "rank"
        ).cache()
        accepted = got if accepted is None else accepted.unionByName(got)
        resolved_keys = got.select(F.col("qkey").alias("key")).distinct()
        unresolved = unresolved.join(resolved_keys, "key", "left_anti").cache()
        if unresolved.isEmpty():
            break

    if not unresolved.isEmpty():
        # brute-force tail: broadcast the (small) unresolved query set
        q = unresolved.select(
            F.col("key").alias("qkey"),
            F.col("lat").alias("qlat"),
            F.col("lon").alias("qlon"),
        )
        cand = F.broadcast(q).crossJoin(
            corpus.select("nkey", "nlat", "nlon")
        ).where(F.col("qkey") != F.col("nkey"))
        dx = F.col("nlon") - F.col("qlon")
        dy2 = F.col("nlat") - F.col("qlat")
        w = Window.partitionBy("qkey").orderBy(F.col("dist2").asc(), F.col("nkey").asc())
        tail = (
            cand.withColumn("dist2", dx * dx + dy2 * dy2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qkey", "nkey", "dist2", "rank")
        )
        accepted = tail if accepted is None else accepted.unionByName(tail)

    assert accepted is not None
    return accepted.select(
        F.col("qkey").alias("key"),
        F.col("nkey").alias("neighbor_key"),
        "dist2",
        F.col("rank").cast("long").alias("rank"),  # BIGINT like the oracle
    )


def knn_sql(points_sql: str, k: int) -> str:
    """DuckDB oracle: exact brute-force kNN with identical distance and ties.

    ``points_sql`` must yield (key, lat, lon).
    """
    return f"""
WITH pts AS ({points_sql}),
pairs AS (
  SELECT q.key AS key, n.key AS neighbor_key,
         (n.lon - q.lon) * (n.lon - q.lon) + (n.lat - q.lat) * (n.lat - q.lat) AS dist2
  FROM pts q CROSS JOIN pts n
  WHERE q.key <> n.key
),
ranked AS (
  SELECT key, neighbor_key, dist2,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY dist2 ASC, neighbor_key ASC) AS rank
  FROM pairs
)
SELECT key, neighbor_key, dist2, rank FROM ranked WHERE rank <= {k}
"""
