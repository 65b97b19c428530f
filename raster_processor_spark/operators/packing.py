"""Sequence packing: assign documents to fixed-token-capacity training bins.

The operator a pretraining data pipeline runs right before tokenized-example
serialization: group documents into bins of at most ``capacity`` tokens so
batch assembly wastes as little padding as possible.

Greedy first-fit packing is a sequential recurrence (each bin boundary
depends on every earlier document), so it cannot shuffle-parallelize. The
engine uses **size-class packing** (the slab-allocator shape): each doc's
token count rounds UP to the next power-of-two slot size; within a
(source, size_class) stratum, slots of size s pack capacity/s docs per bin
— so bins never overflow BY CONSTRUCTION, every worker packs its strata
independently after one shuffle, and the assignment is a pure function of
(source, size_class, rank-by-doc_id): deterministic, restart-stable, and
bit-identical in the DuckDB twin. Padding waste is bounded by 2x (power-of-
two rounding) and measured, not hidden: pack_stats reports the realized
fill ratio per stratum.

At 10^12 docs: one shuffle on (source, size_class) — a few hundred strata;
skewed strata (one giant size class) salt by splitting rank ranges, since
bin ids are rank-arithmetic and salting just offsets the rank base. Docs
longer than ``capacity`` map to the overflow class (own bin each, flagged)
— the chunk-long-docs decision belongs to the tokenizer upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from raster_processor_spark.sources.tables import read_parquet as _read_parquet

CAPACITY = 2048
MIN_SLOT = 16


def _size_class_col(n_tokens, capacity: int):
    """Next power of two >= n_tokens, clamped to [MIN_SLOT, capacity].
    ceil(log2(n)) via bit-length arithmetic on int64: 2^ceil(log2(n)) is the
    smallest power of two p with p >= n, found by doubling from MIN_SLOT —
    expressed as a closed-form chain of WHENs (log2 has float-rounding
    hazards at exact powers of two, so stay in integers)."""
    expr = F.lit(capacity)
    s = capacity // 2
    while s >= MIN_SLOT:
        expr = F.when(n_tokens <= s, F.lit(s)).otherwise(expr)
        s //= 2
    return expr


def _size_class_sql(n_tokens: str, capacity: int) -> str:
    expr = f"{capacity}"
    s = capacity // 2
    while s >= MIN_SLOT:
        expr = f"(CASE WHEN {n_tokens} <= {s} THEN {s} ELSE {expr} END)"
        s //= 2
    return expr


def pack_assignments(
    spark: SparkSession, sf_dir: str, capacity: int = CAPACITY,
    salt_splits: int = 1,
) -> DataFrame:
    """(doc_id, source, n_tokens, size_class, bin_id, overflow).

    bin_id is dense within (source, size_class): floor(rank / docs_per_bin).
    One shuffle (the stratum window); everything else is codegen exprs.

    ``salt_splits`` > 1 breaks hot-stratum skew: the rank window partitions
    by (stratum, salt) where salt = hash(doc_id) % S, and bins interleave as
    bin = salt + S * floor(rank / per_bin) — still collision-free and
    overflow-free by the same rank arithmetic, at the cost of up to S
    partial (under-filled) bins per stratum instead of 1. At corpus scale a
    single stratum can hold ~n/80 docs (80 (source, size_class) strata), so
    the salted window is what keeps one task from sorting it alone."""
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    sc = _size_class_col(F.col("n_tokens"), capacity)
    d = d.withColumn("size_class", sc).withColumn(
        "overflow", (F.col("n_tokens") > capacity).cast("int")
    )
    per_bin = F.greatest(F.lit(capacity) / F.col("size_class"), F.lit(1)).cast(
        "long"
    )
    if salt_splits > 1:
        from raster_processor_spark.operators.sampling import _mix_col

        d = d.withColumn("salt", F.pmod(_mix_col(F.col("doc_id")), F.lit(salt_splits)))
        w = Window.partitionBy("source", "size_class", "salt").orderBy("doc_id")
        bin_id = F.col("salt") + F.lit(salt_splits) * F.floor(
            (F.row_number().over(w) - 1) / per_bin
        )
    else:
        w = Window.partitionBy("source", "size_class").orderBy("doc_id")
        bin_id = F.floor((F.row_number().over(w) - 1) / per_bin)
    return d.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("size_class").cast("long").alias("size_class"),
        bin_id.cast("long").alias("bin_id"),
        "overflow",
    )


def pack_assignments_sql(capacity: int = CAPACITY, salt_splits: int = 1) -> str:
    from raster_processor_spark.operators.sampling import _mix_sql

    sc = _size_class_sql("n_tokens", capacity)
    if salt_splits > 1:
        salt = f"({_mix_sql('doc_id')} % {salt_splits})"
        part = "source, size_class, salt"
        bin_expr = (
            f"salt + {salt_splits} * "
            f"((ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY doc_id) - 1)"
            f" // GREATEST({capacity} // size_class, 1))"
        )
    else:
        salt = "0"
        bin_expr = (
            f"(ROW_NUMBER() OVER (PARTITION BY source, size_class"
            f" ORDER BY doc_id) - 1)"
            f" // GREATEST({capacity} // size_class, 1)"
        )
    return f"""
WITH d AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, source, n_tokens, {sc} AS size_class,
         (CASE WHEN n_tokens > {capacity} THEN 1 ELSE 0 END) AS overflow,
         {salt} AS salt
  FROM d
)
SELECT doc_id, source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(size_class AS BIGINT) AS size_class,
       CAST({bin_expr} AS BIGINT) AS bin_id,
       overflow
FROM s
"""


def pack_stats(
    spark: SparkSession, sf_dir: str, capacity: int = CAPACITY,
    salt_splits: int = 1,
) -> DataFrame:
    """Per-(source, size_class, overflow) packing efficiency: bins used,
    docs, token fill ratio — the padding-waste audit. The overflow stratum
    (docs longer than capacity, packed 1-per-bin) reports separately so its
    ratio cannot exceed 1; the fill numerator caps each doc at capacity for
    the same reason. n_bins counts DISTINCT bin ids (max+1 over-counts the
    interleave gaps salting introduces). The ratio divides two exact
    integers, so it is bit-deterministic."""
    a = pack_assignments(spark, sf_dir, capacity, salt_splits)
    filled = F.sum(F.least(F.col("n_tokens"), F.lit(capacity)))
    return (
        a.groupBy("source", "size_class", "overflow")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("bin_id").alias("n_bins"),
            F.sum("n_tokens").alias("sum_tokens"),
            filled.alias("_filled"),
        )
        .select(
            "source",
            "size_class",
            "overflow",
            "n_docs",
            "n_bins",
            "sum_tokens",
            (
                F.col("_filled").cast("double")
                / (F.col("n_bins") * F.lit(capacity))
            ).alias("fill_ratio"),
        )
    )


def pack_stats_sql(capacity: int = CAPACITY, salt_splits: int = 1) -> str:
    return f"""
WITH a AS ({pack_assignments_sql(capacity, salt_splits)})
SELECT source, size_class, overflow,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS n_bins,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(LEAST(n_tokens, {capacity})) AS DOUBLE)
         / (COUNT(DISTINCT bin_id) * {capacity}) AS fill_ratio
FROM a GROUP BY 1, 2, 3
"""
