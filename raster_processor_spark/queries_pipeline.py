"""Training-data pipeline queries: dedup, similarity search, text analysis.

Registered into the main REGISTRY (imported from queries.py at module end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from raster_processor_spark.sources.tables import read_parquet as _read_parquet

from raster_processor_spark.operators import dedup as dd
from raster_processor_spark.operators import similarity as sim
from raster_processor_spark.operators import text as tx
from raster_processor_spark.queries import q

NGRAM_TAU = 0.8
LSH_TAU = 0.3
COSINE_DUP_TAU = 0.45
ANN_K = 10
ANN_QUERY_MOD = 25


@q("dedup_exact", tx.dedup_exact_sql())
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.dedup_exact(spark, sf_dir)


@q("dedup_ngram_jaccard", dd.ngram_jaccard_sql(NGRAM_TAU))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.ngram_jaccard_pairs(spark, sf_dir, NGRAM_TAU)


@q("dedup_minhash_lsh", dd.minhash_lsh_sql(LSH_TAU))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_lsh_pairs(spark, sf_dir, LSH_TAU)


@q("dedup_incremental", dd.incremental_lsh_sql(LSH_TAU))
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch LSH dedup against the existing corpus — never recomputes
    existing x existing; oracle = full-run pairs touching the new batch."""
    return dd.incremental_lsh_pairs(spark, sf_dir, LSH_TAU)


@q("dedup_simhash", dd.simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash(spark, sf_dir)


@q("dedup_embedding_cosine", sim.embedding_near_dup_sql(COSINE_DUP_TAU))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.embedding_near_dup_pairs(spark, sf_dir, COSINE_DUP_TAU)


@q("ann_cosine_topk", sim.ann_brute_topk_sql(ANN_K, ANN_QUERY_MOD))
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.ann_brute_topk(spark, sf_dir, ANN_K, ANN_QUERY_MOD)


# approximate vs BRUTE-force truth (recall >= 0.9 at a <= 25% probe
# fraction, tested at sf0.1), but the IVF computation itself is
# deterministic end-to-end — so it gets a full bit-exact oracle twin
# replaying k-means training, spilled assignment, probes, and scoring
@q("ann_ivf_topk", sim.ann_ivf_topk_sql(ANN_K, ANN_QUERY_MOD))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.ann_ivf_topk(spark, sf_dir, ANN_K, ANN_QUERY_MOD)


# the second ANN family: hyperplane (signed-random-projection) LSH —
# stateless index (no training), candidates from a (band, bucket)
# equi-join; fully deterministic (integer hyperplane dots), so the oracle
# replays projections, banding, candidates, and scoring bit-exactly
@q("ann_srp_topk", sim.ann_srp_topk_sql(ANN_K, ANN_QUERY_MOD))
def ann_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.ann_srp_topk(spark, sf_dir, ANN_K, ANN_QUERY_MOD)


@q("text_stats", tx.text_stats_sql())
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.text_stats(spark, sf_dir)


@q("token_count_by_source", tx.token_count_by_source_sql())
def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_count_by_source(spark, sf_dir)


@q("doc_fingerprint", tx.doc_fingerprint_sql())
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.doc_fingerprint(spark, sf_dir)


from raster_processor_spark.operators import multimodal as _mm

# golden-VALUES oracles: the codec is a pure function of the ids, so the
# oracle is the numpy-golden expected table joined to the documents ids.
# The gate runs at sf<=0.01 where documents has 500 rows (ids 0..499).
_MM_N, _MM_RESIZE_N, _MM_TARGET = 500, 200, 8


@q("multimodal_decode_stats", _mm.decode_stats_oracle_sql(_MM_N))
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stats over an image table synthesized in-flight from document
    ids (the driver tables carry no binary column; generation is the same
    deterministic codec the golden tests pin down). Fully distributed: ids
    stream into the generator via mapInPandas — no driver count()."""
    from raster_processor_spark import datagen
    from raster_processor_spark.operators import multimodal as mm

    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    images = datagen.images_from_ids(d.repartition(8))
    stats = mm.decode_stats(images)
    return stats.select(
        "image_id", "px_mean", "px_std", "px_min", "px_max", "n_bytes"
    )


@q("multimodal_resize", _mm.resize_oracle_sql(_MM_RESIZE_N, _MM_TARGET))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode over the first
    _MM_RESIZE_N ids (predicate, not a driver-side count+range)."""
    from pyspark.sql import functions as F

    from raster_processor_spark import datagen
    from raster_processor_spark.operators import multimodal as mm

    d = (
        _read_parquet(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .where(F.col("doc_id") < _MM_RESIZE_N)
    )
    images = datagen.images_from_ids(d.repartition(4))
    thumbs = mm.resize_thumbs(images, target=_MM_TARGET)
    return thumbs.select("image_id", "tw", "th", F.length("thumb").alias("thumb_bytes"))


_CUR_N = 300


@q("image_curation", _mm.image_curation_oracle_sql(_CUR_N))
def image_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-level image curation flags over the synthetic image table
    (first _CUR_N ids) — no decode in the plan, pure codegen exprs."""
    from pyspark.sql import functions as F

    from raster_processor_spark import datagen
    from raster_processor_spark.operators import multimodal as mm

    d = (
        _read_parquet(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .where(F.col("doc_id") < _CUR_N)
    )
    return mm.image_curation(datagen.images_from_ids(d.repartition(4)))


@q("dedup_clusters", dd.dedup_clusters_sql(LSH_TAU))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.dedup_clusters(spark, sf_dir, LSH_TAU)


@q("dedup_simhash_pairs", dd.simhash_pairs_sql(3))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_pairs(spark, sf_dir, 3)


from raster_processor_spark.operators import sketches as sk

CMS_MIN_EST = 50


@q("cms_heavy_hitters", sk.cms_heavy_hitters_sql(CMS_MIN_EST))
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sk.cms_heavy_hitters(spark, sf_dir, CMS_MIN_EST)


@q("hll_distinct", sk.hll_distinct_sql())
def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sk.hll_distinct(spark, sf_dir)


from raster_processor_spark.operators import decontam as dc


@q("decontaminate", dc.decontaminate_sql())
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dc.decontaminate(spark, sf_dir)


from raster_processor_spark.operators import packing as pk


# the pipeline path runs SALTED (salt_splits=4): at corpus scale a hot
# (source, size_class) stratum is one task's sort without it — the driver
# exercises the non-default knob, oracle replaying the salt arithmetic
PACK_SALT = 4


@q("pack_assignments", pk.pack_assignments_sql(salt_splits=PACK_SALT))
def pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pk.pack_assignments(spark, sf_dir, salt_splits=PACK_SALT)


@q("pack_stats", pk.pack_stats_sql(salt_splits=PACK_SALT))
def pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pk.pack_stats(spark, sf_dir, salt_splits=PACK_SALT)


from raster_processor_spark.operators import sampling as smp


@q("rate_sample", smp.rate_sample_sql())
def rate_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.rate_sample(spark, sf_dir)


@q("temperature_sample", smp.temperature_sample_sql())
def temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.temperature_sample(spark, sf_dir)


@q("exact_k_sample", smp.exact_k_sample_sql())
def exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.exact_k_sample(spark, sf_dir)


_PHASH_N, _PHASH_MAX_HAM = 300, 3


@q("dedup_image_phash", _mm.image_phash_pairs_sql(_PHASH_N, _PHASH_MAX_HAM))
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mm.image_phash_pairs(spark, sf_dir, _PHASH_N, _PHASH_MAX_HAM)


from raster_processor_spark.operators import media as md

_VID_N, _VID_EVERY, _AUD_N = 200, 4, 150


@q("video_frame_sample", md.frame_sample_oracle_sql(_VID_N, _VID_EVERY))
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = (
        _read_parquet(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id").where(F.col("doc_id") < _VID_N).repartition(8)
    )
    return md.frame_sample(md.videos_from_ids(ids), every=_VID_EVERY)


@q("audio_features", md.audio_features_oracle_sql(_AUD_N))
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = (
        _read_parquet(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id").where(F.col("doc_id") < _AUD_N).repartition(8)
    )
    return md.audio_features(md.audios_from_ids(ids))


@q("token_count_bpe", tx.token_count_bpe_sql())
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_count_bpe(spark, sf_dir)


@q("dedup_survivors", dd.dedup_survivors_sql(LSH_TAU))
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.dedup_survivors(spark, sf_dir, LSH_TAU)


@q("quality_filter", tx.quality_filter_sql())
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_filter(spark, sf_dir)


@q("repetition_stats", tx.repetition_stats_sql())
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.repetition_stats(spark, sf_dir)


_TRAINING_CORPUS_SQL = f"""
WITH survivors AS ({dd.dedup_survivors_sql(LSH_TAU).strip()}),
kept AS ({tx.quality_filter_sql().strip()}),
decon AS ({dc.decontaminate_sql().strip()})
SELECT s.doc_id, s.source, s.n_chars
FROM survivors s
JOIN kept k ON k.doc_id = s.doc_id
LEFT JOIN decon d ON d.doc_id = s.doc_id
WHERE s.doc_id % {dc.EVAL_MOD} <> 0
  AND COALESCE(d.contaminated, FALSE) = FALSE
"""


@q("training_corpus", _TRAINING_CORPUS_SQL)
def training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The terminal curated table — what the pipeline actually ships to the
    trainer: near-dup clusters collapsed to canonical members
    (dedup_survivors), the per-language quality floor applied
    (quality_filter), eval-set documents and anything sharing shingles with
    them removed (decontaminate). Each stage is the registered operator; at
    production scale each runs as its own snapshot-checkpointed job and
    this query is the final anti-join chain over their outputs."""
    from pyspark.sql import functions as F

    surv = dd.dedup_survivors(spark, sf_dir, LSH_TAU)
    kept = tx.quality_filter(spark, sf_dir).select("doc_id")
    bad = dc.decontaminate(spark, sf_dir).where(F.col("contaminated")).select(
        "doc_id"
    )
    return (
        surv.where(F.pmod(F.col("doc_id"), F.lit(dc.EVAL_MOD)) != 0)
        .join(kept, "doc_id", "left_semi")
        .join(bad, "doc_id", "left_anti")
        .select("doc_id", "source", "n_chars")
    )
