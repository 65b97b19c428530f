"""Benchmark decontamination: flag corpus documents that share n-gram
shingles with a held-out evaluation set — the filter every pretraining
pipeline runs so benchmark text never leaks into training data.

Structure (the 100 TB shape):
  1. the EVAL side is tiny (benchmarks are ~10^5-10^7 shingles); hash each
     eval shingle to K Bloom positions and keep the DISTINCT occupied
     positions — a set bounded by the BLOOM_M bitmap size, broadcastable;
  2. the CORPUS side streams: each corpus shingle computes its K positions
     and is a Bloom HIT iff ALL K are occupied — here two broadcast
     left-semi joins (Catalyst turns them into map-side hash probes; on a
     real bitmap it is a bitset lookup, same data movement: corpus never
     shuffles against eval);
  3. per-document roll-up: shingle count, hit count, contaminated flag.

The Bloom filter is DETERMINISTIC (LCG position hashes of the shingle id),
so false positives are a pure function of the data and the DuckDB twin
replays them bit-for-bit — the oracle validates the structure including its
FP behavior (rate ≈ (1 - e^{-K·n/M})^K; size M ~10-20x the eval shingle
count to keep it ≪ 1 %). Exact-match decontamination (no FPs) is the same plan
with the semi-join on raw sids — `exact=True`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raster_processor_spark.operators.dedup import SHINGLES_CTE_SQL, shingles

BLOOM_M = 131072  # bits; size ~10-20x the eval shingle count (FP << 1%)
MERSENNE31 = 2147483647
# Two positions per shingle. They must NOT both be affine in sid: two
# affine maps are congruence-linked (a collision in one implies the other),
# which degrades the K-hash FP rate (1-e^{-Kn/M})^K to the single-probe
# n·m/M — measured exactly that on the fixture. The second hash therefore
# goes through the quadratic residue sid^2 mod 2^31-1 first (sid < 2^31 so
# sid^2 < 2^62: int64-safe in both engines).
BLOOM_HASHES = ((69069, 362437), (1664525, 1013904223))
EVAL_MOD = 50  # doc_id % EVAL_MOD == 0 -> held-out eval document


def _positions(sid, m: int = BLOOM_M):
    (a0, b0), (a1, b1) = BLOOM_HASHES
    sq = F.pmod(sid * sid, F.lit(MERSENNE31))
    return [
        F.pmod(F.lit(a0) * sid + F.lit(b0), F.lit(m)).alias("pos0"),
        F.pmod(F.lit(a1) * sq + F.lit(b1), F.lit(m)).alias("pos1"),
    ]


def decontaminate(
    spark: SparkSession, sf_dir: str, eval_mod: int = EVAL_MOD,
    exact: bool = False,
) -> DataFrame:
    """(doc_id, n_shingles, n_hits, contaminated) for every NON-eval doc.

    ``exact=False`` (default) probes the deterministic Bloom positions —
    the broadcastable scale path; ``exact=True`` semi-joins raw shingle ids
    (no false positives) — the verification path a pipeline runs on the
    flagged subset."""
    sh = shingles(spark, sf_dir)
    is_eval = F.pmod(F.col("doc_id"), F.lit(eval_mod)) == 0
    eval_sh = sh.where(is_eval)
    corpus_sh = sh.where(~is_eval)
    if exact:
        probed = corpus_sh.join(
            F.broadcast(
                eval_sh.select("sid").distinct().withColumn("_h0", F.lit(1))
            ),
            "sid",
            "left",
        )
        hit = F.col("_h0").isNotNull()
    else:
        # ONE corpus-shingle pass: the round-5 form consumed corpus_sh twice
        # (semi-joined hit rows + a separate totals aggregate, re-running the
        # tokenize/hash front-end) and joined the two aggregates back
        # together. Keeping the probes as broadcast LEFT joins with a marker
        # column turns "hit" into a flag on the SAME stream, so shingle
        # count and hit count come out of a single groupBy — the corpus is
        # scanned and hashed exactly once and the final left join vanishes.
        # Identical output: occ is distinct, so each left join matches at
        # most once and the marker conjunction equals the two semi-joins.
        occ = None
        ev = eval_sh.select(*_positions(F.col("sid")))
        for i in range(len(BLOOM_HASHES)):
            p = ev.select(F.col(f"pos{i}").alias("pos"))
            occ = p if occ is None else occ.unionByName(p)
        occ = occ.distinct()
        probed = corpus_sh.select("doc_id", *_positions(F.col("sid")))
        for i in range(len(BLOOM_HASHES)):
            probed = probed.join(
                F.broadcast(
                    occ.select(
                        F.col("pos").alias(f"pos{i}"),
                        F.lit(1).alias(f"_h{i}"),
                    )
                ),
                f"pos{i}",
                "left",
            )
        hit = F.col("_h0").isNotNull() & F.col("_h1").isNotNull()
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("n_hits"),
    ).select(
        "doc_id",
        "n_shingles",
        "n_hits",
        (F.col("n_hits") > 0).alias("contaminated"),
    )


def decontaminate_sql(eval_mod: int = EVAL_MOD, exact: bool = False) -> str:
    (a0, b0), (a1, b1) = BLOOM_HASHES
    pos_exprs = [
        f"(({a0} * sid + {b0}) % {BLOOM_M})",
        f"(({a1} * ((sid * sid) % {MERSENNE31}) + {b1}) % {BLOOM_M})",
    ]
    if exact:
        hit_cte = f"""
hits AS (
  SELECT c.doc_id, c.sid FROM corpus_sh c
  WHERE c.sid IN (SELECT DISTINCT sid FROM eval_sh)
)"""
    else:
        occ_union = " UNION ".join(
            f"SELECT {p} AS pos FROM eval_sh" for p in pos_exprs
        )
        conds = " AND ".join(
            f"{p} IN (SELECT pos FROM occ)" for p in pos_exprs
        )
        hit_cte = f"""
occ AS ({occ_union}),
hits AS (SELECT doc_id, sid FROM corpus_sh WHERE {conds})"""
    return f"""
WITH {SHINGLES_CTE_SQL},
eval_sh AS (SELECT sid FROM sh WHERE doc_id % {eval_mod} = 0),
corpus_sh AS (SELECT doc_id, sid FROM sh WHERE doc_id % {eval_mod} <> 0),
{hit_cte.strip()},
per_doc AS (SELECT doc_id, COUNT(*) AS n_hits FROM hits GROUP BY 1),
totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus_sh GROUP BY 1)
SELECT t.doc_id, t.n_shingles,
       COALESCE(p.n_hits, 0) AS n_hits,
       (COALESCE(p.n_hits, 0) > 0) AS contaminated
FROM totals t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
"""
