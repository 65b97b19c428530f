"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All built-in expressions (JVM-side,
whole-stage codegen) with bit-exact DuckDB twins — no UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from raster_processor_spark.sources.tables import read_parquet as _read_parquet

STOPWORDS = ["the", "a"]
FP_MOD = 2147483647
FP_POWERS = [pow(31, i, FP_MOD) for i in range(16)]  # cyclic position weights


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token/char/stopword stats + a quality score + lang heuristic."""
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars", F.split("text", " ").alias("ws")
    )
    n_tokens = F.size("ws")
    n_distinct = F.size(F.array_distinct("ws"))
    stop_hits = F.size(F.filter("ws", lambda w: w.isin(STOPWORDS)))
    # single-spaced text → char count excluding separators
    avg_wlen = (F.col("n_chars") - (n_tokens - 1)).cast("double") / n_tokens
    quality = (
        n_distinct.cast("double") / n_tokens
        + F.when(stop_hits > 0, 0.5).otherwise(0.0)
    )
    lang_pred = F.when(stop_hits > 0, F.lit("en")).otherwise(F.lit("unk"))
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct"),
        stop_hits.cast("long").alias("stop_hits"),
        avg_wlen.alias("avg_word_len"),
        quality.alias("quality"),
        lang_pred.alias("lang_pred"),
    )


def text_stats_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents),
s AS (
  SELECT doc_id, n_chars,
         len(ws) AS n_tokens,
         len(list_distinct(ws)) AS n_distinct,
         len(list_filter(ws, w -> w IN ({stop}))) AS stop_hits
  FROM d
)
SELECT doc_id, n_tokens, n_distinct, stop_hits,
       CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_word_len,
       CAST(n_distinct AS DOUBLE) / n_tokens
         + (CASE WHEN stop_hits > 0 THEN 0.5 ELSE 0.0 END) AS quality,
       (CASE WHEN stop_hits > 0 THEN 'en' ELSE 'unk' END) AS lang_pred
FROM s
"""


def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "source", "n_chars", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return d.groupBy("source").agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def token_count_by_source_sql() -> str:
    return """
SELECT source,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint over hashed word-ids with cyclic
    position weights 31^(i mod 16) mod M — deterministic integer arithmetic
    (the windowed analogue of a content-defined rolling hash). Word ids are
    per-token char hashes (dedup.word_id_expr) and the position-weighted
    sum folds over the per-document word-id ARRAY — the whole query is one
    narrow projection (no explode, no shuffle at all; the round-5 form
    shuffled every token through a repartition + groupBy). Each term is
    reduced mod M before the running sum, which stays < 2^51 per document
    (int64-safe), so the result is bit-identical to the grouped SUM."""
    from raster_processor_spark.operators.dedup import wid_array_col

    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", wid_array_col(F.col("text")).alias("_wids")
    )
    pw = F.array(*[F.lit(p).cast("long") for p in FP_POWERS])
    terms = F.transform(
        F.col("_wids"),
        lambda w, i: F.pmod(
            w * F.element_at(pw, F.pmod(i, F.lit(16)) + 1), F.lit(FP_MOD)
        ),
    )
    total = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        F.pmod(total, F.lit(FP_MOD)).alias("fingerprint"),
        F.size("_wids").cast("long").alias("n_tokens"),
    )


def doc_fingerprint_sql() -> str:
    from raster_processor_spark.operators.dedup import WID_SQL

    powers = ", ".join(f"({i}, {p})" for i, p in enumerate(FP_POWERS))
    wid = WID_SQL.format(w="word")
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, UNNEST(ws) AS word,
               UNNEST(generate_series(1, len(ws))) AS i FROM w),
powers AS (SELECT * FROM (VALUES {powers}) AS p(imod, pw)),
tw AS (SELECT t.doc_id, {wid} AS wid, pw.pw
       FROM tok t JOIN powers pw ON pw.imod = (t.i - 1) % 16)
SELECT doc_id,
       CAST(SUM((wid * pw) % {FP_MOD}) % {FP_MOD} AS BIGINT) AS fingerprint,
       COUNT(*) AS n_tokens
FROM tw GROUP BY 1
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: keep the smallest doc_id per distinct text, report
    group size. Groups by (length, xxhash64) of the text so the shuffle
    carries 16 bytes per row instead of whole documents — equal texts always
    collide; a 64-bit+length collision between different texts is ~n²/2^64
    and would be caught by the oracle compare."""
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        d.select("doc_id", F.length("text").alias("tlen"), F.xxhash64("text").alias("th"))
        .groupBy("tlen", "th")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def dedup_exact_sql() -> str:
    return """
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


# BPE-ish subword counting: greedy fixed-width chunking of letter/digit runs
# plus single punctuation tokens — the standard cheap proxy for a learned
# BPE vocabulary's token count (≈ ceil(len(run)/4) per word). The pattern is
# ASCII-class-only so Java regex (Spark) and RE2 (DuckDB) tokenize
# identically; both engines scan leftmost with greedy bounded quantifiers.
BPE_PATTERN = "[a-z]{1,4}|[A-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9 ]"


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source whitespace vs BPE-ish token totals + the subword blowup
    ratio a tokenizer-budget planner needs (all codegen, no UDF)."""
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "source",
        F.size(F.split("text", " ")).alias("nw"),
        F.size(F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)")).alias("nb"),
    )
    return d.groupBy("source").agg(
        F.sum("nw").alias("ws_tokens"),
        F.sum("nb").alias("bpe_tokens"),
        (F.sum("nb").cast("double") / F.sum("nw")).alias("subword_ratio"),
    )


def token_count_bpe_sql() -> str:
    return f"""
SELECT source,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) AS BIGINT)
         AS bpe_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) AS DOUBLE)
         / SUM(len(string_split(text, ' '))) AS subword_ratio
FROM documents GROUP BY 1
"""


# The one outstanding persisted range-partitioned corpus (see below);
# bounded at a single entry so long multi-query sessions never accumulate.
# SERIAL-EXECUTION CONTRACT (same as percentiles._RANGED_CACHE): each
# distributed_rank_cut plan must be executed before the next one is built —
# building releases the previous invocation's persist.
_RANGED_CACHE: list[DataFrame] = []


def distributed_rank_cut(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    drop_frac_permille: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Drop the lowest floor(n * f/1000) rows per group by (order_cols)
    rank — WITHOUT a per-group rank window (a group key like language has
    constant cardinality, so at corpus scale one task would sort ~n/|langs|
    rows; the round-2 scale-killer).

    Distributed exact rank instead:
      1. range-partition on (group, *order) — rows of a group land in a
         contiguous pid range, sorted across partitions by construction;
      2. row_number within (pid, group) — partition key cardinality is
         P x |groups|, so no task ever sorts more than one range partition;
      3. global rank = local rank + Σ counts of earlier pids (the offset
         table is P x |groups| rows — broadcast);
      4. keep iff global rank > the cut. Bit-exact and tie-stable as long as
         order_cols are unique per row (callers append a unique id).
    The pid column is captured BEFORE the window shuffle, so correctness
    never depends on where the window moves rows."""
    from pyspark.sql import Window

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # persist() the range-partitioned corpus: three consumers (ranked rows,
    # per-pid counts, per-group totals) hang off it, and spark_partition_id
    # is nondeterministic to Catalyst, which BLOCKS exchange reuse — without
    # the persist the corpus is scanned and range-exchanged three times
    # (verified in the physical plan; the plan test pins one parquet scan).
    # The cache entry must outlive THIS plan (it's consumed lazily at
    # action time) but not the session: each invocation releases the
    # previous one, so a long driver sweep holds at most one cached corpus
    # instead of accumulating one per call (the session-amplification class
    # removed from knn in round 4). At cluster scale this is where a
    # checkpoint of the ranked corpus belongs anyway.
    while _RANGED_CACHE:
        _RANGED_CACHE.pop().unpersist()
    ranged = (
        df.repartitionByRange(p, group_col, *order_cols)
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    _RANGED_CACHE.append(ranged)
    w_local = Window.partitionBy("pid", group_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    ranked = ranged.withColumn("lrn", F.row_number().over(w_local))
    counts = ranged.groupBy("pid", group_col).agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(F.col("pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid",
        group_col,
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
    )
    totals = counts.groupBy(group_col).agg(F.sum("cnt").alias("n"))
    cut = F.floor(F.col("n") * drop_frac_permille / 1000.0)
    return (
        ranked.join(F.broadcast(offsets), ["pid", group_col])
        .join(F.broadcast(totals), group_col)
        .where(F.col("lrn") + F.col("off") > cut)
        .drop("pid", "lrn", "off", "n")
    )


REP_TOP_FRAC_MAX = 0.20  # most-frequent 2-gram occupies > 20% -> repetitive
REP_DUP_FRAC_MAX = 0.60  # > 60% of 2-gram slots are repeats -> repetitive


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals — the word-stream analogues of the
    public MassiveText repetition filters (Rae et al. 2021: duplicate-line
    and top-n-gram fractions; this corpus is single-line, so the signals
    run over 2-grams):

      top_gram_frac = occurrences of the most frequent 2-gram / total
      dup_gram_frac = occurrences belonging to 2-grams seen more than once
                      / total
      repetitive    = either fraction above its threshold

    2-gram ids are the same per-token hash arithmetic as the dedup shingles
    (no vocab table); counts are exact integers and each fraction is one
    deterministic division, so the oracle is bit-exact with no rounding.
    Scale shape: groupBy (doc_id, gram) then groupBy doc_id — both
    partial-aggregated, no windows, no skew key below doc granularity."""
    from raster_processor_spark.operators.dedup import (
        MERSENNE31,
        SID_P,
        wid_array_col,
    )

    # Narrow front-end: the 2-gram ids derive positionally from the
    # per-document word-id ARRAY, so the tokenize → hash → pair pipeline is
    # one projection — the round-5 form repartitioned every token and
    # sorted each document in a lead() window first. The two partial-
    # aggregated groupBys over the skinny (doc_id, gram) stream stay (a
    # pure array fold was tried and is several times slower: higher-order
    # lambdas are CodegenFallback, evaluated interpreted per element).
    # Counts are the same exact integers, so the fractions are
    # bit-identical.
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", wid_array_col(F.col("text")).alias("_wids")
    )
    wids = F.col("_wids")
    n = F.size(wids)
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    gram_expr = F.transform(
        idx,
        lambda i: F.pmod(
            F.get(wids, i) * F.lit(SID_P) + F.get(wids, i + 1),
            F.lit(MERSENNE31),
        ),
    )
    grams = d.select("doc_id", F.explode(gram_expr).alias("gram"))
    counted = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    base = counted.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_c"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_c"),
    )
    top_frac = F.col("top_c").cast("double") / F.col("n_grams")
    dup_frac = F.col("dup_c").cast("double") / F.col("n_grams")
    return base.select(
        "doc_id",
        "n_grams",
        top_frac.alias("top_gram_frac"),
        dup_frac.alias("dup_gram_frac"),
        (
            (top_frac > REP_TOP_FRAC_MAX) | (dup_frac > REP_DUP_FRAC_MAX)
        ).alias("repetitive"),
    )


def repetition_stats_sql() -> str:
    from raster_processor_spark.operators.dedup import MERSENNE31, SID_P, WID_SQL

    wid = WID_SQL.format(w="word")
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, UNNEST(ws) AS word,
               UNNEST(generate_series(1, len(ws))) AS i FROM w),
tw AS (SELECT doc_id, i, {wid} AS wid FROM tok),
g0 AS (SELECT doc_id,
              (wid * {SID_P} + LEAD(wid, 1) OVER (PARTITION BY doc_id ORDER BY i))
                % {MERSENNE31} AS gram
       FROM tw),
grams AS (SELECT doc_id, gram FROM g0 WHERE gram IS NOT NULL),
counted AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
agg AS (SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_grams,
               CAST(MAX(c) AS BIGINT) AS top_c,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_c
        FROM counted GROUP BY 1)
SELECT doc_id, n_grams,
       CAST(top_c AS DOUBLE) / n_grams AS top_gram_frac,
       CAST(dup_c AS DOUBLE) / n_grams AS dup_gram_frac,
       ((CAST(top_c AS DOUBLE) / n_grams > {REP_TOP_FRAC_MAX})
        OR (CAST(dup_c AS DOUBLE) / n_grams > {REP_DUP_FRAC_MAX})) AS repetitive
FROM agg
"""


def quality_filter(
    spark: SparkSession, sf_dir: str, drop_frac_permille: int = 200
) -> DataFrame:
    """Per-language quality floor: drop the lowest ``drop_frac_permille``/1000
    of documents by quality score within each predicted language — the
    curation filter downstream of text_stats. Rank-based over (quality,
    doc_id), not quantile-interpolation-based, so the cut is bit-exact across
    engines and stable under ties; the rank itself is computed by
    distributed_rank_cut (no per-language window — language cardinality is
    constant, so a per-language sort cannot scale)."""
    s = text_stats(spark, sf_dir).select("doc_id", "lang_pred", "quality")
    return distributed_rank_cut(
        s, "lang_pred", ["quality", "doc_id"], drop_frac_permille
    ).select("doc_id", "lang_pred", "quality")


def quality_filter_sql(drop_frac_permille: int = 200) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, lang_pred, quality FROM ({text_stats_sql().strip()})
),
r AS (
  SELECT doc_id, lang_pred, quality,
         ROW_NUMBER() OVER (PARTITION BY lang_pred
                            ORDER BY quality ASC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY lang_pred) AS n
  FROM s
)
SELECT doc_id, lang_pred, quality
FROM r WHERE rn > FLOOR(n * {drop_frac_permille} / 1000.0)
"""
