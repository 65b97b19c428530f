"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9: the engine surface for kernels that need explicit state).

`stateful_user_stats` maintains per-user running state across micro-batches
(event count, value sum, last-seen timestamp, max inter-event gap) — the
incremental form of the reference's multi-tile accumulation (ScenePixc
__add__, products.py:1849: each arriving tile updates the accumulated
scene; here each micro-batch updates per-key state).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from raster_processor_spark.streaming.jobs import EVENTS_SCHEMA

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("max_gap", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        n, s, last_ts, max_gap = state.get
    else:
        n, s, last_ts, max_gap = 0, 0.0, None, 0
    for pdf in pdfs:
        pdf = pdf.sort_values("tus")
        for tus, val in zip(pdf["tus"], pdf["value"]):
            if last_ts is not None:
                max_gap = max(max_gap, int(tus) - int(last_ts))
            last_ts = int(tus)
            n += 1
            s += float(val) if val == val else 0.0
    state.update((n, s, last_ts if last_ts is not None else 0, max_gap))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "max_gap_us": [max_gap],
        }
    )


PACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("size_class", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("overflow", T.IntegerType()),
    ]
)

PACK_STATE_SCHEMA = T.StructType([T.StructField("next_rank", T.LongType())])


def _pack_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-(source, size_class) running slot counter: each arriving doc
    takes the next rank; bin = rank // docs_per_bin. With docs arriving in
    doc_id order per stratum, the assignment equals the batch
    pack_assignments exactly — the streaming form of size-class slab
    packing (bins still overflow-free by construction, state is ONE counter
    per stratum)."""
    from raster_processor_spark.operators.packing import CAPACITY

    source, size_class = key
    per_bin = max(CAPACITY // int(size_class), 1)
    rank = state.get[0] if state.exists else 0
    out = []
    # pdfs is an iterable of Arrow CHUNKS of one group's micro-batch: sort
    # once over the concatenation — per-chunk sorting would assign ranks in
    # chunk order and silently break the stream==batch equivalence whenever
    # a stratum's batch spans multiple chunks
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        for doc_id, n_tokens in zip(pdf["doc_id"], pdf["n_tokens"]):
            out.append(
                (
                    int(doc_id),
                    source,
                    int(n_tokens),
                    int(size_class),
                    rank // per_bin,
                    int(int(n_tokens) > CAPACITY),
                )
            )
            rank += 1
    state.update((rank,))
    yield pd.DataFrame(
        out,
        columns=["doc_id", "source", "n_tokens", "size_class", "bin_id", "overflow"],
    )


def stateful_packing(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming sequence packing — the incremental twin of
    operators/packing.pack_assignments: documents stream in (one file per
    micro-batch), each is routed to its (source, size_class) stratum, and a
    per-stratum counter in GroupState hands out bin slots. Equal to the
    batch assignment whenever arrival order per stratum follows doc_id
    (range-ordered ingest), which the stream==batch test stages."""
    from raster_processor_spark.operators.packing import CAPACITY, _size_class_col

    docs_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    s = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "size_class",
            _size_class_col(F.col("n_tokens"), CAPACITY).cast("long"),
        )
    )
    return s.groupBy("source", "size_class").applyInPandasWithState(
        _pack_update,
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_stats(spark: SparkSession, input_dir: str) -> DataFrame:
    s = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(input_dir)
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
            "value",
        )
    )
    return s.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
