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
