"""Shared helpers for iterative-plan checkpoint hygiene."""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the block-manager storage behind a localCheckpoint()ed
    DataFrame NOW (the plan is a LogicalRDD over a persisted internal RDD;
    unpersist it directly). Best-effort: if the internals move, the blocks
    are still reclaimed by the driver's periodic-GC ContextCleaner pass —
    this just makes iterative loops O(1) in checkpoint storage instead of
    O(rounds) between GCs."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
