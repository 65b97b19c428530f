"""Schema-memoized parquet reads for the engine's base tables.

``spark.read.parquet(path)`` infers the schema from footers and builds a
fresh file index on EVERY call — measured ~80-105 ms per call on the bench
tables vs 13-16 ms when the schema is supplied. The engine's queries
re-derive their base-table DataFrames per invocation (no plan or result
reuse across queries — the driver contract), so a 42-query bench session
paid that inference cost ~120 times per pass for schemas that cannot have
changed.

The schema of an unchanged file set is pure metadata, so it is memoized
here keyed by the path's on-disk state (mtime_ns + size of the file, or of
every entry of a directory — the same staleness treatment as the corpus
fingerprints on the IVF/bucketed-table artifacts). The DATA path is
untouched: every query still lists and scans the parquet fresh — only the
schema-inference round trip is skipped — and any rewrite of the inputs
(changed mtime/size) re-infers. The memo is bounded at one entry per
distinct path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_SCHEMA_MEMO: dict[str, tuple[object, object]] = {}


def _path_state(path: str):
    st = os.stat(path)
    if os.path.isdir(path):
        entries = []
        for name in sorted(os.listdir(path)):
            s = os.stat(os.path.join(path, name))
            entries.append((name, s.st_mtime_ns, s.st_size))
        return (st.st_mtime_ns, tuple(entries))
    return (st.st_mtime_ns, st.st_size)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Drop-in for ``spark.read.parquet(path)`` with the schema memoized
    against the path's on-disk state (see module docstring)."""
    state = _path_state(path)
    hit = _SCHEMA_MEMO.get(path)
    if hit is not None and hit[0] == state:
        return spark.read.schema(hit[1]).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_MEMO[path] = (state, df.schema)
    return df
