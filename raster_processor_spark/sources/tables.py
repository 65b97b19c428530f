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


_CONST_DF_MEMO: dict[tuple, DataFrame] = {}


def const_df(spark: SparkSession, key: tuple, rows_fn, schema: str) -> DataFrame:
    """Memoized literal DataFrame — constant rows derived from code, never
    from data (polygon edge tables, ring-offset tables, bbox covers):
    ``createDataFrame`` costs ~25-30 ms of py4j/row conversion per call and
    several operators rebuild the same constants on every invocation.
    Keyed by (applicationId, *key) so a restarted in-process session never
    sees a relation bound to a stopped context; entries of dead
    applications are dropped on insert, bounding the memo at one session's
    constants."""
    k = (spark.sparkContext.applicationId,) + tuple(key)
    df = _CONST_DF_MEMO.get(k)
    if df is None:
        for stale in [x for x in _CONST_DF_MEMO if x[0] != k[0]]:
            del _CONST_DF_MEMO[stale]
        df = spark.createDataFrame(rows_fn(), schema)
        _CONST_DF_MEMO[k] = df
    return df
