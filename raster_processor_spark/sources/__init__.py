"""Sources & sinks: schema-pinned parquet readers and the snapshot/lineage
table-format layer (Iceberg-style semantics over plain parquet)."""
