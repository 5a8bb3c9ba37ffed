"""delta_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild (NOT a port) of the capabilities of CDAP Delta
(reference: /root/reference, Java): a binlog/WAL-style change stream of
INSERT/UPDATE/DELETE (+DDL) events over multi-turn conversation
transcripts, keyed by ``(conv_id, turn_idx)``, is tailed via Structured
Streaming, deduplicated by sequence number, and applied as
key-partitioned MERGE upserts into snapshot-isolated lake tables with
exactly-once commit markers, schema evolution, per-partition lineage and
metrics, resumable from checkpoint.

Modules
-------
schema      event + applied-table StructTypes, op enums
changelog   deterministic seeded changelog generator + scan helpers
transform   vectorized (Arrow/pandas-UDF) column transforms & renames
dedup       sequence dedup + last-writer-wins collapse (incl. salted)
lake        minimal snapshot-isolated table format on Parquet
apply       micro-batch apply: DDL-first ordering, MERGE, lineage
pipeline    batch + Structured Streaming replay wiring, resume,
            supervised retry (run_supervised)
catalog     named tables + table-level DDL (CREATE/DROP/TRUNCATE/RENAME)
multi       multi-table pipelines (table→instance routing, demux)
progress    StreamingQueryListener diagnostics (log + JSONL stats)
assess      design-time schema-compat assessment
service     Spark-free diagnostics/assessment HTTP service
functions   training-data-pipeline ops (dedup, similarity, text, media)
lake.interop  DuckDB reader for lake tables (external-engine proof)
"""

__version__ = "0.1.0"
