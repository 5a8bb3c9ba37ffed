"""Minimal snapshot-isolated lake table format on Parquet.

The north rule calls for Iceberg; the runtime image ships no Iceberg
(or Delta/Hudi) jars, so this package implements the same *semantics*
as a small, self-contained table format:

  * versioned metadata with optimistic-concurrency atomic commits
  * snapshots with summaries (writer-id / batch-id / max-seq commit
    markers → idempotent exactly-once apply)
  * hash-bucket layout on the merge key → MERGE rewrites only touched
    buckets (partition pruning at 100 TB)
  * column-id-based schema evolution (add / rename / widen) applied as
    metadata-only commits, with per-file schema versions aligned at
    read time

Swapping this for real Iceberg is a sink-level change: ``LakeTable``'s
surface (read / merge / apply_ddl / snapshot summaries) mirrors
Iceberg's (DataFrame read / MERGE INTO / UpdateSchema / snapshot
summary properties).
"""

from .materialized import MaterializedAggregate, advance_all  # noqa: F401
from .table import CommitConflict, LakeTable  # noqa: F401
