"""Table→instance routing (reference: DeltaWorker.assignTables,
/root/reference/delta-app/src/main/java/io/cdap/delta/app/
DeltaWorker.java:594-620 round-robin :612-617; explicit per-instance
lists via ParallelismConfig, delta-proto/.../ParallelismConfig.java:27-51;
instance count capped to table count, DeltaWorker.java:157-165).

In the Spark rebuild each "instance" is an independent Pipeline
(own writer-id, own checkpoint) over its assigned tables; within one
table, parallelism comes from partitioning, not instances.
"""

from __future__ import annotations


def assign_tables(
    tables: list[str],
    num_instances: int,
    explicit: list[list[str]] | None = None,
) -> list[list[str]]:
    """Round-robin by default; explicit assignment wins when given.
    Returns one table list per instance; instances are capped to the
    table count (no idle instances)."""
    if explicit is not None:
        listed = [t for group in explicit for t in group]
        if sorted(listed) != sorted(set(listed)):
            raise ValueError("explicit assignment lists a table twice")
        unknown = set(listed) - set(tables)
        if unknown:
            raise ValueError(f"explicit assignment has unknown tables: {sorted(unknown)}")
        rest = [t for t in tables if t not in set(listed)]
        groups = [list(g) for g in explicit]
        # leftovers round-robin over the explicit groups (reference
        # appends unassigned tables to the last instance; we spread)
        for i, t in enumerate(rest):
            groups[i % len(groups)].append(t)
        return [g for g in groups if g]
    n = max(1, min(num_instances, len(tables)))
    groups: list[list[str]] = [[] for _ in range(n)]
    for i, t in enumerate(sorted(tables)):
        groups[i % n].append(t)
    return groups
