"""Catalog: named LakeTables under one root, with idempotent
table-level DDL (CREATE / DROP / TRUNCATE / RENAME TABLE).

Reference semantics rebuilt (Spark-first, not a port):
  * table-level DDL op set — /root/reference/delta-api/src/main/java/
    io/cdap/delta/api/DDLOperation.java:30-38 (Type enum; RENAME
    carries previous + new name :58-65)
  * idempotent applyDDL contract — EventConsumer.java:39-55
  * CREATE_TABLE may never be blacklisted — DeltaWorker.java:219,231
    (enforced by ``expand_blacklist`` in multi.py)

Design notes:
  * the catalog document (name → table dir + create_seq) commits with
    the same tmp+fsync+link atomic protocol as LakeTable metadata —
    optimistic concurrency, never a torn latest version.
  * DROP leaves the table directory orphaned under ``dropped/`` GC
    bookkeeping and a RECREATE allocates a FRESH directory: exactly-once
    markers of the old incarnation can never satisfy the new one
    (table-level generation fencing), and ``create_seq`` recorded at
    CREATE time fences replayed pre-drop DML segments out of the new
    incarnation.
  * replayed table-level DDL is detected by a per-writer applied-seq
    marker set (each DDL event's seq is unique); ops are additionally
    individually re-tolerant (CREATE if-not-exists, DROP if-exists,
    RENAME old-missing+new-present) so a crash BETWEEN op and marker
    replays into a no-op, never a double-apply.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .lake import LakeTable
from .lake.table import CommitConflict


class Catalog:
    def __init__(self, spark: SparkSession, root: str, meta: dict):
        self.spark = spark
        self.root = root
        self.meta = meta

    # ------------------------------------------------------ lifecycle

    @staticmethod
    def _meta_dir(root: str) -> str:
        return os.path.join(root, "_catalog")

    @staticmethod
    def load_or_create(spark: SparkSession, root: str) -> "Catalog":
        d = Catalog._meta_dir(root)
        versions = glob.glob(os.path.join(d, "v*.json"))
        if versions:
            return Catalog(spark, root, Catalog._read_meta(root))
        os.makedirs(d, exist_ok=True)
        cat = Catalog(
            spark, root,
            {"version": 0, "tables": {}, "dropped": [], "applied_ddls": {}},
        )
        cat._write(cat.meta, expected_version=None)
        return cat

    @staticmethod
    def _read_meta(root: str) -> dict:
        versions = glob.glob(os.path.join(Catalog._meta_dir(root), "v*.json"))
        if not versions:
            raise FileNotFoundError(f"no catalog at {root}")
        versions.sort(key=lambda p: int(os.path.basename(p)[1:-5]), reverse=True)
        for i, p in enumerate(versions):
            try:
                with open(p) as f:
                    return json.load(f)
            except (json.JSONDecodeError, OSError):
                if i == 0:
                    continue
                raise
        raise FileNotFoundError(f"no readable catalog at {root}")

    def refresh(self) -> "Catalog":
        self.meta = self._read_meta(self.root)
        return self

    def _write(self, meta: dict, expected_version: int | None) -> None:
        from .lake.commit import protocol_for

        new_version = 0 if expected_version is None else expected_version + 1
        meta = dict(meta, version=new_version)
        protocol_for(self.root).claim(
            self._meta_dir(self.root), f"v{new_version}.json", meta
        )
        self.meta = meta

    def _commit(self, mutate, max_attempts: int = 10) -> bool:
        """Optimistic-concurrency catalog commit: ``mutate(meta)``
        returns the new meta dict or None for no-op; on CommitConflict
        (another instance committed first — routine when several
        pipeline instances share one catalog) refresh and re-apply.
        Safe because every catalog op is individually idempotent:
        re-running the mutation over the newer version either applies
        once or degrades to the no-op branch."""
        for attempt in range(max_attempts):
            meta = mutate(dict(self.meta))
            if meta is None:
                return False
            try:
                self._write(meta, expected_version=self.meta["version"])
                return True
            except CommitConflict:
                if attempt == max_attempts - 1:
                    raise
                self.refresh()
        return False

    # ------------------------------------------------------ lookup

    def list_tables(self) -> list[str]:
        return sorted(self.meta["tables"])

    def has_table(self, name: str) -> bool:
        return name in self.meta["tables"]

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, self.meta["tables"][name]["dir"])

    def table(self, name: str) -> LakeTable:
        return LakeTable.load(self.spark, self.table_path(name))

    def migrate_metadata(self) -> dict[str, int]:
        """Catalog-wide one-shot metadata upgrade: run
        ``LakeTable.migrate_inline_manifests`` over every registered
        table, converting any pre-split-manifest (legacy inline
        ``files``) snapshots to immutable manifest refs. Reference
        analog: the one-shot whole-pipeline state migration run at
        startup (StateStoreMigrator.java:52-106). Returns
        ``{table: snapshots_migrated}`` — all zeros when current."""
        return {
            t: self.table(t).migrate_inline_manifests()
            for t in self.list_tables()
        }

    def create_seq(self, name: str) -> int:
        return self.meta["tables"][name].get("create_seq", -1)

    # ------------------------------------------------------ DDL markers

    def ddl_applied(self, writer_id: str, seq: int) -> bool:
        return int(seq) in set(self.meta["applied_ddls"].get(writer_id, []))

    def mark_ddl(self, writer_id: str, seq: int) -> None:
        def mutate(meta):
            marks = {k: list(v) for k, v in meta["applied_ddls"].items()}
            marks.setdefault(writer_id, [])
            if int(seq) in marks[writer_id]:
                return None
            marks[writer_id].append(int(seq))
            return {**meta, "applied_ddls": marks}

        self._commit(mutate)

    # ------------------------------------------------------ table DDL

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        key_cols: list[str],
        bucket_col: str | None = None,
        num_buckets: int = 16,
        create_seq: int = -1,
        stats_cols: list[str] | None = None,
    ) -> bool:
        """CREATE TABLE IF NOT EXISTS. A recreate after DROP gets a
        FRESH directory; ``create_seq`` fences replayed pre-create DML
        out of the new incarnation."""
        if self.has_table(name):
            return False
        rel = os.path.join("tables", f"{name}-{uuid.uuid4().hex[:8]}")
        LakeTable.create(
            self.spark, os.path.join(self.root, rel), schema, key_cols,
            bucket_col=bucket_col, num_buckets=num_buckets,
            stats_cols=stats_cols,
        )

        def mutate(meta):
            if name in meta["tables"]:
                return None  # lost the race — our fresh dir stays orphaned
            return {
                **meta,
                "tables": {
                    **meta["tables"],
                    name: {"dir": rel, "create_seq": int(create_seq)},
                },
            }

        return self._commit(mutate)

    def drop_table(self, name: str) -> bool:
        """DROP TABLE IF EXISTS — the mapping is removed; the directory
        is recorded for GC, never reused."""
        def mutate(meta):
            if name not in meta["tables"]:
                return None
            tables = dict(meta["tables"])
            entry = tables.pop(name)
            return {
                **meta,
                "tables": tables,
                "dropped": [*meta["dropped"], entry["dir"]],
            }

        return self._commit(mutate)

    def fast_forward_all(
        self, branch: str, drop: bool = False
    ) -> dict[str, int | None]:
        """Publish a fleet-wide WAP staging round: fast-forward every
        table whose ``branch`` exists to its staged head (tables
        without the branch are skipped with None). Per-table
        fast-forwards are individually atomic and idempotent, so a
        crash mid-fleet is resumed by re-running — already-published
        tables no-op, the rest publish; there is no cross-table
        torn-read window beyond what independent tables always have
        (the reference replicates tables independently too,
        DeltaWorker.java:594-620). ``drop=True`` also drops each
        published branch ref. Returns table → published snapshot id
        (None = table has no such branch). A table whose publish is
        REFUSED (diverged) does not abort the fleet: the rest still
        publish, and one ValueError naming every refused table is
        raised at the end — the returned report is in its message."""
        out: dict[str, int | None] = {}
        refused: dict[str, str] = {}
        for name in self.list_tables():
            t = self.table(name)
            if branch not in t.branches:
                out[name] = None
                continue
            try:
                out[name] = t.fast_forward(branch)
            except ValueError as e:
                refused[name] = str(e)
                continue
            if drop:
                t.drop_branch(branch)
        if refused:
            raise ValueError(
                f"fast_forward_all({branch!r}): {len(refused)} table(s) "
                f"refused (diverged): {refused}; published: "
                f"{ {k: v for k, v in out.items() if v is not None} }"
            )
        return out

    def tag_all(self, tag: str, replace: bool = False) -> dict[str, int | None]:
        """Stamp ``tag`` at every table's current head — the fleet-wide
        pre-deploy checkpoint a rollback drill rewinds to. Empty tables
        are skipped with None (nothing to pin). Mirrors the
        fast_forward_all / rollback_all failure shape: a table that
        refuses (tag already pins an OLDER snapshot and ``replace`` is
        False) does not abort the fleet mid-loop — the rest still tag,
        and one ValueError naming every refused table is raised at the
        end with the full report in its message, so a mixed-release
        checkpoint is visible instead of silent. Release processes
        should pass ``replace=True`` (each deploy moves the checkpoint
        forward); ``replace=False`` is the audit mode that proves no
        tag moved."""
        out: dict[str, int | None] = {}
        refused: dict[str, str] = {}
        for name in self.list_tables():
            t = self.table(name)
            if t.metadata["current_snapshot_id"] is None:
                out[name] = None
                continue
            try:
                out[name] = t.tag(tag, replace=replace)
            except (ValueError, CommitConflict) as e:
                # CommitConflict: a live writer claimed the next
                # metadata version mid-drill — report it like any
                # other refusal instead of aborting the fleet loop
                refused[name] = str(e)
        if refused:
            raise ValueError(
                f"tag_all({tag!r}): {len(refused)} table(s) refused: "
                f"{refused}; tagged: "
                f"{ {k: v for k, v in out.items() if v is not None} }"
            )
        return out

    def rollback_all(self, tag: str) -> dict[str, int | str | None]:
        """Fleet-wide bad-deploy drill: roll every table carrying
        ``tag`` back to it (LakeTable.rollback_to — metadata-only,
        exactly-once markers revoked so the fixed pipeline re-applies).
        Mirrors ``fast_forward_all``'s failure shape: per-table
        rollbacks are individually atomic, a refused table (e.g. tag
        expired off main's lineage) does not abort the fleet, and one
        ValueError naming every refused table is raised at the end
        with the report in its message. Returns table → snapshots
        revoked (0 = already at the tag), with two distinguishable
        skip markers: None for a table with no commits (nothing to
        roll back), and the string ``"untagged"`` for a table that
        HAS commits but no checkpoint tag — e.g. created after
        ``tag_all`` ran, so every row in it post-dates the checkpoint
        and the drill cannot vouch for it; the operator must inspect
        (and possibly truncate) it by hand rather than read the
        report as all-clear."""
        out: dict[str, int | str | None] = {}
        refused: dict[str, str] = {}
        for name in self.list_tables():
            t = self.table(name)
            if tag not in t.tags:
                out[name] = (
                    None
                    if t.metadata["current_snapshot_id"] is None
                    else "untagged"
                )
                continue
            try:
                out[name] = t.rollback_to(tag=tag)
            except (ValueError, CommitConflict) as e:
                refused[name] = str(e)
        if refused:
            raise ValueError(
                f"rollback_all({tag!r}): {len(refused)} table(s) refused: "
                f"{refused}; rolled back: "
                f"{ {k: v for k, v in out.items() if v is not None} }"
            )
        return out

    def truncate_table(self, name: str) -> bool:
        """TRUNCATE: commit an empty snapshot. Exactly-once markers of
        earlier batches live on in the retained snapshot history, so a
        replayed pre-truncate sub-batch stays skipped."""
        if not self.has_table(name):
            return False
        t = self.table(name)
        cur = t.current_snapshot
        if cur is None or not cur["files"]:
            return False  # already empty — replay no-op
        t._commit_snapshot([], {"operation": "truncate"})
        return True

    # ------------------------------------------------------ databases

    @staticmethod
    def database_of(table: str) -> str:
        """A table's database is its dotted prefix; bare names live in
        ``default`` (reference: DDLOperation.getDatabaseName)."""
        return table.split(".", 1)[0] if "." in table else "default"

    def list_databases(self) -> list[str]:
        explicit = set(self.meta.get("databases", []))
        implicit = {self.database_of(t) for t in self.meta["tables"]}
        return sorted(explicit | implicit | {"default"})

    def create_database(self, name: str) -> bool:
        """CREATE DATABASE IF NOT EXISTS — namespace bookkeeping only
        (tables carry the prefix; there is no physical container)."""
        if name in self.list_databases():
            return False

        def mutate(meta):
            dbs = set(meta.get("databases", []))
            if name in dbs:
                return None
            return {**meta, "databases": sorted(dbs | {name})}

        return self._commit(mutate)

    def drop_database(self, name: str) -> bool:
        """DROP DATABASE IF EXISTS, cascade: drops every table in the
        namespace (each via drop_table's orphan-dir bookkeeping)."""
        victims = [t for t in self.meta["tables"] if self.database_of(t) == name]
        changed = False
        for t in victims:
            changed |= self.drop_table(t)
        if name in self.meta.get("databases", []):

            def mutate(meta):
                if name not in meta.get("databases", []):
                    return None
                return {
                    **meta,
                    "databases": [d for d in meta["databases"] if d != name],
                }

            changed |= self._commit(mutate)
        return changed

    def rename_table(self, old: str, new: str) -> bool:
        """RENAME TABLE — pure catalog metadata (reference: rename
        carries prev+new name, DDLOperation.java:58-65)."""
        if not self.has_table(old):
            if self.has_table(new):
                return False  # replayed rename
            raise ValueError(f"rename: no table {old}")
        if self.has_table(new):
            raise ValueError(f"rename: table {new} exists")

        def mutate(meta):
            if old not in meta["tables"]:
                return None  # concurrent writer finished the rename
            if new in meta["tables"]:
                # re-checked INSIDE the retry loop: a concurrent
                # create_table(new) that won the version race must not
                # be silently clobbered on our refresh-and-retry
                raise ValueError(f"rename: table {new} exists")
            tables = dict(meta["tables"])
            tables[new] = tables.pop(old)
            return {**meta, "tables": tables}

        return self._commit(mutate)

    # ------------------------------------------------------ event apply

    def apply_table_ddl(self, ddl: dict, writer_id: str, seq: int) -> bool:
        """Apply one table-level DDL event idempotently (exactly-once
        via the per-writer applied-seq marker; op-first-then-mark order
        makes a crash in between replay into a no-op)."""
        from .schema import (
            DDL_CREATE_DATABASE,
            DDL_CREATE_TABLE,
            DDL_DROP_DATABASE,
            DDL_DROP_TABLE,
            DDL_RENAME_TABLE,
            DDL_TRUNCATE_TABLE,
        )

        if self.ddl_applied(writer_id, seq):
            return False
        op = ddl["op"]
        if op == DDL_CREATE_TABLE:
            fields = [
                T.StructField(c["name"], _type_of(c["type"]), c.get("nullable", True))
                for c in ddl["columns"]
            ]
            self.create_table(
                ddl["table"],
                T.StructType(fields),
                key_cols=ddl["primary_key"],
                bucket_col=ddl.get("bucket_col"),
                num_buckets=ddl.get("num_buckets", 16),
                create_seq=seq,
            )
        elif op == DDL_DROP_TABLE:
            self.drop_table(ddl["table"])
        elif op == DDL_TRUNCATE_TABLE:
            self.truncate_table(ddl["table"])
        elif op == DDL_RENAME_TABLE:
            self.rename_table(ddl["table"], ddl["new_name"])
        elif op == DDL_CREATE_DATABASE:
            self.create_database(ddl["database"])
        elif op == DDL_DROP_DATABASE:
            self.drop_database(ddl["database"])
        else:
            raise ValueError(f"unknown table DDL op {op}")
        self.mark_ddl(writer_id, seq)
        return True


def _type_of(name: str) -> T.DataType:
    from .lake.table import _type_of as lake_type_of

    return lake_type_of(name)
