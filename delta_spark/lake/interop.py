"""External-engine interop: read a LakeTable from DuckDB — no Spark.

The lake format (lake/table.py) is deliberately engine-neutral:
immutable parquet data files + JSON metadata/manifests, snapshot
isolation, column-id schema evolution, equality-delete-style MoR.
This module PROVES that neutrality by resolving a table's current (or
time-travelled) snapshot with the standard library alone and emitting
ONE DuckDB SQL statement that reproduces ``LakeTable.read()``
bit-for-bit:

  * manifest-ref resolution (split manifests; legacy inline ``files``)
  * schema alignment by COLUMN ID across schema versions (renames
    re-aliased, widened types cast, added columns NULL-filled)
  * row-level bucket pruning of spanning MoR delta files on the stored
    ``_bucket`` column (file-level pruning for bucketed base files)
  * merge-on-read fold: per-key argmax by (``_seq``, ``_sort``) —
    the window formulation of dedup.lww_collapse (ties beyond the
    sort prefix carry identical payloads by the engine's invariant)
  * tombstone (``_deleted``) filtering and system-column hiding

This is the reference's "any consumer can read the replicated target"
property (the reference writes to BigQuery/SQL targets readable by any
client; delta-target-bigquery/README.md) rebuilt for the sandbox: with
no Iceberg jars available offline, DuckDB stands in as the independent
second engine. Intentionally imports neither pyspark nor the rest of
delta_spark — the ~60 lines of metadata resolution ARE the format spec.
"""

from __future__ import annotations

import datetime
import glob
import json
import os

try:  # stdlib-only sibling: keeps this module Spark-free
    from .stats import prune_files
except ImportError:
    # loaded standalone by file path (a consumer may vendor just this
    # file + stats.py; tested by the import-poisoned subprocess test) —
    # resolve the sibling by path
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "_delta_spark_lake_stats",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "stats.py"),
    )
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    prune_files = _mod.prune_files

# ---------------------------------------------------------- metadata
# Mirrors LakeTable._read_metadata / _resolve_files (the format's
# reader contract): newest readable v*.json wins; snapshots hold
# manifest REFS (or legacy inline ``files``); manifests are immutable
# JSON lists of {path, bucket, schema_version, kind, rows, max_seq}.


def read_metadata(table_path: str) -> dict:
    versions = glob.glob(os.path.join(table_path, "metadata", "v*.json"))
    if not versions:
        raise FileNotFoundError(f"no lake table at {table_path}")
    versions.sort(key=lambda p: int(os.path.basename(p)[1:-5]), reverse=True)
    for i, p in enumerate(versions):
        try:
            with open(p) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            if i == 0:
                continue
            raise
    raise FileNotFoundError(f"no readable metadata at {table_path}")


def resolve_snapshot(meta: dict, table_path: str, snapshot_id: int | None = None) -> dict | None:
    sid = meta["current_snapshot_id"] if snapshot_id is None else snapshot_id
    if sid is None:
        return None
    snap = next(s for s in meta["snapshots"] if s["id"] == sid)
    if "files" in snap:  # legacy inline manifest
        return {**snap, "files": list(snap["files"])}
    files: list[dict] = []
    for rel in snap.get("manifests", ()):
        with open(os.path.join(table_path, rel)) as f:
            files.extend(json.load(f))
    return {**snap, "files": files}


# ---------------------------------------------------------- SQL

_DUCK_TYPES = {
    "string": "VARCHAR",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "binary": "BLOB",
    "date": "DATE",
}


def _duck_type(spark_type: str) -> str:
    t = spark_type.strip()
    if t in _DUCK_TYPES:
        return _DUCK_TYPES[t]
    if t.startswith("decimal("):
        return "DECIMAL" + t[len("decimal"):].upper()
    if t.startswith("array<") and t.endswith(">"):
        return _duck_type(t[len("array<"):-1]) + "[]"
    raise ValueError(f"no DuckDB mapping for spark type {spark_type!r}")


def _q(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


def _lit_path(p: str) -> str:
    return "'" + p.replace("'", "''") + "'"


def _file_has_column(path: str, col: str) -> bool:
    import pyarrow.parquet as pq  # arrow, not Spark

    return col in pq.read_schema(path).names


def _sql_lit(v) -> str:
    if isinstance(v, datetime.datetime):
        return "TIMESTAMP '" + v.isoformat(sep=" ") + "'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    raise ValueError(f"no SQL literal for {type(v).__name__}")


def _range_cond(expr: str, lo, hi) -> str | None:
    conds = []
    if lo is not None:
        conds.append(f"{expr} >= {_sql_lit(lo)}")
    if hi is not None:
        conds.append(f"{expr} <= {_sql_lit(hi)}")
    return " AND ".join(conds) if conds else None


def read_sql(
    table_path: str,
    buckets: list[int] | None = None,
    snapshot_id: int | None = None,
    include_system: bool = False,
    align_schema_version: int | None = None,
    ranges: dict[str, tuple] | None = None,
) -> str:
    """Return one DuckDB SQL statement equivalent to
    ``LakeTable.read(buckets, include_system, snapshot_id, ranges)``.

    ``align_schema_version`` overrides the output schema (the analog
    of ``LakeTable.read(_align_schema_version=...)``): used by
    ``changes_sql`` so both sides of a cross-snapshot diff speak the
    TO snapshot's column names even across renames.

    ``ranges`` (column name → inclusive (lo, hi), either side None)
    plans the same manifest-stats file skipping as the Spark reader —
    lake/stats.py is the shared planner — so a selective DuckDB read
    also opens only the files whose bounds intersect the predicate;
    key-column row filters apply pre-fold, non-key post-fold."""
    table_path = os.path.abspath(table_path)
    meta = read_metadata(table_path)
    snap = resolve_snapshot(meta, table_path, snapshot_id)
    sv_cur = (
        meta["schema_version"]
        if snap is None or snapshot_id is None
        else snap.get("schema_version", meta["schema_version"])
    )
    if align_schema_version is not None:
        sv_cur = align_schema_version
    cur = meta["schemas"][str(sv_cur)]

    names = ", ".join(_q(f["name"]) for f in cur)
    if include_system:
        names += ", _seq, _sort, _deleted"

    def empty_sql() -> str:
        null_sel = ", ".join(
            f"CAST(NULL AS {_duck_type(f['type'])}) AS {_q(f['name'])}" for f in cur
        )
        if include_system:
            null_sel += (
                ", CAST(NULL AS BIGINT) AS _seq, CAST(NULL AS BIGINT) AS _sort,"
                " CAST(NULL AS BOOLEAN) AS _deleted"
            )
        return f"SELECT {null_sel} WHERE FALSE"

    if snap is None or not snap["files"]:
        return empty_sql()

    files = snap["files"]
    bset = None
    if buckets is not None:
        cur_spec = int(meta.get("bucket_spec_id", 0))
        if any(int(f.get("spec", 0)) != cur_spec for f in files):
            # pruning a file written under an older bucket spec needs
            # Spark's xxhash64 recomputed per row — DuckDB can't; the
            # FULL read stays exact regardless of specs
            raise NotImplementedError(
                "bucket-pruned interop read across bucket-spec evolution: "
                "run LakeTable.compact() to migrate pre-rebucket files, "
                "or read without bucket pruning"
            )
        bset = sorted({int(b) for b in buckets})
        files = [f for f in files if f["bucket"] in bset or f["bucket"] == -1]
        if not files:
            return empty_sql()

    pre_ranges: list[tuple[dict, tuple]] = []  # key-column ranges, pre-fold
    post_conds: list[str] = []  # non-key ranges judge the LATEST value
    if ranges:
        key_ids = set(meta["key_ids"])
        files = prune_files(files, cur, key_ids, ranges)
        if not files:
            return empty_sql()
        by_name = {f["name"]: f for f in cur}
        for colname, (lo, hi) in ranges.items():
            fld = by_name[colname]
            if fld["id"] in key_ids:
                pre_ranges.append((fld, (lo, hi)))
            else:
                cond = _range_cond(_q(colname), lo, hi)
                if cond:
                    post_conds.append(cond)

    # group by (schema_version, spanning?) exactly like LakeTable.read
    by_sv: dict[tuple[int, bool], list[str]] = {}
    has_delta = False
    for f in files:
        has_delta = has_delta or f.get("kind") == "delta"
        by_sv.setdefault((f["schema_version"], f["bucket"] == -1), []).append(
            os.path.join(table_path, f["path"])
        )

    parts = []
    for (sv, spanning), paths in sorted(by_sv.items()):
        old = {f["id"]: f for f in meta["schemas"][str(sv)]}
        cols = []
        for f in cur:
            dt = _duck_type(f["type"])
            if f["id"] in old:
                cols.append(f"CAST({_q(old[f['id']]['name'])} AS {dt}) AS {_q(f['name'])}")
            else:
                cols.append(f"CAST(NULL AS {dt}) AS {_q(f['name'])}")
        cols.append("_seq")
        conds = []
        if spanning and bset is not None:
            conds.append(
                f"_bucket IN ({', '.join(str(b) for b in bset)})" if bset else "FALSE"
            )
        for fld, (lo, hi) in pre_ranges:
            # condition on the SOURCE expression (this schema version's
            # physical name); a version without the column yields NULL,
            # which a range predicate excludes — matching the Spark side
            dt = _duck_type(fld["type"])
            expr = (
                f"CAST({_q(old[fld['id']]['name'])} AS {dt})"
                if fld["id"] in old
                else f"CAST(NULL AS {dt})"
            )
            cond = _range_cond(expr, lo, hi)
            if cond:
                conds.append(cond)
        where = f" WHERE {' AND '.join(conds)}" if conds else ""
        # pre-sort-column files read as _sort = 0 (format evolution) —
        # checked PER FILE: old and new files may coexist within one
        # schema version, and read_parquet over a mixed list would
        # either error or mis-default the column
        with_sort = {p for p in paths if _file_has_column(p, "_sort")}
        for plist, sort_expr in (
            (sorted(with_sort), "_sort"),
            (sorted(set(paths) - with_sort), "CAST(0 AS BIGINT) AS _sort"),
        ):
            if not plist:
                continue
            gcols = [*cols, sort_expr, "_deleted"]
            src = "read_parquet([" + ", ".join(_lit_path(p) for p in plist) + "])"
            parts.append(f"SELECT {', '.join(gcols)} FROM {src}{where}")

    u = "\nUNION ALL BY NAME\n".join(parts)
    if has_delta:
        # MoR fold — the window formulation of the argmax-by-(_seq,
        # _sort) aggregate (dedup.lww_collapse). DESC + default
        # NULLS-LAST matches Spark struct-max's null-smallest ordering.
        keys = ", ".join(
            _q(next(f["name"] for f in cur if f["id"] == i)) for i in meta["key_ids"]
        )
        u = (
            f"SELECT * EXCLUDE (__rn) FROM (\n"
            f"SELECT *, row_number() OVER (PARTITION BY {keys} "
            f"ORDER BY _seq DESC, _sort DESC) AS __rn FROM (\n{u}\n)\n) WHERE __rn = 1"
        )
    tail = "".join(f" AND {c}" for c in post_conds)
    return f"SELECT {names} FROM (\n{u}\n) WHERE NOT _deleted{tail}"


def changes_sql(
    table_path: str,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
) -> str:
    """One DuckDB SQL statement equivalent to
    ``LakeTable.read_changes(from, to)`` — Spark-free CDC-out. A
    downstream consumer that can reach the table's files needs NO
    Spark to replicate incrementally: per-key insert/update/delete
    classification between two snapshots, payload aligned to the TO
    snapshot's schema (post-rename names), deletes carrying the
    last-known payload, ``_seq`` = the winning sequence number.

    Formulation: both snapshots' LIVE states (tombstones already
    folded out by ``read_sql``) FULL-JOINed on the keys —
      in TO only → insert; in both with a different winning
      (_seq, _sort) → update; in FROM only → delete.
    That live-state diff is exactly the engine's emitted set (same
    classification table, ``LakeTable.read_changes``); the engine
    additionally prunes the scan to the buckets the range's commits
    touched — a cost optimization, not a semantic one, so this
    convenience reader scans both snapshots whole instead.
    """
    table_path = os.path.abspath(table_path)
    meta = read_metadata(table_path)
    to_sid = (
        meta["current_snapshot_id"] if to_snapshot_id is None else to_snapshot_id
    )
    if from_snapshot_id is not None and to_sid is not None and from_snapshot_id > to_sid:
        raise ValueError(
            f"changes_sql range reversed: from {from_snapshot_id} > to {to_sid}"
        )
    to_snap = resolve_snapshot(meta, table_path, to_sid) if to_sid is not None else None
    sv_to = (
        to_snap.get("schema_version", meta["schema_version"])
        if to_snap is not None and to_snapshot_id is not None
        else meta["schema_version"]
    )
    fields = meta["schemas"][str(sv_to)]
    by_id = {f["id"]: f["name"] for f in fields}
    keys = [by_id[i] for i in meta["key_ids"]]
    payload = [f["name"] for f in fields if f["name"] not in keys]

    b_sql = read_sql(
        table_path, snapshot_id=to_sid, include_system=True,
        align_schema_version=sv_to,
    )
    if to_snap is None:
        # empty table: no changes
        null_sel = ", ".join(
            f"CAST(NULL AS {_duck_type(f['type'])}) AS {_q(f['name'])}"
            for f in fields
        )
        return (
            f"SELECT {null_sel}, CAST(NULL AS VARCHAR) AS _change_type,"
            f" CAST(NULL AS BIGINT) AS _seq WHERE FALSE"
        )
    if from_snapshot_id is None:
        pay = ", ".join(_q(c) for c in [*keys, *payload])
        return (
            f"SELECT {pay}, 'insert' AS _change_type, _seq FROM (\n{b_sql}\n)"
        )
    a_sql = read_sql(
        table_path, snapshot_id=from_snapshot_id, include_system=True,
        align_schema_version=sv_to,
    )
    on = " AND ".join(f"a.{_q(k)} = b.{_q(k)}" for k in keys)
    key_sel = ", ".join(
        f"COALESCE(b.{_q(k)}, a.{_q(k)}) AS {_q(k)}" for k in keys
    )
    pay_sel = ", ".join(
        f"CASE WHEN b._seq IS NULL THEN a.{_q(c)} ELSE b.{_q(c)} END AS {_q(c)}"
        for c in payload
    )
    change = (
        "CASE WHEN a._seq IS NULL AND b._seq IS NOT NULL THEN 'insert' "
        "WHEN a._seq IS NOT NULL AND b._seq IS NOT NULL "
        "AND (a._seq <> b._seq OR a._sort IS DISTINCT FROM b._sort) "
        "THEN 'update' "
        "WHEN a._seq IS NOT NULL AND b._seq IS NULL THEN 'delete' END"
    )
    seq = "CASE WHEN b._seq IS NULL THEN a._seq ELSE b._seq END"
    sel = ", ".join(x for x in (key_sel, pay_sel) if x)
    return (
        f"SELECT * FROM (\n"
        f"SELECT {sel}, {change} AS _change_type, {seq} AS _seq\n"
        f"FROM (\n{a_sql}\n) a FULL JOIN (\n{b_sql}\n) b ON {on}\n"
        f") WHERE _change_type IS NOT NULL"
    )


def read_duckdb(
    table_path: str,
    con=None,
    buckets: list[int] | None = None,
    snapshot_id: int | None = None,
    ranges: dict[str, tuple] | None = None,
):
    """Read a lake table through DuckDB; returns a DuckDB relation
    (``.df()`` / ``.fetchall()`` to materialize)."""
    import duckdb

    sql = read_sql(
        table_path, buckets=buckets, snapshot_id=snapshot_id, ranges=ranges
    )
    if con is not None:
        return con.sql(sql)
    # module-level default connection: outlives this frame (a locally
    # created connection would be GC'd with the relation still open)
    return duckdb.sql(sql)
