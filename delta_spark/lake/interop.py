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
import uuid

def _sibling(name: str):
    """Import a stdlib-only sibling module, working both as a package
    member and when this file is loaded standalone by path (a consumer
    may vendor just these files; tested by the import-poisoned
    subprocess test)."""
    try:
        from importlib import import_module

        return import_module(f".{name}", package=__package__ or None)
    except (ImportError, TypeError):
        import importlib.util as ilu

        spec = ilu.spec_from_file_location(
            f"_delta_spark_lake_{name}",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), f"{name}.py"),
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod


_stats = _sibling("stats")
prune_files = _stats.prune_files
normalize_ranges = _stats.normalize_ranges

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


def branch_ref(meta: dict, name: str) -> tuple[int, int | None]:
    """(head, fork) of a branch ref from raw metadata — the Spark-free
    mirror of LakeTable._ref resolution (legacy int refs: fork
    unknown). Raises on a missing branch."""
    br = meta.get("branches", {})
    if name not in br:
        raise ValueError(f"no branch {name!r} (have {sorted(br)})")
    v = br[name]
    if isinstance(v, dict):
        return int(v["head"]), int(v["fork"])
    return int(v), None


class ExpiredSnapshotError(ValueError):
    """A referenced snapshot id is not in the metadata — expired by
    retention or never committed. Subclasses ValueError so existing
    rebootstrap catchers (consume_changes, matview cursors) keep
    working; typed so callers offering an automatic resync (the
    ``deltaspark`` stream reader's ``expired_offset`` option) can
    catch exactly this case and nothing else."""


def snapshot_was_expired(meta: dict, sid: int) -> bool:
    """Classify a MISSING snapshot id: True = it was committed and
    then removed by retention (automatic resync is legitimate), False
    = it can never have been a committed snapshot this consumer read
    (a typo'd ``starting`` id, a checkpoint replayed against the wrong
    table — configuration errors that must stay loud, not be masked
    by a silent full-state re-emission). Ids are allocated from one
    monotonic sequence shared by every ref STARTING AT 1 (the writer
    allocates ``1 + max(existing, 0)``), so any id in [1, head]
    existed; 0 and negatives never did (a typo'd ``starting='0'`` must
    stay loud, round-4 ADVICE), and ids above the head never did."""
    head = meta.get("current_snapshot_id")
    return head is not None and 1 <= sid <= int(head)


def resolve_snapshot(meta: dict, table_path: str, snapshot_id: int | None = None) -> dict | None:
    sid = meta["current_snapshot_id"] if snapshot_id is None else snapshot_id
    if sid is None:
        return None
    snap = next((s for s in meta["snapshots"] if s["id"] == sid), None)
    if snap is None:
        # a raw StopIteration here would surface as a generator
        # protocol error three frames up; name the actual problem
        raise ExpiredSnapshotError(
            f"snapshot {sid} is unknown at {table_path} — expired by "
            f"retention or never committed (known: "
            f"{sorted(s['id'] for s in meta['snapshots'])[-5:]}...). "
            f"Consumers holding an expired cursor must rebootstrap "
            f"(the consume_changes / matview contract)."
        )
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


def _union_cond(expr: str, ivals: list[tuple]) -> str | None:
    """OR of per-interval conditions; None if any interval is fully
    open (then the union filters nothing)."""
    parts = []
    for lo, hi in ivals:
        c = _range_cond(expr, lo, hi)
        if c is None:
            return None
        parts.append(f"({c})" if len(ivals) > 1 else c)
    return " OR ".join(parts) if parts else None


def read_sql(
    table_path: str,
    buckets: list[int] | None = None,
    snapshot_id: int | None = None,
    include_system: bool = False,
    align_schema_version: int | None = None,
    ranges: dict[str, tuple] | None = None,
    bucket_udf: str | None = None,
    branch: str | None = None,
    meta: dict | None = None,
) -> str:
    """Return one DuckDB SQL statement equivalent to
    ``LakeTable.read(buckets, include_system, snapshot_id, ranges)``.

    ``bucket_udf`` names a registered scalar function mapping a bucket
    column value to its CURRENT-spec bucket id (``read_duckdb``
    registers the Spark-equal XXH64 from lake/xxh.py); it enables
    bucket-pruned reads across bucket-spec evolution, where foreign-spec
    rows must recompute the hash.

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
    if meta is None:
        meta = read_metadata(table_path)
    if branch is not None:
        # Spark-free audit read of a WAP staging branch: resolve the
        # ref to its head exactly like LakeTable.read(branch=)
        if snapshot_id is not None:
            raise ValueError("pass at most one of snapshot_id / branch")
        snapshot_id = branch_ref(meta, branch)[0]
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
    cur_spec = int(meta.get("bucket_spec_id", 0))
    if buckets is not None:
        if (
            any(int(f.get("spec", 0)) != cur_spec for f in files)
            and bucket_udf is None
        ):
            # pruning a file written under an older bucket spec needs
            # Spark's xxhash64 recomputed per row — pure SQL can't;
            # read_duckdb registers the Spark-equal XXH64 UDF
            # (lake/xxh.py) and passes bucket_udf, and the FULL read
            # stays exact regardless of specs
            raise NotImplementedError(
                "bucket-pruned interop read across bucket-spec evolution: "
                "use read_duckdb(buckets=...) (registers the hash UDF), "
                "run LakeTable.compact() to migrate pre-rebucket files, "
                "or read without bucket pruning"
            )
        bset = sorted({int(b) for b in buckets})
        # file-level pruning only for CURRENT-spec per-bucket files;
        # spanning and foreign-spec files are kept and row-filtered
        files = [
            f
            for f in files
            if f["bucket"] == -1
            or int(f.get("spec", 0)) != cur_spec
            or f["bucket"] in bset
        ]
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
        for colname, ivals in normalize_ranges(ranges).items():
            fld = by_name[colname]
            if fld["id"] in key_ids:
                pre_ranges.append((fld, ivals))
            else:
                cond = _union_cond(_q(colname), ivals)
                if cond:
                    # parenthesize: a multi-interval union is an OR —
                    # appended bare after AND it would flip precedence
                    # and leak tombstoned rows into the result
                    post_conds.append(f"({cond})" if " OR " in cond else cond)

    # group by (schema_version, spanning?, spec) exactly like
    # LakeTable._scan_entries
    by_sv: dict[tuple[int, bool, int], list[str]] = {}
    has_delta = False
    for f in files:
        has_delta = has_delta or f.get("kind") == "delta"
        key = (f["schema_version"], f["bucket"] == -1, int(f.get("spec", 0)))
        by_sv.setdefault(key, []).append(os.path.join(table_path, f["path"]))

    parts = []
    for (sv, spanning, spec), paths in sorted(by_sv.items()):
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
        if bset is not None:
            in_list = ", ".join(str(b) for b in bset)
            if spec != cur_spec:
                # foreign-spec rows: recompute the CURRENT-spec bucket
                # with the registered Spark-equal hash UDF (the exact
                # analog of the Spark reader's row filter)
                bname_sv = old[meta["bucket_id"]]["name"]
                conds.append(
                    f"{bucket_udf}({_q(bname_sv)}) IN ({in_list})"
                    if bset
                    else "FALSE"
                )
            elif spanning:
                conds.append(f"_bucket IN ({in_list})" if bset else "FALSE")
        for fld, ivals in pre_ranges:
            # condition on the SOURCE expression (this schema version's
            # physical name); a version without the column yields NULL,
            # which a range predicate excludes — matching the Spark side
            dt = _duck_type(fld["type"])
            expr = (
                f"CAST({_q(old[fld['id']]['name'])} AS {dt})"
                if fld["id"] in old
                else f"CAST(NULL AS {dt})"
            )
            cond = _union_cond(expr, ivals)
            if cond:
                conds.append(f"({cond})" if " OR " in cond else cond)
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


def _touched_buckets(
    table_path: str, meta: dict, from_snap: dict, to_snap: dict, con
) -> tuple[list[int] | None, str | None]:
    """Driver-side manifest diff → the bucket ids touched by commits in
    (from, to] under the CURRENT spec (the engine's read_changes
    pruning, Spark-free). Returns (buckets, bucket_udf_name);
    (None, None) means "cannot prune, scan whole" — never wrong, only
    slower. Cost: pure JSON except one DISTINCT over the single
    ``_bucket``/key column of the touched delta files (O(changed
    data), the thing being replicated anyway)."""
    import duckdb

    from_paths = {f["path"] for f in from_snap["files"]}
    to_paths = {f["path"] for f in to_snap["files"]}
    touched = [f for f in to_snap["files"] if f["path"] not in from_paths]
    # removed files matter too: a commit that only drops files still
    # deletes every key those files held
    touched += [f for f in from_snap["files"] if f["path"] not in to_paths]
    cur_spec = int(meta.get("bucket_spec_id", 0))
    bset = {
        int(f["bucket"])
        for f in touched
        if f["bucket"] != -1 and int(f.get("spec", 0)) == cur_spec
    }
    c = con if con is not None else duckdb
    span = [
        f
        for f in touched
        if f["bucket"] == -1 and int(f.get("spec", 0)) == cur_spec
    ]
    if span:  # spanning deltas STORE _bucket: one tiny column scan
        lst = ", ".join(
            _lit_path(os.path.join(table_path, f["path"])) for f in span
        )
        bset |= {
            int(r[0])
            for r in c.sql(
                f"SELECT DISTINCT _bucket FROM read_parquet([{lst}])"
            ).fetchall()
        }
    foreign = [f for f in touched if int(f.get("spec", 0)) != cur_spec]
    udf = None
    needs_udf = foreign or any(
        int(f.get("spec", 0)) != cur_spec
        for snap in (from_snap, to_snap)
        for f in snap["files"]
    )
    if needs_udf:
        # the range crosses a rebucket: recomputing current-spec ids
        # (for touched foreign files AND the pruned read itself) needs
        # the Spark-equal hash; unsupported bucket-column type → no
        # pruning rather than a wrong hash
        try:
            udf = _register_bucket_udf(c, meta)
        except NotImplementedError:
            return None, None
    for f in foreign:
        sv = f["schema_version"]
        flds = meta["schemas"][str(sv)]
        bname = next(g["name"] for g in flds if g["id"] == meta["bucket_id"])
        bset |= {
            int(r[0])
            for r in c.sql(
                f"SELECT DISTINCT {udf}({_q(bname)}) FROM read_parquet("
                f"{_lit_path(os.path.join(table_path, f['path']))})"
            ).fetchall()
        }
    return sorted(bset), udf


def touched_buckets(
    table_path: str,
    from_snapshot_id: int | None,
    to_snapshot_id: int | None = None,
    con=None,
) -> list[int] | None:
    """Driver-side: the CURRENT-spec bucket ids touched by commits in
    ``(from, to]`` — the same manifest-diff pruning ``changes_sql``
    plans with, exposed so a caller that fans the diff out (one task
    per touched bucket, ``changes_sql(buckets=[b])`` each) can name
    the fan-out without generating SQL first. ``None`` means "cannot
    prune, scan whole" (unsupported bucket type across a rebucket) —
    never wrong, only wider. ``from_snapshot_id=None`` (full state as
    inserts) also returns None: every bucket may hold rows."""
    table_path = os.path.abspath(table_path)
    meta = read_metadata(table_path)
    to_sid = (
        meta["current_snapshot_id"] if to_snapshot_id is None else to_snapshot_id
    )
    if from_snapshot_id is None or to_sid is None:
        return None
    from_snap = resolve_snapshot(meta, table_path, from_snapshot_id)
    to_snap = resolve_snapshot(meta, table_path, to_sid)
    buckets, _ = _touched_buckets(table_path, meta, from_snap, to_snap, con)
    return buckets


def changes_sql(
    table_path: str,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
    con=None,
    buckets: list[int] | None = None,
    align_schema_version: int | None = None,
    meta: dict | None = None,
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
    Like the engine's ``read_changes``, both sides are pruned to the
    buckets the range's commits touched, named driver-side by the
    manifest diff (plus one DISTINCT over the touched delta files'
    stored ``_bucket`` column, run on ``con`` / the default DuckDB
    connection): a 1-commit delta on a wide table generates SQL over
    O(touched) files, not O(table). Untouched buckets are state-equal
    on both sides by construction, so pruning never changes the
    emitted set.

    ``meta`` pins the metadata document every decision (and both
    read_sql sides) is made from — a caller that validated the bucket
    spec against a metadata read passes that same read here, closing
    the check-then-act window against a concurrent rebucket.

    Explicit ``buckets`` restricts BOTH sides to those current-spec
    bucket ids instead of auto-computing the touched set — the
    fan-out path (``touched_buckets`` names the ids driver-side, one
    executor runs the SQL for its slice). The restriction is a
    partition of the auto-pruned diff: key state is bucket-local, so
    the union over the touched ids equals the unrestricted feed."""
    table_path = os.path.abspath(table_path)
    if meta is None:
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
    if align_schema_version is not None:
        # caller pins the OUTPUT naming epoch (columns are mapped by
        # field id underneath): a reader that pinned its schema before
        # a metadata-only rename keeps getting the names it promised
        sv_to = align_schema_version
    fields = meta["schemas"][str(sv_to)]
    by_id = {f["id"]: f["name"] for f in fields}
    keys = [by_id[i] for i in meta["key_ids"]]
    payload = [f["name"] for f in fields if f["name"] not in keys]

    udf = None
    if buckets is not None:
        # caller-scoped slice: a pruned read across a rebucket still
        # needs the Spark-equal hash to row-filter foreign-spec files
        cur_spec = int(meta.get("bucket_spec_id", 0))
        from_snap = (
            resolve_snapshot(meta, table_path, from_snapshot_id)
            if from_snapshot_id is not None and to_snap is not None
            else None
        )
        if any(
            int(f.get("spec", 0)) != cur_spec
            for snap in (from_snap, to_snap)
            if snap is not None
            for f in snap["files"]
        ):
            import duckdb

            udf = _register_bucket_udf(con if con is not None else duckdb, meta)
    elif from_snapshot_id is not None and to_snap is not None:
        from_snap = resolve_snapshot(meta, table_path, from_snapshot_id)
        buckets, udf = _touched_buckets(
            table_path, meta, from_snap, to_snap, con
        )

    b_sql = read_sql(
        table_path, snapshot_id=to_sid, include_system=True,
        align_schema_version=sv_to, buckets=buckets, bucket_udf=udf,
        meta=meta,
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
        align_schema_version=sv_to, buckets=buckets, bucket_udf=udf,
        meta=meta,
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


def _register_bucket_udf(con, meta: dict) -> str:
    """Register (idempotently) the Spark-equal XXH64 bucket function
    for this table's CURRENT spec on ``con`` (a connection, or the
    duckdb module for its default connection); returns the name.

    The hash is dispatched on the bucket column's DECLARED type —
    Spark hashes an IntegerType column via the 4-byte hashInt path and
    a LongType column via 8-byte hashLong, so one Python int has two
    different buckets depending on the column type. Only string /
    bigint / int columns are supported here; anything else raises
    rather than hashing wrong (callers fall back to a Spark read).
    Registered with ``null_handling='special'``: DuckDB's default
    short-circuits NULL inputs to NULL without calling the UDF, but
    Spark's ``xxhash64(NULL)`` yields the seed — a NULL bucket key
    belongs in bucket ``pmod(42, n)``, and a NULL ``_bucket`` would be
    silently dropped by every ``_bucket IN (...)`` pruned read."""
    import duckdb
    import duckdb.typing as dt

    bucket_of = _sibling("xxh").bucket_of
    n = int(meta["num_buckets"])
    cur = meta["schemas"][str(meta["schema_version"])]
    btype = next(f["type"] for f in cur if f["id"] == meta["bucket_id"])
    if btype == "string":
        argtype = dt.VARCHAR
    elif btype == "bigint":
        argtype = dt.BIGINT
    elif btype == "int":
        argtype = dt.INTEGER
    else:
        raise NotImplementedError(
            f"DuckDB interop bucket hashing supports string/bigint/int "
            f"bucket columns; this table buckets by {btype!r} — use the "
            f"Spark reader/writer for it"
        )
    fname = f"xxb_{btype}_{n}"
    try:
        # return BIGINT: Spark's spanning files store _bucket as int64
        # (pmod over xxhash64) — matching physical types keeps mixed
        # spark-written + duck-written file scans schema-consistent
        con.create_function(
            fname,
            _make_bucket_udf(bucket_of, n, btype),
            [argtype],
            dt.BIGINT,
            null_handling="special",
        )
    except (duckdb.CatalogException, duckdb.NotImplementedException):
        pass  # already registered on this connection
    return fname


def read_duckdb(
    table_path: str,
    con=None,
    buckets: list[int] | None = None,
    snapshot_id: int | None = None,
    ranges: dict[str, tuple] | None = None,
    branch: str | None = None,
    align_schema_version: int | None = None,
    meta: dict | None = None,
):
    """Read a lake table through DuckDB; returns a DuckDB relation
    (``.df()`` / ``.fetchall()`` to materialize). Unlike the pure-SQL
    ``read_sql``, this handles bucket-pruned reads across bucket-spec
    evolution by registering the Spark-equal hash UDF."""
    import duckdb

    bucket_udf = None
    if buckets is not None:
        if meta is None:
            meta = read_metadata(os.path.abspath(table_path))
        sid = snapshot_id
        if branch is not None and branch in meta.get("branches", {}):
            sid = branch_ref(meta, branch)[0]
        snap = resolve_snapshot(meta, os.path.abspath(table_path), sid)
        cur_spec = int(meta.get("bucket_spec_id", 0))
        if snap is not None and any(
            int(f.get("spec", 0)) != cur_spec for f in snap["files"]
        ):
            bucket_udf = _register_bucket_udf(
                con if con is not None else duckdb, meta
            )
    sql = read_sql(
        table_path,
        buckets=buckets,
        snapshot_id=snapshot_id,
        ranges=ranges,
        bucket_udf=bucket_udf,
        branch=branch,
        align_schema_version=align_schema_version,
        meta=meta,
    )
    if con is not None:
        return con.sql(sql)
    # module-level default connection: outlives this frame (a locally
    # created connection would be GC'd with the relation still open)
    return duckdb.sql(sql)


def changes_duckdb(
    table_path: str,
    con=None,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
    buckets: list[int] | None = None,
    align_schema_version: int | None = None,
    meta: dict | None = None,
):
    """``changes_sql`` executed through DuckDB; returns a relation.
    The ``buckets`` slice makes this the executor half of a fan-out:
    the driver names ``touched_buckets(...)``, each task folds its
    bucket's diff independently (keys never span buckets)."""
    import duckdb

    c = con if con is not None else duckdb
    sql = changes_sql(
        table_path,
        from_snapshot_id=from_snapshot_id,
        to_snapshot_id=to_snapshot_id,
        con=c,
        buckets=buckets,
        align_schema_version=align_schema_version,
        meta=meta,
    )
    return c.sql(sql)


# ---------------------------------------------------------- writing
#
# The format is engine-neutral in BOTH directions: a producer with no
# Spark at all can commit exactly-once merge-on-read deltas into a
# LIVE table that a Spark pipeline keeps merging/compacting. Possible
# because every moving part is already engine-free — the bucket
# function is plain XXH64 (lake/xxh.py, pinned bit-for-bit against
# Spark), the data files are parquet DuckDB can write, and the commit
# is the same atomic version claim (lake/commit.py) the Spark writer
# uses, so concurrent writers conflict-and-retry instead of corrupting.
# Reference analog: any number of CDC workers share one offset store
# (DBReplicationOffsetStore.java) — here the table IS the store.


def _is_applied(meta: dict, writer_id: str, batch_id: str) -> bool:
    if str(batch_id) in meta.get("applied_markers", {}).get(writer_id, []):
        return True
    # snapshots revoked by a rollback drill (LakeTable.rollback_to)
    # don't count: the Spark-free writer must re-admit the repair
    # batch exactly like the engine's is_applied does
    return any(
        s["summary"].get("writer-id") == writer_id
        and s["summary"].get("batch-id") == str(batch_id)
        and not s.get("rolled_back")
        for s in meta["snapshots"]
    )


def _write_json_once(path: str, payload) -> None:
    tmp = path + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _make_bucket_udf(bucket_of, n, coltype):
    # DuckDB hands an INTEGER arg over as a Python int — the declared
    # column type (captured here), not the value's Python type, picks
    # the Spark hash variant. None reaches us because the function is
    # registered with null_handling='special' (Spark: NULL → seed).
    def f(v):
        return int(bucket_of(v, n, coltype=coltype))

    return f


def write_delta_duckdb(
    table_path: str,
    con,
    select_sql: str,
    writer_id: str,
    batch_id: str,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "DELETE",
    sort_col: str | None = None,
    branch: str | None = None,
) -> dict | None:
    """Commit one merge-on-read delta batch from DuckDB — no Spark.

    ``branch`` stages the commit on a WAP branch instead of main (the
    Spark-free producer's write-audit-publish: stage from DuckDB,
    audit ``read_duckdb(branch=)``, publish with ``fast_forward``).
    The branch must already exist.

    ``select_sql`` must yield the table's CURRENT payload columns (by
    name) plus ``op_col`` and ``seq_col`` (and ``sort_col`` if given —
    single column only; composite sortKeys need the Spark writer).
    Rows are staged as ONE spanning parquet delta file with the same
    system columns the Spark MoR writer produces (``_seq``/``_sort``/
    ``_deleted``/``_bucket`` — the bucket computed by the Spark-equal
    XXH64), then committed with an O(batch) manifest append under the
    atomic version claim. Idempotent by (writer-id, batch-id); returns
    None on replay, commit stats otherwise. Readers (Spark, DuckDB)
    fold it like any delta; ``compact()`` migrates it to base files.
    """
    table_path = os.path.abspath(table_path)
    meta = read_metadata(table_path)
    if _is_applied(meta, writer_id, batch_id):
        return None
    staged = stage_delta_duckdb(
        table_path,
        con,
        select_sql,
        meta=meta,
        op_col=op_col,
        seq_col=seq_col,
        delete_op=delete_op,
        sort_col=sort_col,
    )
    if staged is None:
        return {"files": 0, "upserts": 0, "deletes": 0}
    return commit_delta_staged(
        table_path,
        [staged],
        writer_id=writer_id,
        batch_id=batch_id,
        expected_spec=int(meta.get("bucket_spec_id", 0)),
        expected_num_buckets=int(meta["num_buckets"]),
        branch=branch,
    )


def stage_delta_duckdb(
    table_path: str,
    con,
    select_sql: str,
    meta: dict | None = None,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "DELETE",
    sort_col: str | None = None,
) -> dict | None:
    """Stage one spanning MoR delta parquet file from a DuckDB query —
    the executor half of a Spark-free (or fan-out) delta write. Writes
    ``data/<tag>/part-00000.parquet`` with the engine's system columns
    and returns ``{"entry": <manifest entry>, "rows", "deletes",
    "max_seq"}`` for ``commit_delta_staged`` (None when the query
    yields no rows). Purely local: no metadata is touched, so any
    number of stagers run concurrently and a crash leaves only an
    orphan file for ``remove_orphans``."""
    table_path = os.path.abspath(table_path)
    if meta is None:
        meta = read_metadata(table_path)
    cur = meta["schemas"][str(meta["schema_version"])]
    bname = next(f["name"] for f in cur if f["id"] == meta["bucket_id"])
    spec_id = int(meta.get("bucket_spec_id", 0))

    fname = _register_bucket_udf(con, meta)
    if sort_col is None:
        sort_expr = "CAST(0 AS BIGINT)"
    else:
        s_type = next((f["type"] for f in cur if f["name"] == sort_col), "bigint")
        raw = (
            f"epoch_us({_q(sort_col)})"
            if s_type == "timestamp"
            else f"CAST({_q(sort_col)} AS BIGINT)"
        )
        sort_expr = f"COALESCE({raw}, {-(1 << 62)})"
    cols = [
        f"CAST({_q(f['name'])} AS {_duck_type(f['type'])}) AS {_q(f['name'])}"
        for f in cur
    ]
    staged = (
        f"SELECT {', '.join(cols)}, "
        f"CAST({_q(seq_col)} AS BIGINT) AS _seq, "
        f"{sort_expr} AS _sort, "
        f"({_q(op_col)} = {_sql_lit(delete_op)}) AS _deleted, "
        # hash the DECLARED-type value (a producer yielding BIGINT for
        # an int column must hash 4 bytes, not 8)
        f"{fname}(CAST({_q(bname)} AS "
        f"{_duck_type(next(f['type'] for f in cur if f['name'] == bname))}"
        f")) AS _bucket "
        f"FROM ({select_sql})"
    )
    tag = f"delta-duck-{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(table_path, "data", tag)
    os.makedirs(out_dir)
    fpath = os.path.join(out_dir, "part-00000.parquet")
    con.execute(f"COPY ({staged}) TO {_lit_path(fpath)} (FORMAT PARQUET)")
    n, dels, max_seq = con.execute(
        f"SELECT count(*), count(*) FILTER (WHERE _deleted), max(_seq) "
        f"FROM read_parquet({_lit_path(fpath)})"
    ).fetchall()[0]
    if n == 0:
        os.unlink(fpath)
        os.rmdir(out_dir)
        return None
    return {
        "entry": {
            "path": os.path.relpath(fpath, table_path),
            "bucket": -1,
            "schema_version": meta["schema_version"],
            "rows": int(n),
            "max_seq": int(max_seq),
            "kind": "delta",
            **({"spec": spec_id} if spec_id else {}),
        },
        "rows": int(n),
        "deletes": int(dels),
        "max_seq": int(max_seq),
    }


def commit_delta_staged(
    table_path: str,
    staged: list,
    writer_id: str,
    batch_id: str,
    expected_spec: int,
    expected_num_buckets: int,
    branch: str | None = None,
) -> dict | None:
    """Driver half: commit already-staged delta files (from any number
    of ``stage_delta_duckdb`` runs — e.g. one per Spark write task) as
    ONE snapshot under the atomic version claim. All-or-nothing:
    either every staged file enters the manifest chain with the
    (writer-id, batch-id) marker, or the claim loses and is retried
    against fresh metadata. Idempotent: returns None (and removes the
    staged orphans) when the batch is already applied. Raises
    CommitConflict if the bucket spec or schema moved while staging —
    the stage is schema-version-stamped, so a stale file can never
    slip into a newer table shape."""
    commit = _sibling("commit")

    table_path = os.path.abspath(table_path)
    staged = [s for s in staged if s is not None]
    if not staged:
        return {"files": 0, "upserts": 0, "deletes": 0}
    entries = [s["entry"] for s in staged]
    n = sum(s["rows"] for s in staged)
    dels = sum(s["deletes"] for s in staged)
    max_seq = max(s["max_seq"] for s in staged)
    spec_id = expected_spec

    def _drop_orphans():
        for e in entries:
            p = os.path.join(table_path, e["path"])
            try:
                os.unlink(p)
                os.rmdir(os.path.dirname(p))
            except OSError:
                pass

    # already-applied check BEFORE writing the manifest: the replay
    # path is routine (every restart replays its last epoch), and it
    # should leave no orphan m-*.json behind on each pass
    if _is_applied(read_metadata(table_path), writer_id, batch_id):
        _drop_orphans()
        return None

    mdir = os.path.join(table_path, "metadata", "manifests")
    os.makedirs(mdir, exist_ok=True)
    man_rel = os.path.join("metadata", "manifests", f"m-{uuid.uuid4().hex[:16]}.json")
    _write_json_once(os.path.join(table_path, man_rel), entries)

    proto = commit.protocol_for(table_path)
    for _ in range(50):
        meta = read_metadata(table_path)
        if _is_applied(meta, writer_id, batch_id):
            _drop_orphans()  # another replay of us won
            return None
        if int(meta.get("bucket_spec_id", 0)) != spec_id or int(
            meta["num_buckets"]
        ) != expected_num_buckets:
            raise commit.CommitConflict(
                "bucket spec changed while staging — recompute and retry"
            )
        if any(meta["schema_version"] != e["schema_version"] for e in entries):
            raise commit.CommitConflict(
                "schema changed while staging — recompute and retry"
            )
        fork = None
        if branch is not None:
            head, fork = branch_ref(meta, branch)  # raises if missing
            parent_id = head
        else:
            parent_id = meta["current_snapshot_id"]
        parent = next(
            (s for s in meta["snapshots"] if s["id"] == parent_id), None
        )
        if parent is None:
            refs = []
        elif "files" in parent:  # legacy inline parent → split once
            legacy_rel = os.path.join(
                "metadata", "manifests", f"m-{uuid.uuid4().hex[:16]}.json"
            )
            _write_json_once(os.path.join(table_path, legacy_rel), parent["files"])
            refs = [legacy_rel]
        else:
            refs = list(parent.get("manifests", ()))
        # ids are globally unique across main AND branch refs — a
        # "parent + 1" id could collide with a branch commit's
        snap = {
            "id": 1 + max(
                parent_id or 0,
                meta["current_snapshot_id"] or 0,
                *(
                    (int(v["head"]) if isinstance(v, dict) else int(v))
                    for v in meta.get("branches", {}).values()
                ),
                *(sn["id"] for sn in meta["snapshots"]),
            ),
            "parent": parent_id,
            "timestamp_ms": int(
                (datetime.datetime.now(datetime.timezone.utc)
                 - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc))
                .total_seconds() * 1000
            ),
            "schema_version": meta["schema_version"],
            "summary": {
                "operation": "merge-mor",
                "writer-id": writer_id,
                "batch-id": str(batch_id),
                "upserts": int(n) - int(dels),
                "deletes": int(dels),
                "max-seq": int(max_seq),
            },
            "manifests": [*refs, man_rel],
        }
        new_version = meta["version"] + 1
        payload = {
            **meta,
            "version": new_version,
            "snapshots": [*meta["snapshots"], snap],
        }
        if branch is None:
            payload["current_snapshot_id"] = snap["id"]
        else:
            payload["branches"] = {
                **meta.get("branches", {}),
                branch: {
                    "head": snap["id"],
                    "fork": fork if fork is not None else parent_id,
                },
            }
        try:
            proto.claim(
                os.path.join(table_path, "metadata"), f"v{new_version}.json", payload
            )
            return {
                "files": len(entries),
                "upserts": int(n) - int(dels),
                "deletes": int(dels),
                "max_seq": int(max_seq),
                "snapshot_id": snap["id"],
            }
        except commit.CommitConflict:
            continue  # a concurrent writer advanced the version — re-read
    raise commit.CommitConflict("lost the version race 50 times; giving up")
