"""Iceberg-compatible export: publish a LakeTable snapshot as a
standard Apache Iceberg v2 table that any ecosystem reader
(pyiceberg, Trino, DuckDB ``iceberg_scan``, Spark's Iceberg catalog)
can consume — metadata.json + Avro manifest list + Avro manifests +
parquet data/equality-delete files, per the public Iceberg table spec
(iceberg.apache.org/spec). Reference analog: the reference's targets
are consumed by the wider ecosystem, not just its own reader
(delta-api/.../EventConsumer.java:39-76 — the consumer contract).

Cost model (what survives 100 TB):

  * BASE files are exported ZERO-COPY (hard-linked, fallback copy) as
    Iceberg data files at data sequence number 1. The CoW invariant —
    at most one stored version per key across base files — makes them
    valid Iceberg data as-is; historical column names are covered by a
    ``schema.name-mapping.default`` listing every name each field id
    ever had, and widened types ride Iceberg's int→long / float→double
    promotion rules.
  * Keys whose base row is stale or tombstoned — keys touched by any
    MoR delta file, plus tombstoned keys found in base files (located
    via parquet ``_deleted`` footer stats, so delta-free compacted
    files are never opened) — are folded ONCE, bucket-pruned, and
    re-emitted as a "winners" data file at sequence 2 together with
    ONE equality-delete file (the key columns, sequence 2). A v2
    reader applies the equality delete to strictly-older data (the
    base files), so superseded base rows vanish and the winners
    provide the live versions. Export cost is O(delta rows +
    tombstoned files + metadata), never a full-table rewrite.

The module also ships an INDEPENDENT consumer (``iceberg_scan_sql`` /
``read_iceberg_duckdb``): stdlib + DuckDB only, driven exclusively by
the exported Iceberg structures (metadata.json → manifest list →
manifests → data/delete files with sequence-number semantics). With
no Iceberg libraries installable in this sandbox, that consumer is
the constructive proof the export is readable outside the engine;
tests pin it row-equal to ``LakeTable.read()``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from .avro import read_ocf, write_ocf

# ------------------------------------------------------------ types

_ICE_TYPES = {
    "string": "string",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "timestamp": "timestamptz",  # Spark TimestampType is UTC-adjusted
    "date": "date",
    "binary": "binary",
}


def _ice_type(t: str) -> str:
    t = t.strip()
    if t in _ICE_TYPES:
        return _ICE_TYPES[t]
    if t.startswith("decimal(") and t.endswith(")"):
        p, s = t[len("decimal("):-1].split(",")
        return f"decimal({int(p)}, {int(s)})"
    raise ValueError(f"no Iceberg mapping for lake type {t!r}")


_DUCK_OF_ICE = {
    "string": "VARCHAR",
    "int": "INTEGER",
    "long": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "timestamptz": "TIMESTAMP",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "binary": "BLOB",
}


def _duck_of_ice(t: str) -> str:
    if t in _DUCK_OF_ICE:
        return _DUCK_OF_ICE[t]
    if t.startswith("decimal("):
        return "DECIMAL(" + t[len("decimal("):]
    raise ValueError(f"no DuckDB mapping for Iceberg type {t!r}")


# ------------------------------------------------------------ Avro
# schemas for v2 manifest lists and manifest files. Field names and
# ids follow the Iceberg spec (Appendix: Avro schemas); ids are what
# id-aware readers (pyiceberg) resolve by, names what name-based
# readers match.

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {
            "name": "added_data_files_count",
            "aliases": ["added_files_count"],
            "type": "int",
            "field-id": 504,
        },
        {
            "name": "existing_data_files_count",
            "aliases": ["existing_files_count"],
            "type": "int",
            "field-id": 505,
        },
        {
            "name": "deleted_data_files_count",
            "aliases": ["deleted_files_count"],
            "type": "int",
            "field-id": 506,
        },
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "element-id": 508,
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {
                                "name": "contains_null",
                                "type": "boolean",
                                "field-id": 509,
                            },
                            {
                                "name": "contains_nan",
                                "type": ["null", "boolean"],
                                "field-id": 518,
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                                "field-id": 510,
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                                "field-id": 511,
                            },
                        ],
                    },
                },
            ],
            "field-id": 507,
        },
        {"name": "key_metadata", "type": ["null", "bytes"], "field-id": 519},
    ],
}


def _manifest_entry_schema() -> dict:
    # partition struct is EMPTY — the export is unpartitioned (the
    # engine's xxhash64 bucketing is not an Iceberg transform, so we
    # do not claim a partition spec a reader would mis-plan by)
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {"type": "record", "name": "r102", "fields": []},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                        {
                            "name": "equality_ids",
                            "type": [
                                "null",
                                {"type": "array", "items": "int", "element-id": 136},
                            ],
                            "field-id": 135,
                        },
                        {
                            "name": "sort_order_id",
                            "type": ["null", "int"],
                            "field-id": 140,
                        },
                    ],
                },
            },
        ],
    }


# ------------------------------------------------------------ export


def _uri(path: str) -> str:
    return "file://" + os.path.abspath(path)


def _parquet_meta(path: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows, os.path.getsize(path)


def _link_or_copy(src: str, dst: str) -> None:
    # dst may exist from a CRASHED prior attempt (files are written
    # before the metadata claim); names are deterministic and content
    # comes from the same source, so replacing is always safe
    if os.path.exists(dst):
        os.remove(dst)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _bool_stat_may_be_true(path: str, col: str) -> bool:
    """True unless the parquet footer PROVES ``col`` is all-false.
    Used to skip opening delta-free compacted base files when looking
    for tombstones (missing stats → conservatively True)."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col not in idx:
            return False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max or bool(st.max):
                return True
        return False
    except Exception:
        return True


def _name_mapping(meta: dict, fields: list[dict]) -> list[dict]:
    """``schema.name-mapping.default``: every name each field id ever
    had (current first) — zero-copy files predating a rename resolve
    by their old name."""
    mapping = []
    for f in fields:
        names = [f["name"]]
        for flds in meta["schemas"].values():
            for g in flds:
                if g["id"] == f["id"] and g["name"] not in names:
                    names.append(g["name"])
        mapping.append({"field-id": f["id"], "names": names})
    return mapping


def _ice_fields(fields: list[dict]) -> list[dict]:
    return [
        {
            "id": f["id"],
            "name": f["name"],
            "required": False,
            "type": _ice_type(f["type"]),
        }
        for f in fields
    ]


def _manifest_file(
    meta_dir: str,
    tag: str,
    entries_files: list[tuple[str, int, int]],
    content: int,
    seq: int,
    snapshot_id_out: int,
    key_ids: list[int],
    ice_schema: dict,
) -> dict:
    """Write one Avro manifest; return its manifest-list record.
    ``content``: 0 data manifest / 1 delete manifest; the data_file
    content code is 0 for data, 2 for equality deletes."""
    recs = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id_out,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0 if content == 0 else 2,
                "file_path": _uri(p),
                "file_format": "PARQUET",
                "partition": {},
                "record_count": rows,
                "file_size_in_bytes": size,
                "equality_ids": list(key_ids) if content == 1 else None,
                "sort_order_id": None,
            },
        }
        for p, rows, size in entries_files
    ]
    path = os.path.join(meta_dir, f"m-{uuid.uuid4().hex}-{tag}.avro")
    write_ocf(
        path,
        _manifest_entry_schema(),
        recs,
        meta={
            "schema": json.dumps(ice_schema),
            "schema-id": str(ice_schema.get("schema-id", 0)),
            "partition-spec": "[]",
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "data" if content == 0 else "deletes",
        },
    )
    return {
        "manifest_path": _uri(path),
        "manifest_length": os.path.getsize(path),
        "partition_spec_id": 0,
        "content": content,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id_out,
        "added_data_files_count": len(recs),
        "existing_data_files_count": 0,
        "deleted_data_files_count": 0,
        "added_rows_count": sum(r for _, r, _ in entries_files),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": [],
        "key_metadata": None,
    }


def _collect_parquet_dir(
    tmp_dir: str, data_dir: str, prefix: str
) -> list[tuple[str, int, int]]:
    """Move a Spark parquet output dir's part files into ``data_dir``
    under ``prefix``; return (path, rows, bytes) per non-empty file."""
    out: list[tuple[str, int, int]] = []
    for j, p in enumerate(
        sorted(p for p in os.listdir(tmp_dir) if p.endswith(".parquet"))
    ):
        rows, size = _parquet_meta(os.path.join(tmp_dir, p))
        if rows == 0:
            continue
        dst = os.path.join(data_dir, f"{prefix}{j:05d}-{p}")
        os.replace(os.path.join(tmp_dir, p), dst)
        out.append((dst, rows, size))
    shutil.rmtree(tmp_dir)
    return out


def _full_state_files(
    table,
    dest: str,
    data_dir: str,
    snapshot_id: int | None = None,
    prefix: str = "",
) -> tuple[list, list, list, list, int]:
    """Materialize one whole table state as Iceberg files under
    ``data_dir``: base files zero-copied (hard-linked), delta-touched ∪
    tombstoned keys folded once into winners + one equality-delete set.
    Returns (base_files, winners_files, delete_files, fields,
    lake_sid); each file list holds (path, rows, bytes). Shared by the
    one-shot export (sequences 1/2) and the squash publish (sequences
    S+1/S+2)."""
    from pyspark.sql import functions as F

    meta = table.metadata
    if snapshot_id is not None:
        raw = table._raw_snapshot(snapshot_id)
        files = table._resolve_files(raw)
        sv = raw.get("schema_version", meta["schema_version"])
    else:
        raw = table._raw_snapshot()
        files = table._resolve_files(raw) if raw else []
        sv = meta["schema_version"]
    lake_sid = raw["id"] if raw else -1
    fields = meta["schemas"][str(sv)]
    by_id = {f["id"]: f for f in fields}
    key_ids = meta["key_ids"]
    keys = [by_id[i]["name"] for i in key_ids]
    payload = [f["name"] for f in fields]

    base = [f for f in files if f.get("kind") != "delta"]
    deltas = [f for f in files if f.get("kind") == "delta"]

    # ---- zero-copy base data files
    data_files_1: list[tuple[str, int, int]] = []  # (path, rows, bytes)
    for i, f in enumerate(base):
        src = os.path.join(table.path, f["path"])
        dst = os.path.join(data_dir, f"{prefix}b{i:05d}-{os.path.basename(src)}")
        _link_or_copy(src, dst)
        rows = f.get("rows")
        if rows is None:
            rows, _ = _parquet_meta(dst)
        data_files_1.append((dst, int(rows), os.path.getsize(dst)))

    # ---- keys needing suppression: delta-touched ∪ base-tombstoned
    spark = table.spark
    s_parts = []
    if deltas:
        folded = table._scan_entries(deltas, fields, include_system=True)
        s_parts.append(folded.select(*keys))
    tomb_files = [
        f
        for f in base
        if _bool_stat_may_be_true(os.path.join(table.path, f["path"]), "_deleted")
    ]
    if tomb_files:
        tomb = table._scan_entries(tomb_files, fields, include_system=True)
        s_parts.append(tomb.filter(F.col("_deleted")).select(*keys))
    winners_files: list[tuple[str, int, int]] = []
    delete_files: list[tuple[str, int, int]] = []
    if s_parts:
        s_df = s_parts[0]
        for p in s_parts[1:]:
            s_df = s_df.unionByName(p)
        s_df = s_df.distinct().localCheckpoint(eager=True)
        n_s = s_df.count()
        if n_s:
            # bucket-prune the fold to the touched keys' buckets when
            # the bucket column is a key column (the usual layout);
            # otherwise fold all buckets — still one bounded pass
            bname = by_id[meta["bucket_id"]]["name"]
            bset = None
            if meta["bucket_id"] in key_ids:
                bset = [
                    int(b)
                    for b in s_df.agg(
                        F.collect_set(
                            F.pmod(
                                F.xxhash64(F.col(bname)),
                                F.lit(meta["num_buckets"]),
                            )
                        ).alias("b")
                    ).collect()[0]["b"]
                ]
            state = table.read(
                buckets=bset, include_system=True, snapshot_id=snapshot_id
            )
            winners = state.join(s_df, keys, "left_semi")
            live = winners.filter(~F.col("_deleted")).select(*payload)
            win_tmp = os.path.join(dest, f"_win_tmp_{prefix.strip('-') or 'x'}")
            shutil.rmtree(win_tmp, ignore_errors=True)  # crashed attempt
            live.coalesce(max(1, min(8, n_s // 500_000 + 1))).write.parquet(win_tmp)
            winners_files = _collect_parquet_dir(win_tmp, data_dir, f"{prefix}w")
            del_tmp = os.path.join(dest, f"_del_tmp_{prefix.strip('-') or 'x'}")
            shutil.rmtree(del_tmp, ignore_errors=True)
            s_df.coalesce(max(1, min(8, n_s // 2_000_000 + 1))).write.parquet(del_tmp)
            delete_files = _collect_parquet_dir(del_tmp, data_dir, f"{prefix}ed")

    return data_files_1, winners_files, delete_files, fields, lake_sid


def export_iceberg(table, dest: str, snapshot_id: int | None = None) -> str:
    """Export one snapshot of ``table`` (a LakeTable) to ``dest`` as a
    self-contained Iceberg v2 table; returns the metadata.json path.

    See the module docstring for the mapping and its cost model. The
    export directory is laid out HadoopTables-style (``data/`` +
    ``metadata/v1.metadata.json`` + ``version-hint.text``) so path
    -based readers find it without a catalog."""
    dest = os.path.abspath(dest)
    data_dir = os.path.join(dest, "data")
    meta_dir = os.path.join(dest, "metadata")
    # crash-retryable bootstrap: a prior attempt may have created the
    # dirs, linked files (_link_or_copy tolerates that), and even
    # written v1.metadata.json before dying pre-hint — every step below
    # must be re-runnable, or continuous publishing wedges forever
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    meta = table.metadata
    key_ids = meta["key_ids"]
    data_files_1, winners_files, delete_files, fields, lake_sid = (
        _full_state_files(table, dest, data_dir, snapshot_id=snapshot_id)
    )
    mapping = _name_mapping(meta, fields)
    ice_schema = {
        "type": "struct",
        "schema-id": 0,
        "identifier-field-ids": [],
        "fields": _ice_fields(fields),
    }

    seq_max = 2 if (winners_files or delete_files) else 1
    snapshot_id_out = int(uuid.uuid4().int % (1 << 62)) + 1
    now_ms = int(time.time() * 1000)

    # ---- manifests
    def _write_manifest(tag, entries_files, content, seq):
        return _manifest_file(
            meta_dir, tag, entries_files, content, seq,
            snapshot_id_out, key_ids, ice_schema,
        )

    manifests = []
    if data_files_1:
        manifests.append(_write_manifest("data1", data_files_1, 0, 1))
    if winners_files:
        manifests.append(_write_manifest("data2", winners_files, 0, 2))
    if delete_files:
        manifests.append(_write_manifest("del2", delete_files, 1, 2))

    list_path = os.path.join(
        meta_dir, f"snap-{snapshot_id_out}-1-{uuid.uuid4().hex}.avro"
    )
    write_ocf(list_path, _MANIFEST_LIST_SCHEMA, manifests)

    md = {
        "format-version": 2,
        "table-uuid": meta.get("table_uuid", str(uuid.uuid4())),
        "location": _uri(dest),
        "last-sequence-number": seq_max,
        "last-updated-ms": now_ms,
        "last-column-id": max(f["id"] for f in fields),
        "current-schema-id": 0,
        "schemas": [ice_schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "schema.name-mapping.default": json.dumps(mapping),
            "write.format.default": "parquet",
            # publish cursor: the lake snapshot this Iceberg state
            # reflects — publish_iceberg() resumes incrementally here
            "delta-spark.lake-snapshot-id": str(lake_sid),
        },
        "current-snapshot-id": snapshot_id_out,
        "refs": {"main": {"snapshot-id": snapshot_id_out, "type": "branch"}},
        "snapshots": [
            {
                "snapshot-id": snapshot_id_out,
                "sequence-number": seq_max,
                "timestamp-ms": now_ms,
                "manifest-list": _uri(list_path),
                "summary": {
                    "operation": "append",
                    "added-data-files": str(
                        len(data_files_1) + len(winners_files)
                    ),
                    "added-delete-files": str(len(delete_files)),
                    "delta-spark.lake-snapshot-id": str(lake_sid),
                },
                "schema-id": 0,
            }
        ],
        "snapshot-log": [
            {"snapshot-id": snapshot_id_out, "timestamp-ms": now_ms}
        ],
        "metadata-log": [],
    }
    md_path = os.path.join(meta_dir, "v1.metadata.json")
    hint_path = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint_path):
        # a LIVE table (hint published) must never be clobbered — use
        # publish_iceberg for incremental updates
        raise FileExistsError(
            f"{dest} is already a published Iceberg table (version-hint "
            f"present); export refuses to overwrite it"
        )
    # no hint ⇒ any existing v1 is an unpublished leftover of a crashed
    # bootstrap: overwrite atomically, then publish the hint LAST
    tmp = md_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(md, f, indent=2)
    os.replace(tmp, md_path)
    with open(hint_path, "w") as f:
        f.write("1")
    return md_path


def _claim_metadata_version(meta_dir: str, version: int, md: dict) -> str:
    """Atomically claim v{version}.metadata.json: write a COMPLETE temp
    file, fsync, then os.link it into place — all-or-nothing, so any
    v-file that exists is complete by construction (a racing or
    crashed writer can never leave a truncated claimed file). Raises
    FileExistsError when the version is already claimed."""
    path = os.path.join(meta_dir, f"v{version}.metadata.json")
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(md, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    finally:
        os.unlink(tmp)
    return path


def _adopt_orphan_version(meta_dir: str, version: int) -> None:
    """Crash recovery: v{version} was claimed but the hint was never
    published (writer died in the claim→hint window). The claim is
    atomic, so a REAL publisher's file is complete — finishing the
    dead writer's job (publishing the hint) unwedges the destination;
    the caller then re-reads and retries its own publish on top. A
    file that is NOT valid Iceberg metadata of THIS table (garbage, or
    a foreign write squatting on the version number) is never adopted:
    that stays a loud FileExistsError for the operator."""
    path = os.path.join(meta_dir, f"v{version}.metadata.json")
    try:
        with open(path) as f:
            md = json.load(f)
        ok = all(
            k in md
            for k in ("format-version", "schemas", "snapshots", "table-uuid")
        )
    except (json.JSONDecodeError, OSError):
        ok = False
    if not ok:
        raise FileExistsError(
            f"{path} is claimed by something that is not this table's "
            f"Iceberg metadata — refusing to adopt or overwrite it"
        )
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))



def publish_iceberg(
    table,
    dest: str,
    squash: bool = False,
    squash_after_deletes: int = 64,
) -> str:
    """CONTINUOUS Iceberg publishing: keep an Iceberg v2 table at
    ``dest`` tracking ``table`` commit-by-commit. First call bootstraps
    via :func:`export_iceberg`; each later call appends ONE Iceberg
    snapshot holding exactly the keys whose state changed since the
    last published lake snapshot — new data files with the winning rows
    plus one equality-delete file covering every changed key (which
    suppresses all strictly-older versions, including previous
    publishes' rows) — then writes ``v{N+1}.metadata.json`` with the
    full snapshot log, schema list (appended on evolution), refreshed
    name mapping, and a ``metadata-log`` link to the previous version.
    Old metadata files stay readable: pointing a consumer at
    ``v{N}.metadata.json`` is Iceberg time travel to that publish.

    Exactly-once: the published lake snapshot id rides in the table
    properties (``delta-spark.lake-snapshot-id``) and each snapshot's
    summary; a republish with no new lake commits and no schema change
    is a no-op, and the ``open(path, 'x')`` claim on the next metadata
    version makes racing publishers lose loudly, mirroring
    ``lake/commit.py`` (and Iceberg's own optimistic metadata swap).

    Cost is O(changed rows + metadata) per call — the change feed is
    ``read_changes`` (manifest-diff bucket-pruned), never a table scan.

    SQUASH: each incremental publish adds one equality-delete file, and
    a v2 reader anti-joins every delete file on every read — unbounded
    under a per-micro-batch publisher. When the delete-file count
    reaches ``squash_after_deletes`` (or ``squash=True`` forces it),
    the publish emits a REPLACE snapshot instead: the full current
    state re-materialized (base files zero-copy hard-linked — cheap
    right after the lake's own compaction — plus one winners fold) with
    a FRESH manifest list, so the delete-file stack resets to ≤1. Older
    metadata versions still time-travel; their files stay on disk.

    Reference analog: the per-commit consumer contract the reference's
    targets expose downstream (delta-api/.../EventConsumer.java:39-76)
    — here the downstream IS the Iceberg ecosystem."""
    from pyspark.sql import functions as F

    dest = os.path.abspath(dest)
    meta_dir = os.path.join(dest, "metadata")
    data_dir = os.path.join(dest, "data")
    hint = os.path.join(meta_dir, "version-hint.text")
    if not os.path.exists(hint):
        return export_iceberg(table, dest)

    with open(hint) as f:
        v = int(f.read().strip())
    prev_path = os.path.join(meta_dir, f"v{v}.metadata.json")
    with open(prev_path) as f:
        md = json.load(f)
    last_pub = int(
        md.get("properties", {}).get("delta-spark.lake-snapshot-id", "-1")
    )

    meta = table.metadata
    raw = table._raw_snapshot()
    cur_sid = raw["id"] if raw else -1
    fields = meta["schemas"][str(meta["schema_version"])]
    ice_flds = _ice_fields(fields)
    cur_schema = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    if cur_sid == last_pub and cur_schema["fields"] == ice_flds and not squash:
        return prev_path  # nothing new — idempotent no-op

    # schema evolution: reuse an identical historical schema-id, else
    # append a new schema entry and point current-schema-id at it
    match = next((s for s in md["schemas"] if s["fields"] == ice_flds), None)
    if match is None:
        schema_id = 1 + max(s["schema-id"] for s in md["schemas"])
        ice_schema = {
            "type": "struct",
            "schema-id": schema_id,
            "identifier-field-ids": [],
            "fields": ice_flds,
        }
        schemas = md["schemas"] + [ice_schema]
    else:
        schema_id, ice_schema, schemas = match["schema-id"], match, md["schemas"]

    key_ids = meta["key_ids"]
    by_id = {f["id"]: f for f in fields}
    keys = [by_id[i]["name"] for i in key_ids]
    payload = [f["name"] for f in fields]

    seq = md["last-sequence-number"] + 1
    snapshot_id_out = int(uuid.uuid4().int % (1 << 62)) + 1
    now_ms = int(time.time() * 1000)

    if not squash and squash_after_deletes:
        squash = (
            len(scan_files(prev_path)["deletes"]) >= squash_after_deletes
        )

    if squash:
        # REPLACE snapshot: full state re-materialized, fresh manifest
        # list — resets the equality-delete stack a v2 reader must
        # anti-join on every read
        base_f, winners_files, delete_files, _flds, _sid = _full_state_files(
            table, dest, data_dir, prefix=f"s{seq:04d}-"
        )
        seq_hi = seq + 1 if (winners_files or delete_files) else seq
        manifests = []
        if base_f:
            manifests.append(
                _manifest_file(
                    meta_dir, f"sqdata{seq}", base_f, 0, seq,
                    snapshot_id_out, key_ids, ice_schema,
                )
            )
        if winners_files:
            manifests.append(
                _manifest_file(
                    meta_dir, f"sqwin{seq}", winners_files, 0, seq_hi,
                    snapshot_id_out, key_ids, ice_schema,
                )
            )
        if delete_files:
            manifests.append(
                _manifest_file(
                    meta_dir, f"sqdel{seq}", delete_files, 1, seq_hi,
                    snapshot_id_out, key_ids, ice_schema,
                )
            )
        seq = seq_hi
        op_label = "replace"
        n_added_data = len(base_f) + len(winners_files)
    else:
        try:
            ch = table.read_changes(
                from_snapshot_id=(last_pub if last_pub >= 0 else None)
            )
        except ValueError as e:
            raise ValueError(
                f"published lake snapshot {last_pub} is no longer readable "
                f"({e}); re-export to a fresh destination"
            ) from None
        ch = ch.localCheckpoint(eager=True)  # bounded: changed rows only
        n_ch = ch.count()

        winners_files = []
        delete_files = []
        if n_ch:
            live = ch.filter(F.col("_change_type") != "delete").select(*payload)
            win_tmp = os.path.join(dest, f"_win_tmp_{seq}")
            shutil.rmtree(win_tmp, ignore_errors=True)  # crashed attempt
            live.coalesce(max(1, min(8, n_ch // 500_000 + 1))).write.parquet(win_tmp)
            winners_files = _collect_parquet_dir(win_tmp, data_dir, f"w{seq:04d}-")
            dels = ch.select(*keys)
            del_tmp = os.path.join(dest, f"_del_tmp_{seq}")
            shutil.rmtree(del_tmp, ignore_errors=True)
            dels.coalesce(max(1, min(8, n_ch // 2_000_000 + 1))).write.parquet(del_tmp)
            delete_files = _collect_parquet_dir(del_tmp, data_dir, f"ed{seq:04d}-")

        # manifest list = carried-forward manifests + this publish's new ones
        snap_prev = next(
            s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
        )
        _, manifests = read_ocf(_strip_uri(snap_prev["manifest-list"]))
        manifests = list(manifests)
        if winners_files:
            manifests.append(
                _manifest_file(
                    meta_dir, f"data{seq}", winners_files, 0, seq,
                    snapshot_id_out, key_ids, ice_schema,
                )
            )
        if delete_files:
            manifests.append(
                _manifest_file(
                    meta_dir, f"del{seq}", delete_files, 1, seq,
                    snapshot_id_out, key_ids, ice_schema,
                )
            )
        op_label = "overwrite" if delete_files else "append"
        n_added_data = len(winners_files)

    list_path = os.path.join(
        meta_dir, f"snap-{snapshot_id_out}-1-{uuid.uuid4().hex}.avro"
    )
    write_ocf(list_path, _MANIFEST_LIST_SCHEMA, manifests)

    snap_entry = {
        "snapshot-id": snapshot_id_out,
        "parent-snapshot-id": md["current-snapshot-id"],
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": _uri(list_path),
        "summary": {
            "operation": op_label,
            "added-data-files": str(n_added_data),
            "added-delete-files": str(len(delete_files)),
            "delta-spark.lake-snapshot-id": str(cur_sid),
        },
        "schema-id": schema_id,
    }
    new_md = {
        **md,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": max(
            md["last-column-id"], max(f["id"] for f in fields)
        ),
        "current-schema-id": schema_id,
        "schemas": schemas,
        "properties": {
            **md.get("properties", {}),
            "schema.name-mapping.default": json.dumps(
                _name_mapping(meta, fields)
            ),
            "delta-spark.lake-snapshot-id": str(cur_sid),
            # monotone lineage epoch: bumped on every REPLACE so the
            # change-feed squash guard survives snapshot-log pruning
            # (expire_iceberg may drop the replace snapshot itself)
            "delta-spark.squash-count": str(
                int(md.get("properties", {}).get("delta-spark.squash-count", "0"))
                + (1 if op_label == "replace" else 0)
            ),
        },
        "current-snapshot-id": snapshot_id_out,
        "refs": {"main": {"snapshot-id": snapshot_id_out, "type": "branch"}},
        "snapshots": md["snapshots"] + [snap_entry],
        "snapshot-log": md["snapshot-log"]
        + [{"snapshot-id": snapshot_id_out, "timestamp-ms": now_ms}],
        # capped like Iceberg's write.metadata.previous-versions-max:
        # un-capped, a per-micro-batch publisher makes every metadata
        # file carry the full publish history (O(K^2) cumulative bytes)
        "metadata-log": (md["metadata-log"]
        + [
            {
                "timestamp-ms": md["last-updated-ms"],
                "metadata-file": _uri(prev_path),
            }
        ])[-100:],
    }
    try:
        new_path = _claim_metadata_version(meta_dir, v + 1, new_md)
    except FileExistsError:
        # v+1 exists but the hint still says v: a writer (possibly a
        # previous incarnation of THIS publisher) died in the
        # claim→hint window. Adopt its complete file, then retry this
        # publish on top of it — never wedge the destination.
        _adopt_orphan_version(meta_dir, v + 1)
        return publish_iceberg(
            table, dest, squash=squash,
            squash_after_deletes=squash_after_deletes,
        )
    with open(hint, "w") as f:
        f.write(str(v + 1))
    return new_path


# ------------------------------------------------------------ consume
#
# An INDEPENDENT Iceberg reader (stdlib + pyarrow schema sniff +
# DuckDB): walks metadata.json → manifest list → manifests exactly as
# the spec prescribes, applies name mapping and equality-delete
# sequence semantics, and emits one SQL statement. It reads NOTHING
# from the lake's own metadata — only the exported Iceberg files —
# which is what makes it a valid stand-in for pyiceberg in this
# offline sandbox.


def _strip_uri(p: str) -> str:
    return p[len("file://"):] if p.startswith("file://") else p


def scan_files(metadata_path: str) -> dict:
    """Resolve an Iceberg metadata.json to its current snapshot's data
    and delete files: {schema, name_mapping, data: [(path, seq)],
    deletes: [(path, seq, equality_ids)]}."""
    with open(metadata_path) as f:
        md = json.load(f)
    schema = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    mapping = json.loads(
        md.get("properties", {}).get("schema.name-mapping.default", "[]")
    )
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, manifests = read_ocf(_strip_uri(snap["manifest-list"]))
    data, deletes = [], []
    for m in manifests:
        _, entries = read_ocf(_strip_uri(m["manifest_path"]))
        for e in entries:
            if e["status"] == 2:  # DELETED entry: file left the table
                continue
            df = e["data_file"]
            seq = e["sequence_number"]
            if seq is None:
                seq = m["sequence_number"]  # v2 inheritance
            if df["content"] == 0:
                data.append((_strip_uri(df["file_path"]), seq))
            elif df["content"] == 2:
                deletes.append(
                    (_strip_uri(df["file_path"]), seq, df["equality_ids"] or [])
                )
            else:
                raise NotImplementedError("position deletes not produced here")
    return {
        "schema": schema,
        "name_mapping": mapping,
        "data": data,
        "deletes": deletes,
    }


def _file_select(path: str, seq: int, fields: list[dict], mapping: list[dict]) -> str:
    """SELECT aligning one parquet file to the table schema: resolve
    each field by current name, then by any mapped historical name
    (file written pre-rename), else NULL; cast to the table type
    (int→long etc. — Iceberg type promotion)."""
    import pyarrow.parquet as pq

    have = set(pq.read_schema(path).names)
    names_of = {m["field-id"]: m["names"] for m in mapping}
    cols = []
    for f in fields:
        src = None
        for cand in (f["name"], *names_of.get(f["id"], [])):
            if cand in have:
                src = cand
                break
        dt = _duck_of_ice(f["type"])
        q = '"' + f["name"].replace('"', '""') + '"'
        if src is None:
            cols.append(f"CAST(NULL AS {dt}) AS {q}")
        else:
            qs = '"' + src.replace('"', '""') + '"'
            cols.append(f"CAST({qs} AS {dt}) AS {q}")
    cols.append(f"CAST({seq} AS BIGINT) AS __seq")
    lit = "'" + path.replace("'", "''") + "'"
    return f"SELECT {', '.join(cols)} FROM read_parquet({lit})"


def iceberg_scan_sql(metadata_path: str) -> str:
    """One DuckDB SQL statement reading the exported Iceberg table:
    union of data files, minus rows matched by an equality delete of a
    strictly higher data sequence number (the v2 MoR read)."""
    scan = scan_files(metadata_path)
    fields = scan["schema"]["fields"]
    mapping = scan["name_mapping"]
    if not scan["data"]:
        null_sel = ", ".join(
            f'CAST(NULL AS {_duck_of_ice(f["type"])}) AS "{f["name"]}"'
            for f in fields
        )
        return f"SELECT {null_sel} WHERE FALSE"
    data_sql = "\nUNION ALL BY NAME\n".join(
        _file_select(p, seq, fields, mapping) for p, seq in scan["data"]
    )
    out_cols = ", ".join('"' + f["name"].replace('"', '""') + '"' for f in fields)
    if not scan["deletes"]:
        return f"SELECT {out_cols} FROM (\n{data_sql}\n)"
    by_name = {f["id"]: f for f in fields}
    eq_ids = scan["deletes"][0][2]
    if any(tuple(d[2]) != tuple(eq_ids) for d in scan["deletes"]):
        raise NotImplementedError("heterogeneous equality_ids")
    key_fields = [by_name[i] for i in eq_ids]
    del_sql = "\nUNION ALL BY NAME\n".join(
        _file_select(p, seq, key_fields, mapping) for p, seq, _ in scan["deletes"]
    )
    on = " AND ".join(
        f'd."{f["name"]}" IS NOT DISTINCT FROM x."{f["name"]}"' for f in key_fields
    )
    return (
        f"SELECT {out_cols} FROM (\n{data_sql}\n) d\n"
        f"WHERE NOT EXISTS (SELECT 1 FROM (\n{del_sql}\n) x\n"
        f"WHERE {on} AND x.__seq > d.__seq)"
    )


def read_iceberg_duckdb(metadata_path: str, con=None):
    """Read an exported Iceberg table through DuckDB (no Spark)."""
    import duckdb

    sql = iceberg_scan_sql(metadata_path)
    return (con or duckdb).sql(sql)


_SPARK_OF_ICE = {
    "string": "string",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz",
    "date": "date",
    "binary": "binary",
}




def _spark_type_of(t: str) -> str:
    """Iceberg type string → Spark DDL type (shared by both Spark
    readers — one mapping, one place to extend)."""
    if t in _SPARK_OF_ICE:
        return _SPARK_OF_ICE[t]
    if t.startswith("decimal("):
        return "decimal(" + t[len("decimal("):]
    raise ValueError(f"no Spark mapping for Iceberg type {t!r}")


def _union_parquet(spark, files, flds, names_of):
    """Union (path, seq) parquet files into one DataFrame aligned to
    ``flds`` + a ``__seq`` column, grouping files by (resolved source
    column per field, seq) so the scan count is O(schema epochs), not
    O(files). Shared by both Spark readers — the name-mapping
    resolution must never diverge between the full read and the feed."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    groups: dict[tuple, list[str]] = {}
    for path, seq in files:
        sch = pq.read_schema(path)
        have = set(sch.names)
        srcs, phys = [], []
        for f in flds:
            src = None
            for cand in (f["name"], *names_of.get(f["id"], [])):
                if cand in have:
                    src = cand
                    break
            srcs.append(src)
            # group ALSO by physical type: a widen (int→long) leaves
            # old int32 and rewritten int64 files at the SAME data
            # sequence under the same name — one spark.read.parquet
            # over both trips the vectorized reader; per-type groups
            # let the cast apply Iceberg's promotion per file layout
            phys.append(
                str(sch.field(src).type) if src is not None else None
            )
        groups.setdefault((tuple(srcs), tuple(phys), seq), []).append(path)
    parts = []
    for (srcs, _phys, seq), paths in groups.items():
        df = spark.read.parquet(*paths)
        cols = [
            (F.col(src) if src is not None else F.lit(None))
            .cast(_spark_type_of(f["type"]))
            .alias(f["name"])
            for f, src in zip(flds, srcs)
        ]
        cols.append(F.lit(seq).cast("long").alias("__seq"))
        parts.append(df.select(*cols))
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return out


def read_iceberg_spark(metadata_path: str, spark):
    """Read an exported Iceberg table as a Spark DataFrame — the same
    plan a Spark+Iceberg runtime produces for a v2 MoR read: union the
    data files (grouped by physical column layout so the scan count is
    O(schema epochs), not O(files)), then one left-anti join against
    the equality-delete files restricted to strictly-older data
    sequence numbers. Driven ONLY by the exported Iceberg metadata."""
    from pyspark.sql import functions as F

    scan = scan_files(metadata_path)
    fields = scan["schema"]["fields"]
    mapping = scan["name_mapping"]
    names_of = {m["field-id"]: m["names"] for m in mapping}
    _spark_type = _spark_type_of

    def _union(files, flds):
        return _union_parquet(spark, files, flds, names_of)

    if not scan["data"]:
        ddl = ", ".join(
            f"`{f['name']}` {_spark_type(f['type'])}" for f in fields
        )
        return spark.createDataFrame([], ddl)
    data = _union(scan["data"], fields)
    out_cols = [f["name"] for f in fields]
    if scan["deletes"]:
        by_id = {f["id"]: f for f in fields}
        eq_ids = scan["deletes"][0][2]
        key_fields = [by_id[i] for i in eq_ids]
        dels = _union([(p, s) for p, s, _ in scan["deletes"]], key_fields)
        d = data.alias("d")
        x = dels.alias("x")
        cond = F.col("x.__seq") > F.col("d.__seq")
        for f in key_fields:
            cond = cond & F.col(f"d.{f['name']}").eqNullSafe(
                F.col(f"x.{f['name']}")
            )
        data = d.join(x, on=cond, how="left_anti")
    return data.select(*out_cols)


# ------------------------------------------------------ change feed
#
# The published Iceberg table is ALSO an incremental CDC source: each
# incremental publish adds data files (the winning rows) and one
# equality-delete file (every changed key) at a fresh sequence number,
# so the NET CHANGE between two published metadata versions is fully
# derivable from the artifacts alone — no access to the lake table.
# Semantics: one row per key whose winner changed in the range;
# ``_change_type`` ∈ upsert / delete (artifacts carry no before-image,
# so insert-vs-update is not distinguished); deletes carry key columns
# only (payload NULL) and may include at-least-once tombstones for
# keys created AND deleted inside the range — idempotent for any MERGE
# consumer. Mirrors the engine's read_changes/interop.changes_sql at
# the published layer.


def _changed_files(dest: str, from_version: int, to_version: int | None):
    """Resolve the (data, delete) files ADDED between two metadata
    versions of one published destination, plus the TO schema/mapping.
    Raises on a squash (REPLACE) snapshot inside the range — a replace
    rewrites the file set, so a file diff is no longer a change feed."""
    meta_dir = os.path.join(dest, "metadata")
    if to_version is None:
        with open(os.path.join(meta_dir, "version-hint.text")) as f:
            to_version = int(f.read().strip())
    if from_version >= to_version:
        raise ValueError(
            f"from_version {from_version} must be < to_version {to_version}"
        )
    from_path = os.path.join(meta_dir, f"v{from_version}.metadata.json")
    to_path = os.path.join(meta_dir, f"v{to_version}.metadata.json")
    with open(from_path) as f:
        md_a = json.load(f)
    seq_from = md_a["last-sequence-number"]
    with open(to_path) as f:
        md_b = json.load(f)
    # squash-count property is the retention-proof detector: the
    # replace snapshot itself may have been pruned from md_b's
    # snapshot log by expire_iceberg's keep_last_snapshots
    sq_a = int(md_a.get("properties", {}).get("delta-spark.squash-count", "0"))
    sq_b = int(md_b.get("properties", {}).get("delta-spark.squash-count", "0"))
    if sq_b != sq_a:
        raise NotImplementedError(
            f"a squash (REPLACE) happened in ({from_version}, "
            f"{to_version}] (lineage epoch {sq_a} -> {sq_b}); a file "
            "diff is no longer a change feed — read the full state at "
            "to_version instead"
        )
    for s in md_b["snapshots"]:
        if (
            s["sequence-number"] > seq_from
            and s.get("summary", {}).get("operation") == "replace"
        ):
            raise NotImplementedError(
                f"snapshot {s['snapshot-id']} in range is a squash "
                "(REPLACE); read the full state at to_version instead"
            )
    scan = scan_files(to_path)
    data = [(p, s) for p, s in scan["data"] if s > seq_from]
    deletes = [(p, s, ids) for p, s, ids in scan["deletes"] if s > seq_from]
    return data, deletes, scan["schema"], scan["name_mapping"]


def iceberg_changes_sql(
    dest: str, from_version: int, to_version: int | None = None
) -> str:
    """One DuckDB statement emitting the change feed between two
    published metadata versions (Spark-free): surviving new data rows
    (not matched by a strictly-newer delete in the range) become
    upserts; changed keys with no survivor become deletes."""
    data, deletes, schema, mapping = _changed_files(
        dest, from_version, to_version
    )
    fields = schema["fields"]
    by_id = {f["id"]: f for f in fields}
    eq_ids = deletes[0][2] if deletes else []
    key_fields = [by_id[i] for i in eq_ids]
    out_cols = ", ".join('"' + f["name"].replace('"', '""') + '"' for f in fields)
    null_payload = ", ".join(
        f'CAST(NULL AS {_duck_of_ice(f["type"])}) AS "{f["name"]}"'
        for f in fields
        if f not in key_fields
    )
    # empty SELECTs must be TYPED NULL casts with aliases — bare column
    # names without a FROM clause are a DuckDB binder error (hit on
    # deletes-only and schema-evolution-only publish ranges)
    null_all = ", ".join(
        f'CAST(NULL AS {_duck_of_ice(f["type"])}) AS "{f["name"]}"'
        for f in fields
    )
    if not data and not deletes:
        return (
            f"SELECT {null_all}, CAST(NULL AS VARCHAR) AS _change_type "
            "WHERE FALSE"
        )
    data_sql = "\nUNION ALL BY NAME\n".join(
        _file_select(p, seq, fields, mapping) for p, seq in data
    ) or f"SELECT {null_all}, CAST(NULL AS BIGINT) AS __seq WHERE FALSE"
    del_sql = "\nUNION ALL BY NAME\n".join(
        _file_select(p, seq, key_fields, mapping) for p, seq, _ in deletes
    )
    on = " AND ".join(
        f'd."{f["name"]}" IS NOT DISTINCT FROM x."{f["name"]}"'
        for f in key_fields
    )
    surv = (
        f"SELECT {out_cols} FROM (\n{data_sql}\n) d\n"
        f"WHERE NOT EXISTS (SELECT 1 FROM (\n{del_sql}\n) x "
        f"WHERE {on} AND x.__seq > d.__seq)"
        if deletes
        else f"SELECT {out_cols} FROM (\n{data_sql}\n)"
    )
    if not deletes:
        return f"SELECT *, 'upsert' AS _change_type FROM (\n{surv}\n)"
    key_cols = ", ".join(f'"{f["name"]}"' for f in key_fields)
    on_k = " AND ".join(
        f'k."{f["name"]}" IS NOT DISTINCT FROM u."{f["name"]}"'
        for f in key_fields
    )
    sep = ", " if null_payload else ""
    return (
        f"WITH surv AS (\n{surv}\n)\n"
        f"SELECT *, 'upsert' AS _change_type FROM surv\n"
        f"UNION ALL BY NAME\n"
        f"SELECT {key_cols}{sep}{null_payload}, 'delete' AS _change_type\n"
        f"FROM (SELECT DISTINCT {key_cols} FROM (\n{del_sql}\n)) k\n"
        f"WHERE NOT EXISTS (SELECT 1 FROM surv u WHERE {on_k})"
    )


def read_iceberg_changes_spark(
    dest: str, from_version: int, spark, to_version: int | None = None
):
    """The same change feed as a Spark DataFrame — new data files union
    minus strictly-newer range deletes (upserts), plus keys with no
    survivor (deletes, payload NULL). Driven only by published
    metadata."""
    from pyspark.sql import functions as F

    data, deletes, schema, mapping = _changed_files(
        dest, from_version, to_version
    )
    fields = schema["fields"]
    by_id = {f["id"]: f for f in fields}
    eq_ids = deletes[0][2] if deletes else []
    key_fields = [by_id[i] for i in eq_ids]
    names_of = {m["field-id"]: m["names"] for m in mapping}

    _spark_type = _spark_type_of

    def _union(files, flds):
        return _union_parquet(spark, files, flds, names_of)

    empty_ddl = ", ".join(
        f"`{f['name']}` {_spark_type(f['type'])}" for f in fields
    )
    if not data and not deletes:
        return spark.createDataFrame([], empty_ddl + ", `_change_type` string")
    if data:
        d = _union(data, fields)
    else:
        d = spark.createDataFrame([], empty_ddl + ", `__seq` bigint")
    out_cols = [f["name"] for f in fields]
    if not deletes:
        return d.select(*out_cols).withColumn("_change_type", F.lit("upsert"))
    x = _union([(p, s) for p, s, _ in deletes], key_fields)
    cond = F.col("x.__seq") > F.col("d.__seq")
    for f in key_fields:
        cond = cond & F.col(f"d.{f['name']}").eqNullSafe(F.col(f"x.{f['name']}"))
    surv = d.alias("d").join(x.alias("x"), on=cond, how="left_anti").select(*out_cols)
    key_names = [f["name"] for f in key_fields]
    del_keys = (
        x.select(*key_names)
        .distinct()
        .join(surv.select(*key_names), on=key_names, how="left_anti")
    )
    payload_nulls = [
        F.lit(None).cast(_spark_type(f["type"])).alias(f["name"])
        for f in fields
        if f["name"] not in key_names
    ]
    dels = del_keys.select(*key_names, *payload_nulls).select(*out_cols)
    return surv.withColumn("_change_type", F.lit("upsert")).unionByName(
        dels.withColumn("_change_type", F.lit("delete"))
    )


# ------------------------------------------------------ maintenance


def expire_iceberg(
    dest: str,
    keep_last_versions: int = 10,
    orphan_age_s: float = 3600.0,
    dry_run: bool = False,
    keep_last_snapshots: int = 50,
) -> dict:
    """Lifecycle maintenance for a published destination, mirroring the
    lake's expire_snapshots + remove_orphans (and Iceberg's own
    expireSnapshots, which REWRITES metadata):

      * prune the CURRENT metadata's snapshot list to the newest
        ``keep_last_snapshots`` entries (a continuous publisher appends
        one per micro-batch forever; without pruning, every historical
        manifest stays reachable from the current version and no
        superseded data file can ever be reclaimed) — written as a new
        metadata version through the same ``open(x)`` claim publishers
        use;
      * retire metadata versions older than the newest
        ``keep_last_versions`` (their snapshots stop being
        time-travelable);
      * delete ``data/`` and ``metadata/`` files REFERENCED BY NO
        retained metadata version (crashed-publish leftovers — files
        written before the metadata claim — and files only retired
        versions or pruned snapshots referenced), but only when older
        than ``orphan_age_s`` so an in-flight publish's fresh files
        are never swept.

    Returns counts; ``dry_run`` reports without deleting or pruning.
    Safe under the publish protocol: a publisher writes data files
    first and claims the metadata version LAST, so anything
    unreferenced and old is garbage by construction."""
    meta_dir = os.path.join(dest, "metadata")
    data_dir = os.path.join(dest, "data")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        cur_v = int(f.read().strip())

    pruned_snapshots = 0
    if keep_last_snapshots and not dry_run:
        cur_path = os.path.join(meta_dir, f"v{cur_v}.metadata.json")
        with open(cur_path) as f:
            md = json.load(f)
        if len(md["snapshots"]) > keep_last_snapshots:
            snaps = md["snapshots"][-keep_last_snapshots:]
            kept_ids = {s["snapshot-id"] for s in snaps}
            assert md["current-snapshot-id"] in kept_ids
            pruned_snapshots = len(md["snapshots"]) - len(snaps)
            now_ms = int(time.time() * 1000)
            new_md = {
                **md,
                "snapshots": snaps,
                "snapshot-log": [
                    e
                    for e in md["snapshot-log"]
                    if e["snapshot-id"] in kept_ids
                ],
                "last-updated-ms": now_ms,
                "metadata-log": (md["metadata-log"]
                + [
                    {
                        "timestamp-ms": md["last-updated-ms"],
                        "metadata-file": _uri(cur_path),
                    }
                ])[-100:],
            }
            # same atomic claim publishers use; an orphan v-file from a
            # crashed claim→hint window is adopted, not a dead end
            try:
                _claim_metadata_version(meta_dir, cur_v + 1, new_md)
                with open(
                    os.path.join(meta_dir, "version-hint.text"), "w"
                ) as f:
                    f.write(str(cur_v + 1))
            except FileExistsError:
                # someone else's complete claim: publish THEIR version;
                # our prune is stale against it — drop it (the next
                # scheduled run prunes on top), never overwrite a claim
                _adopt_orphan_version(meta_dir, cur_v + 1)
                pruned_snapshots = 0
            cur_v += 1
    versions = sorted(
        int(p[1:-len(".metadata.json")])
        for p in os.listdir(meta_dir)
        if p.startswith("v") and p.endswith(".metadata.json")
    )
    keep = [v for v in versions if v > cur_v - keep_last_versions]
    if cur_v not in keep:
        keep.append(cur_v)

    referenced: set[str] = set()
    for v in keep:
        md_path = os.path.join(meta_dir, f"v{v}.metadata.json")
        referenced.add(os.path.abspath(md_path))
        with open(md_path) as f:
            md = json.load(f)
        for s in md["snapshots"]:
            lp = _strip_uri(s["manifest-list"])
            referenced.add(os.path.abspath(lp))
            if not os.path.exists(lp):
                continue
            _, manifests = read_ocf(lp)
            for m in manifests:
                mp = _strip_uri(m["manifest_path"])
                referenced.add(os.path.abspath(mp))
                if not os.path.exists(mp):
                    continue
                _, entries = read_ocf(mp)
                for e in entries:
                    referenced.add(
                        os.path.abspath(_strip_uri(e["data_file"]["file_path"]))
                    )

    now = time.time()
    removed_files, expired = 0, []
    for root in (data_dir, meta_dir):
        if not os.path.isdir(root):
            continue
        for p in os.listdir(root):
            full = os.path.abspath(os.path.join(root, p))
            if p == "version-hint.text" or full in referenced:
                continue
            try:
                if now - os.path.getmtime(full) < orphan_age_s:
                    continue
            except OSError:
                continue
            removed_files += 1
            if p.endswith(".metadata.json"):
                expired.append(int(p[1:-len(".metadata.json")]))
            if not dry_run:
                os.remove(full)
    return {
        "current_version": cur_v,
        "retained_versions": keep,
        "expired_versions": sorted(expired),
        "removed_files": removed_files,
        "pruned_snapshots": pruned_snapshots,
        "dry_run": dry_run,
    }
