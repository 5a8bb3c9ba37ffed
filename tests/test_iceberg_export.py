"""Iceberg-compatible export (lake/iceberg.py): a LakeTable snapshot
published as a standard Iceberg v2 table — metadata.json + Avro
manifest list/manifests + parquet data and equality-delete files —
and read back row-equal by an INDEPENDENT consumer that walks ONLY
the exported Iceberg structures (no pyiceberg ships in this sandbox;
the consumer is the constructive ecosystem-readability proof).

Reference analog: targets must be consumable by the wider ecosystem
(delta-api/.../EventConsumer.java:39-76)."""

import datetime
import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.lake.avro import read_ocf
from delta_spark.lake.iceberg import (
    export_iceberg,
    iceberg_scan_sql,
    read_iceberg_duckdb,
    scan_files,
)
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 3, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _mk(spark, path, n=6):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 8
    )
    rows = [
        (f"c{i}", j, "user", f"v1 {i}.{j}", "", TS, "INSERT", i * 10 + j + 1)
        for i in range(n)
        for j in range(3)
    ]
    t.merge(spark.createDataFrame(rows, DDL), "w", "b0")
    return t


def _rows_equal(spark_df, duck_rel):
    want = sorted(tuple(r) for r in spark_df.collect())
    got = sorted(tuple(r) for r in duck_rel.fetchall())
    assert len(want) == len(got), (len(want), len(got))
    for a, b in zip(want, got):
        assert a == b, (a, b)


def test_zero_copy_export_of_cow_table(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    mp = export_iceberg(t, str(tmp_path / "ice"))
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    # pure CoW snapshot: no winners / deletes, sequence stays 1, and
    # every data file is a HARD LINK of the lake's own file (zero-copy)
    with open(mp) as f:
        md = json.load(f)
    assert md["format-version"] == 2
    assert md["last-sequence-number"] == 1
    scan = scan_files(mp)
    assert scan["deletes"] == []
    src_inodes = {
        os.stat(os.path.join(t.path, e["path"])).st_ino
        for e in t.current_snapshot["files"]
    }
    for p, _seq in scan["data"]:
        assert os.stat(p).st_ino in src_inodes, p


def test_export_mor_tombstones_and_rename(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    upd = [
        ("c1", 0, "assistant", "v2", "", TS, "UPDATE", 1000),
        ("c2", 1, None, None, None, None, "DELETE", 1001),
        ("c9", 0, "user", "new", "", TS, "INSERT", 1002),
    ]
    t.merge(spark.createDataFrame(upd, DDL), "w", "b1", mode="mor")
    t.apply_ddl(
        {"op": "RENAME_COLUMN", "column": "conv_id", "new_name": "conversation_id"}
    )
    t = t.refresh()
    mp = export_iceberg(t, str(tmp_path / "ice"))
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    # the Spark-side consumer (what a Spark+Iceberg runtime plans)
    # agrees with both the DuckDB consumer and the engine read
    from delta_spark.lake.iceberg import read_iceberg_spark

    got_spark = sorted(tuple(r) for r in read_iceberg_spark(mp, spark).collect())
    want = sorted(tuple(r) for r in t.read().collect())
    assert got_spark == want
    scan = scan_files(mp)
    # equality deletes at sequence 2 suppress the superseded base rows
    assert scan["deletes"] and all(seq == 2 for _p, seq, _ids in scan["deletes"])
    key_ids = t.metadata["key_ids"]
    assert all(ids == key_ids for _p, _seq, ids in scan["deletes"])
    # name mapping carries the pre-rename name for the zero-copy files
    with open(mp) as f:
        md = json.load(f)
    mapping = json.loads(md["properties"]["schema.name-mapping.default"])
    m = next(e for e in mapping if "conversation_id" in e["names"])
    assert "conv_id" in m["names"]


def test_export_after_compact_suppresses_base_tombstones(spark, tmp_path):
    """Post-compact the table is delta-free but base files RETAIN
    tombstones (the seq guard); the export must find them via the
    _deleted footer stats and emit the equality delete."""
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(
        spark.createDataFrame(
            [("c2", 1, None, None, None, None, "DELETE", 900)], DDL
        ),
        "w",
        "b1",
        mode="mor",
    )
    assert t.compact(max_files_per_bucket=1) > 0
    t = t.refresh()
    assert all(f.get("kind") != "delta" for f in t.current_snapshot["files"])
    mp = export_iceberg(t, str(tmp_path / "ice"))
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    got = read_iceberg_duckdb(mp).df()
    assert not ((got["conv_id"] == "c2") & (got["turn_idx"] == 1)).any()


def test_export_across_rebucket_spec_evolution(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    assert t.rebucket(16)
    t = t.refresh()
    t.merge(
        spark.createDataFrame(
            [("c3", 0, "user", "post-rebucket", "", TS, "UPDATE", 5000)], DDL
        ),
        "w",
        "b1",
        mode="mor",
    )
    t = t.refresh()
    mp = export_iceberg(t, str(tmp_path / "ice"))
    _rows_equal(t.read(), read_iceberg_duckdb(mp))


def test_export_time_travel_snapshot(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    sid = t.metadata["current_snapshot_id"]
    t.merge(
        spark.createDataFrame(
            [("c0", 0, "user", "after", "", TS, "UPDATE", 7000)], DDL
        ),
        "w",
        "b1",
        mode="mor",
    )
    t = t.refresh()
    mp = export_iceberg(t, str(tmp_path / "ice"), snapshot_id=sid)
    _rows_equal(t.read(snapshot_id=sid), read_iceberg_duckdb(mp))
    got = read_iceberg_duckdb(mp).df()
    assert "after" not in set(got["text"])


def test_export_empty_table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], "conv_id", 8,
    )
    mp = export_iceberg(t, str(tmp_path / "ice"))
    assert read_iceberg_duckdb(mp).fetchall() == []


def test_manifest_list_avro_structure(spark, tmp_path):
    """Decode the manifest list through the independent Avro reader
    and check the spec-required v2 fields and their values."""
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 1, None, None, None, None, "DELETE", 999),
                ("c2", 0, "user", "v2", "", TS, "UPDATE", 998),
            ],
            DDL,
        ),
        "w",
        "b1",
        mode="mor",
    )
    mp = export_iceberg(t.refresh(), str(tmp_path / "ice"))
    with open(mp) as f:
        md = json.load(f)
    snap = md["snapshots"][0]
    assert snap["snapshot-id"] == md["current-snapshot-id"]
    schema, manifests = read_ocf(snap["manifest-list"][len("file://"):])
    assert schema["name"] == "manifest_file"
    by_fid = {f["field-id"]: f["name"] for f in schema["fields"]}
    assert by_fid[500] == "manifest_path" and by_fid[517] == "content"
    contents = sorted(m["content"] for m in manifests)
    assert contents == [0, 0, 1]  # base data, winners data, deletes
    for m in manifests:
        assert os.path.getsize(m["manifest_path"][len("file://"):]) == (
            m["manifest_length"]
        )
        assert m["added_snapshot_id"] == snap["snapshot-id"]
        # manifest header carries the spec-required properties
        import io

        from delta_spark.lake.avro import _MAGIC, _decode

        with open(m["manifest_path"][len("file://"):], "rb") as f:
            buf = io.BytesIO(f.read())
        assert buf.read(4) == _MAGIC
        hdr = _decode(buf, {"type": "map", "values": "bytes"}, {})
        assert hdr["format-version"] == b"2"
        assert hdr["content"] in (b"data", b"deletes")
        assert json.loads(hdr["schema"])["type"] == "struct"


def test_equality_delete_sequence_is_strict(spark, tmp_path):
    """Winners live at the SAME sequence as the delete file; the
    strictly-greater rule must keep them (a >= comparison would wipe
    every re-emitted row)."""
    t = _mk(spark, str(tmp_path / "t"), n=2)
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "user", "v2 winner", "", TS, "UPDATE", 800)], DDL
        ),
        "w",
        "b1",
        mode="mor",
    )
    mp = export_iceberg(t.refresh(), str(tmp_path / "ice"))
    sql = iceberg_scan_sql(mp)
    assert "x.__seq > d.__seq" in sql
    got = duckdb.sql(sql).df().set_index(["conv_id", "turn_idx"])
    assert got.loc[("c1", 0), "text"] == "v2 winner"


def test_export_widened_column_promotion(spark, tmp_path):
    """Files written before a WIDEN (int→bigint) read through Iceberg
    type promotion: table schema says long, old files store int32."""
    t = _mk(spark, str(tmp_path / "t"), n=3)
    t.apply_ddl({"op": "WIDEN_COLUMN", "column": "turn_idx", "new_type": "bigint"})
    t = t.refresh()
    t.merge(
        spark.createDataFrame(
            [("c9", 2**33, "user", "wide", "", TS, "INSERT", 9000)],
            "conv_id string, turn_idx long, role string, text string, "
            "tool string, ts timestamp, op string, seq long",
        ),
        "w",
        "b1",
        mode="mor",
    )
    t = t.refresh()
    mp = export_iceberg(t, str(tmp_path / "ice"))
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    with open(mp) as f:
        md = json.load(f)
    fld = next(
        f for f in md["schemas"][0]["fields"] if f["name"] == "turn_idx"
    )
    assert fld["type"] == "long"


# ---------------------------------------------------- continuous publish


def test_publish_incremental_tracks_commits(spark, tmp_path):
    """publish_iceberg keeps an Iceberg table in lockstep with the lake
    table: each call appends ONE snapshot holding exactly the changed
    keys; both independent consumers read every published version equal
    to the engine state at that publish."""
    from delta_spark.lake.iceberg import publish_iceberg, read_iceberg_spark

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    mp1 = publish_iceberg(t.refresh(), ice)
    assert mp1.endswith("v1.metadata.json")
    _rows_equal(t.read(), read_iceberg_duckdb(mp1))

    # idempotent: no new lake commit → same metadata version back
    assert publish_iceberg(t.refresh(), ice) == mp1

    upd = [
        ("c1", 0, "assistant", "v2", "", TS, "UPDATE", 1000),
        ("c2", 1, None, None, None, None, "DELETE", 1001),
        ("c9", 0, "user", "new", "", TS, "INSERT", 1002),
    ]
    t.merge(spark.createDataFrame(upd, DDL), "w", "b1", mode="mor")
    t = t.refresh()
    mp2 = publish_iceberg(t, ice)
    assert mp2.endswith("v2.metadata.json")
    _rows_equal(t.read(), read_iceberg_duckdb(mp2))
    got_spark = sorted(tuple(r) for r in read_iceberg_spark(mp2, spark).collect())
    assert got_spark == sorted(tuple(r) for r in t.read().collect())

    # the snapshot chain and metadata-log link versions together
    with open(mp2) as f:
        md = json.load(f)
    assert len(md["snapshots"]) == 2 and len(md["snapshot-log"]) == 2
    assert md["metadata-log"][-1]["metadata-file"].endswith("v1.metadata.json")
    s2 = next(
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    )
    assert s2["parent-snapshot-id"] is not None
    assert s2["summary"]["operation"] == "overwrite"

    # TIME TRAVEL: the previous metadata version still reads the
    # pre-update state (c1/0 at v1, c2/1 present, no c9)
    old = read_iceberg_duckdb(mp1).df()
    assert ((old["conv_id"] == "c2") & (old["turn_idx"] == 1)).any()
    assert not (old["conv_id"] == "c9").any()
    new = read_iceberg_duckdb(mp2).df()
    assert not ((new["conv_id"] == "c2") & (new["turn_idx"] == 1)).any()
    assert (new["conv_id"] == "c9").any()


def test_publish_incremental_cost_and_manifest_reuse(spark, tmp_path):
    """An incremental publish writes only O(changed-keys) new files and
    carries prior manifests forward BY REFERENCE — the bootstrap data
    files are neither rewritten nor re-manifested."""
    from delta_spark.lake.iceberg import publish_iceberg

    t = _mk(spark, str(tmp_path / "t"), n=8)
    ice = str(tmp_path / "ice")
    mp1 = publish_iceberg(t.refresh(), ice)
    scan1 = scan_files(mp1)
    data_dir = os.path.join(ice, "data")
    files_before = set(os.listdir(data_dir))

    t.merge(
        spark.createDataFrame(
            [("c3", 0, "assistant", "touched", "", TS, "UPDATE", 5000)], DDL
        ),
        "w",
        "b1",
        mode="mor",
    )
    mp2 = publish_iceberg(t.refresh(), ice)
    scan2 = scan_files(mp2)
    added = set(os.listdir(data_dir)) - files_before
    # exactly one winners file + one equality-delete file for 1 key
    assert len(added) == 2, added
    assert len(scan2["data"]) == len(scan1["data"]) + 1
    assert len(scan2["deletes"]) == 1
    # every v1 manifest rides into v2's manifest list untouched
    with open(mp1) as f:
        md1 = json.load(f)
    with open(mp2) as f:
        md2 = json.load(f)
    s1 = md1["snapshots"][0]
    s2 = next(
        s for s in md2["snapshots"] if s["snapshot-id"] == md2["current-snapshot-id"]
    )
    _, m1 = read_ocf(s1["manifest-list"][len("file://"):])
    _, m2 = read_ocf(s2["manifest-list"][len("file://"):])
    assert {m["manifest_path"] for m in m1} <= {m["manifest_path"] for m in m2}


def test_publish_schema_evolution_and_conflict(spark, tmp_path):
    """Rename + widen between publishes appends a new schema entry
    (old metadata versions keep reading with the old names); a racing
    publisher loses the open('x') claim on the next metadata version."""
    import pytest as _pytest

    from delta_spark.lake.iceberg import publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    mp1 = publish_iceberg(t.refresh(), ice)

    t.apply_ddl(
        {"op": "RENAME_COLUMN", "column": "conv_id", "new_name": "conversation_id"}
    )
    t = t.refresh()
    t.merge(
        spark.createDataFrame(
            [("c1", 1, "assistant", "v3", "", TS, "UPDATE", 2000)],
            DDL.replace("conv_id", "conversation_id"),
        ),
        "w",
        "b2",
        mode="mor",
    )
    t = t.refresh()
    mp2 = publish_iceberg(t, ice)
    with open(mp2) as f:
        md = json.load(f)
    assert [s["schema-id"] for s in md["schemas"]] == [0, 1]
    assert md["current-schema-id"] == 1
    _rows_equal(t.read(), read_iceberg_duckdb(mp2))
    assert "conversation_id" in read_iceberg_duckdb(mp2).df().columns
    assert "conv_id" in read_iceberg_duckdb(mp1).df().columns  # time travel

    # conflict: someone already claimed v3 → loud failure, not silent loss
    with open(os.path.join(ice, "metadata", "v3.metadata.json"), "x") as f:
        f.write("{}")
    t.merge(
        spark.createDataFrame(
            [("c2", 0, "assistant", "v4", "", TS, "UPDATE", 3000)],
            DDL.replace("conv_id", "conversation_id"),
        ),
        "w",
        "b3",
        mode="mor",
    )
    with _pytest.raises(FileExistsError):
        publish_iceberg(t.refresh(), ice)


def test_publish_expired_cursor_fails_loudly(spark, tmp_path):
    """If snapshot expiry removed the published cursor, publish must
    refuse with a clear re-export instruction, never emit a wrong
    incremental diff."""
    import pytest as _pytest

    from delta_spark.lake.iceberg import publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)
    for i in range(3):
        t.merge(
            spark.createDataFrame(
                [(f"c{i}", 0, "assistant", f"u{i}", "", TS, "UPDATE", 7000 + i)],
                DDL,
            ),
            "w",
            f"bx{i}",
            mode="mor",
        )
        t = t.refresh()
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    with _pytest.raises(ValueError, match="re-export"):
        publish_iceberg(t, ice)


def test_publish_squash_resets_delete_stack(spark, tmp_path):
    """Per-commit publishing stacks one equality-delete file per call
    (a v2 reader anti-joins ALL of them); the squash publish emits a
    REPLACE snapshot with a fresh manifest list, resetting the stack,
    while reads stay equal and old versions still time-travel."""
    from delta_spark.lake.iceberg import publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)
    for i in range(3):
        t.merge(
            spark.createDataFrame(
                [(f"c{i}", 0, "assistant", f"u{i}", "", TS, "UPDATE", 8000 + i)],
                DDL,
            ),
            "w",
            f"sq{i}",
            mode="mor",
        )
        t = t.refresh()
        mp = publish_iceberg(t, ice)
    assert len(scan_files(mp)["deletes"]) == 3  # one per incremental

    # threshold triggers automatically on the next publish
    t.merge(
        spark.createDataFrame(
            [("c4", 0, "assistant", "u4", "", TS, "UPDATE", 9000)], DDL
        ),
        "w",
        "sq4",
        mode="mor",
    )
    t = t.refresh()
    mp_sq = publish_iceberg(t, ice, squash_after_deletes=3)
    scan = scan_files(mp_sq)
    assert len(scan["deletes"]) <= 1  # stack reset
    _rows_equal(t.read(), read_iceberg_duckdb(mp_sq))
    with open(mp_sq) as f:
        md = json.load(f)
    cur = next(
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    )
    assert cur["summary"]["operation"] == "replace"
    # pre-squash version still time-travels with its full delete stack
    assert len(scan_files(mp)["deletes"]) == 3
    _rows_equal_count = len(read_iceberg_duckdb(mp).fetchall())
    assert _rows_equal_count == 18

    # forced squash with no new lake commits also works (maintenance)
    mp_sq2 = publish_iceberg(t.refresh(), ice, squash=True)
    assert mp_sq2 != mp_sq
    _rows_equal(t.read(), read_iceberg_duckdb(mp_sq2))


def test_publish_across_rebucket(spark, tmp_path):
    """Bucket-spec evolution between publishes: the incremental diff
    (read_changes) is rebucket-aware, so the published Iceberg state
    stays equal to the engine state across the spec change."""
    from delta_spark.lake.iceberg import publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)

    assert t.rebucket(16)
    t = t.refresh()
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "assistant", "post-rebucket", "", TS, "UPDATE", 4000),
                ("c7", 0, "user", "fresh", "", TS, "INSERT", 4001),
                ("c2", 2, None, None, None, None, "DELETE", 4002),
            ],
            DDL,
        ),
        "w",
        "rb1",
        mode="mor",
    )
    t = t.refresh()
    mp = publish_iceberg(t, ice)
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    got = read_iceberg_duckdb(mp).df()
    assert (got["text"] == "post-rebucket").any()
    assert not ((got["conv_id"] == "c2") & (got["turn_idx"] == 2)).any()


def test_iceberg_changes_feed_between_versions(spark, tmp_path):
    """The published Iceberg table is itself an incremental CDC source:
    the net change between two metadata versions is derived from the
    artifacts alone (new data files minus strictly-newer range deletes
    → upserts; changed keys with no survivor → deletes), identically
    via DuckDB SQL and the Spark reader. A squash in range refuses."""
    import duckdb as _duck

    from delta_spark.lake.iceberg import (
        iceberg_changes_sql,
        publish_iceberg,
        read_iceberg_changes_spark,
    )

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)  # v1
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "assistant", "v2", "", TS, "UPDATE", 1000),
                ("c2", 1, None, None, None, None, "DELETE", 1001),
                ("c9", 0, "user", "new", "", TS, "INSERT", 1002),
            ],
            DDL,
        ),
        "w", "b1", mode="mor",
    )
    publish_iceberg(t.refresh(), ice)  # v2
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "assistant", "v3", "", TS, "UPDATE", 2000),
                ("c9", 0, None, None, None, None, "DELETE", 2001),
                ("c5", 2, "user", "late", "", TS, "INSERT", 2002),
            ],
            DDL,
        ),
        "w", "b2", mode="mor",
    )
    publish_iceberg(t.refresh(), ice)  # v3

    cols = ["conv_id", "turn_idx", "text", "_change_type"]
    duck = (
        _duck.sql(iceberg_changes_sql(ice, 1, 3)).df()[cols]
        .sort_values(cols[:2]).reset_index(drop=True)
    )
    got = {(c, t): (x, ct) for c, t, x, ct in
           duck.itertuples(index=False, name=None)}
    assert got == {
        ("c1", 0): ("v3", "upsert"),          # latest winner, once
        ("c2", 1): (None, "delete"),
        ("c5", 2): ("late", "upsert"),
        ("c9", 0): (None, "delete"),          # created+deleted in range:
    }                                          # at-least-once tombstone
    sdf = (
        read_iceberg_changes_spark(ice, 1, spark, 3).toPandas()[cols]
        .sort_values(cols[:2]).reset_index(drop=True)
    )
    assert duck.astype(str).equals(sdf.astype(str))

    # v2→v3 window: only the second batch's net effect
    d23 = _duck.sql(iceberg_changes_sql(ice, 2, 3)).df()
    keys23 = {(r[0], r[1], r[2]) for r in d23[
        ["conv_id", "turn_idx", "_change_type"]
    ].itertuples(index=False, name=None)}
    assert keys23 == {("c1", 0, "upsert"), ("c9", 0, "delete"),
                      ("c5", 2, "upsert")}

    # squash inside the range must refuse (file diff ≠ change feed)
    publish_iceberg(t.refresh(), ice, squash=True)  # v4 (replace)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="squash|REPLACE|replace"):
        iceberg_changes_sql(ice, 1, 4)


def test_expire_iceberg_versions_and_orphans(spark, tmp_path):
    """Published-destination lifecycle: crashed-publish leftovers (data
    files written before the metadata claim) and files referenced only
    by retired metadata versions are swept once old enough; every
    retained version keeps reading; fresh files are never touched."""
    from delta_spark.lake.iceberg import expire_iceberg, publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)
    for i in range(3):
        t.merge(
            spark.createDataFrame(
                [(f"c{i}", 1, "assistant", f"x{i}", "", TS, "UPDATE", 6000 + i)],
                DDL,
            ),
            "w", f"ex{i}", mode="mor",
        )
        t = t.refresh()
        mp = publish_iceberg(t, ice)

    # a crashed publish: data file on disk, never claimed by metadata
    orphan = os.path.join(ice, "data", "w9999-crashed.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    old = __import__("time").time() - 7200
    os.utime(orphan, (old, old))

    # fresh orphan must survive an aged sweep
    fresh = os.path.join(ice, "data", "w9998-inflight.parquet")
    with open(fresh, "wb") as f:
        f.write(b"in-flight")

    rep = expire_iceberg(ice, keep_last_versions=2, orphan_age_s=3600)
    assert not os.path.exists(orphan)
    assert os.path.exists(fresh)
    assert rep["removed_files"] >= 1
    # v4 (current) and v3 retained and still reading; the only possibly
    # expired METADATA files are v1/v2 (age-gated, so may remain today)
    for v in rep["retained_versions"]:
        p = os.path.join(ice, "metadata", f"v{v}.metadata.json")
        assert os.path.exists(p)
    _rows_equal(t.read(), read_iceberg_duckdb(mp))

    # age out everything unreferenced: v1/v2 chains disappear, current
    # chain still intact
    rep2 = expire_iceberg(ice, keep_last_versions=2, orphan_age_s=0.0)
    assert set(rep2["expired_versions"]) == {1, 2}
    assert not os.path.exists(
        os.path.join(ice, "metadata", "v1.metadata.json")
    )
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    assert not os.path.exists(fresh)  # age 0 sweeps it too


def test_expire_prunes_snapshots_and_reclaims_superseded_files(spark, tmp_path):
    """A continuous publisher appends one snapshot per micro-batch
    forever; expire must PRUNE the current metadata's snapshot list
    (new metadata version, same claim protocol) or superseded data
    files stay reachable from the current version and are never
    reclaimed. After squash + prune + retire + age-0 sweep, the
    pre-squash incremental files are gone from disk and the current
    read is unchanged."""
    from delta_spark.lake.iceberg import expire_iceberg, publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)
    for i in range(4):
        t.merge(
            spark.createDataFrame(
                [(f"c{i}", 0, "assistant", f"p{i}", "", TS, "UPDATE", 9100 + i)],
                DDL,
            ),
            "w", f"pr{i}", mode="mor",
        )
        t = t.refresh()
        publish_iceberg(t, ice)
    data_dir = os.path.join(ice, "data")
    incr_files = {p for p in os.listdir(data_dir) if p.startswith(("w000", "ed00"))}
    assert incr_files  # superseded incremental winners/deletes exist

    publish_iceberg(t, ice, squash=True)  # current state now self-contained
    rep = expire_iceberg(
        ice, keep_last_versions=1, orphan_age_s=0.0, keep_last_snapshots=1
    )
    assert rep["pruned_snapshots"] >= 4
    with open(os.path.join(ice, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    mp = os.path.join(ice, "metadata", f"v{v}.metadata.json")
    with open(mp) as f:
        md = json.load(f)
    assert len(md["snapshots"]) == 1
    # the superseded incremental files are actually reclaimed
    left = {p for p in os.listdir(data_dir) if p in incr_files}
    assert not left, left
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    # and publishing continues cleanly after the prune
    t.merge(
        spark.createDataFrame(
            [("c5", 0, "assistant", "after", "", TS, "UPDATE", 9900)], DDL
        ),
        "w", "pr9", mode="mor",
    )
    t = t.refresh()
    mp2 = publish_iceberg(t, ice)
    _rows_equal(t.read(), read_iceberg_duckdb(mp2))


def test_publish_crash_retry_over_leftovers(spark, tmp_path):
    """A publisher that crashed AFTER writing data files / tmp dirs but
    BEFORE the metadata claim leaves leftovers with deterministic
    names; the retry must overwrite them and succeed (the metadata
    claim, not the file writes, is the commit point)."""
    from delta_spark.lake.iceberg import publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "assistant", "v2", "", TS, "UPDATE", 1000)], DDL
        ),
        "w", "cr1", mode="mor",
    )
    t = t.refresh()
    # simulate the crashed attempt: stale tmp dir + a stale squash link
    os.makedirs(os.path.join(ice, "_win_tmp_2"))
    with open(os.path.join(ice, "_win_tmp_2", "part-junk.parquet"), "wb") as f:
        f.write(b"junk")
    base0 = t.current_snapshot["files"][0]["path"]
    stale = os.path.join(
        ice, "data", f"s0002-b00000-{os.path.basename(base0)}"
    )
    with open(stale, "wb") as f:
        f.write(b"stale-halfway")

    mp = publish_iceberg(t, ice)  # incremental retry over tmp leftover
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    mp2 = publish_iceberg(t.refresh(), ice, squash=True)  # over stale link
    _rows_equal(t.read(), read_iceberg_duckdb(mp2))


def test_changes_feed_across_rename_in_range(spark, tmp_path):
    """A RENAME between publishes inside the feed range: files written
    pre-rename resolve through the name mapping; the feed speaks the
    TO version's (current) column names."""
    import duckdb as _duck

    from delta_spark.lake.iceberg import (
        iceberg_changes_sql,
        publish_iceberg,
        read_iceberg_changes_spark,
    )

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)  # v1
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "assistant", "pre-rename", "", TS, "UPDATE", 1000)], DDL
        ),
        "w", "r1", mode="mor",
    )
    publish_iceberg(t.refresh(), ice)  # v2 (data file has OLD name)
    t.apply_ddl(
        {"op": "RENAME_COLUMN", "column": "conv_id", "new_name": "conversation_id"}
    )
    t = t.refresh()
    t.merge(
        spark.createDataFrame(
            [("c2", 0, "assistant", "post-rename", "", TS, "UPDATE", 2000)],
            DDL.replace("conv_id", "conversation_id"),
        ),
        "w", "r2", mode="mor",
    )
    t = t.refresh()
    publish_iceberg(t, ice)  # v3 (new schema-id)

    duck = _duck.sql(iceberg_changes_sql(ice, 1, 3)).df()
    assert "conversation_id" in duck.columns  # TO-version names
    got = {(r[0], r[1]): r[2] for r in duck[
        ["conversation_id", "turn_idx", "text"]
    ].itertuples(index=False, name=None)}
    assert got == {("c1", 0): "pre-rename", ("c2", 0): "post-rename"}
    sdf = read_iceberg_changes_spark(ice, 1, spark, 3).toPandas()
    assert sorted(sdf.columns) == sorted(duck.columns)
    got_s = {(r["conversation_id"], r["turn_idx"]): r["text"]
             for _i, r in sdf.iterrows()}
    assert got_s == got


def test_bootstrap_crash_retry_and_live_guard(spark, tmp_path):
    """Regression: a bootstrap export that crashed after creating
    dirs/linking files/writing v1 — but BEFORE publishing the hint —
    must be retryable (continuous publishing used to wedge forever on
    os.makedirs). A LIVE dest (hint present) still refuses export."""
    import pytest as _pt

    from delta_spark.lake.iceberg import export_iceberg, publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    # simulate the deepest crash: everything written except the hint
    export_iceberg(t, ice)
    os.remove(os.path.join(ice, "metadata", "version-hint.text"))
    mp = publish_iceberg(t, ice)  # retries the bootstrap, succeeds
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    # live table → export refuses rather than clobbering
    with _pt.raises(FileExistsError, match="already a published"):
        export_iceberg(t, str(tmp_path / "ice"))


def test_changes_sql_deletes_only_range(spark, tmp_path):
    """Regression: a publish range whose only change is deletes used to
    generate a FROM-less bare-column SELECT that DuckDB rejects; the
    feed must instead emit the delete rows."""
    import duckdb

    from delta_spark.lake.iceberg import iceberg_changes_sql, publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t, ice)  # v1
    t.merge(
        spark.createDataFrame(
            [("c1", 0, None, None, None, None, "DELETE", 5000),
             ("c2", 1, None, None, None, None, "DELETE", 5001)], DDL
        ),
        "w", "d1", mode="mor",
    )
    publish_iceberg(t.refresh(), ice)  # v2: deletes only
    rows = duckdb.sql(iceberg_changes_sql(ice, 1, 2)).fetchall()
    kinds = {r[-1] for r in rows}
    assert kinds == {"delete"} and len(rows) == 2


def test_squash_guard_survives_snapshot_pruning(spark, tmp_path):
    """Regression: the change feed's REPLACE guard used to rely on the
    replace snapshot being retained in the TO metadata's snapshot log;
    the squash-count property detects it even after pruning."""
    import json as _json

    import pytest as _pt

    from delta_spark.lake.iceberg import iceberg_changes_sql, publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t, ice)  # v1
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "assistant", "v2", "", TS, "UPDATE", 6000)], DDL
        ),
        "w", "s1", mode="mor",
    )
    publish_iceberg(t.refresh(), ice, squash=True)  # v2 = REPLACE
    # simulate expire_iceberg pruning the replace snapshot from v2's log
    v2 = os.path.join(ice, "metadata", "v2.metadata.json")
    with open(v2) as f:
        md = _json.load(f)
    md["snapshots"] = [
        s for s in md["snapshots"]
        if s.get("summary", {}).get("operation") != "replace"
    ]
    with open(v2, "w") as f:
        _json.dump(md, f)
    with _pt.raises(NotImplementedError, match="squash|REPLACE"):
        iceberg_changes_sql(ice, 1, 2)


def test_publish_crash_in_claim_to_hint_window(spark, tmp_path):
    """Regression: a publisher that died AFTER claiming v{N+1} but
    BEFORE updating version-hint used to wedge the destination forever
    (FileExistsError on every retry). The claim is atomic, so a retry
    adopts the complete orphan version and continues publishing."""
    from delta_spark.lake.iceberg import publish_iceberg

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t, ice)  # v1
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "assistant", "v2", "", TS, "UPDATE", 7000)], DDL
        ),
        "w", "w1", mode="mor",
    )
    publish_iceberg(t.refresh(), ice)  # v2
    # simulate the crash: roll the hint back to v1, leaving v2 claimed
    with open(os.path.join(ice, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    t.merge(
        spark.createDataFrame(
            [("c2", 0, "assistant", "v3", "", TS, "UPDATE", 7001)], DDL
        ),
        "w", "w2", mode="mor",
    )
    mp = publish_iceberg(t.refresh(), ice)  # adopts v2, publishes v3
    _rows_equal(t.read(), read_iceberg_duckdb(mp))
    with open(os.path.join(ice, "metadata", "version-hint.text")) as f:
        assert int(f.read().strip()) == 3


def test_metadata_log_is_capped(spark, tmp_path):
    """Regression: every publish used to append a metadata-log entry
    forever (O(K^2) cumulative metadata bytes for a per-micro-batch
    publisher); the log is now capped Iceberg-style."""
    import json as _json

    from delta_spark.lake.iceberg import publish_iceberg

    t = _mk(spark, str(tmp_path / "t"), n=2)
    ice = str(tmp_path / "ice")
    publish_iceberg(t, ice)
    for i in range(3):
        t.merge(
            spark.createDataFrame(
                [("c0", 0, "assistant", f"u{i}", "", TS, "UPDATE", 8000 + i)],
                DDL,
            ),
            "w", f"m{i}", mode="mor",
        )
        publish_iceberg(t.refresh(), ice)
    with open(os.path.join(ice, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(ice, "metadata", f"v{v}.metadata.json")) as f:
        md = _json.load(f)
    assert len(md["metadata-log"]) <= 100
    assert md["metadata-log"], "log still links the previous version"
