"""Incremental change feed (LakeTable.read_changes) — the engine as a
CDC *source* (Iceberg incremental scan / Delta CDF analog; reference
targets are consumed the same way downstream). Covers insert/update/
delete classification, bucket-pruned scan cost, schema evolution
across the range, compaction no-ops, and from-the-beginning reads."""

import datetime

from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _mk(spark, path, n=40, buckets=8):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", buckets
    )
    base = spark.createDataFrame(
        [(f"c{i}", 0, "user", f"v1 {i}", "", TS, "INSERT", i + 1) for i in range(n)],
        DDL,
    )
    t.merge(base, "w", "b0")
    return t


def test_changes_insert_update_delete(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    sid = t.metadata["current_snapshot_id"]
    batch = spark.createDataFrame(
        [
            ("c1", 0, "user", "v2", "", TS, "UPDATE", 100),
            ("c2", 0, None, None, None, None, "DELETE", 101),
            ("c99", 0, "user", "new", "", TS, "INSERT", 102),
        ],
        DDL,
    )
    t.merge(batch, "w", "b1")
    ch = {r["conv_id"]: r for r in t.read_changes(sid).collect()}
    assert set(ch) == {"c1", "c2", "c99"}
    assert ch["c1"]["_change_type"] == "update" and ch["c1"]["text"] == "v2"
    assert ch["c2"]["_change_type"] == "delete"
    assert ch["c2"]["text"] == "v1 2", "delete carries last-known payload"
    assert ch["c99"]["_change_type"] == "insert" and ch["c99"]["_seq"] == 102


def test_changes_mor_path_and_from_beginning(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=10)
    sid = t.metadata["current_snapshot_id"]
    upd = spark.createDataFrame(
        [("c3", 0, "assistant", "mor", "", TS, "UPDATE", 200)], DDL
    )
    t.merge(upd, "w", "b1", mode="mor")
    ch = t.read_changes(sid).collect()
    assert len(ch) == 1 and ch[0]["_change_type"] == "update"
    assert ch[0]["text"] == "mor"
    # from the beginning: every live row is an insert
    allch = t.read_changes(None)
    assert allch.count() == 10
    assert allch.filter(F.col("_change_type") != "insert").count() == 0


def test_changes_scan_is_bucket_pruned(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=64, buckets=16)
    sid = t.metadata["current_snapshot_id"]
    t.merge(
        spark.createDataFrame([("c5", 0, "user", "v2", "", TS, "UPDATE", 500)], DDL),
        "w",
        "b1",
    )
    ch = t.read_changes(sid)
    assert [r["conv_id"] for r in ch.collect()] == ["c5"]
    # the diff must NOT read the whole table: only c5's bucket
    n_buckets_read = len(
        {p.split("/b")[-1].split("/")[0] for p in ch.inputFiles() if "/data/" in p}
    )
    total_buckets = len(
        {f["bucket"] for f in t.current_snapshot["files"] if f["bucket"] != -1}
    )
    assert total_buckets > 4
    assert n_buckets_read <= 2, f"read {n_buckets_read} buckets of {total_buckets}"


def test_changes_across_rename_emit_new_names(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=6)
    sid = t.metadata["current_snapshot_id"]
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "body"})
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "user", "renamed", "", TS, "UPDATE", 300)],
            DDL.replace(" text ", " body "),
        ),
        "w",
        "b1",
    )
    ch = t.read_changes(sid)
    assert "body" in ch.columns and "text" not in ch.columns
    rows = ch.collect()
    assert len(rows) == 1 and rows[0]["body"] == "renamed"


def test_changes_compaction_emits_nothing(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=12)
    t.merge(
        spark.createDataFrame([("c1", 0, "user", "m1", "", TS, "UPDATE", 50)], DDL),
        "w",
        "b1",
        mode="mor",
    )
    sid = t.metadata["current_snapshot_id"]
    assert t.compact(max_files_per_bucket=1) >= 0
    assert t.metadata["current_snapshot_id"] > sid, "compact commits a snapshot"
    assert t.read_changes(sid).count() == 0, "logical state unchanged"


def test_changes_empty_and_ddl_only_ranges(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=4)
    sid = t.metadata["current_snapshot_id"]
    assert t.read_changes(sid).count() == 0  # same snapshot
    t.apply_ddl({"op": "ADD_COLUMN", "column": "score", "new_type": "double"})
    assert t.read_changes(sid).count() == 0  # DDL adds no files


def test_changes_bad_ranges_raise(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=4)
    sid = t.metadata["current_snapshot_id"]
    t.merge(
        spark.createDataFrame([("c1", 0, "user", "v2", "", TS, "UPDATE", 99)], DDL),
        "w",
        "b1",
    )
    import pytest

    with pytest.raises(ValueError, match="reversed"):
        t.read_changes(t.metadata["current_snapshot_id"], sid)
    with pytest.raises(ValueError, match="not found"):
        t.read_changes(9999)


def test_changes_roundtrip_reconstructs_state(spark, tmp_path):
    """Feed-consistency invariant (the property a downstream replicator
    relies on): applying read_changes(A, B) onto the table state at A
    — upsert inserts/updates, drop deletes — reproduces the state at B
    EXACTLY, for a realistic random changelog (duplicate seqs,
    out-of-order delivery, deletes) split at an arbitrary point."""
    import pandas as pd

    from delta_spark.changelog import ChangelogSpec, generate_changelog

    log = generate_changelog(
        ChangelogSpec(n_events=1200, n_convs=25, seed=1234, include_ddl=False)
    )
    cut = 700
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "seq"]

    def _to_spark(pdf):
        return spark.createDataFrame(pdf[cols].astype({"seq": "int64"}), DDL)

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], "conv_id", 8,
    )
    t.merge(_to_spark(log.iloc[:cut]), "w", "b0")
    sid_a = t.metadata["current_snapshot_id"]
    t.merge(_to_spark(log.iloc[cut:]), "w", "b1")
    sid_b = t.metadata["current_snapshot_id"]

    payload = ["role", "text", "tool", "ts"]
    key = ["conv_id", "turn_idx"]
    state_a = t.read(snapshot_id=sid_a).toPandas().set_index(key)
    state_b = t.read(snapshot_id=sid_b).toPandas().set_index(key)
    feed = t.read_changes(sid_a, sid_b).toPandas()
    assert set(feed["_change_type"]) <= {"insert", "update", "delete"}

    applied = state_a.copy()
    for _, r in feed.iterrows():
        k = (r["conv_id"], r["turn_idx"])
        if r["_change_type"] == "delete":
            applied = applied.drop(index=[k])
        else:
            for c in payload:
                applied.loc[k, c] = r[c]
    applied = applied.sort_index()[payload]
    expect = state_b.sort_index()[payload]
    pd.testing.assert_frame_equal(
        applied.reset_index(drop=True), expect.reset_index(drop=True),
        check_dtype=False,
    )


def test_changes_sql_matches_engine(spark, tmp_path):
    """Spark-free CDC-out: interop.changes_sql emits the SAME change
    set as the engine's read_changes — insert/update/delete, MoR
    deltas in range, and a rename between the snapshots (both sides
    aligned to the TO schema)."""
    import duckdb

    from delta_spark.lake.interop import changes_sql

    t = _mk(spark, str(tmp_path / "t"), n=20)
    sid_a = t.metadata["current_snapshot_id"]
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "body"})
    ddl2 = DDL.replace(" text ", " body ")
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "user", "v2", "", TS, "UPDATE", 100),
                ("c2", 0, None, None, None, None, "DELETE", 101),
                ("c99", 0, "user", "new", "", TS, "INSERT", 102),
            ],
            ddl2,
        ),
        "w", "b1", mode="mor",
    )
    t.merge(
        spark.createDataFrame(
            [("c3", 0, "user", "v3", "", TS, "UPDATE", 103)], ddl2
        ),
        "w", "b2", mode="mor",
    )
    sid_b = t.metadata["current_snapshot_id"]

    key = ["conv_id", "turn_idx"]
    eng = t.read_changes(sid_a, sid_b).toPandas()
    duck = duckdb.sql(changes_sql(str(tmp_path / "t"), sid_a, sid_b)).df()
    assert sorted(eng.columns) == sorted(duck.columns)
    from conftest import assert_pdf_equal

    assert_pdf_equal(
        eng.sort_index(axis=1), duck.sort_index(axis=1), key
    )
    # from-the-beginning shape: every live row is an insert
    all_eng = t.read_changes(None, sid_b).toPandas()
    all_duck = duckdb.sql(changes_sql(str(tmp_path / "t"), None, sid_b)).df()
    assert_pdf_equal(
        all_eng.sort_index(axis=1), all_duck.sort_index(axis=1), key
    )


def test_changes_removal_only_commit_emits_deletes(spark, tmp_path):
    """A commit that only REMOVES files (truncate = empty snapshot)
    still deletes every key — the touched-bucket derivation must
    consider removed files, not just added ones."""
    t = _mk(spark, str(tmp_path / "t"), n=12)
    sid = t.metadata["current_snapshot_id"]
    t._commit_snapshot([], {"operation": "truncate"})
    ch = t.read_changes(sid).toPandas()
    assert len(ch) == 12
    assert set(ch["_change_type"]) == {"delete"}
    assert set(ch["conv_id"]) == {f"c{i}" for i in range(12)}
    # parity: the Spark-free SQL formulation agrees
    import duckdb

    from conftest import assert_pdf_equal
    from delta_spark.lake.interop import changes_sql

    duck = duckdb.sql(
        changes_sql(str(tmp_path / "t"), sid, t.metadata["current_snapshot_id"])
    ).df()
    assert_pdf_equal(
        ch.sort_index(axis=1), duck.sort_index(axis=1), ["conv_id", "turn_idx"]
    )


def test_changes_sql_prunes_to_touched_buckets(spark, tmp_path):
    """A 1-commit delta on a many-bucket table: the generated SQL must
    reference O(touched) data files — both snapshot sides pruned by
    the driver-side manifest diff — and still emit the exact change
    set. At 100 TB this is what keeps the Spark-free consumer usable
    for small deltas."""
    import duckdb

    from conftest import assert_pdf_equal
    from delta_spark.lake.interop import changes_sql, read_sql

    t = _mk(spark, str(tmp_path / "t"), n=64)  # 64 convs over 16 buckets
    sid_a = t.metadata["current_snapshot_id"]
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "user", "v2", "", TS, "UPDATE", 500)], DDL
        ),
        "w", "b1", mode="mor",
    )
    sid_b = t.metadata["current_snapshot_id"]
    sql = changes_sql(str(tmp_path / "t"), sid_a, sid_b)
    full = read_sql(str(tmp_path / "t"), include_system=True).count(".parquet'")
    touched = sql.count(".parquet'")
    # two sides of the diff, each ~1 bucket file (+ the delta file)
    assert 0 < touched <= 6 < full, (touched, full)
    eng = t.read_changes(sid_a, sid_b).toPandas()
    duck = duckdb.sql(sql).df()
    assert len(eng) == len(duck) == 1
    assert_pdf_equal(
        eng.sort_index(axis=1), duck.sort_index(axis=1), ["conv_id", "turn_idx"]
    )
    # an empty range generates an empty (and tiny) statement
    empty = duckdb.sql(changes_sql(str(tmp_path / "t"), sid_b, sid_b)).df()
    assert len(empty) == 0


def test_changes_sql_pruned_across_rebucket(spark, tmp_path):
    """The range crosses a rebucket: touched foreign-spec files need
    the Spark-equal hash UDF to name their current-spec buckets; the
    pruned feed must still equal the engine's."""
    import duckdb

    from conftest import assert_pdf_equal
    from delta_spark.lake.interop import changes_sql

    t = _mk(spark, str(tmp_path / "t"), n=16)
    sid_a = t.metadata["current_snapshot_id"]
    assert t.rebucket(32)
    t = t.refresh()
    t.merge(
        spark.createDataFrame(
            [("c2", 0, "user", "post-rb", "", TS, "UPDATE", 600)], DDL
        ),
        "w", "b1", mode="mor",
    )
    sid_b = t.metadata["current_snapshot_id"]
    con = duckdb.connect()
    sql = changes_sql(str(tmp_path / "t"), sid_a, sid_b, con=con)
    eng = t.read_changes(sid_a, sid_b).toPandas()
    duck = con.sql(sql).df()
    assert_pdf_equal(
        eng.sort_index(axis=1), duck.sort_index(axis=1), ["conv_id", "turn_idx"]
    )


def test_changes_ddl_without_data_commit_uses_current_names(spark, tmp_path):
    """A rename DDL with NO data commit after it: the current-state
    change feed must speak the CURRENT schema (matching read() and
    changes_sql), not the last snapshot's."""
    t = _mk(spark, str(tmp_path / "t"), n=6)
    sid = t.metadata["current_snapshot_id"]
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "body"})
    cols = set(t.read_changes(sid).columns)
    assert "body" in cols and "text" not in cols
    from delta_spark.lake.interop import changes_sql

    assert '"body"' in changes_sql(str(tmp_path / "t"), sid)
