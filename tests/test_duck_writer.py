"""Spark-free exactly-once WRITER (interop.write_delta_duckdb): a
DuckDB producer commits merge-on-read deltas into a live lake table —
same system columns, same Spark-equal XXH64 bucket values, same atomic
version-claim commit — and both engines read the merged result
identically; Spark's own merge/compact keep operating on top."""

import datetime

import duckdb
import pytest

from delta_spark.lake import LakeTable
from delta_spark.lake.interop import read_duckdb, write_delta_duckdb
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 3, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _mk(spark, path):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 8
    )
    rows = [
        (f"c{i}", j, "user", f"v1 {i}.{j}", "", TS, "INSERT", i * 10 + j + 1)
        for i in range(6)
        for j in range(3)
    ]
    t.merge(spark.createDataFrame(rows, DDL), "spark-w", "b0")
    return t


DUCK_BATCH = """
    SELECT * FROM (VALUES
        ('c1', 0, 'assistant', 'v2 duck', '', TIMESTAMP '2026-03-02 00:00:00',
         'UPDATE', 1000),
        ('c2', 1, NULL, NULL, NULL, NULL, 'DELETE', 1001),
        ('c9', 0, 'user', 'new from duck', '', TIMESTAMP '2026-03-02 00:00:00',
         'INSERT', 1002)
    ) AS v(conv_id, turn_idx, role, text, tool, ts, op, seq)
"""


def test_duck_writer_commits_and_both_engines_agree(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    con = duckdb.connect()
    st = write_delta_duckdb(t.path, con, DUCK_BATCH, "duck-w", "d0")
    assert st == {
        "files": 1, "upserts": 2, "deletes": 1, "max_seq": 1002,
        "snapshot_id": st["snapshot_id"],
    }
    t = t.refresh()
    # exactly-once: replaying the same (writer, batch) is a no-op
    assert write_delta_duckdb(t.path, con, DUCK_BATCH, "duck-w", "d0") is None
    assert t.refresh().metadata["current_snapshot_id"] == st["snapshot_id"]
    assert t.last_committed_seq("duck-w") == 1002

    sp = t.read().toPandas().set_index(["conv_id", "turn_idx"]).sort_index()
    assert sp.loc[("c1", 0), "text"] == "v2 duck"
    assert ("c2", 1) not in sp.index  # tombstoned by the duck writer
    assert sp.loc[("c9", 0), "text"] == "new from duck"
    assert len(sp) == 18 - 1 + 1
    du = (
        read_duckdb(t.path, con=con)
        .df()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    assert list(du.index) == list(sp.index)
    assert list(du["text"]) == list(sp["text"])


def test_duck_written_buckets_match_spark_pruning(spark, tmp_path):
    """The stored _bucket values a pruned Spark read and a compaction
    trust must equal Spark's own hash — the XXH64 parity, end to end."""
    from pyspark.sql import functions as F

    t = _mk(spark, str(tmp_path / "t"))
    con = duckdb.connect()
    write_delta_duckdb(t.path, con, DUCK_BATCH, "duck-w", "d0")
    t = t.refresh()
    b = t.spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("c9")), F.lit(8)).alias("b")
    ).collect()[0]["b"]
    got = t.read(buckets=[int(b)]).filter(F.col("conv_id") == "c9").collect()
    assert len(got) == 1 and got[0]["text"] == "new from duck"
    # stale seq from duck is rejected by the same guard as Spark's
    stale = DUCK_BATCH.replace("1000", "1").replace("1001", "2").replace("1002", "3")
    write_delta_duckdb(t.path, con, stale, "duck-w", "d1")
    t = t.refresh()
    sp = t.read().toPandas().set_index(["conv_id", "turn_idx"])
    # stale seqs (1/2/3) lose to the applied 1000/1001/1002 in the fold
    assert sp.loc[("c1", 0), "text"] == "v2 duck"
    assert sp.loc[("c9", 0), "text"] == "new from duck"

    # Spark merge + compaction absorb duck-written deltas exactly
    upd = spark.createDataFrame(
        [("c1", 0, "user", "v3 spark", "", TS, "UPDATE", 2000)], DDL
    )
    t.merge(upd, "spark-w", "b1", mode="mor")
    assert t.compact(max_files_per_bucket=1) > 0
    t = t.refresh()
    assert all(f.get("kind") != "delta" for f in t.current_snapshot["files"])
    sp = t.read().toPandas().set_index(["conv_id", "turn_idx"])
    assert sp.loc[("c1", 0), "text"] == "v3 spark"
    assert sp.loc[("c9", 0), "text"] == "new from duck"
    assert ("c2", 1) not in sp.index


def test_duck_writer_conflict_with_spark_writer(spark, tmp_path):
    """Concurrent version race: a Spark commit between the duck
    writer's read and claim forces a refresh-retry, not corruption."""
    t = _mk(spark, str(tmp_path / "t"))
    con = duckdb.connect()
    # simulate interleaving by replaying on a table that advanced:
    # duck writes, spark writes, duck writes again — versions strictly
    # increase and all three commits land
    v0 = t.metadata["version"]
    write_delta_duckdb(t.path, con, DUCK_BATCH, "duck-w", "d0")
    upd = spark.createDataFrame(
        [("c3", 0, "user", "spark mid", "", TS, "UPDATE", 3000)], DDL
    )
    t.refresh().merge(upd, "spark-w", "b1", mode="mor")
    st = write_delta_duckdb(
        t.path, con,
        DUCK_BATCH.replace("'d0'", "'d2'").replace("1000", "5000")
        .replace("1001", "5001").replace("1002", "5002"),
        "duck-w", "d2",
    )
    assert st is not None
    t = t.refresh()
    assert t.metadata["version"] >= v0 + 3
    sp = t.read().toPandas().set_index(["conv_id", "turn_idx"])
    assert sp.loc[("c3", 0), "text"] == "spark mid"
    assert sp.loc[("c1", 0), "text"] == "v2 duck"


def test_duck_writer_rejects_unknown_sort_and_empty(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    con = duckdb.connect()
    st = write_delta_duckdb(
        t.path, con, DUCK_BATCH + " WHERE conv_id = 'nope'", "duck-w", "d9"
    )
    assert st == {"files": 0, "upserts": 0, "deletes": 0}
    # an empty stage commits nothing and is NOT marked applied
    assert write_delta_duckdb(t.path, con, DUCK_BATCH, "duck-w", "d9") is not None


def test_duck_writer_stages_on_branch(spark, tmp_path):
    """Spark-free WAP: a DuckDB producer stages a commit on a branch
    (main untouched), a Spark/DuckDB auditor reads the staged head,
    fast_forward publishes — and snapshot ids never collide even when
    a branch commit landed after main's head."""
    import duckdb

    from delta_spark.lake import LakeTable, interop

    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("staged")
    con = duckdb.connect()
    res = interop.write_delta_duckdb(
        str(tmp_path / "t"), con,
        "SELECT 'c0' AS conv_id, 0 AS turn_idx, 'user' AS role, "
        "'duck-staged' AS text, '' AS tool, "
        "TIMESTAMP '2026-01-01 00:00:00' AS ts, "
        "'UPDATE' AS op, 999999 AS seq",
        writer_id="duck", batch_id="db1", branch="staged",
    )
    assert res is not None and res["files"] == 1
    t.refresh()
    assert "duck-staged" not in {r["text"] for r in t.read().collect()}
    staged = {r["text"] for r in t.read(branch="staged").collect()}
    assert "duck-staged" in staged
    # idempotent replay, still branch-scoped
    assert interop.write_delta_duckdb(
        str(tmp_path / "t"), con, "SELECT 1", writer_id="duck",
        batch_id="db1", branch="staged",
    ) is None
    # a MAIN duck write after the branch commit must mint a fresh id
    interop.write_delta_duckdb(
        str(tmp_path / "t"), con,
        "SELECT 'c1' AS conv_id, 0 AS turn_idx, 'user' AS role, "
        "'duck-main' AS text, '' AS tool, "
        "TIMESTAMP '2026-01-01 00:00:00' AS ts, "
        "'UPDATE' AS op, 999998 AS seq",
        writer_id="duck", batch_id="db2",
    )
    t.refresh()
    ids = [s["id"] for s in t.metadata["snapshots"]]
    assert len(ids) == len(set(ids)), "snapshot id collision"
    # main advanced independently after the fork → publish refuses
    import pytest as _pt

    with _pt.raises(ValueError, match="not an ancestor"):
        t.fast_forward("staged")
    assert "duck-main" in {r["text"] for r in t.read().collect()}


def test_duck_writer_readmits_after_rollback(spark, tmp_path):
    """The Spark-free writer's idempotency check must forget revoked
    (writer, batch) markers exactly like the engine's is_applied: after
    a rollback drill, re-sending the repaired batch through DuckDB
    lands instead of silently no-op'ing the repair away."""
    t = _mk(spark, str(tmp_path / "t"))
    con = duckdb.connect()
    good = t.refresh().metadata["current_snapshot_id"]
    bad = DUCK_BATCH.replace("'v2 duck'", "'POISON'")
    st = write_delta_duckdb(t.path, con, bad, "duck-w", "d0")
    assert st is not None
    t = t.refresh()
    assert t.rollback_to(good) == 1
    t = t.refresh()
    # revoked: the duck writer re-admits the same (writer, batch)
    st2 = write_delta_duckdb(t.path, con, DUCK_BATCH, "duck-w", "d0")
    assert st2 is not None and st2["snapshot_id"] != st["snapshot_id"]
    t = t.refresh()
    sp = t.read().toPandas().set_index(["conv_id", "turn_idx"])
    assert sp.loc[("c1", 0), "text"] == "v2 duck"
    # ...and a second replay is back to exactly-once
    assert write_delta_duckdb(t.path, con, DUCK_BATCH, "duck-w", "d0") is None
