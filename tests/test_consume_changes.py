"""Downstream change-feed consumer job (jobs/consume_changes.py):
offset-tracked exactly-once consumption of read_changes increments."""

import datetime
import importlib.util
import os

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)

spec = importlib.util.spec_from_file_location(
    "consume_changes",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs", "consume_changes.py"),
)
cc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cc)


def test_consumer_processes_increments_exactly_once(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 4,
    )
    out = str(tmp_path / "cdc")
    off = os.path.join(out, "_consumer_offset.json")
    os.makedirs(out)

    def batch(rows, bid):
        t.merge(spark.createDataFrame(rows, DDL), "w", bid)

    batch([(f"c{i}", 0, "user", f"v{i}", "", TS, "INSERT", i + 1) for i in range(6)], "b0")
    n1 = cc.consume_once(spark, t.path, out, off)
    assert n1 == 6  # initial increment: all inserts
    assert cc.consume_once(spark, t.path, out, off) == 0  # caught up

    batch([("c1", 0, "user", "v2", "", TS, "UPDATE", 100),
           ("c2", 0, None, None, None, None, "DELETE", 101)], "b1")
    n2 = cc.consume_once(spark, t.path, out, off)
    assert n2 == 2
    assert cc.consume_once(spark, t.path, out, off) == 0

    feed = spark.read.parquet(out).orderBy("_seq")
    assert feed.count() == 8
    types = [r["_change_type"] for r in feed.collect()]
    assert types.count("insert") == 6 and types.count("update") == 1
    assert types.count("delete") == 1

    # crash between sink write and offset advance: the offset still
    # holds the PREVIOUS snapshot id, so the replayed increment
    # recomputes the same rows and overwrites the SAME partition —
    # downstream never sees duplicates
    first_sid = sorted(
        int(p.split("=")[1])
        for p in os.listdir(out)
        if p.startswith("to_snapshot=")
    )[0]
    cc._write_offset(off, first_sid)  # rewind: simulate pre-advance crash
    assert cc.consume_once(spark, t.path, out, off) == 2  # replays b1's increment
    assert spark.read.parquet(out).count() == 8  # no duplicates
    assert cc.consume_once(spark, t.path, out, off) == 0

def test_consumer_drops_stale_partial_partition(spark, tmp_path):
    """Crash AFTER a partial sink write, then the table advances before
    the retry: the retried increment lands in a NEWER to_snapshot=N
    partition covering the same range — the torn partition from the
    crashed attempt must be removed, or downstream double-reads its
    keys."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 4,
    )
    out = str(tmp_path / "cdc")
    off = os.path.join(out, "_consumer_offset.json")
    os.makedirs(out)

    def batch(rows, bid):
        t.merge(spark.createDataFrame(rows, DDL), "w", bid)

    batch([(f"c{i}", 0, "user", f"v{i}", "", TS, "INSERT", i + 1) for i in range(4)], "b0")
    assert cc.consume_once(spark, t.path, out, off) == 4
    sid0 = cc._read_offset(off)

    # crashed attempt: partial partition written, offset NOT advanced
    batch([("c1", 0, "user", "v2", "", TS, "UPDATE", 50)], "b1")
    torn = os.path.join(out, f"to_snapshot={t.metadata['current_snapshot_id']}")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-torn.parquet"), "wb") as f:
        f.write(b"")  # zero-byte torn part file
    # table moves on before the retry
    batch([("c2", 0, "user", "v3", "", TS, "UPDATE", 51)], "b2")

    assert cc.consume_once(spark, t.path, out, off) == 2  # covers b1+b2
    assert not os.path.exists(torn)  # torn partition removed
    feed = spark.read.parquet(out)
    assert feed.count() == 6
    assert cc._read_offset(off) == t.metadata["current_snapshot_id"]
    assert sid0 < cc._read_offset(off)

def test_consumer_expired_offset_rebootstraps(spark, tmp_path):
    """An expired offset can't be diffed — and a from-the-beginning
    read emits only inserts (no tombstones for keys deleted since),
    so the consumer must REBOOTSTRAP: wipe the feed and restart it
    from the current full state, never append inserts over stale
    partitions that still expose deleted keys."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 4,
    )
    out = str(tmp_path / "cdc")
    off = os.path.join(out, "_consumer_offset.json")
    os.makedirs(out)

    def batch(rows, bid):
        t.merge(spark.createDataFrame(rows, DDL), "w", bid)

    batch([(f"c{i}", 0, "user", f"v{i}", "", TS, "INSERT", i + 1) for i in range(5)], "b0")
    assert cc.consume_once(spark, t.path, out, off) == 5
    # delete c1, then expire history so the consumer's offset is gone
    batch([("c1", 0, None, None, None, None, "DELETE", 100)], "b1")
    batch([("c2", 0, "user", "v2b", "", TS, "UPDATE", 101)], "b2")
    t.expire_snapshots(keep_last=1)
    n = cc.consume_once(spark, t.path, out, off)
    assert n == 4  # full rebootstrap: the 4 live keys
    feed = spark.read.parquet(out)
    assert feed.count() == 4  # old partitions wiped — c1 not exposed
    assert set(r["conv_id"] for r in feed.collect()) == {"c0", "c2", "c3", "c4"}
    assert cc.consume_once(spark, t.path, out, off) == 0


def test_consumer_iceberg_mode_exactly_once_and_squash_rebootstrap(spark, tmp_path):
    """--iceberg mode: the consumer tracks published metadata versions
    and needs no lake access; increments land exactly once; a squash in
    range triggers a full rebootstrap (feed dropped, all-upserts
    bootstrap partition), never a wrong diff."""
    from delta_spark.lake.iceberg import publish_iceberg

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 4,
    )
    ice = str(tmp_path / "ice")
    out = str(tmp_path / "cdc")
    os.makedirs(out, exist_ok=True)
    off = os.path.join(out, "_consumer_offset.json")

    rows = [(f"c{i}", 0, "user", f"v1 {i}", "", TS, "INSERT", i + 1) for i in range(6)]
    t.merge(spark.createDataFrame(rows, DDL), "w", "b0")
    publish_iceberg(t.refresh(), ice)  # v1

    n1 = cc.consume_iceberg_once(spark, ice, out, off)
    assert n1 == 6  # bootstrap: full state as upserts
    assert cc.consume_iceberg_once(spark, ice, out, off) == 0  # caught up

    t.merge(
        spark.createDataFrame(
            [("c1", 0, "assistant", "v2", "", TS, "UPDATE", 100),
             ("c2", 0, None, None, None, None, "DELETE", 101)], DDL
        ),
        "w", "b1", mode="mor",
    )
    publish_iceberg(t.refresh(), ice)  # v2
    n2 = cc.consume_iceberg_once(spark, ice, out, off)
    assert n2 == 2
    got = spark.read.parquet(os.path.join(out, "to_snapshot=2"))
    types = {(r["conv_id"], r["_change_type"]) for r in got.collect()}
    assert types == {("c1", "upsert"), ("c2", "delete")}

    # squash, then another change → the next consume must rebootstrap
    publish_iceberg(t.refresh(), ice, squash=True)  # v3 (replace)
    t.merge(
        spark.createDataFrame(
            [("c3", 0, "assistant", "v3", "", TS, "UPDATE", 200)], DDL
        ),
        "w", "b2", mode="mor",
    )
    publish_iceberg(t.refresh(), ice)  # v4
    n4 = cc.consume_iceberg_once(spark, ice, out, off)
    live = t.refresh().read().count()
    assert n4 == live  # full-state bootstrap row count
    assert not os.path.exists(os.path.join(out, "to_snapshot=2"))  # feed dropped
    boot = spark.read.parquet(os.path.join(out, "to_snapshot=4"))
    assert boot.filter("_change_type <> 'upsert'").count() == 0
