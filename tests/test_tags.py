"""Snapshot tags (Iceberg table refs) + TIMESTAMP AS OF time travel.

A tag names the exact table state a training run / audit consumed and
PINS it against retention: ``expire_snapshots`` prunes around tagged
snapshots, so aggressive retention and long-lived named states
coexist. The invariants: read(tag=) == read(snapshot_id=) forever,
expiry never drops a tagged snapshot (and still drops untagged ones),
drop_tag makes it expirable again, and tags cannot be silently
repointed."""

import datetime

import pytest
from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _mk(spark, path):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 4
    )
    t.merge(
        spark.createDataFrame(
            [(f"c{i}", 0, "user", f"v0-{i}", "", TS, "INSERT", i + 1)
             for i in range(6)],
            DDL,
        ),
        "w", "b0",
    )
    return t


def _bump(t, spark, n, text):
    t.merge(
        spark.createDataFrame(
            [("c0", 0, "user", text, "", TS, "UPDATE", 1000 + n)], DDL
        ),
        "w", f"b{n}",
    )


def test_tag_reads_pinned_state(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    sid = t.tag("v1-train")
    assert t.tags == {"v1-train": sid}
    _bump(t, spark, 1, "changed")
    got = {r["text"] for r in t.read(tag="v1-train").collect()}
    assert "v0-0" in got and "changed" not in got
    assert "changed" in {r["text"] for r in t.read().collect()}
    # tag resolution == raw snapshot id time travel
    assert sorted(t.read(tag="v1-train").collect()) == sorted(
        t.read(snapshot_id=sid).collect()
    )


def test_tagged_snapshot_survives_expiry(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    sid = t.tag("audit")
    for i in range(1, 8):
        _bump(t, spark, i, f"v{i}")
    n = t.expire_snapshots(keep_last=1)
    assert n > 0
    kept = {s["id"] for s in t.metadata["snapshots"]}
    assert sid in kept and len(kept) == 2  # pinned + newest
    rows = t.read(tag="audit").collect()
    assert {r["text"] for r in rows if r["conv_id"] == "c0"} == {"v0-0"}
    # a reloaded handle sees the tag (it lives in metadata)
    assert LakeTable.load(spark, t.path).tags == {"audit": sid}


def test_drop_tag_makes_snapshot_expirable(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    sid = t.tag("tmp")
    for i in range(1, 5):
        _bump(t, spark, i, f"v{i}")
    assert t.drop_tag("tmp") is True
    assert t.drop_tag("tmp") is False  # idempotent
    t.expire_snapshots(keep_last=1)
    assert sid not in {s["id"] for s in t.metadata["snapshots"]}
    with pytest.raises(ValueError, match="no tag"):
        t.read(tag="tmp")


def test_tag_cannot_be_silently_repointed(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    sid = t.tag("rel")
    assert t.tag("rel") == sid  # same id: no-op
    _bump(t, spark, 1, "v1")
    with pytest.raises(ValueError, match="replace=True"):
        t.tag("rel")
    sid2 = t.tag("rel", replace=True)
    assert sid2 != sid and t.tags["rel"] == sid2


def test_tag_validation(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "e"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], "conv_id", 4,
    )
    with pytest.raises(ValueError, match="empty table"):
        t.tag("x")
    t2 = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="not found"):
        t2.tag("x", snapshot_id=999)


def test_as_of_timestamp_travel(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    _bump(t, spark, 1, "v1")
    snaps = sorted(t.metadata["snapshots"], key=lambda s: s["id"])
    first, second = snaps[0], snaps[1]
    # exactly at a commit's recorded instant → that snapshot
    got = t.read(as_of=first["timestamp_ms"])
    assert {r["text"] for r in got.collect() if r["conv_id"] == "c0"} == {"v0-0"}
    got2 = t.read(as_of=second["timestamp_ms"])
    assert {r["text"] for r in got2.collect() if r["conv_id"] == "c0"} == {"v1"}
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.read(as_of=first["timestamp_ms"] - 10_000)
    # datetime accepted too
    dt = datetime.datetime.fromtimestamp(second["timestamp_ms"] / 1000)
    assert t.read(as_of=dt).count() == t.read(snapshot_id=second["id"]).count()


def test_time_travel_selector_exclusivity(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    sid = t.tag("x")
    with pytest.raises(ValueError, match="at most one"):
        t.read(tag="x", snapshot_id=sid)
