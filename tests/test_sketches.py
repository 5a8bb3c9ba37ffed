"""Per-file membership sketches (Iceberg compute_table_stats puffin
blob / parquet bloom filter analog): ``LakeTable.compute_sketches``
runs ONE distributed job hashing the sketched columns per file and
stores a bloom bitmap per (file, column) in the manifest entries; the
shared Spark-free planner (lake/stats.py) then skips in-bounds but
sketch-NEGATIVE files for point intervals — the pruning min/max
bounds can't give on columns whose per-file value range spans the
probe.

Safety bar: false positives only cost a read; false negatives are
impossible for sketched files (probe hashing is the pinned
pure-Python XXH64 reproducing Spark's xxhash64 bit-for-bit, values
cast to the column's CURRENT type on both sides), and unsketched
files are never skipped on membership. The MoR gate is the stats
gate: key columns always, non-key columns only on delta-free
snapshots.
"""

import datetime

from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.lake.stats import sketch_contains, sketch_hash
from delta_spark.schema import TRANSCRIPT_SCHEMA

DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _ts(day, month=1):
    return datetime.datetime(2026, month, day, 12, 0, 0)


def _rows(convs, n_turns, month=1, seq0=1, op="INSERT", tool=""):
    out = []
    s = seq0
    for c in convs:
        for t in range(n_turns):
            out.append(
                (c, t, "user", f"{c} t{t}", tool, _ts(1 + t % 27, month), op, s)
            )
            s += 1
    return out


def _mk(spark, path, n_buckets=8, convs=10, turns=5):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id",
        n_buckets,
    )
    df = spark.createDataFrame(_rows([f"c{i}" for i in range(convs)], turns), DDL)
    t.merge(df, "w", "b0")
    return t


def test_sketch_entries_and_point_probe_prunes(spark, tmp_path):
    """text is non-key and NOT in the stats set: without a sketch a
    point probe plans every file; with one it plans few — and the rows
    are exactly the full-scan filter's."""
    t = _mk(spark, str(tmp_path / "t"))
    full = t.read()
    probe = {"text": [("c7 t3", "c7 t3")]}
    before = t.read(ranges=probe)
    assert len(before.inputFiles()) == len(full.inputFiles())  # no skip yet
    n = t.compute_sketches(["text"])
    t = t.refresh()
    assert n == len(t.current_snapshot["files"]) > 0
    id_of = {f["name"]: str(f["id"]) for f in t.fields}
    for f in t.current_snapshot["files"]:
        sk = f.get("sketch", {}).get(id_of["text"])
        assert sk and sk["m"] == 4096 and sk["k"] == 5 and sk["b"]
    got = t.read(ranges=probe)
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["conv_id"] == "c7"
    assert 0 < len(got.inputFiles()) < len(full.inputFiles())
    # absent value: every sketch answers definitely-absent → 0 planned
    miss = t.read(ranges={"text": [("no such turn", "no such turn")]})
    assert miss.count() == 0 and miss.inputFiles() == []


def test_no_false_negatives_every_value(spark, tmp_path):
    """Probe EVERY value present in the table: sketch pruning must
    never lose a row (bit-exact Spark↔Python hash agreement E2E)."""
    t = _mk(spark, str(tmp_path / "t"), convs=6, turns=4)
    t.compute_sketches(["text"])
    t = t.refresh()
    vals = [r["text"] for r in t.read().select("text").collect()]
    assert len(vals) == 24
    hits = t.read(ranges={"text": [(v, v) for v in vals]})
    assert hits.count() == 24
    for v in vals[:6]:  # spot-check single-point probes too
        assert t.read(ranges={"text": [(v, v)]}).count() == 1


def test_key_sketch_prunes_under_mor_and_int_path(spark, tmp_path):
    """Key columns prune even with MoR deltas in play; turn_idx is
    int32, exercising Spark's 4-byte hashInt path driver-side. The
    unsketched delta file is never membership-skipped."""
    t = _mk(spark, str(tmp_path / "t"))
    t.compute_sketches(["conv_id", "turn_idx"])
    t = t.refresh()
    upd = spark.createDataFrame(
        [("c3", 0, "user", "moved", "", _ts(5, month=6), "UPDATE", 10_000)], DDL
    )
    t.merge(upd, "w", "b1", mode="mor")
    t = t.refresh()
    got = t.read(ranges={"conv_id": [("c3", "c3")], "turn_idx": [(0, 0)]})
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["text"] == "moved"
    assert 0 < len(got.inputFiles()) < len(t.read().inputFiles())
    # non-key sketch must NOT skip while deltas exist (stats gate)
    t2 = t.refresh()
    n2 = t2.compute_sketches(["text"])
    assert n2 > 0
    probe = t2.refresh().read(ranges={"text": [("moved", "moved")]})
    assert probe.count() == 1


def test_sketch_survives_rename_and_appends_stay_unskipped(spark, tmp_path):
    """Sketches are field-id keyed (rename-proof); files appended
    after the sketch run carry none and are always planned until the
    incremental recompute covers them."""
    t = _mk(spark, str(tmp_path / "t"))
    n1 = t.compute_sketches(["text"])
    t = t.refresh()
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "body"})
    t = t.refresh()
    got = t.read(ranges={"body": [("c7 t3", "c7 t3")]})
    assert got.count() == 1
    assert len(got.inputFiles()) < len(t.read().inputFiles())
    # new batch lands WITHOUT sketches → probe for its value still hits
    extra = spark.createDataFrame(
        [("z9", 0, "user", "fresh row", "", _ts(2), "INSERT", 20_000)],
        DDL.replace("text string", "body string"),
    )
    t.merge(extra, "w", "b2")
    t = t.refresh()
    assert t.read(ranges={"body": [("fresh row", "fresh row")]}).count() == 1
    # incremental: only the new files get scanned/sketched
    n2 = t.compute_sketches(["body"])
    assert 0 < n2 < n1 + n2
    t = t.refresh()
    assert t.read(ranges={"body": [("fresh row", "fresh row")]}).count() == 1


def test_widen_then_sketch_hashes_current_type(spark, tmp_path):
    """Files written while turn_idx was int32 are sketched under the
    CURRENT (widened) bigint type — cast-before-hash on the Spark
    side, hashLong on the probe side — so probes keep matching."""
    t = _mk(spark, str(tmp_path / "t"))
    t.apply_ddl({"op": "WIDEN_COLUMN", "column": "turn_idx", "new_type": "bigint"})
    t = t.refresh()
    t.compute_sketches(["turn_idx"])
    t = t.refresh()
    got = t.read(ranges={"conv_id": [("c4", "c4")], "turn_idx": [(3, 3)]})
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["turn_idx"] == 3


def test_all_null_column_yields_always_negative_sketch(spark, tmp_path):
    """A file whose sketched column is entirely NULL gets an all-zero
    bitmap: any probe skips it (NULL never equals a point probe)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], "conv_id", 4,
    )
    rows = [
        (c, i, "user", f"{c} {i}", None, _ts(1), "INSERT", 1 + i)
        for i, c in enumerate(["a1", "a2", "a3", "a4"])
    ]
    t.merge(spark.createDataFrame(rows, DDL), "w", "b0")
    t = t.refresh()
    t.compute_sketches(["tool"])
    t = t.refresh()
    got = t.read(ranges={"tool": [("anything", "anything")]})
    assert got.count() == 0 and got.inputFiles() == []


def test_probe_helpers_are_safe_on_garbage(spark, tmp_path):
    """Planner never fails closed: unhashable probes disable sketch
    pruning, unreadable sketches read as maybe-present."""
    assert sketch_hash("string", None) is None
    assert sketch_hash("double", 1.5) is None  # unsupported type
    assert sketch_hash("bigint", "oops") is None  # type mismatch
    assert sketch_hash("timestamp", _ts(3)) is not None
    assert sketch_contains({"m": 64, "k": 2, "b": "!!!notbase64"}, 1, 3)
    assert sketch_contains({}, 1, 3)
    lo, step = sketch_hash("string", "x")
    full = {"m": 64, "k": 2, "b": "/" * 12}  # all-ones bitmap
    assert sketch_contains(full, lo, step)


def test_interop_reader_shares_sketch_pruning(spark, tmp_path):
    """The Spark-free DuckDB reader plans the SAME membership skips
    (shared planner) and returns identical rows for a point probe."""
    from delta_spark.lake.interop import read_duckdb, read_sql

    t = _mk(spark, str(tmp_path / "t"))
    t.compute_sketches(["text"])
    t = t.refresh()
    probe = {"text": [("c7 t3", "c7 t3")]}
    sp = sorted(map(tuple, t.read(ranges=probe).collect()))
    du = sorted(map(tuple, read_duckdb(t.path, ranges=probe).fetchall()))
    assert sp == du and len(sp) == 1
    full = read_sql(t.path).count(".parquet'")
    pruned = read_sql(t.path, ranges=probe).count(".parquet'")
    assert 0 < pruned < full


def test_lookup_composes_with_key_sketch(spark, tmp_path):
    """lookup() goes through the same point-interval planner, so a
    bucket-colocated key with a sketched key column plans the
    intersection of bucket pruning and membership pruning."""
    t = _mk(spark, str(tmp_path / "t"))
    base_planned = len(t.lookup(["c7"]).inputFiles())
    t.compute_sketches(["conv_id"])
    t = t.refresh()
    got = t.lookup(["c7"])
    assert got.count() == 5
    assert 0 < len(got.inputFiles()) <= base_planned


def test_sketch_before_widen_refused_then_rebuilt(spark, tmp_path):
    """The reverse order — sketch FIRST, widen AFTER — must never lose
    rows: the stored sketch was hashed under int32, the post-widen
    probe hashes under bigint (different bit positions entirely), so
    the planner refuses the stale sketch (type recorded in the entry)
    rather than trusting a false 'definitely absent'. An incremental
    compute_sketches afterwards rebuilds under the current type and
    restores pruning."""
    t = _mk(spark, str(tmp_path / "t"))
    t.compute_sketches(["turn_idx"])
    t = t.refresh()
    t.apply_ddl({"op": "WIDEN_COLUMN", "column": "turn_idx", "new_type": "bigint"})
    t = t.refresh()
    # stale sketches present, but every matching row still comes back
    got = t.read(ranges={"conv_id": [("c4", "c4")], "turn_idx": [(3, 3)]})
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["turn_idx"] == 3
    # incremental refresh sees the type mismatch and re-sketches
    n = t.compute_sketches(["turn_idx"])
    assert n > 0, "type-stale sketches must be rebuilt, not skipped"
    t = t.refresh()
    fid = str(next(f["id"] for f in t.fields if f["name"] == "turn_idx"))
    assert all(
        f["sketch"][fid]["t"] == "bigint"
        for f in t.current_snapshot["files"]
    )
    rows = t.read(
        ranges={"conv_id": [("c4", "c4")], "turn_idx": [(3, 3)]}
    ).collect()
    assert len(rows) == 1 and rows[0]["turn_idx"] == 3
    # and a second refresh is a no-op (parameters + type now current)
    assert t.compute_sketches(["turn_idx"]) == 0


def test_sketch_refuses_unattributable_scan_paths(spark, tmp_path, monkeypatch):
    """An all-zero sketch means "definitely absent for every probe" —
    committing one for a file the scan merely failed to attribute
    (URI→path round-trip broken, e.g. an object-store scheme) would
    silently prune live rows from every point read. compute_sketches
    must refuse loudly and commit nothing instead."""
    import urllib.parse as up

    import pytest

    t = _mk(spark, str(tmp_path / "t"), convs=4, turns=2)
    orig = up.unquote
    monkeypatch.setattr(up, "unquote", lambda s, *a, **k: orig(s, *a, **k) + ".nope")
    before = t.metadata["version"]
    with pytest.raises(ValueError, match="cannot attribute"):
        t.compute_sketches(["conv_id"])
    t = t.refresh()
    assert t.metadata["version"] == before, "no partial sketch commit"
    assert all("sketch" not in f for f in t.current_snapshot["files"])
