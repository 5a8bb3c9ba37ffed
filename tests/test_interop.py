"""External-engine interop: DuckDB reads a LakeTable (lake/interop.py)
and must match LakeTable.read() bit-for-bit — across CoW base files,
MoR deltas, tombstones, renames/adds (schema evolution by column id),
bucket pruning, and time travel. Also proves the reader runs with NO
Spark: a subprocess with pyspark import-poisoned reads the table."""

import datetime
import subprocess
import sys

from conftest import assert_pdf_equal

from delta_spark.lake import LakeTable
from delta_spark.lake import interop
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


def _norm(pdf):
    import pandas as pd

    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[ns]")
    return pdf


def _mk_history(spark, path):
    """CoW base -> RENAME text->body + ADD score -> two MoR delta
    commits with updates and deletes."""
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 8
    )
    rows = [
        (f"c{i % 10}", i, "user", f"r{i}", "", TS, "INSERT", i + 1)
        for i in range(100)
    ]
    base = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    t.merge(base, "w1", "b0")  # CoW (empty table)
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "body"})
    t.apply_ddl({"op": "ADD_COLUMN", "column": "score", "new_type": "double"})
    upd = spark.createDataFrame(
        [
            (f"c{i % 10}", i, "assistant", f"v2 r{i}", "", TS, 0.5 + i,
             "UPDATE" if i % 3 else "DELETE", 1000 + i)
            for i in range(0, 100, 2)
        ],
        "conv_id string, turn_idx int, role string, body string, tool string, "
        "ts timestamp, score double, op string, seq long",
    )
    t.merge(upd, "w1", "b1", mode="mor", sort_col="ts")
    upd2 = spark.createDataFrame(
        [("c1", 1, "assistant", "v3", "", TS, 9.0, "UPDATE", 2000)],
        "conv_id string, turn_idx int, role string, body string, tool string, "
        "ts timestamp, score double, op string, seq long",
    )
    t.merge(upd2, "w1", "b2", mode="mor", sort_col="ts")
    return t


def test_duckdb_reads_lake_table_exactly(spark, tmp_path):
    t = _mk_history(spark, str(tmp_path / "t"))
    assert any(
        f.get("kind") == "delta" for f in t.current_snapshot["files"]
    ), "fixture must exercise the MoR fold path"
    expected = _norm(t.read().toPandas())
    got = _norm(interop.read_duckdb(t.path).df())
    assert_pdf_equal(got, expected, ["conv_id", "turn_idx"])


def test_duckdb_bucket_pruned_read_matches(spark, tmp_path):
    t = _mk_history(spark, str(tmp_path / "t"))
    for bs in ([0, 3], [7], []):
        expected = _norm(t.read(buckets=bs).toPandas())
        got = _norm(interop.read_duckdb(t.path, buckets=bs).df())
        assert_pdf_equal(got, expected, ["conv_id", "turn_idx"])


def test_duckdb_time_travel_matches(spark, tmp_path):
    t = _mk_history(spark, str(tmp_path / "t"))
    sid = t.metadata["snapshots"][0]["id"]  # pre-rename snapshot
    expected = _norm(t.read(snapshot_id=sid).toPandas())
    got = _norm(interop.read_duckdb(t.path, snapshot_id=sid).df())
    # pre-rename schema: still named `text`, no `score`
    assert "text" in got.columns and "score" not in got.columns
    assert_pdf_equal(got, expected, ["conv_id", "turn_idx"])


def test_interop_reader_needs_no_spark(spark, tmp_path):
    """The reader is format-spec-only: a subprocess with pyspark
    IMPORT-POISONED resolves metadata/manifests and reads the table."""
    t = _mk_history(spark, str(tmp_path / "t"))
    n = t.read().count()
    script = f"""
import importlib.util, sys
sys.modules["pyspark"] = None  # any `import pyspark` now fails
spec = importlib.util.spec_from_file_location("interop", {interop.__file__!r})
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
rows = m.read_duckdb({t.path!r}).fetchall()
assert "pyspark" not in sys.modules or sys.modules["pyspark"] is None
print(len(rows))
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert int(out.stdout.strip()) == n


def test_duckdb_reads_composite_sortkey_table(spark, tmp_path):
    """Composite sortKeys store `_sort` as array<bigint>; DuckDB list
    comparison is lexicographic like Spark's — the MoR fold must pick
    the same winner for equal-seq revisions."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 4
    )
    ddl = ("conv_id string, turn_idx int, role string, text string, tool string, "
           "ts timestamp, op string, seq long")
    base = spark.createDataFrame(
        [(f"c{i}", 0, "user", f"base {i}", "", TS, "INSERT", 1) for i in range(8)], ddl
    )
    t.merge(base, "w1", "b0", sort_col=("ts", "seq"))
    # equal seq, tie broken by (ts, seq): later ts must win
    upd = spark.createDataFrame(
        [("c1", 0, "user", "loser", "", TS, "UPDATE", 5),
         ("c1", 0, "user", "winner", "", datetime.datetime(2026, 2, 1), "UPDATE", 5)],
        ddl,
    )
    t.merge(upd, "w1", "b1", mode="mor", sort_col=("ts", "seq"))
    expected = _norm(t.read().toPandas())
    assert (expected.loc[expected.conv_id == "c1", "text"] == "winner").all()
    got = _norm(interop.read_duckdb(t.path).df())
    assert_pdf_equal(got, expected, ["conv_id", "turn_idx"])


def test_multi_interval_nonkey_range_respects_tombstones(spark, tmp_path):
    """Regression: a multi-interval range on a NON-key column used to
    append an unparenthesized OR after 'NOT _deleted', resurrecting
    tombstoned rows whose value fell in the later interval."""
    DDL = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, op string, seq long"
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], "conv_id", 4,
    )
    t.merge(spark.createDataFrame(
        [(f"c{i}", 0, "user", f"t{i:02d}", "", TS, "INSERT", i + 1)
         for i in range(10)], DDL), "w", "b0")
    # tombstone a row whose text lands in the SECOND interval
    t.merge(spark.createDataFrame(
        [("c8", 0, None, None, None, None, "DELETE", 100)], DDL),
        "w", "b1", mode="mor")
    t.compact(max_files_per_bucket=1)  # delta-free: non-key skip legal
    ranges = {"text": [("t00", "t02"), ("t07", "t09")]}
    want = sorted(r["text"] for r in t.read(ranges=ranges).collect())
    got = sorted(
        r[3] for r in interop.read_duckdb(str(tmp_path / "t"), ranges=ranges).fetchall()
    )
    assert got == want
    assert "t08" not in got, "tombstoned row resurrected by OR precedence"
    assert set(got) == {"t00", "t01", "t02", "t07", "t09"}
