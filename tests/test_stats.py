"""Manifest column-bounds stats + file skipping (Iceberg column
bounds / scan planning analog): per-file min/max of the key columns
(plus opt-in extras) recorded at write time from parquet footers,
consumed driver-side by ``read(ranges=...)`` and ``lookup(...)`` so a
selective read plans down to a handful of files without opening any.

Skip-safety rules under MoR (the part Iceberg gets for free from
positional deletes and we must argue for fold-on-read):
  * key columns: every version of a key carries the same key value, so
    excluding files whose key range misses the predicate excludes only
    keys the predicate misses — always exact;
  * non-key columns: a base row may be superseded by a delta row whose
    NEW value re-enters the range, so file-skip happens only on
    delta-free snapshots; the row filter always applies post-fold.
"""

import datetime

from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _ts(day, month=1):
    return datetime.datetime(2026, month, day, 12, 0, 0)


def _rows(convs, n_turns, month=1, seq0=1, op="INSERT"):
    out = []
    s = seq0
    for c in convs:
        for t in range(n_turns):
            out.append((c, t, "user", f"{c} t{t}", "", _ts(1 + t % 27, month), op, s))
            s += 1
    return out


def _mk(spark, path, stats_cols=("ts",), n_buckets=8):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id",
        n_buckets, stats_cols=list(stats_cols),
    )
    df = spark.createDataFrame(_rows([f"c{i}" for i in range(10)], 5), DDL)
    t.merge(df, "w", "b0")
    return t


def test_manifest_entries_carry_stats(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    id_of = {f["name"]: str(f["id"]) for f in t.fields}
    files = t.current_snapshot["files"]
    assert files
    for f in files:
        st = f.get("stats", {})
        # key cols + opted-in ts all bounded
        for c in ("conv_id", "turn_idx", "ts"):
            assert id_of[c] in st, (f["path"], st)
        lo, hi = st[id_of["conv_id"]]
        assert lo.startswith("c") and hi.startswith("c") and lo <= hi
        tlo, thi = st[id_of["ts"]]
        assert isinstance(tlo, int) and tlo <= thi  # epoch micros


def test_key_range_read_skips_files_and_is_exact(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    full = t.read()
    want = full.filter((F.col("conv_id") >= "c3") & (F.col("conv_id") <= "c4"))
    got = t.read(ranges={"conv_id": ("c3", "c4")})
    assert sorted(got.collect()) == sorted(want.collect())
    # driver-side planning touched strictly fewer files
    assert 0 < len(got.inputFiles()) < len(full.inputFiles())


def test_nonkey_range_skips_on_delta_free_snapshot(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))  # all ts in January
    got = t.read(ranges={"ts": (_ts(1, month=3), None)})
    assert got.count() == 0
    # every file's ts bound excludes March → nothing even planned
    assert got.inputFiles() == []
    # half-open range with survivors stays exact
    mid = _ts(3)
    want = t.read().filter(F.col("ts") >= mid).count()
    assert t.read(ranges={"ts": (mid, None)}).count() == want


def test_nonkey_skip_disabled_under_mor_deltas(spark, tmp_path):
    """An update moves a row's ts from Jan to June via a delta file;
    base-file stats still say Jan. A June query must NOT skip the base
    file (the fold needs the base row's key context) and must return
    the updated row."""
    t = _mk(spark, str(tmp_path / "t"))
    upd = spark.createDataFrame(
        [("c3", 0, "user", "moved", "", _ts(5, month=6), "UPDATE", 10_000)], DDL
    )
    t.merge(upd, "w", "b1", mode="mor")
    got = t.read(ranges={"ts": (_ts(1, month=6), None)}).collect()
    assert len(got) == 1 and got[0]["text"] == "moved"
    # and the stale pre-update row is judged by its LATEST value: a
    # January query no longer returns c3/0
    jan = t.read(ranges={"ts": (None, _ts(27, month=1))})
    assert jan.filter((F.col("conv_id") == "c3") & (F.col("turn_idx") == 0)).count() == 0


def test_point_lookup_plans_few_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    got = t.lookup(["c7"])
    rows = got.collect()
    assert len(rows) == 5 and all(r["conv_id"] == "c7" for r in rows)
    full = t.read()
    assert 0 < len(got.inputFiles()) < len(full.inputFiles())
    # lookup of an absent key still exact (may plan 0 or few files)
    assert t.lookup(["zz-missing"]).count() == 0


def test_lookup_survives_rename(spark, tmp_path):
    """Stats are keyed by field id, so a RENAME_COLUMN neither
    invalidates them nor breaks range planning."""
    t = _mk(spark, str(tmp_path / "t"))
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "conv_id", "new_name": "conversation_id"})
    t = t.refresh()
    got = t.lookup(["c7"])
    assert got.count() == 5
    assert len(got.inputFiles()) < len(t.read().inputFiles())
    want = t.read().filter(F.col("conversation_id").between("c3", "c4"))
    ranged = t.read(ranges={"conversation_id": ("c3", "c4")})
    assert sorted(ranged.collect()) == sorted(want.collect())


def test_ranges_compose_with_buckets_and_mor(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    upd = spark.createDataFrame(
        [("c3", 1, "user", "v2", "", _ts(9), "UPDATE", 20_000)], DDL
    )
    t.merge(upd, "w", "b1", mode="mor")
    got = t.lookup(["c3"]).orderBy("turn_idx").collect()
    assert [r["text"] for r in got] == ["c3 t0", "v2", "c3 t2", "c3 t3", "c3 t4"]


def test_interop_ranges_match_spark(spark, tmp_path):
    """The DuckDB reader plans the SAME file skips (shared planner in
    lake/stats.py) and returns the same rows for a ranged read — with a
    MoR delta in play so the non-key bound is judged post-fold there
    too."""
    from delta_spark.lake.interop import read_duckdb, read_sql

    t = _mk(spark, str(tmp_path / "t"))
    upd = spark.createDataFrame(
        [("c3", 0, "user", "moved", "", _ts(5, month=6), "UPDATE", 10_000)], DDL
    )
    t.merge(upd, "w", "b1", mode="mor")
    ranges = {"conv_id": ("c3", "c4"), "ts": (_ts(2), None)}
    sp = sorted(map(tuple, t.read(ranges=ranges).collect()))
    du = sorted(map(tuple, read_duckdb(t.path, ranges=ranges).fetchall()))
    assert sp == du and len(sp) > 0
    # and the emitted SQL itself plans fewer files under a key range
    full = read_sql(t.path).count(".parquet'")
    pruned = read_sql(t.path, ranges={"conv_id": ("c3", "c4")}).count(".parquet'")
    assert 0 < pruned < full


def test_compact_sorts_within_files(spark, tmp_path):
    """Compaction rewrites files sorted by key so parquet row-group
    stats become tight (scan-relevant at real file sizes; asserted here
    via physical row order)."""
    import pyarrow.parquet as pq

    t = _mk(spark, str(tmp_path / "t"))
    upd = spark.createDataFrame(_rows([f"c{i}" for i in range(10)], 5, month=2, seq0=10_001), DDL)
    t.merge(upd, "w", "b1", mode="mor")
    assert t.compact(max_files_per_bucket=0) > 0
    t = t.refresh()
    files = [f for f in t.current_snapshot["files"] if f["bucket"] != -1]
    assert files
    import os

    for f in files:
        tb = pq.read_table(os.path.join(t.path, f["path"]), columns=["conv_id", "turn_idx"])
        pairs = list(zip(tb.column("conv_id").to_pylist(), tb.column("turn_idx").to_pylist()))
        assert pairs == sorted(pairs), f["path"]
    # and the compacted (delta-free) snapshot re-enables non-key skip
    assert t.read(ranges={"ts": (_ts(1, month=3), None)}).inputFiles() == []
