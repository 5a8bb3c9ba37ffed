"""Sort-order rewrite (``cluster_by``) — Iceberg rewrite_data_files
with a sort order / Delta OPTIMIZE ZORDER analog.

Hash buckets spread every sort-key range over ALL files, so a range
scan on a non-key column row-filters the whole table even with
manifest stats (every file's bounds span the domain). ``cluster_by``
rewrites files range-disjoint on the sort columns; the invariants
under test: data identical before/after, range scans plan strictly
fewer files DRIVER-SIDE, the sort columns' stats are added in the
same commit, key semantics (lookup, MERGE, bucket pruning) untouched,
and maintenance (``compact``) preserves the clustering."""

import datetime

from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _ts(month, day=1):
    return datetime.datetime(2026, month, day, 12, 0, 0)


def _rows(n_convs, months=12, seq0=1):
    """Every conv contributes one turn per month — so every BUCKET
    (hash of conv_id) spans the full ts domain before clustering."""
    out, s = [], seq0
    for i in range(n_convs):
        for m in range(1, months + 1):
            out.append(
                (f"c{i}", m, "user", f"c{i} m{m}", "", _ts(m), "INSERT", s)
            )
            s += 1
    return out


def _mk(spark, path, n_convs=24, stats_cols=(), n_buckets=8):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id",
        n_buckets, stats_cols=list(stats_cols),
    )
    t.merge(spark.createDataFrame(_rows(n_convs), DDL), "w", "b0")
    return t


def _sorted_rows(df):
    return sorted(
        df.select("conv_id", "turn_idx", "role", "text", "ts").collect()
    )


def test_cluster_rewrite_preserves_data_and_folds_deltas(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    # MoR update + delete so the rewrite has deltas/tombstones to fold
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 3, "user", "updated", "", _ts(3), "UPDATE", 10_000),
                ("c2", 5, None, None, None, None, "DELETE", 10_001),
            ],
            DDL,
        ),
        "w", "b1", mode="mor",
    )
    before = _sorted_rows(t.read())
    n = t.cluster_by(["ts"])
    assert n > 0
    assert _sorted_rows(t.read()) == before
    # full CoW rewrite: delta-free snapshot, tombstones purged
    files = t.current_snapshot["files"]
    assert all(f.get("kind") != "delta" for f in files)
    assert t.read(include_system=True).filter(F.col("_deleted")).count() == 0
    assert t.cluster_cols == ["ts"]


def test_cluster_makes_range_scans_skip_files(spark, tmp_path):
    # ts in stats from the start: before clustering the stats exist but
    # every file spans all 12 months — nothing skips
    t = _mk(spark, str(tmp_path / "t"), stats_cols=("ts",))
    rng = {"ts": (_ts(6), _ts(6, day=28))}
    want = _sorted_rows(t.read().filter(
        (F.col("ts") >= _ts(6)) & (F.col("ts") <= _ts(6, day=28))
    ))
    pre = t.read(ranges=rng)
    assert _sorted_rows(pre) == want
    pre_files = len(pre.inputFiles())
    total = len(t.read().inputFiles())
    assert pre_files == total, "unclustered: stats can't skip anything"

    t.cluster_by(["ts"])
    post = t.read(ranges=rng)
    assert _sorted_rows(post) == want
    post_files = len(post.inputFiles())
    post_total = len(t.read().inputFiles())
    # 1 month of 12: a range-disjoint layout must skip most files
    assert 0 < post_files <= post_total // 3


def test_cluster_adds_stats_for_new_sort_column(spark, tmp_path):
    # created WITHOUT ts stats: cluster_by must add them in-commit
    t = _mk(spark, str(tmp_path / "t"), stats_cols=())
    id_of = {f["name"]: f["id"] for f in t.fields}
    assert id_of["ts"] not in t.stats_ids
    t.cluster_by(["ts"])
    assert id_of["ts"] in t.stats_ids
    got = t.read(ranges={"ts": (_ts(2), _ts(2, day=28))})
    assert 0 < len(got.inputFiles()) < len(t.read().inputFiles())
    assert got.count() == t.read().filter(
        (F.col("ts") >= _ts(2)) & (F.col("ts") <= _ts(2, day=28))
    ).count()
    # a reloaded handle sees the sort order (it lives in metadata)
    assert LakeTable.load(spark, t.path).cluster_cols == ["ts"]


def test_cluster_keeps_key_semantics(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), stats_cols=("ts",))
    t.cluster_by(["ts"])
    # files stay bucket-pure → point lookup still plans few files
    got = t.lookup(["c7"])
    assert got.count() == 12
    assert 0 < len(got.inputFiles()) < len(t.read().inputFiles())
    # MERGE on top of the clustered layout stays exact
    t.merge(
        spark.createDataFrame(
            [("c7", 1, "user", "post-cluster", "", _ts(1), "UPDATE", 20_000)],
            DDL,
        ),
        "w", "b2",
    )
    row = t.lookup(["c7"]).filter(F.col("turn_idx") == 1).collect()
    assert len(row) == 1 and row[0]["text"] == "post-cluster"


def test_compact_preserves_clustering(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), stats_cols=("ts",))
    t.cluster_by(["ts"])
    # pile up MoR deltas, then compact (which absorbs them)
    for i in range(3):
        t.merge(
            spark.createDataFrame(
                [(f"c{i}", 1, "user", f"u{i}", "", _ts(1), "UPDATE", 30_000 + i)],
                DDL,
            ),
            "w", f"m{i}", mode="mor",
        )
    assert t.compact(max_files_per_bucket=0) > 0
    files = t.current_snapshot["files"]
    assert all(f.get("kind") != "delta" for f in files)
    rng = {"ts": (_ts(9), _ts(9, day=28))}
    got = t.read(ranges=rng)
    assert 0 < len(got.inputFiles()) <= len(t.read().inputFiles()) // 3
    want = t.read().filter((F.col("ts") >= _ts(9)) & (F.col("ts") <= _ts(9, day=28)))
    assert _sorted_rows(got) == _sorted_rows(want)


def test_cluster_is_rename_proof(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), stats_cols=("ts",))
    t.cluster_by(["ts"])
    t.apply_ddl(
        {"op": "RENAME_COLUMN", "column": "ts", "new_name": "event_ts"}
    )
    assert t.cluster_cols == ["event_ts"]
    got = t.read(ranges={"event_ts": (_ts(4), _ts(4, day=28))})
    assert 0 < len(got.inputFiles()) < len(t.read().inputFiles())
    assert got.count() == 24


def test_cluster_rejects_unknown_column(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    import pytest

    with pytest.raises(ValueError, match="unknown cluster column"):
        t.cluster_by(["nope"])
    with pytest.raises(ValueError, match="at least one"):
        t.cluster_by([])


def test_cluster_by_survives_ref_disjoint_race(spark, tmp_path):
    """Regression: losing the optimistic version race to a
    ref-disjoint commit (a tag from another handle) used to drop the
    clustering metadata on the rebase — the files landed but
    cluster_cols/stats came back empty."""
    t = _mk(spark, str(tmp_path / "t"), stats_cols=("ts",))
    stale = LakeTable.load(spark, str(tmp_path / "t"))  # version V
    t.tag("pin")  # bumps the version; `stale` doesn't see it
    n = stale.cluster_by(["ts"])  # loses the race once, rebases
    assert n > 0
    t.refresh()
    assert t.cluster_cols == ["ts"]
    assert "pin" in t.tags  # nobody's write was lost
    # and a FAILED rewrite never leaks phantom clustering
    t2 = _mk(spark, str(tmp_path / "t2"))
    try:
        t2.cluster_by(["nope"])
    except ValueError:
        pass
    assert t2.cluster_cols == []
