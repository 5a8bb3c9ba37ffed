"""Bucket-spec evolution (LakeTable.rebucket) — Iceberg partition-spec
evolution rebuilt for hash buckets: a metadata-only bucket-count change;
files keep the spec they were written under; reads stay exact (foreign-
spec files row-filtered on the recomputed hash); CoW merges migrate the
foreign files they touch; compact() migrates everything."""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import assert_pdf_equal
from delta_spark.lake import LakeTable
from delta_spark.lake.interop import read_sql
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _rows(lo, hi, text, op="INSERT", seq0=None):
    return [
        (f"c{i}", 0, "user", f"{text} {i}", "", TS, op, (seq0 or hi * 10) + i)
        for i in range(lo, hi)
    ]


def _mk(spark, path, n=40, buckets=4):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", buckets
    )
    t.merge(spark.createDataFrame(_rows(0, n, "v1", seq0=0), DDL), "w", "b0")
    return t


def _oracle(t):
    """Recompute live state from scratch: full unpruned read is the
    reference (spec-agnostic by construction)."""
    return t.read().toPandas()


def test_rebucket_is_metadata_only_and_reads_stay_exact(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=40, buckets=4)
    before = _oracle(t)
    files_before = {f["path"] for f in t.current_snapshot["files"]}
    assert t.rebucket(16) is True
    assert t.rebucket(16) is False  # no-op at same modulus
    assert t.num_buckets == 16 and t.bucket_spec_id == 1
    assert t.bucket_specs == {0: 4, 1: 16}
    # no data rewritten, same snapshot
    assert {f["path"] for f in t.current_snapshot["files"]} == files_before
    assert_pdf_equal(t.read().toPandas(), before, ["conv_id", "turn_idx"])


def test_pruned_read_is_pure_key_predicate_across_specs(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=60, buckets=4)
    t.rebucket(16)
    # MoR delta under the NEW spec + old-spec base both live
    t.merge(
        spark.createDataFrame(_rows(0, 10, "v2", "UPDATE", seq0=1000), DDL),
        "w", "b1", mode="mor",
    )
    full = t.read(include_system=True).withColumn(
        "b", F.pmod(F.xxhash64("conv_id"), F.lit(16))
    )
    for bset in ([0], [3, 7, 11], list(range(16))):
        want = full.filter(F.col("b").isin(bset)).drop("b").toPandas()
        got = t.read(buckets=bset, include_system=True).toPandas()
        assert_pdf_equal(got, want, ["conv_id", "turn_idx"])


def test_cow_merge_after_rebucket_migrates_touched_files_exactly(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=50, buckets=4)
    t.rebucket(8)
    # CoW merge: updates 5 keys, deletes 1, inserts 2
    batch = spark.createDataFrame(
        [
            *_rows(0, 5, "v2", "UPDATE", seq0=1000),
            ("c7", 0, None, None, None, None, "DELETE", 2000),
            ("x1", 0, "user", "new 1", "", TS, "INSERT", 3000),
            ("x2", 0, "user", "new 2", "", TS, "INSERT", 3001),
        ],
        DDL,
    )
    st = t.merge(batch, "w", "b1", mode="cow")
    assert st is not None
    # expected state: recompute in pandas
    import pandas as pd

    base = pd.DataFrame(
        _rows(0, 50, "v1", seq0=0),
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "seq"],
    ).drop(columns=["op", "seq"])
    base.loc[base.conv_id.isin([f"c{i}" for i in range(5)]), "text"] = [
        f"v2 {i}" for i in range(5)
    ]
    base = base[base.conv_id != "c7"]
    base = pd.concat(
        [
            base,
            pd.DataFrame(
                [
                    ("x1", 0, "user", "new 1", "", TS),
                    ("x2", 0, "user", "new 2", "", TS),
                ],
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            ),
        ],
        ignore_index=True,
    )
    assert_pdf_equal(t.read().toPandas(), base, ["conv_id", "turn_idx"])
    # every REPLACED foreign file is gone; every batch key now lives in
    # a current-spec file; untouched foreign files remain (incremental
    # migration, never a full rewrite)
    specs = {t._entry_spec(f) for f in t.current_snapshot["files"]}
    assert 1 in specs, "rewrite happened under the new spec"
    assert 0 in specs, "untouched old-spec files were NOT rewritten"
    # a second identical merge is idempotent (marker)
    assert t.merge(batch, "w", "b1", mode="cow") is None


def test_compact_migrates_every_foreign_file(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=50, buckets=4)
    t.rebucket(8)
    t.merge(
        spark.createDataFrame(_rows(0, 10, "v2", "UPDATE", seq0=1000), DDL),
        "w", "b1", mode="mor",
    )
    before = _oracle(t)
    n = t.compact(max_files_per_bucket=1)
    assert n > 0
    after_files = t.current_snapshot["files"]
    assert {t._entry_spec(f) for f in after_files} == {1}
    assert all(f["bucket"] != -1 for f in after_files), "spanning absorbed"
    assert_pdf_equal(t.read().toPandas(), before, ["conv_id", "turn_idx"])
    # file-level pruning restored: a pruned read touches only the
    # requested buckets' files (+ none spanning/foreign)
    got = t.read(buckets=[0, 1], include_system=True)
    want = (
        t.read(include_system=True)
        .filter(F.pmod(F.xxhash64("conv_id"), F.lit(8)).isin([0, 1]))
        .toPandas()
    )
    assert_pdf_equal(got.toPandas(), want, ["conv_id", "turn_idx"])


def test_interop_full_read_exact_across_specs_pruned_raises(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=30, buckets=4)
    t.rebucket(8)
    t.merge(
        spark.createDataFrame(_rows(0, 5, "v2", "UPDATE", seq0=500), DDL),
        "w", "b1", mode="mor",
    )
    eng = t.read().toPandas()
    duck = duckdb.sql(read_sql(t.path)).df()
    assert_pdf_equal(
        duck.sort_index(axis=1), eng.sort_index(axis=1), ["conv_id", "turn_idx"]
    )
    # pure-SQL pruning can't recompute the hash for foreign-spec rows…
    with pytest.raises(NotImplementedError):
        read_sql(t.path, buckets=[0])
    # …but read_duckdb registers the Spark-equal XXH64 UDF and prunes
    # exactly across the spec boundary
    from delta_spark.lake.interop import read_duckdb

    con = duckdb.connect()
    sp0 = sorted(map(tuple, t.read(buckets=[0]).collect()))
    du0 = sorted(map(tuple, read_duckdb(t.path, con=con, buckets=[0]).fetchall()))
    assert du0 == sp0 and len(sp0) > 0
    # after compact the pure-SQL pruned read works again
    t.compact(max_files_per_bucket=1)
    duckdb.sql(read_sql(t.path, buckets=[0])).df()


def test_read_changes_across_rebucket_boundary(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=30, buckets=4)
    sid_a = t.metadata["current_snapshot_id"]
    t.rebucket(8)
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "user", "v2", "", TS, "UPDATE", 1000),
                ("c2", 0, None, None, None, None, "DELETE", 1001),
                ("z9", 0, "user", "zz", "", TS, "INSERT", 1002),
            ],
            DDL,
        ),
        "w", "b1", mode="mor",
    )
    ch = {r["conv_id"]: r for r in t.read_changes(sid_a).collect()}
    assert set(ch) == {"c1", "c2", "z9"}
    assert ch["c1"]["_change_type"] == "update"
    assert ch["c2"]["_change_type"] == "delete"
    assert ch["z9"]["_change_type"] == "insert"


def test_pipeline_rebucket_mid_stream_equivalent(spark, tmp_path):
    """E2E: replaying one changelog with a mid-run rebucket yields the
    same final state as replaying it without."""
    import os

    from delta_spark.changelog import ChangelogSpec, generate_and_write
    from delta_spark.pipeline import Pipeline, PipelineConfig

    d = str(tmp_path)
    generate_and_write(
        os.path.join(d, "log"),
        ChangelogSpec(n_events=3000, n_convs=40, seed=11, include_ddl=False),
    )

    def run(tag, split):
        cfg = PipelineConfig(
            changelog_path=os.path.join(d, "log"),
            table_path=os.path.join(d, f"tbl_{tag}"),
            checkpoint_dir=os.path.join(d, f"ck_{tag}"),
            generation=1,
            num_buckets=4,
            max_files_per_trigger=2,
        )
        p = Pipeline(spark, cfg)
        if not split:
            p.run_stream_to_completion()
        else:
            # epoch 1, then rebucket, then the rest resumes from the
            # checkpoint and writes under the NEW spec
            q = p.run_stream(available_now=False)
            while not p.stats:
                q.processAllAvailable() if False else None
                import time

                time.sleep(0.2)
            q.stop()
            q.awaitTermination(60)
            LakeTable.load(spark, cfg.table_path).rebucket(16)
            p2 = Pipeline(spark, cfg)
            p2.run_stream_to_completion()
        return LakeTable.load(spark, cfg.table_path).read().toPandas()

    plain = run("plain", split=False)
    rebkt = run("rebkt", split=True)
    assert_pdf_equal(rebkt, plain, ["conv_id", "turn_idx"])


def test_changes_sql_parity_across_rebucket(spark, tmp_path):
    """The Spark-free changes_sql full-diffs both snapshots (it never
    bucket-prunes), so it must agree with the engine's bucket-pruned
    read_changes even when the range crosses a bucket-spec change."""
    from delta_spark.lake.interop import changes_sql

    t = _mk(spark, str(tmp_path / "t"), n=25, buckets=4)
    sid_a = t.metadata["current_snapshot_id"]
    t.rebucket(16)
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "user", "v2", "", TS, "UPDATE", 900),
                ("c2", 0, None, None, None, None, "DELETE", 901),
                ("n1", 0, "user", "new", "", TS, "INSERT", 902),
            ],
            DDL,
        ),
        "w", "b1", mode="mor",
    )
    t.compact(max_files_per_bucket=1)
    sid_b = t.metadata["current_snapshot_id"]
    eng = t.read_changes(sid_a, sid_b).toPandas()
    duck = duckdb.sql(changes_sql(str(tmp_path / "t"), sid_a, sid_b)).df()
    assert_pdf_equal(
        eng.sort_index(axis=1), duck.sort_index(axis=1), ["conv_id", "turn_idx"]
    )
