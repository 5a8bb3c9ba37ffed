"""DROP_COLUMN schema evolution (Iceberg drop semantics: column id
retired, never reused; time travel keeps history) and orphan-file GC
(Iceberg remove_orphan_files analog for crash-leaked writes)."""

import datetime
import os
import time

from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply
from delta_spark.lake import LakeTable
from delta_spark.pipeline import Pipeline, PipelineConfig
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _mk(spark, path, n=10):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 4
    )
    t.merge(
        spark.createDataFrame(
            [(f"c{i}", 0, "user", f"v{i}", "tl", TS, "INSERT", i + 1) for i in range(n)],
            DDL,
        ),
        "w",
        "b0",
    )
    return t


def test_drop_column_semantics(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    pre_sid = t.metadata["current_snapshot_id"]
    dropped_id = next(f["id"] for f in t.fields if f["name"] == "tool")

    assert t.apply_ddl({"op": "DROP_COLUMN", "column": "tool"}) is True
    assert t.apply_ddl({"op": "DROP_COLUMN", "column": "tool"}) is False  # replay
    t = t.refresh()
    assert "tool" not in [f["name"] for f in t.fields]
    assert "tool" not in t.read().columns
    # time travel still reads the dropped column (old schema pinned)
    old = t.read(snapshot_id=pre_sid)
    assert "tool" in old.columns and old.filter("tool = 'tl'").count() == 10
    # re-ADD under the same name gets a FRESH column id: no resurrection
    t.apply_ddl({"op": "ADD_COLUMN", "column": "tool", "new_type": "string"})
    t = t.refresh()
    new_id = next(f["id"] for f in t.fields if f["name"] == "tool")
    assert new_id != dropped_id
    assert t.read().filter("tool IS NOT NULL").count() == 0


def test_drop_key_or_bucket_column_refused(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=2)
    for col in ("conv_id", "turn_idx"):
        try:
            t.apply_ddl({"op": "DROP_COLUMN", "column": col})
            raise AssertionError("must refuse dropping key/bucket column")
        except ValueError:
            pass


def test_drop_column_e2e_pipeline_golden(spark, tmp_path):
    """DROP_COLUMN flows through the real apply path (control row in
    the changelog) and the final state matches the pandas oracle."""
    spec = ChangelogSpec(
        n_events=1200,
        n_convs=30,
        seed=11,
        include_ddl=True,
        ddls=[
            {"op": "ADD_COLUMN", "column": "score", "new_type": "double"},
            {"op": "DROP_COLUMN", "column": "tool"},
        ],
    )
    log_dir = str(tmp_path / "log")
    df = generate_and_write(log_dir, spec)
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        num_buckets=8,
    )
    Pipeline(spark, cfg).run_batch()
    t = LakeTable.load(spark, cfg.table_path)
    cols = [f["name"] for f in t.fields]
    assert "tool" not in cols and "score" in cols
    got = t.read().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = oracle_apply(df)
    assert list(sorted(got.columns)) == list(sorted(exp.columns))
    assert len(got) == len(exp)
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    e = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (g["text"].values == e["text"].values).all()


def test_remove_orphans(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    # crash-leak: a data file written but never committed
    leak_dir = os.path.join(t.path, "data", "crashed-tag")
    os.makedirs(leak_dir)
    leak = os.path.join(leak_dir, "part-00000-dead.parquet")
    with open(leak, "w") as f:
        f.write("x")
    old = time.time() - 7200
    os.utime(leak, (old, old))
    # a FRESH leak must survive the age guard
    fresh = os.path.join(leak_dir, "part-00001-inflight.parquet")
    with open(fresh, "w") as f:
        f.write("y")

    n_before = t.read().count()
    dry = t.remove_orphans(older_than_s=3600, dry_run=True)
    assert dry == [os.path.join("data", "crashed-tag", "part-00000-dead.parquet")]
    assert os.path.exists(leak)

    removed = t.remove_orphans(older_than_s=3600)
    assert removed == dry
    assert not os.path.exists(leak)
    assert os.path.exists(fresh), "age guard protects in-flight writes"
    assert t.read().count() == n_before, "referenced files untouched"
