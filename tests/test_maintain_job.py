"""Table-maintenance job (jobs/maintain_table.py): the Iceberg
procedures surface (rewrite_data_files / expire_snapshots /
remove_orphan_files + legacy-metadata migration) as one idempotent,
writer-safe scheduled run."""

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
    "maintain_table",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs", "maintain_table.py"),
)
mt = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mt)


def _mk(spark, path, n_batches=6):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 4
    )
    for b in range(n_batches):
        rows = [
            (f"c{i}", b, "user", f"b{b} r{i}", "", TS, "INSERT", b * 100 + i + 1)
            for i in range(20)
        ]
        t.merge(spark.createDataFrame(rows, DDL), "w", f"b{b}", mode="auto")
    return t


def test_maintain_compacts_expires_and_reports(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    before = t.read().toPandas()
    # leak an orphan (crashed writer simulation), old enough to collect
    orphan = os.path.join(t.path, "data", "crashed", "part-0.parquet")
    os.makedirs(os.path.dirname(orphan))
    open(orphan, "wb").write(b"junk")
    os.utime(orphan, (1, 1))

    dry = mt.maintain(spark, t.path, dry_run=True)
    assert dry["delta_files"] > 0 and dry["orphans"] == 1
    assert os.path.exists(orphan)  # dry run deletes nothing

    out = mt.maintain(spark, t.path, compact_pressure=1, expire_keep_last=2)
    assert out["compacted_buckets"] > 0
    assert out["expired_snapshots"] > 0
    assert out["orphans_removed"] >= 1
    assert not os.path.exists(orphan)

    t = t.refresh()
    after = t.read().toPandas()
    k = ["conv_id", "turn_idx"]
    assert sorted(map(tuple, after[k].values.tolist())) == sorted(
        map(tuple, before[k].values.tolist())
    )
    # deltas folded, metadata bounded, markers survive expiry
    assert all(f.get("kind") != "delta" for f in t.current_snapshot["files"])
    assert len(t.metadata["snapshots"]) <= 2
    assert t.is_applied("w", "b0")
    # idempotent: a second run is a no-op
    out2 = mt.maintain(spark, t.path, compact_pressure=1, expire_keep_last=2)
    assert out2["compacted_buckets"] == 0 and out2["orphans_removed"] == 0
