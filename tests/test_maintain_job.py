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


def test_maintain_refreshes_sketches_after_compaction(spark, tmp_path):
    """Compaction rewrites files (which drop their membership
    sketches); `maintain(sketch_cols=...)` re-sketches exactly the
    uncovered files last, so point probes keep pruning across
    maintenance cycles."""
    t = _mk(spark, str(tmp_path / "t"))
    t.compute_sketches(["text"])
    t = t.refresh()
    out = mt.maintain(
        spark, t.path, compact_pressure=1, expire_keep_last=2,
        sketch_cols=["text"],
    )
    assert out["compacted_buckets"] > 0
    # compaction rewrote every bucket → every surviving file needed one
    assert out["sketched_files"] > 0
    t = t.refresh()
    id_text = str(next(f["id"] for f in t.fields if f["name"] == "text"))
    assert all(
        id_text in f.get("sketch", {}) for f in t.current_snapshot["files"]
    )
    got = t.read(ranges={"text": [("b3 r7", "b3 r7")]})
    assert got.count() == 1
    assert 0 < len(got.inputFiles()) < len(t.read().inputFiles())
    # steady state: nothing to compact, nothing to re-sketch
    out2 = mt.maintain(
        spark, t.path, compact_pressure=1, expire_keep_last=2,
        sketch_cols=["text"],
    )
    assert out2["compacted_buckets"] == 0 and out2["sketched_files"] == 0


def test_run_pipeline_wap_gate(spark, tmp_path):
    """The deployment entrypoint's write-audit-publish gate: with
    --branch --publish-on-clean-audit a clean run stages, audits, and
    publishes (main == oracle); with a poisoned staged head (NULL key
    written around the pipeline) the audit fails, main stays
    untouched, the state doc flips to FAILING, and the exit code is 3."""
    import datetime as dt
    import json
    import subprocess
    import sys as _sys

    from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply
    from delta_spark.state import StateStore
    from conftest import assert_pdf_equal

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log_dir = str(tmp_path / "log")
    raw = generate_and_write(
        log_dir, ChangelogSpec(n_events=800, n_convs=15, seed=41)
    )
    env = dict(os.environ, PYTHONPATH=repo)
    base = [
        _sys.executable, os.path.join(repo, "jobs", "run_pipeline.py"),
        "--changelog", log_dir, "--table", str(tmp_path / "tbl"),
        "--checkpoint", str(tmp_path / "ck"), "--mode", "batch",
        "--buckets", "4", "--generation", "1",
        "--branch", "staged", "--publish-on-clean-audit",
    ]
    out = subprocess.run(base, capture_output=True, text=True, env=env,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    audit = next(
        json.loads(line) for line in out.stdout.splitlines()
        if line.startswith("{") and "audit" in line
    )
    assert audit["published"] is True
    assert audit["audit"]["dup_keys"] == 0 and audit["audit"]["null_keys"] == 0
    t = LakeTable.load(spark, str(tmp_path / "tbl"))
    assert_pdf_equal(
        t.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"]
    )

    # poison the staged head around the pipeline (simulates a corrupt
    # upstream batch): a NULL-key row the merge's collapse would never
    # produce — overwrite the BRANCH only, main keeps the good state
    good = t.metadata["current_snapshot_id"]
    t.for_branch("staged").overwrite(
        spark.createDataFrame(
            [(None, 0, "user", "nullkey", "", dt.datetime(2026, 1, 1))],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        ),
        "poison", "p1",
    )
    out2 = subprocess.run(
        base + ["--generation", "2"], capture_output=True, text=True,
        env=env, timeout=600,
    )
    assert out2.returncode == 3, (out2.returncode, out2.stderr[-2000:])
    t.refresh()
    assert t.metadata["current_snapshot_id"] == good, "failed audit moved main"
    assert StateStore(str(tmp_path / "tbl"), "transcripts").read()[
        "pipeline"] == "FAILING"
