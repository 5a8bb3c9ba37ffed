"""Snapshot rollback (Iceberg rollback_to_snapshot procedure analog)
with CDC-correct exactly-once semantics: rolling main back to an
ancestor is a metadata-only commit, and the abandoned snapshots'
(writer-id, batch-id) markers are REVOKED so a pipeline re-run
re-applies the rolled-back batches instead of skipping them into
permanent data loss. Reference analog: resume is always from the last
COMMITTED offset, never a poisoned one (DBReplicationOffsetStore
contract)."""

import datetime
import glob
import os

import pytest

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _batch(spark, b, n=12, text=None):
    rows = [
        (f"c{i}", 0, "user", text or f"b{b} r{i}", "", TS, "UPDATE",
         b * 100 + i + 1)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


def _mk(spark, path, n_batches=3):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 4
    )
    for b in range(n_batches):
        t.merge(_batch(spark, b), "w", f"b{b}", mode="auto")
    return t.refresh()


def test_rollback_restores_state_metadata_only(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    good = t.metadata["snapshots"][-2]["id"]  # head after b1
    want = sorted(map(tuple, t.read(snapshot_id=good).collect()))
    data_before = set(glob.glob(os.path.join(t.path, "data", "**", "*"),
                                recursive=True))
    n = t.rollback_to(good)
    assert n == 1
    t = t.refresh()
    assert sorted(map(tuple, t.read().collect())) == want
    # metadata-only: no data file was written, moved, or deleted
    data_after = set(glob.glob(os.path.join(t.path, "data", "**", "*"),
                               recursive=True))
    assert data_after == data_before
    # the abandoned snapshot stays time-travelable for audit
    assert t.read(snapshot_id=good + 1).count() > 0
    # idempotent at the target
    assert t.rollback_to(t.metadata["current_snapshot_id"]) == 0


def test_rollback_revokes_markers_and_seq_hwm(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    good = t.metadata["snapshots"][-2]["id"]
    hwm_good = 1 * 100 + 12  # b1's max-seq
    assert t.is_applied("w", "b2") and t.last_committed_seq("w") > hwm_good
    t.rollback_to(good)
    t = t.refresh()
    assert not t.is_applied("w", "b2"), "rolled-back batch must re-apply"
    assert t.is_applied("w", "b1")  # surviving lineage unaffected
    assert t.last_committed_seq("w") == hwm_good
    # re-applying the revoked batch (the fixed upstream re-send) lands
    t.merge(_batch(spark, 2, text="fixed"), "w", "b2", mode="auto")
    t = t.refresh()
    assert t.is_applied("w", "b2")
    texts = {r["text"] for r in t.read().collect()}
    assert "fixed" in texts and "b2 r3" not in texts


def test_rollback_errors(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="not an ancestor"):
        t.rollback_to(10_000)
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback_to()
    b = t.ensure_branch("stage")
    with pytest.raises(ValueError, match="main"):
        b.rollback_to(1)
    # a snapshot on the branch (not main ancestry) is rejected
    b.merge(_batch(spark, 9), "w2", "x0", mode="auto")
    b = b.refresh()
    branch_head = b.branches["stage"]
    with pytest.raises(ValueError, match="not an ancestor"):
        t.refresh().rollback_to(branch_head)


def test_rollback_by_tag(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t = t.refresh()
    good = t.metadata["snapshots"][-2]["id"]
    t.tag("pre-bad", good)
    t = t.refresh()
    want = sorted(map(tuple, t.read(snapshot_id=good).collect()))
    assert t.rollback_to(tag="pre-bad") == 1
    t = t.refresh()
    assert sorted(map(tuple, t.read().collect())) == want
    with pytest.raises(ValueError, match="unknown tag"):
        t.rollback_to(tag="nope")


def test_change_feed_emits_retractions_across_rollback(spark, tmp_path):
    """A change-feed consumer that followed the bad batch sees the
    rollback as ordinary deltas (updates back to the good payloads /
    deletes of bad inserts) — downstream undo needs no special case."""
    t = _mk(spark, str(tmp_path / "t"), n_batches=2)
    pre_bad = t.metadata["current_snapshot_id"]
    bad = _batch(spark, 7, n=14)  # overwrites c0..c11, inserts c12, c13
    t.merge(bad, "w", "b7", mode="auto")
    t = t.refresh()
    bad_head = t.metadata["current_snapshot_id"]
    t.rollback_to(pre_bad)
    t = t.refresh()
    feed = t.read_changes(bad_head, t.metadata["current_snapshot_id"])
    rows = {(r["conv_id"], r["_change_type"]) for r in feed.collect()}
    assert ("c12", "delete") in rows and ("c13", "delete") in rows
    assert ("c0", "update") in rows
    upd = {r["conv_id"]: r["text"] for r in feed.collect()
           if r["_change_type"] == "update"}
    assert upd["c0"] == "b1 r0"  # restored payload, not the bad one


def test_expiry_after_rollback_drops_revoked_markers_and_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    good = t.metadata["snapshots"][-2]["id"]
    t.rollback_to(good)
    t = t.refresh()
    # churn enough commits that the revoked snapshot leaves keep_last
    for b in range(3, 8):
        t.merge(_batch(spark, b), "w", f"b{b}", mode="auto")
    t = t.refresh()
    assert t.expire_snapshots(keep_last=2) > 0
    t = t.refresh()
    assert not t.is_applied("w", "b2"), "revoked marker survived expiry"
    assert t.is_applied("w", "b1"), "good marker lost in expiry"
    # the bad batch can still land after expiry
    t.merge(_batch(spark, 2, text="late fix"), "w", "b2", mode="auto")
    assert t.refresh().is_applied("w", "b2")


def test_matview_follows_rollback(spark, tmp_path):
    """A materialized view that already folded the bad batch converges
    back through ordinary advance() calls: the pre-image feed across
    the rollback commit retracts the bad contributions (the view's
    cursor sits on a rolled-back snapshot — still resolvable until
    expiry — so no rebootstrap is needed)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from delta_spark.lake import MaterializedAggregate

    def check(mv, t):
        got = mv.read().toPandas().sort_values("role").reset_index(drop=True)
        want = (
            t.read().groupBy("role")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("sum_chars"))
            .toPandas().sort_values("role").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["role", "n_rows", "sum_chars"]].astype("object"),
            want[["role", "n_rows", "sum_chars"]].astype("object"),
            check_dtype=False,
        )

    t = _mk(spark, str(tmp_path / "t"), n_batches=2)
    mv = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["role"],
        {"sum_chars": "length(text)"},
    )
    mv.advance()
    check(mv, t)
    good = t.metadata["current_snapshot_id"]
    # bad batch lands AND is folded into the view before anyone notices
    t.merge(_batch(spark, 7, n=14, text="POISON"), "w", "b7", mode="auto")
    t = t.refresh()
    mv.advance()
    check(mv, t)
    assert "POISON" in set(
        r["text"] for r in t.read().select("text").collect()
    )
    # the drill: rollback, then an ordinary advance folds the retractions
    t.rollback_to(good)
    t = t.refresh()
    mv.advance()
    check(mv, t)
    # the corrected re-send under the same (writer, batch) also flows through
    t.merge(_batch(spark, 7, n=14, text="fixed"), "w", "b7", mode="auto")
    t = t.refresh()
    mv.advance()
    check(mv, t)


def test_iceberg_publish_follows_rollback(spark, tmp_path):
    """A continuously-published Iceberg destination converges across a
    rollback through ordinary publish_iceberg calls — the downstream
    ecosystem copy needs no special rewind procedure."""
    from delta_spark.lake.iceberg import publish_iceberg, read_iceberg_duckdb

    def rows_equal(df, rel):
        a = sorted(map(tuple, df.collect()))
        b = sorted(map(tuple, rel.fetchall()))
        assert a == b

    t = _mk(spark, str(tmp_path / "t"), n_batches=2)
    ice = str(tmp_path / "ice")
    mp = publish_iceberg(t.refresh(), ice)
    rows_equal(t.read(), read_iceberg_duckdb(mp))
    good = t.metadata["current_snapshot_id"]
    t.merge(_batch(spark, 7, n=14, text="POISON"), "w", "b7", mode="auto")
    t = t.refresh()
    mp = publish_iceberg(t, ice)
    rows_equal(t.read(), read_iceberg_duckdb(mp))
    t.rollback_to(good)
    t = t.refresh()
    mp = publish_iceberg(t, ice)
    rows_equal(t.read(), read_iceberg_duckdb(mp))
    t.merge(_batch(spark, 7, n=14, text="fixed"), "w", "b7", mode="auto")
    t = t.refresh()
    mp = publish_iceberg(t, ice)
    rows_equal(t.read(), read_iceberg_duckdb(mp))
    texts = set(read_iceberg_duckdb(mp).df()["text"])
    assert "fixed" in texts and "POISON" not in texts


def test_pipeline_reapplies_after_rollback(spark, tmp_path):
    """Engine-level: replay a changelog, roll the table back to the
    first epoch's head, re-run the SAME pipeline — the final state
    must equal the oracle (exactly-once skipping would lose the
    rolled-back events)."""
    from conftest import assert_pdf_equal
    from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply
    from delta_spark.pipeline import Pipeline, PipelineConfig

    log = str(tmp_path / "log")
    raw = generate_and_write(log, ChangelogSpec(n_events=600, n_convs=12, seed=7))
    cfg = PipelineConfig(
        changelog_path=log, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"), generation=1, num_buckets=4,
    )
    Pipeline(spark, cfg).run_batch()
    t = LakeTable.load(spark, cfg.table_path)
    apply_sids = [s["id"] for s in t.metadata["snapshots"]
                  if (s["summary"] or {}).get("writer-id")]
    assert len(apply_sids) >= 1
    t.rollback_to(apply_sids[0])
    # a re-run resumes from the rolled-back seq hwm and re-applies
    cfg2 = PipelineConfig(
        changelog_path=log, table_path=cfg.table_path,
        checkpoint_dir=str(tmp_path / "ck2"), generation=1, num_buckets=4,
    )
    Pipeline(spark, cfg2).run_batch()
    got = LakeTable.load(spark, cfg.table_path).read().toPandas()
    assert_pdf_equal(got, oracle_apply(raw), ["conv_id", "turn_idx"])


def test_rollback_job_dry_run_and_commit(spark, tmp_path):
    """jobs/rollback_table.py: dry-run previews the blast radius
    (revoked snapshots, reopened batches, post-rollback seq HWM)
    without committing; the real run rolls back and converges a
    continuously-published Iceberg copy in the same invocation."""
    import importlib.util

    from delta_spark.lake.iceberg import publish_iceberg, read_iceberg_duckdb

    spec = importlib.util.spec_from_file_location(
        "rollback_table",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "jobs", "rollback_table.py"),
    )
    rt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rt)

    t = _mk(spark, str(tmp_path / "t"), n_batches=2)
    ice = str(tmp_path / "ice")
    publish_iceberg(t.refresh(), ice)
    t.tag("pre-deploy")
    t.merge(_batch(spark, 7, n=14, text="POISON"), "w", "b7", mode="auto")
    t = t.refresh()
    head = t.metadata["current_snapshot_id"]

    dry = rt.rollback(spark, t.path, to_tag="pre-deploy", dry_run=True)
    assert dry["revoked_snapshots"] == [head]
    assert dry["reopened_batches"] == [["w", "b7"]]
    assert dry["seq_hwm_after"]["w"] == 112  # b1's max-seq
    assert t.refresh().metadata["current_snapshot_id"] == head  # no commit

    out = rt.rollback(spark, t.path, to_tag="pre-deploy",
                      publish_iceberg_dest=ice)
    assert out["rolled_back"] == 1
    t = t.refresh()
    assert "POISON" not in set(
        r["text"] for r in t.read().select("text").collect()
    )
    texts = set(read_iceberg_duckdb(out["published_iceberg_metadata"]).df()["text"])
    assert "POISON" not in texts

    # re-running the applied drill: preview is EMPTY (nothing left to
    # revoke — the engine's preview, so it cannot drift from
    # rollback_to committing nothing) and the run reports 0
    again = rt.rollback(spark, t.path, to_tag="pre-deploy")
    assert again["rolled_back"] == 0 and again["already_at_target"]
    assert again["revoked_snapshots"] == [] and again["reopened_batches"] == []

    with pytest.raises(ValueError, match="unknown tag"):
        rt.rollback(spark, t.path, to_tag="nope")
    with pytest.raises(ValueError, match="not an ancestor"):
        rt.rollback(spark, t.path, to_snapshot=99_999, dry_run=True)


def test_fleet_tag_and_rollback_all(spark, tmp_path):
    """Catalog.tag_all stamps the fleet-wide pre-deploy checkpoint;
    Catalog.rollback_all rewinds every tagged table, flags nonempty
    untagged ones as "untagged" (all their data post-dates the
    checkpoint — the drill cannot vouch for them, so the report must
    not read as all-clear), and a refused table (tag expired off
    main's lineage) reports without aborting the fleet — the
    fast_forward_all failure shape, mirrored for the drill."""
    from delta_spark.catalog import Catalog

    cat = Catalog.load_or_create(spark, str(tmp_path / "cat"))
    for n in ("t_a", "t_b"):
        cat.create_table(n, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
                         "conv_id", 4)
        cat.table(n).merge(_batch(spark, 0), "w", "b0", mode="auto")
    tagged = cat.tag_all("pre-deploy")
    assert set(tagged) == {"t_a", "t_b"} and all(tagged.values())
    # a table created AFTER the checkpoint has no tag: its data is
    # entirely post-checkpoint, so the drill flags it rather than
    # silently skipping it; an EMPTY untagged table is a true no-op
    cat = cat.refresh()
    cat.create_table("t_new", TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
                     "conv_id", 4)
    cat.table("t_new").merge(_batch(spark, 5), "w", "n0", mode="auto")
    cat.create_table("t_empty", TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
                     "conv_id", 4)
    # the bad deploy poisons both tagged tables
    for n in ("t_a", "t_b"):
        cat.table(n).merge(_batch(spark, 7, text="POISON"), "w", "b7",
                           mode="auto")
    out = cat.rollback_all("pre-deploy")
    assert out == {"t_a": 1, "t_b": 1, "t_new": "untagged", "t_empty": None}
    for n in ("t_a", "t_b"):
        texts = {r["text"] for r in cat.table(n).read().collect()}
        assert "POISON" not in texts
    # idempotent: already at the tag
    assert cat.rollback_all("pre-deploy") == {
        "t_a": 0, "t_b": 0, "t_new": "untagged", "t_empty": None
    }
    # refusal shape: expire t_b's tag target off main's lineage is
    # hard (tags pin); instead simulate by moving the tag to a branch
    # snapshot — rollback_to refuses non-ancestors per table
    tb = cat.table("t_b")
    bb = tb.ensure_branch("side")
    bb.merge(_batch(spark, 9, text="side"), "w2", "s0", mode="auto")
    side_head = bb.refresh().branches["side"]
    tb.refresh().tag("pre-deploy", side_head, replace=True)
    cat.table("t_a").merge(_batch(spark, 8, text="POISON2"), "w", "b8",
                           mode="auto")
    with pytest.raises(ValueError, match="t_b"):
        cat.rollback_all("pre-deploy")
    # t_a still rolled back despite t_b's refusal
    texts = {r["text"] for r in cat.table("t_a").read().collect()}
    assert "POISON2" not in texts


def test_drill_end_to_end_in_deployment_shape(spark, tmp_path):
    """The full bad-deploy drill through the shipped entrypoints:
    run_pipeline --tag-before-run stamps the checkpoint, a second run
    lands the 'bad' epoch, jobs/rollback_table.py rewinds to the tag,
    and a re-run with a FRESH checkpoint dir (the documented caveat —
    Spark's source ledger is not the table's to rewind) re-applies.
    Final state equals the single-shot pandas replay oracle."""
    import json
    import subprocess
    import sys

    from conftest import assert_pdf_equal
    from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply

    full = str(tmp_path / "full")
    raw = generate_and_write(full, ChangelogSpec(n_events=800, n_convs=16, seed=5))
    df = spark.read.parquet(full)
    mid = sorted(r["seq"] for r in df.select("seq").collect())[len(raw) // 2]
    df.filter(f"seq <= {mid}").write.parquet(str(tmp_path / "log1"))
    df.filter(f"seq > {mid}").write.parquet(str(tmp_path / "log2"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo}

    def run(job, *args):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", job), *args],
            capture_output=True, text=True, env=env, timeout=420,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return [json.loads(x) for x in out.stdout.splitlines()
                if x.startswith("{")]

    tbl = str(tmp_path / "tbl")
    common = ["--table", tbl, "--mode", "batch", "--buckets", "4",
              "--generation", "1", "--tag-before-run", "pre-deploy"]
    j1 = run("run_pipeline.py", "--changelog", str(tmp_path / "log1"),
             "--checkpoint", str(tmp_path / "ck1"), *common)
    assert not any("tagged" in d for d in j1)  # first run: nothing to pin
    j2 = run("run_pipeline.py", "--changelog", str(tmp_path / "log2"),
             "--checkpoint", str(tmp_path / "ck2"), "--instance-id", "1",
             *common)
    assert any(d.get("tagged") == "pre-deploy" for d in j2)

    # epoch 2 is declared bad: rewind to the stamped tag
    j3 = run("rollback_table.py", "--table", tbl, "--to-tag", "pre-deploy")
    assert j3[-1]["rolled_back"] >= 1
    assert j3[-1]["reopened_batches"]

    # fixed re-run, FRESH checkpoint so the source re-delivers
    run("run_pipeline.py", "--changelog", str(tmp_path / "log2"),
        "--checkpoint", str(tmp_path / "ck3"), "--instance-id", "1",
        "--table", tbl, "--mode", "batch", "--buckets", "4",
        "--generation", "1")
    got = LakeTable.load(spark, tbl).read().toPandas()
    expected = oracle_apply(raw)
    assert_pdf_equal(got[list(expected.columns)], expected,
                     ["conv_id", "turn_idx"])


def test_second_rollback_counts_only_fresh_revocations(spark, tmp_path):
    """A second drill whose abandoned lineage crosses an earlier one
    must report the SAME blast radius rollback_preview showed: only
    freshly-revoked snapshots count (the first drill's are already
    open), so the dry-run and the real run of one action can never
    disagree in the operator's report."""
    t = _mk(spark, str(tmp_path / "t"))
    good = t.metadata["snapshots"][-2]["id"]  # head after b1
    assert t.rollback_to(good) == 1  # revokes b2's snapshot
    t = t.refresh()
    # one repair batch, then a second drill back to the same target:
    # the chain is [repair, rollback-commit, b2] but only the first
    # two are fresh — b2's markers were already reopened
    t.merge(_batch(spark, 3), "w", "repair-0", mode="auto")
    t = t.refresh()
    preview = t.rollback_preview(good)
    assert len(preview["revoked_snapshots"]) == 2
    n = t.rollback_to(good)
    assert n == len(preview["revoked_snapshots"]) == 2
    t = t.refresh()
    assert t.current_snapshot["summary"]["revoked-snapshots"] == "2"
    want = sorted(map(tuple, t.read(snapshot_id=good).collect()))
    assert sorted(map(tuple, t.read().collect())) == want
