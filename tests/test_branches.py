"""Branches (Iceberg mutable refs) + write-audit-publish.

The WAP pattern a 100 TB CDC deployment stages risky loads with:
commit a batch to a branch, audit the branch head while main keeps
serving the last good state, then fast-forward main — an O(1)
metadata pointer move. Invariants: branch writes never move main,
read(branch=) == the branch head, fast_forward is refused when main
diverged, exactly-once markers are shared (a batch staged on a branch
can never re-apply after publication), expiry pins branch heads AND
main's head, and snapshot ids never collide across refs."""

import datetime

import pytest

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


def _batch(spark, n, text, op="UPDATE", conv="c0"):
    return spark.createDataFrame(
        [(conv, 0, "user", text, "", TS, op, 1000 + n)], DDL
    )


def test_wap_write_audit_publish(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    main_before = {r["text"] for r in t.read().collect()}
    t.create_branch("audit")
    b = t.for_branch("audit")
    assert b.merge(_batch(spark, 1, "staged"), "w", "b1") is not None
    # WRITE landed on the branch, main untouched
    t.refresh()
    assert {r["text"] for r in t.read().collect()} == main_before
    staged = {r["text"] for r in t.read(branch="audit").collect()}
    assert "staged" in staged and "v0-0" not in staged
    # branch-bound handle reads its own head
    assert {r["text"] for r in b.read().collect()} == staged
    # AUDIT passes → PUBLISH: main == the audited branch state
    t.fast_forward("audit")
    assert {r["text"] for r in t.read().collect()} == staged
    # exactly-once survives publication: the staged batch cannot re-apply
    assert t.merge(_batch(spark, 1, "replayed"), "w", "b1") is None
    assert t.drop_branch("audit") is True
    assert t.drop_branch("audit") is False


def test_fast_forward_refused_on_divergence(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("audit")
    b = t.for_branch("audit")
    b.merge(_batch(spark, 1, "staged"), "w", "b1")
    # main advances independently → publish must refuse, not drop
    t.refresh().merge(_batch(spark, 2, "mainline", conv="c1"), "w", "b2")
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("audit")
    assert "mainline" in {r["text"] for r in t.read().collect()}


def test_fast_forward_multi_commit_chain(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("audit")
    b = t.for_branch("audit")
    for i in (1, 2, 3):
        b.merge(_batch(spark, i, f"s{i}", conv=f"c{i}"), "w", f"b{i}")
    head = t.refresh().branches["audit"]
    assert t.fast_forward("audit") == head
    got = {r["text"] for r in t.read().collect()}
    assert {"s1", "s2", "s3"} <= got
    # idempotent: ffwd to an already-published head is a no-op
    assert t.fast_forward("audit") == head


def test_branch_ids_never_collide_with_main(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("x")
    b = t.for_branch("x")
    b.merge(_batch(spark, 1, "bx"), "w", "b1")
    t.refresh().merge(_batch(spark, 2, "bm", conv="c1"), "w", "b2")
    b.refresh()
    ids = [s["id"] for s in t.metadata["snapshots"]]
    assert len(ids) == len(set(ids))
    assert t.branches["x"] != t.metadata["current_snapshot_id"]
    # the two lines really hold different states
    assert "bx" not in {r["text"] for r in t.read().collect()}
    assert "bm" not in {r["text"] for r in t.read(branch="x").collect()}


def test_expiry_pins_branch_head_and_main_head(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("keep")
    b = t.for_branch("keep")
    b.merge(_batch(spark, 1, "staged"), "w", "b1")
    branch_head = t.refresh().branches["keep"]
    main_head = t.metadata["current_snapshot_id"]
    # a burst of branch commits after main's head
    for i in range(2, 8):
        b.merge(_batch(spark, i, f"s{i}", conv=f"c{i % 3}"), "w", f"b{i}")
    t.refresh().expire_snapshots(keep_last=2)
    kept = {s["id"] for s in t.metadata["snapshots"]}
    assert main_head in kept, "main's serving state expired under readers"
    assert t.branches["keep"] in kept
    # main still reads its (old) head after aggressive expiry
    assert "v0-0" in {r["text"] for r in t.read().collect()}
    # early branch-intermediate snapshots are NOT pinned
    assert branch_head not in kept
    # dropped branch becomes expirable
    t.drop_branch("keep")
    t.expire_snapshots(keep_last=1)
    assert t.metadata["current_snapshot_id"] in {
        s["id"] for s in t.metadata["snapshots"]
    }


def test_read_ref_resolution_is_exclusive(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("x")
    with pytest.raises(ValueError, match="at most one"):
        t.read(branch="x", tag="y")
    with pytest.raises(ValueError, match="no branch"):
        t.read(branch="nope")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("x")
    with pytest.raises(ValueError, match="no branch"):
        t.for_branch("nope")


def test_streaming_wap_branch(spark, tmp_path):
    """The streaming sink stages every micro-batch on the configured
    branch (PipelineConfig.branch): main stays empty until the auditor
    fast-forwards, and the published state equals the golden oracle —
    WAP over the REAL Structured-Streaming path, multiple epochs."""
    from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply
    from delta_spark.pipeline import Pipeline, PipelineConfig
    from conftest import assert_pdf_equal

    log_dir = str(tmp_path / "changelog")
    raw = generate_and_write(
        log_dir, ChangelogSpec(n_events=2000, n_convs=30, seed=11, n_files=6)
    )
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        generation=1,
        max_files_per_trigger=3,
        branch="staged",
    )
    p = Pipeline(spark, cfg)
    p.run_stream_to_completion()
    assert len(p.stats) >= 2  # several micro-batches, all staged
    t = LakeTable.load(spark, cfg.table_path)
    assert t.read().count() == 0, "main must stay empty until publish"
    t.fast_forward("staged")
    assert_pdf_equal(
        t.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"]
    )


def test_audit_diff_matches_change_feed(spark, tmp_path):
    """audit_diff(branch) == what publish would change: inserts/
    updates/deletes from the staged commits only, and empty once the
    branch is published; diverged branches are refused."""
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("audit")
    b = t.for_branch("audit")
    b.merge(_batch(spark, 1, "changed"), "w", "b1")            # update c0
    b.merge(_batch(spark, 2, "", op="DELETE", conv="c1"), "w", "b2")  # delete c1
    b.merge(_batch(spark, 3, "new", conv="c9"), "w", "b3")     # insert c9
    t.refresh()
    feed = {(r["conv_id"], r["_change_type"]) for r in
            t.audit_diff("audit").collect()}
    assert feed == {("c0", "update"), ("c1", "delete"), ("c9", "insert")}
    t.fast_forward("audit")
    assert t.audit_diff("audit").count() == 0  # published → empty feed
    # diverged branch refused, same rule as fast_forward
    t.merge(_batch(spark, 4, "main-only", conv="c2"), "w", "b4")
    with pytest.raises(ValueError, match="not an ancestor"):
        t.audit_diff("audit")


def test_ref_disjoint_commit_race_is_rebased(spark, tmp_path):
    """A branch writer whose handle is STALE (main committed a tag /
    epoch since it last refreshed) must not fail its micro-batch: the
    commit rebases onto the new metadata version as long as its own
    ref didn't move. A same-ref race still raises CommitConflict."""
    from delta_spark.lake import CommitConflict

    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("staged")
    b = t.for_branch("staged")  # b holds version V
    # main moves on: a data epoch + a tag (two version bumps b missed)
    t.refresh().merge(_batch(spark, 1, "mainline", conv="c1"), "w", "b1")
    t.tag("v1")
    # stale branch handle commits → ref-disjoint race → rebase succeeds
    assert b.merge(_batch(spark, 2, "staged"), "w", "b2") is not None
    t.refresh()
    assert "staged" in {r["text"] for r in t.read(branch="staged").collect()}
    assert "mainline" in {r["text"] for r in t.read().collect()}
    assert "v1" in t.tags  # nobody's write was lost
    # true same-ref conflict: two stale handles racing on ONE branch
    b1 = t.for_branch("staged")
    b2 = t.for_branch("staged")
    b1.merge(_batch(spark, 3, "first", conv="c3"), "w", "b3")
    with pytest.raises(CommitConflict):
        b2.merge(_batch(spark, 4, "second", conv="c4"), "w", "b4")


def test_publish_iceberg_across_fast_forward(spark, tmp_path):
    """Continuous Iceberg publishing sees a fast-forward as one
    incremental delta: publish main, stage several commits on a
    branch, fast-forward, publish again — the published Iceberg table
    reads row-equal to main, with exactly one new metadata version."""
    import glob as _glob

    from delta_spark.lake.iceberg import publish_iceberg, read_iceberg_duckdb

    t = _mk(spark, str(tmp_path / "t"))
    ice = str(tmp_path / "ice")
    publish_iceberg(t, ice)
    v_before = len(_glob.glob(f"{ice}/metadata/v*.metadata.json"))
    t.create_branch("staged")
    b = t.for_branch("staged")
    b.merge(_batch(spark, 1, "changed"), "w", "b1")
    b.merge(_batch(spark, 2, "", op="DELETE", conv="c1"), "w", "b2")
    b.merge(_batch(spark, 3, "new", conv="c9"), "w", "b3")
    t.refresh().fast_forward("staged")
    mp = publish_iceberg(t, ice)
    want = sorted(tuple(r) for r in t.read().collect())
    got = sorted(tuple(r) for r in read_iceberg_duckdb(mp).fetchall())
    assert want == got
    v_after = len(_glob.glob(f"{ice}/metadata/v*.metadata.json"))
    assert v_after == v_before + 1  # ONE incremental publish, not a rebuild


def test_ddl_is_table_level_data_stays_staged(spark, tmp_path):
    """Schema is TABLE-level exactly as in Iceberg: a DDL applied while
    a branch is staging becomes visible to main reads immediately
    (old rows NULL-fill the new column), while the branch's DATA stays
    invisible until fast-forward."""
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("staged")
    b = t.for_branch("staged")
    b.merge(_batch(spark, 1, "staged-row", conv="c7"), "w", "b1")
    t.refresh()
    assert t.apply_ddl(
        {"op": "ADD_COLUMN", "column": "score", "new_type": "double"}
    )
    main = t.read()
    assert "score" in main.columns  # DDL visible on main at once
    assert main.filter("score IS NOT NULL").count() == 0
    assert main.filter("text = 'staged-row'").count() == 0  # data staged
    # the branch read speaks the snapshot's OWN schema epoch (pre-DDL)
    assert "score" not in t.read(branch="staged").columns
    t.fast_forward("staged")
    pub = t.read()
    assert "score" in pub.columns  # published rows align to current schema
    assert pub.filter("text = 'staged-row'").count() == 1


def test_interop_reads_branch_spark_free(spark, tmp_path):
    """A DuckDB consumer audits the staged branch with no Spark:
    interop.read_duckdb(branch=) equals LakeTable.read(branch=)
    bit-for-bit, while the default read still serves main."""
    from delta_spark.lake import interop

    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("staged")
    t.for_branch("staged").merge(_batch(spark, 1, "staged-v"), "w", "b1")
    t.refresh()
    path = str(tmp_path / "t")
    want = sorted(tuple(r) for r in t.read(branch="staged").collect())
    got = sorted(tuple(r) for r in interop.read_duckdb(
        path, branch="staged").fetchall())
    assert want == got and any("staged-v" in str(r) for r in got)
    main = sorted(tuple(r) for r in interop.read_duckdb(path).fetchall())
    assert main == sorted(tuple(r) for r in t.read().collect())
    import pytest as _pt

    with _pt.raises(ValueError, match="no branch"):
        interop.read_sql(path, branch="nope")


def test_fast_forward_survives_aggressive_expiry(spark, tmp_path):
    """The fork-point rule: expiring a staging round's intermediate
    snapshots (routine maintenance) must not make a legitimate publish
    unprovable — audit_diff and fast_forward still work after the
    parent chain is pruned, because divergence is checked against the
    recorded fork, not the retained chain."""
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("staged")
    b = t.for_branch("staged")
    for i in range(1, 7):
        b.merge(_batch(spark, i, f"s{i}", conv=f"c{i % 3}"), "w", f"b{i}")
    t.refresh().expire_snapshots(keep_last=2)  # breaks the parent chain
    kept = {s["id"] for s in t.metadata["snapshots"]}
    assert not all(
        sid in kept for sid in range(2, 7)
    ), "test needs expired intermediates"
    feed = t.audit_diff("staged")
    assert feed.count() > 0
    t.fast_forward("staged")
    assert {"s4", "s5", "s6"} <= {r["text"] for r in t.read().collect()}
    # publish advanced the fork: the next staging round keeps working
    b.refresh().merge(_batch(spark, 9, "next-round", conv="c9"), "w", "b9")
    t.refresh().fast_forward("staged")
    assert "next-round" in {r["text"] for r in t.read().collect()}


def test_ensure_branch_race_is_absorbed(spark, tmp_path):
    """Two pipeline instances bootstrapping the same staging branch
    from stale handles must both end up bound — the loser of the
    create race absorbs instead of crashing."""
    t = _mk(spark, str(tmp_path / "t"))
    h1 = LakeTable.load(spark, str(tmp_path / "t"))
    h2 = LakeTable.load(spark, str(tmp_path / "t"))  # both at version V
    b1 = h1.ensure_branch("staged")
    b2 = h2.ensure_branch("staged")  # stale: create must be absorbed
    assert b1.branches["staged"] == b2.branches["staged"]
    b1.merge(_batch(spark, 1, "i0", conv="cA"), "w0", "b1")
    b2.refresh()
    b2.merge(_batch(spark, 2, "i1", conv="cB"), "w1", "b2")
    t.refresh().fast_forward("staged")
    got = {r["text"] for r in t.read().collect()}
    assert {"i0", "i1"} <= got


def test_fast_forward_all_partial_refusal(spark, tmp_path):
    """A diverged table refuses its publish without aborting the
    fleet: the other tables publish, and the error names the refused
    table and the published report."""
    from delta_spark.catalog import Catalog
    from delta_spark.schema import KEY_COLS

    cat = Catalog.load_or_create(spark, str(tmp_path / "cat"))
    for n in ("ok_t", "bad_t"):
        cat.create_table(n, TRANSCRIPT_SCHEMA, KEY_COLS, "conv_id", 4)
        h = cat.table(n)
        h.merge(_batch(spark, 0, "base", conv="c0"), "w", "b0")
        h.ensure_branch("staged").merge(
            _batch(spark, 1, "staged", conv="c1"), "w", "b1"
        )
    # bad_t's main advances independently → diverged
    cat.table("bad_t").merge(_batch(spark, 2, "main-only", conv="c2"), "w", "b2")
    with pytest.raises(ValueError, match="bad_t.*refused|refused.*bad_t"):
        cat.fast_forward_all("staged")
    # ok_t still published despite the refusal
    assert "staged" in {
        r["text"] for r in cat.table("ok_t").read().collect()
    }
    assert "staged" not in {
        r["text"] for r in cat.table("bad_t").read().collect()
    }


def test_wap_never_leaks_staged_rows_downstream(spark, tmp_path):
    """With WAP staging on, the sink's continuous Iceberg publishing
    and matview maintenance track MAIN, never the staged branch: the
    downstream Iceberg copy stays at the last audited state through
    every staged epoch, and catches up only after fast_forward."""
    from delta_spark.changelog import ChangelogSpec, generate_and_write
    from delta_spark.lake.iceberg import publish_iceberg, read_iceberg_duckdb
    from delta_spark.pipeline import Pipeline, PipelineConfig

    log_dir = str(tmp_path / "changelog")
    generate_and_write(
        log_dir, ChangelogSpec(n_events=1200, n_convs=20, seed=13, n_files=4)
    )
    ice = str(tmp_path / "ice")
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        generation=1,
        max_files_per_trigger=2,
        branch="staged",
        publish_iceberg_dest=ice,
    )
    Pipeline(spark, cfg).run_stream_to_completion()
    t = LakeTable.load(spark, str(tmp_path / "table"))
    # every epoch staged; the Iceberg copy must hold MAIN's state (empty)
    assert t.read().count() == 0
    mp = read_iceberg_duckdb  # alias for line length
    import glob as _glob

    metas = sorted(_glob.glob(f"{ice}/metadata/v*.metadata.json"))
    assert metas, "publisher must have run (and published emptiness)"
    assert mp(metas[-1]).df().shape[0] == 0, "staged rows leaked downstream"
    # publish, then one more maintenance publish catches downstream up
    t.fast_forward("staged")
    final = publish_iceberg(t.refresh(), ice)
    want = sorted(tuple(r) for r in t.read().collect())
    got = sorted(tuple(r) for r in mp(final).fetchall())
    assert want == got and len(got) > 0


def test_expire_branches_retention(spark, tmp_path):
    """Branch retention (max-ref-age): an abandoned staging branch is
    dropped once its head ages past the cutoff, after which snapshot
    expiry reclaims what it pinned; fresh branches survive."""
    import time as _time

    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("old")
    t.for_branch("old").merge(_batch(spark, 1, "abandoned"), "w", "b1")
    t.refresh()
    future = int((_time.time() + 3600) * 1000)
    past = int((_time.time() - 3600) * 1000)
    assert t.expire_branches(past) == []          # nothing that old
    t.create_branch("fresh")
    dropped = t.expire_branches(future)           # everything is older
    assert sorted(dropped) == ["fresh", "old"]
    assert t.branches == {}
    # the abandoned staged snapshot is now expirable
    t.expire_snapshots(keep_last=1)
    assert "abandoned" not in {
        r["text"] for r in t.read().collect()
    }  # main never had it; nothing resurrects it


def test_compact_on_branch_moves_branch_only(spark, tmp_path):
    """Maintenance on a branch-bound handle (MoR compaction) commits to
    the branch pointer: main's head and state are untouched, and the
    branch still folds to the same rows afterwards."""
    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("staged")
    b = t.for_branch("staged")
    for i in (1, 2, 3):
        b.merge(_batch(spark, i, f"s{i}"), "w", f"b{i}", mode="mor")
    before = sorted(tuple(r) for r in b.read().collect())
    main_head = t.refresh().metadata["current_snapshot_id"]
    b.compact(max_files_per_bucket=1)
    t.refresh()
    assert t.metadata["current_snapshot_id"] == main_head
    assert sorted(tuple(r) for r in t.read(branch="staged").collect()) == before
    assert "s3" not in {r["text"] for r in t.read().collect()}


def test_streaming_wap_kill_resume_then_publish(spark, tmp_path):
    """Chaos: kill the staging stream mid-way, resume from checkpoint
    (same generation → same writer/branch), publish — exactly-once
    holds across the crash (no epoch staged twice) and the published
    state equals the golden oracle."""
    from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply
    from delta_spark.pipeline import Pipeline, PipelineConfig
    from conftest import assert_pdf_equal

    log_dir = str(tmp_path / "changelog")
    raw = generate_and_write(
        log_dir, ChangelogSpec(n_events=2500, n_convs=40, seed=23, n_files=8)
    )
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        generation=1,
        max_files_per_trigger=2,
        branch="staged",
    )
    p1 = Pipeline(spark, cfg)
    q = p1.run_stream(available_now=True)
    while not p1.stats:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)
    assert len(p1.stats) < 4  # genuinely mid-stream
    t = LakeTable.load(spark, cfg.table_path)
    assert t.read().count() == 0  # crash leaked nothing to main

    Pipeline(spark, cfg).run_stream_to_completion()  # resume
    t.refresh()
    assert t.read().count() == 0  # still staged only
    t.fast_forward("staged")
    assert_pdf_equal(
        t.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"]
    )
    # no epoch staged twice across the crash
    batch_ids = [
        s["batch-id"] for s in t.snapshot_summaries()
        if s and "batch-id" in s
    ]
    assert len(batch_ids) == len(set(batch_ids))


def test_as_of_never_resolves_staged_snapshots(spark, tmp_path):
    """Regression: TIMESTAMP AS OF used to pick the max-id retained
    snapshot at/before the cutoff — including unaudited WAP staging
    commits. It must resolve on main's lineage only (a branch-bound
    handle resolves on ITS lineage), and see staged data on main only
    after publication."""
    import time as _time

    t = _mk(spark, str(tmp_path / "t"))
    t.create_branch("staged")
    b = t.for_branch("staged")
    b.merge(_batch(spark, 1, "unaudited"), "w", "b1")
    t.refresh()
    now_ms = int((_time.time() + 60) * 1000)
    sid = t.snapshot_as_of(now_ms)
    assert sid == t.metadata["current_snapshot_id"]
    got = {r["text"] for r in t.read(as_of=now_ms).collect()}
    assert "unaudited" not in got and "v0-0" in got
    # the branch-bound handle's as_of resolves on the branch lineage
    assert b.refresh().snapshot_as_of(now_ms) == t.branches["staged"]
    # after publish, main's as_of sees it
    t.fast_forward("staged")
    assert "unaudited" in {
        r["text"] for r in t.read(as_of=now_ms).collect()
    }
