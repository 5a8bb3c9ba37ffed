"""Lake maintenance: time travel, snapshot expiry (markers survive),
small-file compaction."""

from pyspark.sql import functions as F

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA


def _mk_table(spark, path, n_batches=6, rows_per=50):
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 8)
    for b in range(n_batches):
        rows = [
            (f"c{i % 10}", b * rows_per + i, "user", f"b{b} r{i}", "", None, "INSERT", b * rows_per + i + 1)
            for i in range(rows_per)
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, "
            "ts timestamp, op string, seq long",
        )
        t.merge(df, "w1", f"b{b}")
    return t


def test_time_travel(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=3)
    snaps = [s["id"] for s in t.metadata["snapshots"]]
    first = t.read(snapshot_id=snaps[0]).count()
    last = t.read().count()
    assert first == 50 and last == 150


def test_expire_keeps_markers_and_data(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=6)
    before = t.read().count()
    n = t.expire_snapshots(keep_last=2)
    assert n == 4
    assert t.read().count() == before  # current data intact
    # exactly-once markers survive expiry
    assert t.is_applied("w1", "b0") and t.is_applied("w1", "b5")
    assert not t.is_applied("w1", "b99")
    # re-merge of an expired batch id is still skipped
    df = spark.createDataFrame(
        [("cX", 1, "user", "dup", "", None, "INSERT", 99999)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    assert t.merge(df, "w1", "b0") is None
    assert t.read().count() == before


def test_merge_is_self_compacting(spark, tmp_path):
    """Copy-on-write merge rewrites whole buckets: file count stays
    bounded by num_buckets no matter how many batches commit."""
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=6)
    per_bucket = {}
    for f in t.current_snapshot["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert max(per_bucket.values()) == 1
    assert len(t.current_snapshot["files"]) <= t.num_buckets
    assert t.compact(max_files_per_bucket=1) == 0  # nothing to do


def test_compact_reduces_files(spark, tmp_path):
    """When multi-file buckets DO exist (e.g. a differently-written
    import), compact() rewrites them down (Iceberg rewrite_data_files)."""
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=2)
    cur = t.current_snapshot
    # construct a crowded bucket: re-register the same data twice
    extra = t._write_data(
        t.read(include_system=True).withColumn("_bucket", t.bucket_expr()),
        "dup-import",
    )
    rows_before = t.read().count()
    t._commit_snapshot(cur["files"] + extra, {"operation": "append-import"})
    assert t.read().count() == 2 * rows_before  # duplicated on purpose
    n = t.compact(max_files_per_bucket=1)
    assert n > 0
    per_bucket = {}
    for f in t.current_snapshot["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert max(per_bucket.values()) == 1
    assert t.current_snapshot["summary"]["operation"] == "compact"
    assert t.read().count() == 2 * rows_before  # compaction keeps data
    # and a subsequent merge still works
    df = spark.createDataFrame(
        [("c1", 999999, "user", "post-compact", "", None, "INSERT", 10**6)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    assert t.merge(df, "w1", "post") is not None
    assert t.read().filter("text = 'post-compact'").count() == 1


def test_metadata_commit_is_atomic_and_tolerant(spark, tmp_path):
    """A torn (truncated) latest metadata version must not brick the
    table: _read_metadata falls back to the newest parseable version
    (the link()-atomic commit makes torn files impossible going
    forward, but a copied/half-synced table must still load)."""
    import os

    t = _mk_table(spark, str(tmp_path / "t"), n_batches=2)
    good_version = t.metadata["version"]
    torn = os.path.join(str(tmp_path / "t"), "metadata", f"v{good_version + 1}.json")
    with open(torn, "w") as f:
        f.write('{"version": ')  # truncated mid-write
    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    assert t2.metadata["version"] == good_version
    assert t2.read().count() == 100
    os.remove(torn)


def test_commit_conflict_on_concurrent_writers(spark, tmp_path):
    """Two writers racing for the same next version: exactly one wins,
    the loser gets CommitConflict (optimistic concurrency)."""
    import pytest

    from delta_spark.lake.table import CommitConflict

    t = _mk_table(spark, str(tmp_path / "t"), n_batches=1)
    loser = LakeTable.load(spark, str(tmp_path / "t"))
    meta = dict(t.metadata)
    t._write_metadata(meta, expected_version=t.metadata["version"])
    with pytest.raises(CommitConflict):
        loser._write_metadata(dict(loser.metadata), expected_version=loser.metadata["version"])


def test_time_travel_uses_snapshot_schema(spark, tmp_path):
    """VERSION-AS-OF reads align to the schema in effect AT that
    snapshot: pre-rename history reads under the old column name
    (Iceberg semantics — snapshots record their schema id)."""
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=1)
    old_snap = t.current_snapshot["id"]
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "tool", "new_name": "tool_name"})
    df = spark.createDataFrame(
        [("c1", 777, "user", "post-rename", "", None, "INSERT", 10**6)],
        "conv_id string, turn_idx int, role string, text string, tool_name string, "
        "ts timestamp, op string, seq long",
    )
    t.merge(df, "w1", "post-rename")
    assert "tool_name" in t.read().columns  # current reads: new name
    old = t.read(snapshot_id=old_snap)
    assert "tool" in old.columns and "tool_name" not in old.columns
    assert old.count() == 50


def test_mor_update_does_not_rewrite_base(spark, tmp_path):
    """Merge-on-read: a 1-row update appends ONE tiny delta file; the
    bucket's base file is untouched (no CoW rewrite amplification —
    at 100 TB a steady trickle must not rewrite 25 GB buckets)."""
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=1)
    base_paths = {f["path"] for f in t.current_snapshot["files"]}
    df = spark.createDataFrame(
        [("c1", 1, "user", "mor-patch", "", None, "UPDATE", 10**6)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    res = t.merge(df, "w1", "mor-1", mode="mor")
    assert res["files"] == 1
    after = {f["path"]: f for f in t.current_snapshot["files"]}
    assert base_paths <= set(after)  # every base file still referenced
    deltas = [f for f in after.values() if f.get("kind") == "delta"]
    assert len(deltas) == 1
    # read folds base + delta: exactly one row per key, update visible
    assert t.read().filter("text = 'mor-patch'").count() == 1
    assert t.read().count() == 50  # update, not insert
    assert t.delta_file_pressure() == 1


def test_mor_tombstone_blocks_stale_update(spark, tmp_path):
    """DELETE lands as a delta tombstone; a LATER-ARRIVING but
    LOWER-SEQ update for the same key must not resurrect it (the
    cross-micro-batch reorder guard, now across base/delta files)."""
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=1)
    ddl = (
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long"
    )
    t.merge(
        spark.createDataFrame([("c1", 1, None, None, None, None, "DELETE", 10**6)], ddl),
        "w1", "del", mode="mor",
    )
    assert t.read().filter("conv_id = 'c1' and turn_idx = 1").count() == 0
    # stale update (seq below the tombstone) arrives in a later batch
    t.merge(
        spark.createDataFrame([("c1", 1, "user", "zombie", "", None, "UPDATE", 500)], ddl),
        "w1", "stale", mode="mor",
    )
    assert t.read().filter("conv_id = 'c1' and turn_idx = 1").count() == 0
    # ... and survives compaction
    t.compact(max_files_per_bucket=1)
    assert t.read().filter("conv_id = 'c1' and turn_idx = 1").count() == 0
    assert t.delta_file_pressure() == 0


def test_mor_compact_folds_deltas_exactly(spark, tmp_path):
    """Several MoR batches then compact: delta files absorbed into
    base, final state identical before/after."""
    ddl = (
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long"
    )
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=1)
    for b in range(4):
        rows = [(f"c{i % 10}", i, "user", f"mor b{b} r{i}", "", None,
                 "UPDATE" if i % 2 else "INSERT", 1000 * (b + 1) + i) for i in range(20)]
        t.merge(spark.createDataFrame(rows, ddl), "w1", f"mor-{b}", mode="mor")
    before = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    assert t.delta_file_pressure() >= 1
    n = t.compact(max_files_per_bucket=1)
    assert n > 0 and t.delta_file_pressure() == 0
    after = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    assert before == after
    # newest update won inside the fold
    assert after[("c1", 1)] == "mor b3 r1"


def test_mor_commit_survives_observation_timeout(spark, tmp_path, monkeypatch):
    """An Observation timeout during a MoR merge must NOT discard the
    just-written (provably non-empty) delta files — that would drop a
    whole micro-batch while the checkpoint advances. Metrics degrade
    (recovered from parquet footers), data never does."""
    import delta_spark.lake.table as lt

    t = _mk_table(spark, str(tmp_path / "t"), n_batches=1)
    before = t.read().count()
    df = spark.createDataFrame(
        [("c1", 10**6 + i, "user", f"late {i}", "", None, "INSERT", 10**6 + i)
         for i in range(5)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    monkeypatch.setattr(lt, "observe_get", lambda *a, **k: None)
    res = t.merge(df, "w1", "b-timeout", mode="mor")
    monkeypatch.undo()
    assert res is not None and not res.get("aborted")
    assert res["upserts"] == 5  # recovered from footer row counts
    assert res["max_seq"] == 10**6 + 4  # recovered from _seq column stats
    summ = t.current_snapshot["summary"]
    assert summ.get("metrics-degraded") is True
    assert int(summ["max-seq"]) == 10**6 + 4
    assert t.read().count() == before + 5  # the batch actually landed
    # and a genuinely empty batch still commits nothing
    monkeypatch.setattr(lt, "observe_get", lambda *a, **k: None)
    res2 = t.merge(df.filter("seq < 0"), "w1", "b-empty", mode="mor")
    assert res2["files"] == 0 and t.read().count() == before + 5


def test_bucket_pruned_read_excludes_foreign_spanning_rows(spark, tmp_path):
    """read(buckets=...) filters spanning-delta rows on the stored
    _bucket column: a pruned read returns EXACTLY the requested
    buckets, so CoW rewrites never duplicate foreign buckets' rows
    into new base files."""
    from pyspark.sql import functions as F

    t = _mk_table(spark, str(tmp_path / "t"), n_batches=1)
    # spanning MoR delta touching many buckets
    df = spark.createDataFrame(
        [(f"c{i % 10}", 5000 + i, "user", f"mor {i}", "", None, "INSERT", 5000 + i)
         for i in range(40)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    t.merge(df, "w1", "b-mor", mode="mor")
    assert any(f["bucket"] == -1 for f in t.current_snapshot["files"])
    target = 3
    got = (
        t.read(buckets=[target])
        .withColumn("_b", F.pmod(F.xxhash64("conv_id"), F.lit(t.num_buckets)))
        .select("_b")
        .distinct()
        .collect()
    )
    assert {r[0] for r in got} == {target}


def test_split_manifest_commit_cost_flat(spark, tmp_path):
    """Split manifests: the metadata bytes written by ONE MoR append
    commit are ~flat whether the table holds 10^2 or 10^4 files —
    the commit writes one small manifest (its own files) plus a
    snapshot entry of manifest REFS, never the full file list
    (Iceberg manifest lists; reference analog: offsets in a store,
    DBReplicationOffsetStore.java:92-99)."""
    import os

    t = _mk_table(spark, str(tmp_path / "t"), n_batches=1)

    def fake_entries(n, tag):
        return [
            {"path": f"data/{tag}/part-{i:05d}.parquet", "bucket": -1,
             "schema_version": 0, "rows": 10, "max_seq": i, "kind": "delta"}
            for i in range(n)
        ]

    def commit_bytes(tag, n_added):
        """Bytes written to metadata by one append commit."""
        md = os.path.join(str(tmp_path / "t"), "metadata")
        def tree_size():
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(md) for f in fs
            )
        before = tree_size()
        t._commit_snapshot(added=fake_entries(n_added, tag),
                           summary={"operation": "merge-mor"})
        return tree_size() - before

    # grow the table to ~100 files, then measure one 4-file commit
    commit_bytes("grow-a", 100)
    small_table_cost = commit_bytes("probe-a", 4)
    # grow to ~10_000 files, measure the SAME 4-file commit
    commit_bytes("grow-b", 9900)
    big_table_cost = commit_bytes("probe-b", 4)
    # bytes grow with snapshot-entry bookkeeping (a few refs), never
    # with the file count: 100x more files < 3x more commit bytes
    assert big_table_cost < 3 * small_table_cost, (
        small_table_cost, big_table_cost,
    )
    # and the file list is intact end to end
    assert len(t.current_snapshot["files"]) >= 10_000


def test_migrate_inline_manifests(spark, tmp_path):
    """One-shot legacy-metadata migration (T3; reference analog
    StateStoreMigrator.java:52-106): a table whose snapshots store
    pre-split-manifest inline file lists upgrades in place, stays
    readable throughout, and the second run is a no-op."""
    from delta_spark.lake.interop import read_duckdb

    t = _mk_table(spark, str(tmp_path / "t"), n_batches=3)
    before = {(r.conv_id, r.turn_idx, r.text) for r in t.read().collect()}
    # forge the pre-split-manifest (round-2) layout: inline every list
    meta = dict(t.metadata)
    meta["snapshots"] = [
        {**{k: v for k, v in s.items() if k != "manifests"},
         "files": t._resolve_files(s)}
        for s in meta["snapshots"]
    ]
    t._write_metadata(meta, expected_version=t.metadata["version"])
    t._manifest_cache.clear()
    assert all("files" in s for s in t.metadata["snapshots"])
    assert t.read().count() == len(before)  # legacy layout readable

    n = t.migrate_inline_manifests()
    assert n == 3
    assert all(
        "files" not in s and s["manifests"] for s in t.metadata["snapshots"]
    )
    after = {(r.conv_id, r.turn_idx, r.text) for r in t.read().collect()}
    assert after == before
    assert t.migrate_inline_manifests() == 0  # idempotent
    # time travel across migrated history intact
    first_sid = t.metadata["snapshots"][0]["id"]
    assert t.read(snapshot_id=first_sid).count() == 50
    # the independent engine reads the migrated table identically
    assert len(read_duckdb(str(tmp_path / "t")).fetchall()) == len(before)


def test_catalog_migrate_metadata(spark, tmp_path):
    """Catalog-wide migration sweeps every table; already-current
    tables report 0."""
    import pyspark.sql.types as T

    from delta_spark.catalog import Catalog

    cat = Catalog.load_or_create(spark, str(tmp_path / "cat"))
    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    cat.create_table("a", sch, ["conv_id", "turn_idx"], "conv_id", 4)
    cat.create_table("b", sch, ["conv_id", "turn_idx"], "conv_id", 4)
    df = spark.createDataFrame(
        [("c1", 0, "hi", "INSERT", 1)],
        "conv_id string, turn_idx int, text string, op string, seq long",
    )
    ta = cat.table("a")
    ta.merge(df, "w", "b0")
    # downgrade table a to the legacy layout; table b stays empty
    meta = dict(ta.metadata)
    meta["snapshots"] = [
        {**{k: v for k, v in s.items() if k != "manifests"},
         "files": ta._resolve_files(s)}
        for s in meta["snapshots"]
    ]
    ta._write_metadata(meta, expected_version=ta.metadata["version"])
    assert cat.migrate_metadata() == {"a": 1, "b": 0}
    assert cat.migrate_metadata() == {"a": 0, "b": 0}
    assert cat.table("a").read().count() == 1


def test_expire_caps_marker_growth(spark, tmp_path):
    """applied_markers must not grow one entry per micro-batch forever:
    expire folds expired snapshots' markers but keeps only the newest
    ``keep_markers`` per writer (commit order). A replay can only ever
    reach the newest uncommitted epoch, so old markers are dead weight."""
    t = _mk_table(spark, str(tmp_path / "t"), n_batches=6)
    t.expire_snapshots(keep_last=2, keep_markers=3)
    m = t.metadata["applied_markers"]["w1"]
    assert m == ["b1", "b2", "b3"]  # newest 3 of the 4 expired (b0..b3)
    # newest markers still honored (via retained snapshots + cap tail)
    assert t.is_applied("w1", "b3") and t.is_applied("w1", "b5")
    # the dropped marker no longer answers — by design: a checkpoint
    # replay can never reach that far back
    assert not t.is_applied("w1", "b0")
