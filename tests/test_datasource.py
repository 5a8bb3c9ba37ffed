"""The ``deltaspark`` Python DataSource: lake tables as a first-class
Spark format — batch state reads (time travel, pushdown pruning),
batch change-feed reads, and the streaming change-feed source with
checkpointed exactly-once resume. Every read is pinned against the
engine's own readers (LakeTable.read / read_changes)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_spark.lake import LakeTable
from delta_spark.lake.datasource import (
    LakeBatchReader,
    LakeDataSource,
    register,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TS = __import__("datetime").datetime(2025, 1, 1)


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register(spark)


def _commit(spark, tbl, rows, op, seq, bid):
    df = (
        spark.createDataFrame(rows, SCHEMA)
        .withColumn("op", F.lit(op))
        .withColumn("seq", F.lit(seq).cast("long"))
    )
    tbl.merge(df, writer_id="w", batch_id=bid)


@pytest.fixture
def table(spark, tmp_path):
    """3 commits: 60-row insert, 4 updates, 1 delete — MoR deltas in
    play (auto mode), two mid-history snapshots to travel to."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    _commit(
        spark,
        tbl,
        [(f"c{i}", j, f"v0 {i}/{j}", TS) for i in range(20) for j in range(3)],
        "INSERT",
        1,
        "b1",
    )
    s1 = tbl.metadata["current_snapshot_id"]
    _commit(
        spark,
        tbl,
        [(f"c{i}", 0, f"v1 {i}", TS) for i in range(0, 20, 5)],
        "UPDATE",
        2,
        "b2",
    )
    _commit(spark, tbl, [("c3", 1, None, None)], "DELETE", 3, "b3")
    return tbl, s1


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _fmt(spark, path, **opts):
    r = spark.read.format("deltaspark").option("path", str(path))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_state_read_equals_engine(spark, table):
    tbl, _ = table
    got = _fmt(spark, tbl.path)
    assert got.schema == tbl.read().schema
    assert _rows(got) == _rows(tbl.read())


def test_time_travel_snapshot_and_tag(spark, table):
    tbl, s1 = table
    tbl.tag("first", s1)
    for opt in ({"snapshot_id": s1}, {"tag": "first"}):
        got = _fmt(spark, tbl.path, **opt)
        assert _rows(got) == _rows(tbl.read(snapshot_id=s1))
    with pytest.raises(Exception, match="unknown tag"):
        _fmt(spark, tbl.path, tag="nope").collect()


def test_branch_read(spark, table):
    tbl, _ = table
    tbl.create_branch("audit")
    h = tbl.for_branch("audit")
    _commit(spark, h, [("c0", 0, "staged", TS)], "UPDATE", 9, "stage1")
    fresh = LakeTable.load(spark, tbl.path)  # h advanced the ref on disk
    got = _fmt(spark, tbl.path, branch="audit")
    assert _rows(got) == _rows(fresh.read(branch="audit"))
    staged = {r["text"] for r in got.filter("conv_id='c0' and turn_idx=0").collect()}
    assert staged == {"staged"}
    # main unchanged through the format too
    assert _rows(_fmt(spark, tbl.path)) == _rows(fresh.read())


def test_bucket_pruning_pushdown_plans_one_task(spark, table):
    """Driver-side proof the equality filter pruned partitions: the
    reader plans exactly the key's bucket, and the filtered read is
    row-equal to the engine's."""
    tbl, _ = table
    got = _fmt(spark, tbl.path).filter(
        (F.col("conv_id") == "c7") & (F.col("turn_idx") == 2)
    )
    assert [r["text"] for r in got.collect()] == ["v0 7/2"]

    from pyspark.sql.datasource import EqualTo

    rdr = LakeBatchReader(tbl.path, {}, tbl.read().schema)
    rdr.pushFilters([EqualTo(("conv_id",), "c7")])
    parts = rdr.partitions()
    assert len(parts) == 1
    from delta_spark.lake.xxh import bucket_of

    assert parts[0].buckets == [bucket_of("c7", 8, coltype="string")]


def test_range_pushdown_recorded_and_correct(spark, table):
    tbl, _ = table
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    rdr = LakeBatchReader(tbl.path, {}, tbl.read().schema)
    rdr.pushFilters(
        [GreaterThanOrEqual(("turn_idx",), 1), LessThan(("turn_idx",), 2)]
    )
    assert rdr._ranges["turn_idx"] == (1, 2)
    got = _fmt(spark, tbl.path).filter("turn_idx >= 1 and turn_idx < 2")
    assert _rows(got) == _rows(tbl.read().filter("turn_idx = 1"))


def test_max_tasks_coalesces_partitions(spark, table):
    """max_tasks bounds the fan-out (a 4096-bucket table must not cost
    4096 Python worker spin-ups) without changing the result."""
    tbl, _ = table
    rdr = LakeBatchReader(tbl.path, {"max_tasks": "3"}, tbl.read().schema)
    parts = rdr.partitions()
    assert len(parts) <= 3
    assert sorted(b for p in parts for b in p.buckets) == sorted(
        b for p in LakeBatchReader(tbl.path, {}, tbl.read().schema).partitions()
        for b in p.buckets
    )
    got = _fmt(spark, tbl.path, max_tasks="3")
    assert _rows(got) == _rows(tbl.read())


def test_rename_then_read_uses_current_names(spark, table):
    tbl, _ = table
    tbl.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "body"})
    got = _fmt(spark, tbl.path)
    assert "body" in got.columns and "text" not in got.columns
    assert _rows(got) == _rows(tbl.read())


def test_rebucket_crossing_read(spark, table):
    """Files under the OLD spec stay readable: candidate set widens to
    the full domain and each task row-filters foreign-spec files on
    the recomputed Spark-equal hash."""
    tbl, _ = table
    tbl.rebucket(5)
    _commit(spark, tbl, [("c2", 0, "v2 post-rebucket", TS)], "UPDATE", 4, "b4")
    got = _fmt(spark, tbl.path)
    assert _rows(got) == _rows(tbl.read())


def test_empty_table_reads_empty(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "e"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    got = _fmt(spark, tbl.path)
    assert got.count() == 0
    eng = tbl.read().schema
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in eng
    ]


def test_changes_feed_batch_equals_engine(spark, table):
    tbl, s1 = table
    head = tbl.metadata["current_snapshot_id"]
    got = _fmt(spark, tbl.path, feed="changes", from_snapshot_id=s1)
    eng = tbl.read_changes(s1, head).select(*got.columns)
    assert _rows(got) == _rows(eng)
    # from omitted: full state as inserts
    full = _fmt(spark, tbl.path, feed="changes")
    assert full.count() == tbl.read().count()
    assert {r["_change_type"] for r in full.collect()} == {"insert"}


def test_stream_requires_changes_feed(spark, table, tmp_path):
    tbl, _ = table
    sdf = spark.readStream.format("deltaspark").option("path", tbl.path).load()
    with pytest.raises(Exception, match="feed"):
        q = (
            sdf.writeStream.format("parquet")
            .option("path", str(tmp_path / "o"))
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def _run_available_now(spark, src_path, out, ck, starting="earliest", **opts):
    r = (
        spark.readStream.format("deltaspark")
        .option("path", str(src_path))
        .option("feed", "changes")
        .option("starting", starting)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    sdf = r.load()
    q = (
        sdf.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_earliest_then_resume_exactly_once(spark, tmp_path):
    """Offsets are snapshot ids: the first run folds history-to-head
    into one inserts batch; a checkpointed rerun after two more
    commits emits ONLY their diff — no replays, no gaps."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    _commit(
        spark, tbl, [(f"c{i}", 0, f"v0 {i}", TS) for i in range(10)], "INSERT", 1, "b1"
    )
    _commit(spark, tbl, [("c3", 0, "v1 3", TS)], "UPDATE", 2, "b2")
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_available_now(spark, tbl.path, out, ck)
    first = spark.read.parquet(str(out)).collect()
    assert len(first) == 10  # head state as inserts, c3 already at v1
    assert {r["_change_type"] for r in first} == {"insert"}
    assert [r["text"] for r in first if r["conv_id"] == "c3"] == ["v1 3"]

    _commit(spark, tbl, [("c5", 0, None, None)], "DELETE", 3, "b3")
    _commit(spark, tbl, [("c9", 1, "v0 9/1", TS)], "INSERT", 4, "b4")
    _run_available_now(spark, tbl.path, out, ck)
    rows = spark.read.parquet(str(out)).collect()
    tagged = sorted((r["conv_id"], r["turn_idx"], r["_change_type"]) for r in rows)
    assert len(rows) == 12
    assert ("c5", 0, "delete") in tagged and ("c9", 1, "insert") in tagged

    # a rerun with NOTHING new is a no-op (offset unchanged)
    _run_available_now(spark, tbl.path, out, ck)
    assert spark.read.parquet(str(out)).count() == 12


def test_stream_starting_latest_skips_history(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    _commit(
        spark, tbl, [(f"c{i}", 0, f"v0 {i}", TS) for i in range(6)], "INSERT", 1, "b1"
    )
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_available_now(spark, tbl.path, out, ck, starting="latest")
    # history not emitted; parquet sink may not even have files yet
    try:
        n0 = spark.read.parquet(str(out)).count()
    except Exception:
        n0 = 0
    assert n0 == 0
    _commit(spark, tbl, [("c1", 0, "v1 1", TS)], "UPDATE", 2, "b2")
    _run_available_now(spark, tbl.path, out, ck, starting="latest")
    rows = spark.read.parquet(str(out)).collect()
    assert [(r["conv_id"], r["_change_type"], r["text"]) for r in rows] == [
        ("c1", "update", "v1 1")
    ]


def _write(df, path, bid, **opts):
    w = (
        df.write.format("deltaspark")
        .mode("append")
        .option("path", str(path))
        .option("writer_id", "fmt")
        .option("batch_id", bid)
    )
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()


def test_writer_upsert_delete_exactly_once(spark, tmp_path):
    """The format write is a CDC delta batch: multi-task staging, ONE
    snapshot, idempotent replay, engine readers/compaction compose."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    ev = (
        spark.createDataFrame(
            [(f"c{i}", 0, f"v0 {i}", TS) for i in range(40)], SCHEMA
        )
        .withColumn("op", F.lit("INSERT"))
        .withColumn("seq", F.lit(1).cast("long"))
        .repartition(4)
    )
    _write(ev, tbl.path, "b1")
    t = LakeTable.load(spark, tbl.path)
    assert t.read().count() == 40
    # one snapshot, one (writer, batch) marker, multiple staged files
    snap = t.metadata["snapshots"][-1]
    assert snap["summary"]["writer-id"] == "fmt"
    assert snap["summary"]["batch-id"] == "b1"
    assert snap["summary"]["upserts"] == 40

    # replay of the same (writer_id, batch_id) is a NO-OP
    _write(ev.withColumn("text", F.lit("GHOST")), tbl.path, "b1")
    t2 = LakeTable.load(spark, tbl.path)
    assert t2.metadata["current_snapshot_id"] == t.metadata["current_snapshot_id"]
    assert "GHOST" not in {r["text"] for r in t2.read().collect()}

    # upsert + tombstone batch folds like any engine delta
    ev2 = (
        spark.createDataFrame(
            [("c3", 0, "v1 3", TS), ("c5", 0, None, None)], SCHEMA
        )
        .withColumn(
            "op", F.when(F.col("conv_id") == "c5", "DELETE").otherwise("UPDATE")
        )
        .withColumn("seq", F.lit(2).cast("long"))
    )
    _write(ev2, tbl.path, "b2")
    t3 = LakeTable.load(spark, tbl.path)
    rows = {(r["conv_id"], r["text"]) for r in t3.read().collect()}
    assert ("c3", "v1 3") in rows and len(rows) == 39
    assert not any(c == "c5" for c, _ in rows)
    # format read agrees with the engine read
    assert _rows(_fmt(spark, tbl.path)) == _rows(t3.read())
    # compaction absorbs the format-written deltas
    t3.compact()
    t4 = LakeTable.load(spark, tbl.path)
    assert {(r["conv_id"], r["text"]) for r in t4.read().collect()} == rows


def test_writer_requires_identity_and_append(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    ev = (
        spark.createDataFrame([("c0", 0, "x", TS)], SCHEMA)
        .withColumn("op", F.lit("INSERT"))
        .withColumn("seq", F.lit(1).cast("long"))
    )
    with pytest.raises(Exception, match="writer_id"):
        ev.write.format("deltaspark").mode("append").option(
            "path", tbl.path
        ).save()
    with pytest.raises(Exception, match="append"):
        ev.write.format("deltaspark").mode("overwrite").option(
            "path", tbl.path
        ).option("writer_id", "w").option("batch_id", "b").save()
    with pytest.raises(Exception, match="missing columns"):
        _write(spark.createDataFrame([("c0", 0)], "conv_id string, turn_idx int"), tbl.path, "b1")


def test_writer_stages_on_branch(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    ev = (
        spark.createDataFrame([("c0", 0, "main0", TS)], SCHEMA)
        .withColumn("op", F.lit("INSERT"))
        .withColumn("seq", F.lit(1).cast("long"))
    )
    _write(ev, tbl.path, "b1")
    LakeTable.load(spark, tbl.path).create_branch("stage")
    ev2 = (
        spark.createDataFrame([("c1", 0, "staged1", TS)], SCHEMA)
        .withColumn("op", F.lit("INSERT"))
        .withColumn("seq", F.lit(2).cast("long"))
    )
    _write(ev2, tbl.path, "b2", branch="stage")
    t = LakeTable.load(spark, tbl.path)
    assert t.read().count() == 1  # main untouched
    assert _rows(_fmt(spark, tbl.path, branch="stage")) == _rows(
        t.read(branch="stage")
    )
    t.fast_forward("stage")
    assert LakeTable.load(spark, tbl.path).read().count() == 2


def test_stream_sink_epoch_exactly_once(spark, tmp_path):
    """writeStream.format('deltaspark'): each micro-batch commits one
    snapshot whose batch id is the stream epoch; a checkpointed rerun
    replays no epoch twice."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    ev = (
        spark.createDataFrame(
            [(f"c{i}", 0, f"v0 {i}", TS) for i in range(12)], SCHEMA
        )
        .withColumn("op", F.lit("INSERT"))
        .withColumn("seq", F.lit(1).cast("long"))
    )
    log = tmp_path / "log"
    ev.repartition(3).write.parquet(str(log))
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(log))
    )

    def run():
        q = (
            sdf.writeStream.format("deltaspark")
            .option("path", tbl.path)
            .option("writer_id", "stream-w")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    t = LakeTable.load(spark, tbl.path)
    assert t.read().count() == 12
    bids = {
        s["summary"]["batch-id"]
        for s in t.metadata["snapshots"]
        if s["summary"].get("writer-id") == "stream-w"
    }
    assert bids == {"stream-0", "stream-1", "stream-2"}
    run()  # same checkpoint: every epoch already committed
    assert (
        LakeTable.load(spark, tbl.path).metadata["current_snapshot_id"]
        == t.metadata["current_snapshot_id"]
    )

    with pytest.raises(Exception, match="batch_id_prefix"):
        q = (
            sdf.writeStream.format("deltaspark")
            .option("path", tbl.path)
            .option("writer_id", "w")
            .option("batch_id", "explicit")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_lake_to_lake_replication_through_format_only(spark, tmp_path):
    """The whole CDC loop with NO engine API in the pipe: source lake
    table → readStream(feed=changes) → writeStream(deltaspark) →
    replica lake table. After two rounds (including updates and a
    delete), the replica equals the source exactly."""
    src = LakeTable.create(
        spark,
        str(tmp_path / "src"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    dst = LakeTable.create(
        spark,
        str(tmp_path / "dst"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,  # different bucketing: replication is logical
    )
    _commit(
        spark,
        src,
        [(f"c{i}", 0, f"v0 {i}", TS) for i in range(10)],
        "INSERT",
        1,
        "b1",
    )

    sdf = (
        spark.readStream.format("deltaspark")
        .option("path", src.path)
        .option("feed", "changes")
        .option("starting", "earliest")
        .load()
    )
    # deletes tie their retracted row on _seq in the replica: the
    # _ord sort column makes the tombstone win deterministically
    piped = sdf.select(
        "conv_id",
        "turn_idx",
        "text",
        "ts",
        F.when(F.col("_change_type") == "delete", "DELETE")
        .otherwise("UPSERT")
        .alias("op"),
        F.col("_seq").alias("seq"),
        F.when(F.col("_change_type") == "delete", F.lit(1))
        .otherwise(F.lit(0))
        .alias("_ord"),
    )

    def run():
        q = (
            piped.writeStream.format("deltaspark")
            .option("path", dst.path)
            .option("writer_id", "replica")
            .option("sort_col", "_ord")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    a = _rows(LakeTable.load(spark, dst.path).read().select("conv_id", "turn_idx", "text"))
    b = _rows(src.read().select("conv_id", "turn_idx", "text"))
    assert a == b and len(a) == 10

    _commit(spark, src, [("c3", 0, "v1 3", TS)], "UPDATE", 2, "b2")
    _commit(spark, src, [("c5", 0, None, None)], "DELETE", 3, "b3")
    run()
    a = _rows(LakeTable.load(spark, dst.path).read().select("conv_id", "turn_idx", "text"))
    b = _rows(LakeTable.load(spark, src.path).read().select("conv_id", "turn_idx", "text"))
    assert a == b and len(a) == 9
    assert ("c3", 0, "v1 3") in a
    # the replica must ALSO fold correctly through the format/DuckDB
    # reader (the tombstone ties its row on _seq; the _ord sort column
    # decides the tie deterministically in every reader)
    f = _rows(_fmt(spark, dst.path).select("conv_id", "turn_idx", "text"))
    assert f == b


@pytest.mark.parametrize(
    "case",
    [
        dict(n_events=2500, n_convs=25, seed=101, update_frac=0.6, delete_frac=0.02),
        dict(n_events=2500, n_convs=30, seed=105, include_ddl=True, dup_frac=0.1),
    ],
    ids=["heavy_updates", "ddl_with_dups"],
)
def test_format_read_equals_engine_property(spark, tmp_path, case):
    """Property sweep over the generator stress cases: after a REAL
    pipeline replay (MoR deltas, DDL, dup injection), the format read
    equals the engine read row-for-row — and the format CHANGE FEED
    from the empty table equals the state as inserts."""
    from delta_spark.changelog import ChangelogSpec, generate_and_write
    from delta_spark.pipeline import Pipeline, PipelineConfig

    generate_and_write(str(tmp_path / "log"), ChangelogSpec(**case))
    cfg = PipelineConfig(
        changelog_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        num_buckets=4,
    )
    Pipeline(spark, cfg).run_batch()
    tbl = LakeTable.load(spark, cfg.table_path)
    eng = tbl.read()
    got = _fmt(spark, cfg.table_path)
    assert sorted(got.columns) == sorted(eng.columns)
    cols = sorted(eng.columns)
    assert _rows(got.select(*cols)) == _rows(eng.select(*cols))
    feed = _fmt(spark, cfg.table_path, feed="changes")
    assert feed.count() == eng.count()
    assert {r["_change_type"] for r in feed.select("_change_type").distinct().collect()} == {"insert"}


def test_catalog_by_name_resolution(spark, tmp_path):
    """format('deltaspark').option('catalog', root).option('table', n)
    resolves through the catalog document (Spark-free) — including
    after a RENAME."""
    from delta_spark.catalog import Catalog

    cat = Catalog.load_or_create(spark, str(tmp_path / "cat"))
    cat.create_table("conv", SCHEMA, key_cols=["conv_id", "turn_idx"])
    tbl = cat.table("conv")
    _commit(spark, tbl, [("c0", 0, "x", TS)], "INSERT", 2, "b1")
    got = (
        spark.read.format("deltaspark")
        .option("catalog", str(tmp_path / "cat"))
        .option("table", "conv")
        .load()
    )
    assert _rows(got) == _rows(tbl.read())
    with pytest.raises(Exception, match="no table"):
        (
            spark.read.format("deltaspark")
            .option("catalog", str(tmp_path / "cat"))
            .option("table", "nope")
            .load()
        )
    with pytest.raises(Exception, match="not both"):
        (
            spark.read.format("deltaspark")
            .option("catalog", str(tmp_path / "cat"))
            .option("table", "conv")
            .option("path", tbl.path)
            .load()
        )


def test_midstream_rename_keeps_pinned_names(spark, tmp_path):
    """A metadata-only rename mid-stream must not break (or silently
    re-shape) a running query: the stream's naming epoch is pinned at
    query start — post-rename commits keep arriving under the pinned
    names (field-id mapping underneath) — while a FRESH batch read
    speaks the new names."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    _commit(spark, tbl, [("c0", 0, "v0", TS)], "INSERT", 1, "b1")
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_available_now(spark, tbl.path, out, ck)  # drain pre-rename

    # a LIVE stream pins its naming epoch at query start: model it by
    # creating the reader object pre-rename and driving a micro-batch
    # planned after the rename landed
    from delta_spark.lake.datasource import (
        LakeChangesStreamReader,
        LakeDataSource,
    )

    pinned_schema = LakeDataSource({"path": tbl.path, "feed": "changes"}).schema()
    rdr = LakeChangesStreamReader(tbl.path, {}, pinned_schema)
    start = rdr.latestOffset()

    tbl.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "body"})
    post = spark.createDataFrame(
        [("c1", 0, "v1", TS, "INSERT", 2)],
        "conv_id string, turn_idx int, body string, ts timestamp, "
        "op string, seq long",
    )
    LakeTable.load(spark, tbl.path).merge(post, writer_id="w", batch_id="b2")

    end = rdr.latestOffset()
    parts = rdr.partitions(start, end)
    batches = [b for p in parts for b in rdr.read(p)]
    assert batches, "post-rename commit must still stream"
    names = set(batches[0].schema.names)
    assert "text" in names and "body" not in names  # pinned epoch
    import pyarrow as pa

    t = pa.Table.from_batches(batches)
    got = set(zip(t["conv_id"].to_pylist(), t["text"].to_pylist()))
    assert ("c1", "v1") in got

    # a FRESH head feed read (and a fresh stream pin) speaks new names
    head_feed = _fmt(spark, tbl.path, feed="changes")
    assert "body" in head_feed.columns and "text" not in head_feed.columns
    assert {(r["conv_id"], r["body"]) for r in head_feed.collect()} == {
        ("c0", "v0"),
        ("c1", "v1"),
    }


def test_explicit_head_after_rename_uses_snapshot_names(spark, tmp_path):
    """Explicit time travel to an id that HAPPENS to be the current
    head still speaks the snapshot's recorded (pre-rename) names —
    matching the engine's read(snapshot_id=) — while the default head
    read speaks current names. Both read, neither crashes."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    _commit(spark, tbl, [("c0", 0, "v0", TS)], "INSERT", 1, "b1")
    head = tbl.metadata["current_snapshot_id"]
    tbl.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "body"})

    default_read = _fmt(spark, tbl.path)
    assert "body" in default_read.columns
    assert default_read.count() == 1

    pinned = _fmt(spark, tbl.path, snapshot_id=head)
    assert "text" in pinned.columns and "body" not in pinned.columns
    assert [r["text"] for r in pinned.collect()] == ["v0"]
    assert pinned.columns == LakeTable.load(spark, tbl.path).read(
        snapshot_id=head
    ).columns

    feed = _fmt(spark, tbl.path, feed="changes", to_snapshot_id=head)
    assert "text" in feed.columns and feed.count() == 1


def test_stream_expired_offset_fails_loudly(spark, tmp_path):
    """A checkpointed offset whose snapshot has been expired by
    retention must fail at planning (the consume_changes resync
    contract) — never silently emit a wrong diff."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    _commit(spark, tbl, [("c0", 0, "v0", TS)], "INSERT", 1, "b1")
    s1 = tbl.metadata["current_snapshot_id"]
    _commit(spark, tbl, [("c1", 0, "v0", TS)], "INSERT", 2, "b2")
    _commit(spark, tbl, [("c2", 0, "v0", TS)], "INSERT", 3, "b3")
    tbl.expire_snapshots(keep_last=1)
    from delta_spark.lake.datasource import _change_partitions

    head = LakeTable.load(spark, tbl.path).metadata["current_snapshot_id"]
    with pytest.raises(Exception):
        _change_partitions(tbl.path, s1, head)


def test_replication_rebuild_on_expired_offset(spark, tmp_path):
    """jobs/replicate_table.py --on-expired-offset rebuild: when the
    checkpointed source offset has been expired by retention, the
    preflight DROPS replica + checkpoint so the next run re-replicates
    the source's full current state — including clearing keys deleted
    inside the lost window, which no in-stream rebootstrap can retract
    (the stream-source option's documented caveat)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "replicate_table_job",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "replicate_table.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    src = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    dst_path, ck = str(tmp_path / "dst"), str(tmp_path / "ck")

    def replicate():
        if not LakeTable.exists(dst_path):  # the job's bootstrap
            LakeTable.create(
                spark, dst_path, SCHEMA,
                key_cols=["conv_id", "turn_idx"], num_buckets=4,
            )
        sdf = (
            spark.readStream.format("deltaspark")
            .option("path", src.path)
            .option("feed", "changes")
            .option("starting", "earliest")
            .load()
        )
        piped = sdf.select(
            "conv_id", "turn_idx", "text", "ts",
            F.when(F.col("_change_type") == "delete", "DELETE")
            .otherwise("UPSERT").alias("op"),
            F.col("_seq").alias("seq"),
            F.when(F.col("_change_type") == "delete", F.lit(1))
            .otherwise(F.lit(0)).alias("_ord"),
        )
        q = (
            piped.writeStream.format("deltaspark")
            .option("path", dst_path)
            .option("writer_id", "replica")
            .option("sort_col", "_ord")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # no checkpoint yet → preflight is a no-op
    assert job.rebuild_if_offset_expired(src.path, dst_path, ck) is False

    _commit(
        spark, src, [(f"c{i}", 0, f"v0 {i}", TS) for i in range(4)], "INSERT", 1, "b1"
    )
    replicate()
    assert job.checkpointed_offset(ck) == 1
    # live offset → no-op
    assert job.rebuild_if_offset_expired(src.path, dst_path, ck) is False

    # the lost window: a delete, a new insert, then offset expiry
    _commit(spark, src, [("c2", 0, None, None)], "DELETE", 2, "b2")
    _commit(spark, src, [("c9", 9, "new", TS)], "INSERT", 3, "b3")
    src_reloaded = LakeTable.load(spark, src.path)
    src_reloaded.expire_snapshots(keep_last=1)

    assert job.rebuild_if_offset_expired(src.path, dst_path, ck) is True
    assert not os.path.exists(dst_path) and not os.path.exists(ck)

    replicate()  # fresh replica from the full current state
    a = _rows(LakeTable.load(spark, dst_path).read().select("conv_id", "turn_idx", "text"))
    b = _rows(LakeTable.load(spark, src.path).read().select("conv_id", "turn_idx", "text"))
    assert a == b and len(a) == 4  # c2 gone, c9 present
    assert not any(r[0] == "c2" for r in a)

    # a checkpoint whose offset the source can NEVER have committed
    # (wrong-table mixup / rolled-back head) must not destroy the
    # replica — the preflight declines and the stream stays loud
    ck2 = str(tmp_path / "ck_wrong")
    os.makedirs(os.path.join(ck2, "commits"))
    os.makedirs(os.path.join(ck2, "offsets"))
    open(os.path.join(ck2, "commits", "0"), "w").write("v1\n{}")
    open(os.path.join(ck2, "offsets", "0"), "w").write(
        'v1\n{"batchWatermarkMs":0}\n{"snapshot_id": 999}'
    )
    assert job.checkpointed_offset(ck2) == 999
    assert job.rebuild_if_offset_expired(src.path, dst_path, ck2) is False
    assert os.path.exists(dst_path)  # untouched


def test_stream_expired_offset_rebootstrap(spark, tmp_path):
    """``expired_offset='rebootstrap'``: a checkpointed stream whose
    offset snapshot was expired by retention re-emits the FULL current
    state as inserts (the consume_changes rebootstrap contract made
    opt-in on the source) and keeps streaming incrementally after; the
    default keeps failing loudly."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    _commit(
        spark, tbl, [(f"c{i}", 0, f"v0 {i}", TS) for i in range(4)], "INSERT", 1, "b1"
    )
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_available_now(spark, tbl.path, out, ck)  # offset now at snapshot 1
    assert spark.read.parquet(str(out)).count() == 4

    # the lost window: an update, a delete, then expiry of the offset
    _commit(spark, tbl, [("c1", 0, "v1 1", TS)], "UPDATE", 2, "b2")
    _commit(spark, tbl, [("c2", 0, None, None)], "DELETE", 3, "b3")
    tbl.expire_snapshots(keep_last=1)

    # default: the checkpointed resume fails loudly at planning
    with pytest.raises(Exception, match="expired|rebootstrap"):
        _run_available_now(spark, tbl.path, out, ck)

    # opt-in: the resume emits the full head state (3 live rows) as
    # inserts — c1 at its post-update text, c2 absent (no tombstone,
    # as documented)
    _run_available_now(spark, tbl.path, out, ck, expired_offset="rebootstrap")
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 4 + 3
    assert {r["_change_type"] for r in rows} == {"insert"}
    # c1 appears at both its pre- and post-update text (old batch +
    # bootstrap); c2 only once (deleted before the bootstrap)
    assert {r["text"] for r in rows if r["conv_id"] == "c1"} == {"v0 1", "v1 1"}
    assert sum(r["conv_id"] == "c2" for r in rows) == 1

    # ... and the stream is incremental again afterwards
    _commit(spark, tbl, [("c9", 9, "new", TS)], "INSERT", 4, "b4")
    _run_available_now(spark, tbl.path, out, ck, expired_offset="rebootstrap")
    rows2 = spark.read.parquet(str(out)).collect()
    assert len(rows2) == 8
    assert ("c9", 9, "insert") in {
        (r["conv_id"], r["turn_idx"], r["_change_type"]) for r in rows2
    }

    # bad option value is refused up front
    with pytest.raises(Exception, match="expired_offset"):
        _run_available_now(
            spark, tbl.path, tmp_path / "o2", tmp_path / "c2",
            expired_offset="ignore",
        )

    # a NEVER-COMMITTED starting id (typo / wrong-table checkpoint) is
    # a configuration error — rebootstrap must NOT mask it
    with pytest.raises(Exception, match="unknown|expired"):
        _run_available_now(
            spark, tbl.path, tmp_path / "o3", tmp_path / "c3",
            starting="999", expired_offset="rebootstrap",
        )


def test_stream_rebootstrap_end_offset_also_expired(spark, tmp_path):
    """The guarded retry: when the replayed batch's WAL'd END offset
    has been expired too, the reader names that state instead of
    promising a rebootstrap and then crashing inside the retry."""
    from delta_spark.lake.datasource import LakeChangesStreamReader
    from delta_spark.lake.interop import ExpiredSnapshotError

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    for i in range(1, 4):
        _commit(spark, tbl, [(f"c{i}", 0, f"v{i}", TS)], "INSERT", i, f"b{i}")
    LakeTable.load(spark, tbl.path).expire_snapshots(keep_last=1)  # keeps id 3

    r = LakeChangesStreamReader(tbl.path, {"expired_offset": "rebootstrap"}, None)
    # both ends expired → the named both-expired error, not a raw retry crash
    with pytest.raises(ExpiredSnapshotError, match="end\\s+offset|Delete the checkpoint"):
        r.partitions({"snapshot_id": 1}, {"snapshot_id": 2})
    # end still live → rebootstrap plans full-state partitions
    parts = r.partitions({"snapshot_id": 1}, {"snapshot_id": 3})
    assert parts and all(p.frm is None and p.to == 3 for p in parts)


def test_schema_function_matches_feeds(spark, table):
    tbl, _ = table
    ds = LakeDataSource({"path": tbl.path})
    st = ds.schema()
    assert st["conv_id"].dataType == T.StringType()
    dsc = LakeDataSource({"path": tbl.path, "feed": "changes"})
    stc = dsc.schema()
    assert stc["_change_type"].dataType == T.StringType()
    assert stc["_seq"].dataType == T.LongType()
    with pytest.raises(ValueError, match="at most one"):
        LakeDataSource(
            {"path": tbl.path, "snapshot_id": "1", "tag": "x"}
        ).schema()


# -- round-5 ADVICE regressions --------------------------------------


def test_pushdown_decided_from_options_e2e(spark, table):
    """reader() executes in PySpark's sessionless planner worker, so the
    pushdown choice must come from OPTIONS, not getActiveSession() (which
    is None there — the old conf probe silently disabled pruning for
    every real read). E2E through the registered format: an equality
    filter on the full key plans exactly ONE scan task; the unfiltered
    read plans one per populated bucket."""
    tbl, _ = table
    got = _fmt(spark, tbl.path).filter(
        (F.col("conv_id") == "c7") & (F.col("turn_idx") == 2)
    )
    assert got.rdd.getNumPartitions() == 1
    assert [r["text"] for r in got.collect()] == ["v0 7/2"]
    assert _fmt(spark, tbl.path).rdd.getNumPartitions() > 1


def test_pushdown_conf_off_fails_loudly_with_escape_hatch(spark, table):
    """A session without spark.sql.python.filterPushdown.enabled gets
    Spark's DATA_SOURCE_PUSHDOWN_DISABLED error naming the conf (not a
    silent full scan); .option('pushdown','false') is the explicit
    opt-out for sessions that cannot flip it."""
    tbl, _ = table
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    try:
        with pytest.raises(Exception, match="filterPushdown"):
            _fmt(spark, tbl.path).collect()
        got = _fmt(spark, tbl.path, pushdown="false")
        assert _rows(got) == _rows(tbl.read())
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def test_snapshot_was_expired_rejects_id_zero(spark, tmp_path):
    """Snapshot ids are allocated from 1; sid=0 (a typo'd starting='0',
    a corrupt checkpoint) can never have been committed, so it must be
    classified as a configuration error — rebootstrap/rebuild paths
    must NOT silently resync over it."""
    from delta_spark.lake.datasource import LakeChangesStreamReader
    from delta_spark.lake.interop import (
        ExpiredSnapshotError,
        read_metadata,
        snapshot_was_expired,
    )

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    _commit(spark, tbl, [("c1", 0, "v", TS)], "INSERT", 1, "b1")
    meta = read_metadata(tbl.path)
    assert snapshot_was_expired(meta, 0) is False
    assert snapshot_was_expired(meta, 1) is True
    assert snapshot_was_expired(meta, meta["current_snapshot_id"] + 1) is False
    # the stream reader refuses to rebootstrap over sid=0
    r = LakeChangesStreamReader(tbl.path, {"expired_offset": "rebootstrap"}, None)
    with pytest.raises(ExpiredSnapshotError):
        r.partitions(
            {"snapshot_id": 0},
            {"snapshot_id": int(meta["current_snapshot_id"])},
        )


def test_stream_rebootstrap_diagnosis_when_only_end_expired(spark, tmp_path):
    """When the resume offset still resolves (pinned by a tag) but the
    WAL'd end offset expired, the handler must name the END offset as
    the failure — not claim both were expired (round-4 ADVICE: wrong
    diagnosis, frm is fine)."""
    from delta_spark.lake.datasource import LakeChangesStreamReader
    from delta_spark.lake.interop import ExpiredSnapshotError

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"]
    )
    for i in range(1, 5):
        _commit(spark, tbl, [(f"c{i}", 0, f"v{i}", TS)], "INSERT", i, f"b{i}")
    tbl = LakeTable.load(spark, tbl.path)
    tbl.tag("pin", snapshot_id=1)
    LakeTable.load(spark, tbl.path).expire_snapshots(keep_last=1)
    # snapshot 1 retained (tagged), 2 and 3 expired, 4 = head
    r = LakeChangesStreamReader(tbl.path, {"expired_offset": "rebootstrap"}, None)
    with pytest.raises(
        ExpiredSnapshotError, match="end offset \\(2\\).*resume offset \\(1\\) still"
    ):
        r.partitions({"snapshot_id": 1}, {"snapshot_id": 2})
    # a range whose both ends resolve still replays normally
    parts = r.partitions({"snapshot_id": 1}, {"snapshot_id": 4})
    assert parts and all(p.to == 4 for p in parts)


def test_change_partitions_unprunable_empty_to_plans_full_domain(
    spark, tmp_path, monkeypatch
):
    """touched_buckets=None (unprunable range) with a file-empty TO
    snapshot must plan the FULL bucket domain, not TO's (zero) buckets:
    planning from TO alone would silently emit no partitions and drop
    the range's delete events (round-4 ADVICE)."""
    from delta_spark.lake import interop
    from delta_spark.lake.datasource import _change_partitions

    tbl = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
    )
    _commit(spark, tbl, [("c1", 0, "v", TS)], "INSERT", 1, "b1")
    _commit(spark, tbl, [("c1", 0, None, None)], "DELETE", 2, "b2")
    tbl = LakeTable.load(spark, tbl.path)
    tbl.compact()  # fold the delete: TO state holds zero rows
    tbl = LakeTable.load(spark, tbl.path)
    head = tbl.metadata["current_snapshot_id"]
    assert tbl.read().count() == 0
    monkeypatch.setattr(interop, "touched_buckets", lambda *a, **k: None)
    parts = _change_partitions(tbl.path, 1, head)
    got = sorted(b for p in parts for b in (p.buckets or []))
    assert got == [0, 1, 2, 3]
