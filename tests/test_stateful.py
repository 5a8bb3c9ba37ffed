"""Custom stateful streaming operators (applyInPandasWithState):
event-time-timeout sessionizer + per-key stale-event audit.

Driven as real multi-batch streams (file source, maxFilesPerTrigger=1,
availableNow) against hand-computed oracles; a far-future flush event
advances the watermark so pending event-time timeouts fire before the
stream drains."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from delta_spark.stateful import _gap_ms, conversation_sessions, stale_event_audit

BASE = pd.Timestamp("2025-06-01 00:00:00")


def _write(path, rows):
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("seq", pa.int64()),
            pa.field("text", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    df = pd.DataFrame(rows, columns=["conv_id", "seq", "text", "ts"])
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False), path
    )


def _run(spark, src, ck, op, name):
    stream = (
        spark.readStream.schema("conv_id string, seq long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def test_gap_parse():
    assert _gap_ms("30 minutes") == 1_800_000
    assert _gap_ms("1 hour") == 3_600_000
    assert _gap_ms("45 seconds") == 45_000
    with pytest.raises(ValueError):
        _gap_ms("soon")


def test_conversation_sessions_emit_on_idle(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    m = pd.Timedelta(minutes=1)
    _write(
        src / "part-000.parquet",
        [
            ("A", 1, "hello", BASE),
            ("A", 2, "world!", BASE + 2 * m),
            ("B", 3, "hey", BASE + 5 * m),
            # D: two bursts 2h apart in ONE batch — the second proves
            # the first's gap, so session 1 emits mid-stream
            ("D", 8, "aa", BASE),
            ("D", 9, "bb", BASE + pd.Timedelta(hours=2)),
        ],
    )
    _write(src / "part-001.parquet", [("A", 4, "bye", BASE + 4 * m)])
    # flush: a throwaway conversation far in the future pushes the
    # watermark past every idle deadline
    _write(src / "part-002.parquet", [("__flush__", 99, "x", BASE + pd.Timedelta(hours=10))])

    out = _run(
        spark,
        src,
        tmp_path / "ck",
        # 3h delay: D's +2h event must not watermark-drop A's file-1
        # event (cross-conv watermark pollution is a data-shape choice,
        # not an operator property)
        lambda s: conversation_sessions(s, gap="30 minutes", watermark="3 hours"),
        "sessions_out",
    ).toPandas()
    out = (
        out[out.conv_id != "__flush__"]
        .sort_values(["conv_id", "first_ts"])
        .reset_index(drop=True)
    )
    assert list(out.conv_id) == ["A", "B", "D", "D"]
    a = out.iloc[0]
    assert a.n_turns == 3
    assert a.first_ts == BASE and a.last_ts == BASE + 4 * m
    assert a.chars == len("hello") + len("world!") + len("bye")
    assert a.duration_s == pytest.approx(240.0)
    b = out.iloc[1]
    assert b.n_turns == 1 and b.duration_s == 0.0 and b.chars == 3
    assert list(out.n_turns[2:]) == [1, 1] and list(out.chars[2:]) == [2, 2]


def test_sessions_late_event_bridges_saved_state(spark, tmp_path):
    """Interval-merge correctness: a late (within-watermark) event that
    lands BETWEEN a saved session and a new burst must weld them into
    one session, matching the batch SQL gap-sessionization."""
    src = tmp_path / "src"
    src.mkdir()
    m = pd.Timedelta(minutes=1)
    _write(src / "part-000.parquet", [("A", 1, "x", BASE + 20 * m)])
    # batch 2: a late event (BASE+5m, before the saved last) plus a
    # burst at +45m: 5m→20m→45m all within a 30m gap → ONE session
    _write(
        src / "part-001.parquet",
        [("A", 2, "y", BASE + 5 * m), ("A", 3, "z", BASE + 45 * m)],
    )
    _write(src / "part-002.parquet", [("__flush__", 9, "x", BASE + pd.Timedelta(hours=9))])
    out = _run(
        spark,
        src,
        tmp_path / "ck",
        lambda s: conversation_sessions(s, gap="30 minutes", watermark="3 hours"),
        "sessions_bridge",
    ).toPandas()
    out = out[out.conv_id == "A"]
    assert len(out) == 1
    r = out.iloc[0]
    assert r.n_turns == 3
    assert r.first_ts == BASE + 5 * m and r.last_ts == BASE + 45 * m


def test_stale_event_audit_flags_dups_and_late(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(
        src / "part-000.parquet",
        [
            ("A", 1, "", BASE),
            ("A", 2, "", BASE),
            ("A", 3, "", BASE),
            ("A", 3, "", BASE),  # in-batch duplicate
            ("B", 10, "", BASE),
        ],
    )
    _write(
        src / "part-001.parquet",
        [
            ("A", 2, "", BASE),   # below batch-0 max → late
            ("A", 5, "", BASE),   # fresh → clean
            ("B", 10, "", BASE),  # exact replay across batches → late
            ("C", 7, "", BASE),   # new key → clean
        ],
    )
    out = _run(
        spark, src, tmp_path / "ck", stale_event_audit, "audit_out"
    ).toPandas()
    got = sorted(map(tuple, out[["conv_id", "seq", "kind", "max_seq_seen"]].values.tolist()))
    assert got == [
        ("A", 2, "late", 3),
        ("A", 3, "duplicate", 3),
        ("B", 10, "late", 10),
    ]


def test_audit_clean_stream_emits_nothing(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(src / "part-000.parquet", [("A", i, "", BASE) for i in range(1, 6)])
    _write(src / "part-001.parquet", [("A", i, "", BASE) for i in range(6, 11)])
    out = _run(spark, src, tmp_path / "ck", stale_event_audit, "audit_clean")
    assert out.count() == 0
