"""Custom stateful streaming operators (Arrow-batched
``applyInPandasWithState``) — the engine's per-key running state that
plain windowed aggregation can't express.

Two CDC-native operators over the transcript changelog:

* :func:`conversation_sessions` — per-conversation running session
  state (turn count, span, size) emitted when the conversation goes
  IDLE past a gap, driven by EVENT-TIME timeouts against the
  watermark. This is the streaming "transcript is finished" signal a
  downstream trainer consumes; in the reference the analogous
  per-table rolling state lives in the worker's in-memory maps flushed
  on commit (MetricsHandler.java:46-133) — Spark's state store gives
  it exactly-once durability across restarts for free.

* :func:`stale_event_audit` — per-key max-seq state that flags
  DUPLICATE and LATE (seq ≤ an earlier batch's max) events as they
  stream through. These are precisely the events the seq-guarded MERGE
  silently and correctly drops (lake/table.py merge guard; reference:
  idempotent-apply contract, EventConsumer.java:39-76) — this operator
  makes the drop observable, turning "exactly-once despite retries"
  from an invariant you trust into a metric you watch.

Scale notes: state is partitioned by the group key across executors
(the same conv_id hash partitioning the sink uses), Arrow-batched in
and out, never collected; the state store checkpoints incrementally.
Skewed conversations hit one state partition — the standard salting
answer doesn't apply to keyed state, so keep keys fine-grained
(conv_id, not user_id).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("chars", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("first_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("chars", T.LongType(), True),
    ]
)

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("seq", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),  # duplicate | late
        T.StructField("max_seq_seen", T.LongType(), True),
    ]
)

_AUDIT_STATE = T.StructType([T.StructField("max_seq", T.LongType(), True)])


def _gap_ms(gap: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s*(second|minute|hour)s?\s*", gap)
    if not m:
        raise ValueError(f"gap must look like '30 minutes', got {gap!r}")
    return int(m.group(1)) * {"second": 1, "minute": 60, "hour": 3600}[m.group(2)] * 1000


def conversation_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming sessionizer: one output row per (conversation,
    session), a session being a maximal run of events whose
    consecutive event-time gaps are ≤ ``gap``. Sessions close two
    ways: a LATER event proves the gap (emitted with the batch that
    proves it), or the event-time TIMEOUT fires once the watermark
    passes the idle deadline (flushes sessions no event will extend).
    Both decisions are made in event time, so the emitted sessions are
    invariant to micro-batch boundaries and equal the batch SQL
    gap-sessionization of the same events (the driver-contract oracle
    for ``stateful_sessions_stream``); out-of-order events inside the
    watermark fold in by interval merge, exactly like Spark's
    ``session_window`` aggregation."""
    gap_us = _gap_ms(gap) * 1000

    def fn(key, pdfs, state):
        import pandas as pd

        (conv_id,) = key

        def row(seg):
            n, first_us, last_us, chars = seg
            return {
                "conv_id": conv_id,
                "n_turns": n,
                "first_ts": pd.Timestamp(first_us, unit="us"),
                "last_ts": pd.Timestamp(last_us, unit="us"),
                "chars": chars,
                "duration_s": (last_us - first_us) / 1e6,
            }

        if state.hasTimedOut:
            seg = tuple(state.get)
            state.remove()
            yield pd.DataFrame([row(seg)])
            return
        cur = tuple(state.get) if state.exists else None
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        # session BREAKS are an event-time decision (gap between
        # consecutive events > gap), never a watermark-arrival one —
        # the emitted sessions are invariant to how the stream was
        # micro-batched. The event-time TIMEOUT only flushes a session
        # no later event will ever extend.
        import numpy as np

        df = pd.concat(frames).sort_values("ts", kind="stable")
        us = (df["ts"].astype("int64") // 1000).to_numpy()
        lens = df["text"].fillna("").str.len().astype("int64").to_numpy()
        # segment boundaries where the event-time gap exceeds the limit
        starts = np.flatnonzero(
            np.concatenate(([True], (us[1:] - us[:-1]) > gap_us))
        )
        bounds = np.append(starts, len(us))
        segs = [
            (int(b - a), int(us[a]), int(us[b - 1]), int(lens[a:b].sum()))
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        if cur is not None:
            # fold the saved session in by INTERVAL overlap (Spark's
            # session_window merge algebra): a segment joins when it
            # intersects [first - gap, last + gap] — exact even when a
            # late event lands inside or bridges the saved span, where
            # a naive "does the first event continue it" check splits
            acc = cur
            rest = []
            for sg in segs:
                if sg[2] >= acc[1] - gap_us and sg[1] <= acc[2] + gap_us:
                    acc = (
                        acc[0] + sg[0],
                        min(acc[1], sg[1]),
                        max(acc[2], sg[2]),
                        acc[3] + sg[3],
                    )
                else:
                    rest.append(sg)
            segs = sorted([*rest, acc], key=lambda s: s[1])
        # every segment but the LAST is closed: the next segment's first
        # event sits more than a gap after it, by construction
        emitted = segs[:-1]
        seg = segs[-1]
        state.update(seg)
        # idle deadline in event time; must sit above the current
        # watermark or Spark rejects it (a very late batch can't set a
        # deadline that already passed)
        state.setTimeoutTimestamp(
            max(seg[2] // 1000 + gap_us // 1000, state.getCurrentWatermarkMs() + 1)
        )
        if emitted:
            yield pd.DataFrame([row(s) for s in emitted])

    src = events.select(
        events[key_col].alias("conv_id"),
        events[ts_col].alias("ts"),
        events[text_col].alias("text"),
    ).withWatermark("ts", watermark)
    return src.groupBy("conv_id").applyInPandasWithState(
        fn, SESSION_SCHEMA, _SESSION_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )


def stale_event_audit(
    changelog: DataFrame,
    key_col: str = "conv_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Streaming exactly-once observability: emits one row per event
    the seq guard would reject — ``duplicate`` (same seq appears twice
    or is replayed) and ``late`` (seq below an earlier batch's max for
    the key, i.e. out-of-order across micro-batches). Clean streams
    emit nothing; a retry storm shows up here instead of silently
    vanishing into idempotent merges."""

    def fn(key, pdfs, state):
        import pandas as pd

        (conv_id,) = key
        prev_max = state.get[0] if state.exists else None
        seqs = []
        for pdf in pdfs:
            if not pdf.empty:
                seqs.append(pdf["seq"].astype("int64"))
        if not seqs:
            return
        s = pd.concat(seqs)
        out_seq, out_kind, out_max = [], [], []
        counts = s.value_counts()
        for seq_v, c in counts.items():
            extra = int(c) - 1
            if extra:
                out_seq.extend([int(seq_v)] * extra)
                out_kind.extend(["duplicate"] * extra)
                out_max.extend([int(s.max())] * extra)
        if prev_max is not None:
            # ≤ an earlier batch's max: a replay or out-of-order event —
            # indistinguishable without unbounded seen-set state, and the
            # merge guard treats both identically, so one kind: "late"
            for seq_v in sorted(counts.index):
                if int(seq_v) <= prev_max:
                    out_seq.append(int(seq_v))
                    out_kind.append("late")
                    out_max.append(prev_max)
        new_max = int(s.max()) if prev_max is None else max(prev_max, int(s.max()))
        state.update((new_max,))
        if out_seq:
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "seq": out_seq,
                    "kind": out_kind,
                    "max_seq_seen": out_max,
                }
            )

    src = changelog.select(
        changelog[key_col].alias("conv_id"),
        changelog[seq_col].cast("long").alias("seq"),
    )
    return src.groupBy("conv_id").applyInPandasWithState(
        fn, AUDIT_SCHEMA, _AUDIT_STATE, "append", GroupStateTimeout.NoTimeout
    )
