"""Ongoing pipeline diagnostics: a StreamingQueryListener that logs and
persists per-micro-batch progress (rows/sec, durations, state size).

Reference: the scheduled per-table stats logger + diagnostics
(/root/reference/delta-app/src/main/java/io/cdap/delta/app/metrics/
MetricsHandler.java:76-83,169-202 and Diagnostics.java:30-48). Spark
already computes all of these per micro-batch; the listener is the
idiomatic tap — no polling thread, no extra pass over data.

Commit-coupled metrics (never double-counted on replay) stay in the
lineage records (apply.write_lineage); this stream is the BEST-EFFORT
operational view the reference logs periodically.
"""

from __future__ import annotations

import json
import logging
import os

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("delta_spark.progress")


class ProgressLogger(StreamingQueryListener):
    """Logs one line per micro-batch and appends the raw progress JSON
    to ``<stats_dir>/progress-<runId>.jsonl`` when a directory is
    given. Attach with ``spark.streams.addListener`` (or
    ``attach_progress_logger``)."""

    def __init__(self, stats_dir: str | None = None, every_n: int = 1):
        self.stats_dir = stats_dir
        self.every_n = max(1, every_n)
        self._seen = 0

    # -- StreamingQueryListener interface -------------------------
    def onQueryStarted(self, event):
        log.info("query started name=%s id=%s", event.name, event.id)

    def onQueryProgress(self, event):
        self._seen += 1
        if self._seen % self.every_n:
            return
        p = json.loads(event.progress.json)
        state = (p.get("stateOperators") or [{}])[0]
        log.info(
            "progress name=%s batch=%s rows=%s rows/s=%.1f batchDur=%sms stateRows=%s",
            p.get("name"),
            p.get("batchId"),
            p.get("numInputRows"),
            p.get("processedRowsPerSecond") or 0.0,
            (p.get("durationMs") or {}).get("triggerExecution"),
            state.get("numRowsTotal"),
        )
        if self.stats_dir:
            os.makedirs(self.stats_dir, exist_ok=True)
            path = os.path.join(self.stats_dir, f"progress-{p.get('runId')}.jsonl")
            with open(path, "a") as f:
                f.write(event.progress.json + "\n")

    def onQueryIdle(self, event):
        # the reference's diagnostic mode dumps state when the target
        # idles (Diagnostics.java:30-48); a log line is the Spark analog
        log.info("query idle id=%s", event.id)

    def onQueryTerminated(self, event):
        if event.exception:
            log.warning("query terminated id=%s exception=%s", event.id, event.exception)
        else:
            log.info("query terminated id=%s", event.id)


def attach_progress_logger(
    spark, stats_dir: str | None = None, every_n: int = 1
) -> ProgressLogger:
    """Attach (and return) a ProgressLogger for the whole session."""
    lst = ProgressLogger(stats_dir=stats_dir, every_n=every_n)
    spark.streams.addListener(lst)
    return lst


def read_progress(spark, stats_dir: str):
    """The persisted progress stream as a DataFrame (per-partition
    lineage + metrics tables contract: queryable, not just logged)."""
    return spark.read.json(os.path.join(stats_dir, "progress-*.jsonl"))
