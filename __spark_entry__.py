"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``delta_spark`` — a PySpark-native CDC/incremental-ingest
engine (see SURVEY.md §2 and delta_spark/__init__.py). Queries cover
the CDC operator surface (scan/filter, LWW dedup, MERGE emulation,
delete apply, metrics, sessionization), relational breadth, the
Iceberg publish/consume chain (export, continuous publish, artifact
-only change feed), write-audit-publish staging (branch refs —
``wap_publish`` replays through a staged branch and fast-forwards),
and the training-data-pipeline library (dedup — batch AND
incrementally maintained over the CDC feed, similarity search, text
analysis, PII scrub — standalone, composed, and at-ingest via the
pipeline transform stage (``scrubbed_replay_lww``), chunking,
sequence packing + packed-corpus materialization, temperature
resampling, OOV-rate vocabulary screening, deterministic TF-IDF
keywords, real media codecs, the CDC-to-training-corpus assembly
``conversation_corpus``, the one-plan curation chain
``corpus_curation_e2e``, the full loop ``conversation_curated`` —
CDC replay feeding curation under a single hash oracle — and the
incrementally-MAINTAINED derived states: ``incremental_curation``
(per-doc verdict status table, O(changed docs) per epoch) and
``incremental_vocab`` (token count + doc frequency retraction-folded
from Delta-CDF pre-images), each pinned equal to its batch operator
over the final corpus). The lake is also a first-class Spark FORMAT
(``deltaspark``, PySpark 4 Python DataSource): ``datasource_scan``
(state read with pushed-filter bucket/stats pruning),
``datasource_changes`` (change-feed batch read sharing
``table_changes_feed``'s oracle verbatim), and
``datasource_write_roundtrip`` (exactly-once format writer — a
double-write under one identity is a no-op under the LWW hash);
``matview_minmax`` adds half-maintainable MIN/MAX view maintenance
(extremal retraction → targeted group recompute) to the incremental
``matview_rollup``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from delta_spark.oracles import ALL_ORACLES  # noqa: E402
from delta_spark.queries import ALL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full engine path — an input_hint-shaped transcript
    changelog derived from the sf0.001 events table, replayed through
    the single-table Pipeline (seq-guarded LWW merge, tombstones,
    snapshot-isolated commit) and read back."""
    from delta_spark.queries import transcript_replay_lww

    return transcript_replay_lww(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data ops). Each callable takes (spark, sf_dir)."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for every SQL-expressible query
    (including both custom stateful streaming operators, the
    real-engine replay paths, and the real-codec multimodal decode).
    The only omitted keys — the two honestly-approximate ANN indexes —
    get the driver's rows-only check plus recall floors pinned in
    tests/test_ann_recall.py."""
    return dict(ALL_ORACLES)
