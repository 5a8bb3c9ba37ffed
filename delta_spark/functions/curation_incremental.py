"""Incrementally-maintained corpus curation over a CDC-maintained
documents table.

The batch pipeline in ``curation.curate_corpus`` answers "what is the
curated packed layout of this corpus"; this module answers "keep that
answer current as documents arrive, get revised, and get deleted
through the CDC apply path" — WITHOUT re-scrubbing or re-gating the
corpus. At 100 TB the text-touching work (PII scrub, tokenize, quality
gate, fingerprint) dominates by orders of magnitude; the verdicts it
produces are a few dozen bytes per document. So the design splits
exactly there:

  * a STATUS lake table (key ``doc_id``) holds each live document's
    per-doc verdicts — scrubbed-text fingerprint, quality-gate keep,
    split assignment, packing token count. All of these are pure
    per-document functions, so ``advance()`` recomputes them for ONLY
    the docs in ``LakeTable.read_changes`` (bucket-pruned CDC-out) and
    MERGEs them through the engine's own exactly-once seq-guarded
    path; deletes tombstone their status row. Per-epoch cost:
    O(changed docs), never a corpus text scan.
  * the corpus-WIDE decisions (which duplicate wins, the packed
    layout) are order statistics over those slim rows, recomputed from
    the status table by ``curated_layout()`` — a window over
    fingerprints plus the one bounded-state packing window, touching
    no text at all. Recomputing them is deliberate, not a concession:
    greedy boundary packing in stable id order means ONE inserted
    document shifts every later bin in its shard, so "incremental
    packing" cannot exist under deterministic layout semantics — but
    the layout pass costs O(live docs × ~40 bytes), which at 10^10
    docs is a few hundred GB of slim rows against the corpus's 100 TB
    of text.

Invariant (pinned by tests and the driver-contract oracle):
``curated_layout()`` after any sequence of ``advance()`` calls equals
``curation.curate_corpus`` run batch over the table's final state,
row for row. Why: every status column is a deterministic function of
the document's final text (or id), the last epoch that touched a doc
recomputes its row from that final text, deletes remove rows, and the
layout pass applies the identical winner/split/pack order statistics
the batch plan applies.

Reference analog: none — the reference replicates tables
(EventConsumer.java:39-76); maintaining derived training-data state
over the replicated table is the layer above it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake import LakeTable
from .curation import repetition_stats, split_assign
from .text import fingerprint, md5_long, pii_scrub, token_count

def _status_schema(id_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("doc_id", id_type, False),
            T.StructField("fingerprint", T.StringType(), True),
            T.StructField("keep", T.BooleanType(), True),
            T.StructField("split", T.StringType(), True),
            T.StructField("pack_tokens", T.LongType(), True),
        ]
    )


def _verdict_rows(ids_text: DataFrame, top_cap: float) -> DataFrame:
    """Per-document curation verdicts over (doc_id, raw text): PII
    scrub, normalized fingerprint, split assignment, packing token
    count, and the quality-gate keep — one row-wise projection plus the
    two repetition_stats aggregations keyed by doc id, O(input rows).
    NULL text gates to keep=false and packs to 0 tokens. Shared by the
    document-level and conversation-level indexers so the verdict
    definition can never drift between them."""
    clean = ids_text.select(
        "doc_id", pii_scrub("text").alias("_t")
    )
    rowwise = clean.select(
        "doc_id",
        fingerprint("_t").alias("fingerprint"),
        split_assign("doc_id").alias("split"),
        F.coalesce(token_count("_t").cast("long"), F.lit(0)).alias(
            "pack_tokens"
        ),
    )
    gate = repetition_stats(
        clean.filter(F.col("_t").isNotNull()), "doc_id", "_t",
        top_cap=top_cap,
    ).select("doc_id", "keep")
    return rowwise.join(gate, "doc_id", "left").select(
        "doc_id",
        "fingerprint",
        F.coalesce(F.col("keep"), F.lit(False)).alias("keep"),
        "split",
        "pack_tokens",
    )


# Composite row identities join key columns with the ASCII unit
# separator: a printable '#' would make ('a#b','c') and ('a','b#c')
# collide into one identity; \x1f in real key values is implausible
# and documented. Batch-equality callers must synthesize ids with the
# same constant.
ID_SEP = "\x1f"


def _marker_cursor(meta: dict, writer_id: str) -> int | None:
    """Last folded base-snapshot id derived from a derived-state
    table's OWN exactly-once markers (every advance's batch-id ends
    ``->{to}``; ``expire_snapshots`` folds markers into
    ``applied_markers``). For ADDITIVE folds this is the only safe
    advancing cursor: a side file committed after the merge leaves a
    crash window in which new base commits change the next batch-id,
    the marker no longer blocks, and the already-folded range is
    folded again (the double-apply hole materialized.py:163-173
    documents)."""
    ids = [
        int(s["summary"]["batch-id"].rsplit("->", 1)[1])
        for s in meta["snapshots"]
        if s["summary"].get("writer-id") == writer_id
        and "->" in s["summary"].get("batch-id", "")
    ]
    ids += [
        int(b.rsplit("->", 1)[1])
        for b in meta.get("applied_markers", {}).get(writer_id, [])
        if "->" in b
    ]
    return max(ids) if ids else None


_VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType(), False),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("df_docs", T.LongType(), True),
    ]
)


class VocabIndexer:
    """Incrementally-maintained corpus VOCABULARY (per-token multiset
    count + document frequency) — the global statistic ``oov_rate`` and
    ``tfidf_topk`` are built on, kept current over the CDC feed instead
    of recomputed by a corpus scan.

    This is the retraction-fold the engine's Delta-CDF pre-images exist
    for: ``read_changes(include_pre_images=True)`` emits each update as
    ``update_pre`` (retract the old text's contribution) plus
    ``update_post`` (add the new one), deletes carry their last payload
    — so per epoch the token deltas are computed from CHANGED docs only
    (+1/−1 per occurrence for the count, per distinct (doc, token) for
    the document frequency), then folded into the vocab lake table by
    one slim join (old + delta, delete at zero). Additive folds are not
    idempotent, so the advancing cursor IS the merge's exactly-once
    marker (one atomic write — never a side file, whose post-merge
    crash window re-folds an already-applied range once new base
    commits change the batch-id): a replayed epoch's merge is BLOCKED
    by its (writer-id, batch-id) marker and cannot double-count.

    Per-epoch cost: O(changed docs × tokens) text work + one join
    against the vocab table's slim rows (at 10^10 docs the vocabulary
    is ~10^8 rows of a few bytes — the join's vocab side is a scan of
    that, never of corpus text; the write is bucket-pruned to touched
    tokens by the engine). Expired cursor → documented rebootstrap:
    recompute the batch vocabulary from the live corpus once and diff
    it against the table.

    Invariant (tests + driver oracle): the vocab table equals the
    batch ``GROUP BY token`` counts of the live corpus after every
    advance, under any interleaving.
    """

    def __init__(
        self,
        spark: SparkSession,
        docs: LakeTable,
        root: str,
        id_col: str | tuple = "doc_id",
        text_col: str = "text",
        num_buckets: int = 16,
    ):
        self.spark = spark
        self.docs = docs
        self.root = root
        # composite row identities are fine: the id only names a row
        # for the document-frequency distinct (e.g. a transcripts table
        # keyed (conv_id, turn_idx) counts df per TURN)
        self.id_cols = (
            (id_col,) if isinstance(id_col, str) else tuple(id_col)
        )
        self.text_col = text_col
        self.vocab_path = os.path.join(root, "vocab")
        if LakeTable.exists(self.vocab_path):
            self.vocab = LakeTable.load(spark, self.vocab_path)
        else:
            self.vocab = LakeTable.create(
                spark,
                self.vocab_path,
                _VOCAB_SCHEMA,
                key_cols=["token"],
                num_buckets=num_buckets,
            )
        self._write_definition()

    def _write_definition(self) -> None:
        """vocab.json sidecar: the same silent-mixing guard as
        CurationIndexer — id_cols/text_col shape every stored count, so
        reopening under different values is refused (delete the root to
        rebootstrap); a docs_path change only warns (faithful copies
        keep snapshot ids, true repoints hit the rebootstrap path)."""
        import uuid as _uuid

        p = os.path.join(self.root, "vocab.json")
        by_name = {f["name"]: f["id"] for f in self.docs.fields}
        body = {
            "docs_path": os.path.abspath(self.docs.path),
            "vocab_path": os.path.abspath(self.vocab_path),
            "id_cols": list(self.id_cols),
            "id_field_ids": [by_name.get(c) for c in self.id_cols],
            "text_col": self.text_col,
            "text_field_id": by_name.get(self.text_col),
        }
        try:
            with open(p) as f:
                prev = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            prev = None
        if prev == body:
            return
        if prev is not None:
            ids_known = (
                prev.get("id_field_ids")
                and prev.get("text_field_id") is not None
                and all(i is not None for i in body["id_field_ids"])
                and body["text_field_id"] is not None
            )
            frozen = (
                ("id_field_ids", "text_field_id")
                if ids_known
                else ("id_cols", "text_col")
            )
            diffs = {
                k: (prev.get(k), body[k])
                for k in frozen
                if prev.get(k) != body[k]
            }
            if diffs:
                raise ValueError(
                    f"vocab index at {self.root} was built with "
                    f"different contribution-shaping parameters {diffs}"
                    " — stored counts would silently mix definitions. "
                    "Delete the index root to rebootstrap, or reopen "
                    "with the recorded parameters."
                )
            if prev.get("docs_path") != body["docs_path"]:
                import logging

                logging.getLogger("delta_spark.curation").warning(
                    "vocab index %s re-pointed %s -> %s",
                    self.root, prev.get("docs_path"), body["docs_path"],
                )
        os.makedirs(self.root, exist_ok=True)
        tmp = f"{p}.{_uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(body, f, sort_keys=True)
        os.replace(tmp, p)

    def _cursor(self) -> int | None:
        """Marker-derived, never a side file: the additive fold is not
        idempotent, so the cursor and the exactly-once marker must be
        ONE write (the merge's own commit) — see _marker_cursor."""
        return _marker_cursor(self.vocab.refresh().metadata, "vocab-index")

    def _signed_deltas(self, signed: DataFrame) -> DataFrame:
        """(token, d_count, d_df) from rows of (sgn, text): +1 rows add
        their tokens, −1 rows retract them; df contributions are per
        distinct (row, token). Net-zero tokens are dropped."""
        from .text import tokens

        tok = signed.select(
            "_rid", "sgn", F.explode(tokens(self.text_col)).alias("token")
        )
        d_count = tok.groupBy("token").agg(
            F.sum("sgn").cast("long").alias("d_count")
        )
        d_df = (
            tok.select("_rid", "sgn", "token")
            .distinct()
            .groupBy("token")
            .agg(F.sum("sgn").cast("long").alias("d_df"))
        )
        return (
            d_count.join(d_df, "token", "full_outer")
            .select(
                "token",
                F.coalesce("d_count", F.lit(0)).alias("d_count"),
                F.coalesce("d_df", F.lit(0)).alias("d_df"),
            )
            .filter((F.col("d_count") != 0) | (F.col("d_df") != 0))
        )

    def advance(
        self,
        to_snapshot_id: int | None = None,
        changes: DataFrame | None = None,
    ) -> dict:
        """``changes`` lets a caller that already scanned the pre-image
        feed for this exact (cursor, to] range share it (the matview
        ``advance_all`` pattern) instead of a second identical scan —
        the caller owns the range-match responsibility."""
        cur = self.docs.current_snapshot
        to_id = cur["id"] if to_snapshot_id is None and cur else to_snapshot_id
        frm = self._cursor()
        if to_id is None or (frm is not None and to_id <= frm):
            return {"tokens_touched": 0, "to": to_id}

        try:
            ch = (
                changes
                if changes is not None
                else self.docs.read_changes(
                    frm, to_id, include_pre_images=True
                )
            )
            sgn = (
                F.when(
                    F.col("_change_type").isin("insert", "update_post"),
                    F.lit(1),
                )
                .when(
                    F.col("_change_type").isin("update_pre", "delete"),
                    F.lit(-1),
                )
            )
            signed = ch.select(
                F.concat_ws(
                    ID_SEP,
                    *[F.col(c).cast("string") for c in self.id_cols],
                    "_change_type",
                ).alias("_rid"),
                sgn.alias("sgn"),
                self.text_col,
            ).filter(F.col("sgn").isNotNull())
            deltas = self._signed_deltas(signed)
            old = self.vocab.read()
        except ValueError:
            # cursor expired under docs-table retention: rebootstrap by
            # diffing the batch vocabulary of the live corpus against
            # the table — every live token upserted to its true counts,
            # every stale token deleted. O(corpus) once, by design.
            import logging

            logging.getLogger("delta_spark.curation").warning(
                "vocab cursor %s expired on %s — rebootstrapping",
                frm, self.docs.path,
            )
            state0 = self.docs.read(snapshot_id=to_id)
            signed = state0.select(
                F.concat_ws(
                    ID_SEP,
                    *[F.col(c).cast("string") for c in self.id_cols],
                ).alias("_rid"),
                F.lit(1).alias("sgn"),
                self.text_col,
            )
            fresh = self._signed_deltas(signed)
            old = self.vocab.read()
            # express the rebootstrap as a delta against the current
            # table so ONE fold path below serves both modes
            deltas = (
                fresh.join(old, "token", "full_outer")
                .select(
                    "token",
                    (
                        F.coalesce("d_count", F.lit(0))
                        - F.coalesce("n_tokens", F.lit(0))
                    ).alias("d_count"),
                    (
                        F.coalesce("d_df", F.lit(0))
                        - F.coalesce("df_docs", F.lit(0))
                    ).alias("d_df"),
                )
                .filter((F.col("d_count") != 0) | (F.col("d_df") != 0))
            )

        folded = (
            deltas.join(old, "token", "left")
            .select(
                "token",
                (
                    F.coalesce("n_tokens", F.lit(0)) + F.col("d_count")
                ).alias("n_tokens"),
                (F.coalesce("df_docs", F.lit(0)) + F.col("d_df")).alias(
                    "df_docs"
                ),
            )
        )
        batch = folded.select(
            "token",
            "n_tokens",
            "df_docs",
            F.when(F.col("n_tokens") <= 0, F.lit("DELETE"))
            .otherwise(F.lit("UPSERT"))
            .alias("op"),
            F.lit(to_id).cast("long").alias("seq"),
        )
        # the merge's marker IS the cursor (one atomic write): there is
        # deliberately NO side cursor file to move afterwards — the
        # crash window between two writes is the double-apply hole.
        # A fold that nets to zero rows commits no snapshot, so the
        # cursor conservatively stays put and the next advance re-reads
        # a cheap empty range instead of risking a skipped one.
        stats = self.vocab.merge(
            batch,
            writer_id="vocab-index",
            batch_id=f"{frm}->{to_id}",
            mode="auto",
        ) or {}
        return {
            "tokens_touched": (stats.get("upserts", 0) or 0)
            + (stats.get("deletes", 0) or 0),
            "to": to_id,
        }

    def top_k(self, k: int) -> DataFrame:
        """The head vocabulary by (count desc, token asc) — the same
        total order ``oov_stats`` cuts its broadcast vocab with, served
        from maintained state instead of a corpus scan."""
        return (
            self.vocab.read()
            .orderBy(F.col("n_tokens").desc(), F.col("token").asc())
            .limit(k)
        )

    def doc_frequency(self) -> DataFrame:
        """(token, df_docs) from maintained state — the corpus-wide IDF
        side ``tfidf_topk(dfreq=...)`` serves without rescanning the
        corpus; pair with :meth:`doc_count` from the same epoch."""
        return self.vocab.read().select("token", "df_docs")

    def doc_count(self) -> int:
        """Corpus document count pinned at the index's cursor snapshot
        — the N that makes maintained-IDF scores epoch-consistent with
        :meth:`doc_frequency` even while newer commits land on the docs
        table. One column-pruned count over the pinned snapshot
        (O(corpus rows), but no explode and no token aggregation — the
        costs the maintained path exists to avoid); the scalar is
        control-plane, not a data collect."""
        frm = self._cursor()
        if frm is None:
            raise ValueError(
                "vocab index has never advanced — no epoch to count at"
            )
        return self.docs.read(snapshot_id=frm).count()


def cursor_from_status_metadata(status_meta: dict) -> int | None:
    """Last docs-snapshot id folded into a status table, derived from
    its own exactly-once markers (every advance's batch-id ends
    ``->{to}``; ``expire_snapshots`` folds markers into
    ``applied_markers``). The diagnostics service's ``/v1/curation``
    uses this Spark-free — the markers, not the side cursor file, are
    the crash-consistent truth (the file moves last and only drives
    the next advance's starting point)."""
    return _marker_cursor(status_meta, "curation-index")


class CurationIndexer:
    """Maintains per-document curation verdicts beside a documents lake
    table; the curated packed layout is derived from them without ever
    rereading unchanged text."""

    def __init__(
        self,
        spark: SparkSession,
        docs: LakeTable,
        root: str,
        id_col: str | tuple = "doc_id",
        text_col: str = "text",
        top_cap: float = 0.25,
        budget: int = 512,
        n_shards: int = 8,
        num_buckets: int = 16,
    ):
        self.spark = spark
        self.docs = docs
        self.root = root
        # a plain string id_col keeps the original bigint row identity;
        # a TUPLE (any length — e.g. the transcripts key
        # ("conv_id", "turn_idx")) synthesizes a STRING identity
        # concat_ws(ID_SEP, ...) so composite-keyed tables curate
        # directly. The batch-equality target is then curate_corpus
        # over the corpus with the same synthesized column. A 1-tuple
        # naming a bigint column NORMALIZES to the plain bigint mode,
        # so hooks that always pass tuple(key_cols) and jobs that pass
        # the default string agree on one definition per index.
        if not isinstance(id_col, str) and len(tuple(id_col)) == 1:
            only = tuple(id_col)[0]
            ftype = next(
                (f["type"] for f in docs.fields if f["name"] == only),
                None,
            )
            if ftype == "bigint":
                id_col = only
        self.id_col = id_col
        self.id_cols = (
            (id_col,) if isinstance(id_col, str) else tuple(id_col)
        )
        self._composite = not isinstance(id_col, str)
        self.text_col = text_col
        self.top_cap, self.budget, self.n_shards = top_cap, budget, n_shards
        self.status_path = os.path.join(root, "status")
        self.cursor_path = os.path.join(root, "_cursor.json")
        if LakeTable.exists(self.status_path):
            self.status = LakeTable.load(spark, self.status_path)
        else:
            self.status = LakeTable.create(
                spark,
                self.status_path,
                _status_schema(
                    T.StringType() if self._composite else T.LongType()
                ),
                key_cols=["doc_id"],
                num_buckets=num_buckets,
            )
        self._write_definition()

    def _id_expr(self):
        """The status row identity over docs columns: the raw bigint id
        (legacy single-key mode) or the '#'-joined string of the key
        columns (composite mode)."""
        if self._composite:
            return F.concat_ws(
                ID_SEP, *[F.col(c).cast("string") for c in self.id_cols]
            )
        return F.col(self.id_cols[0]).cast("long")

    def _write_definition(self) -> None:
        """Self-describing index: a ``curation.json`` sidecar records
        which docs table the status tracks and the layout parameters,
        so Spark-free consumers (the diagnostics service's
        ``/v1/curation`` endpoint, a human at a shell) can discover it.

        The sidecar is also the guard against SILENT verdict mixing:
        ``top_cap`` / ``id_col`` / ``text_col`` / the docs identity
        shape the STORED keep verdicts, so reopening an existing index
        with different values would gate only future changed docs under
        the new rule while every unchanged row keeps the old one — a
        state that equals batch ``curate_corpus`` under NO parameter
        set. Refused loudly (delete the root to rebootstrap under the
        new params). ``budget`` / ``n_shards`` are layout-time only —
        ``curated_layout`` derives them fresh from slim rows each call
        — so changing them is legal and just rewrites the sidecar."""
        import uuid as _uuid

        p = os.path.join(self.root, "curation.json")
        by_name = {f["name"]: f["id"] for f in self.docs.fields}
        body = {
            "docs_path": os.path.abspath(self.docs.path),
            "status_path": os.path.abspath(self.status_path),
            "id_col": (
                self.id_col
                if isinstance(self.id_col, str)
                else list(self.id_col)
            ),
            # field IDS are the rename-proof identity of the frozen
            # columns: a legal key/text rename changes the NAMES but
            # not what shaped the stored verdicts, so the freeze check
            # compares ids when both sides have them
            "id_field_ids": [by_name.get(c) for c in self.id_cols],
            "text_col": self.text_col,
            "text_field_id": by_name.get(self.text_col),
            "top_cap": self.top_cap,
            "budget": self.budget,
            "n_shards": self.n_shards,
        }
        try:
            with open(p) as f:
                prev = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            prev = None
        if prev == body:
            return
        if prev is not None:
            ids_known = (
                prev.get("id_field_ids")
                and prev.get("text_field_id") is not None
                and all(i is not None for i in body["id_field_ids"])
                and body["text_field_id"] is not None
            )
            if ids_known:
                frozen = ("id_field_ids", "text_field_id", "top_cap")
            else:  # legacy sidecar without ids: compare by name
                frozen = ("id_col", "text_col", "top_cap")
            diffs = {
                k: (prev.get(k), body[k])
                for k in frozen
                if prev.get(k) != body[k]
            }
            if diffs:
                raise ValueError(
                    f"curation index at {self.root} was built with "
                    f"different verdict-shaping parameters {diffs} — "
                    "stored keep verdicts would silently mix rules. "
                    "Delete the index root to rebootstrap under the "
                    "new parameters, or reopen with the recorded ones."
                )
            if prev.get("docs_path") != body["docs_path"]:
                # a faithful copy keeps snapshot ids, so verdicts stay
                # valid; a genuinely different table makes the recorded
                # cursor unknown and the next advance() rebootstraps
                import logging

                logging.getLogger("delta_spark.curation").warning(
                    "curation index %s re-pointed %s -> %s",
                    self.root, prev.get("docs_path"), body["docs_path"],
                )
        os.makedirs(self.root, exist_ok=True)
        tmp = f"{p}.{_uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(body, f, sort_keys=True)
        os.replace(tmp, p)

    # ------------------------------------------------------- cursor

    def _cursor(self) -> int | None:
        try:
            with open(self.cursor_path) as f:
                return json.load(f)["last_snapshot"]
        except FileNotFoundError:
            return None

    def _commit_cursor(self, snap_id: int) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_snapshot": snap_id}, f)
        os.replace(tmp, self.cursor_path)

    # ------------------------------------------------- status rows

    def _status_rows(self, docs_df: DataFrame) -> DataFrame:
        """Per-document verdicts over the SCRUBBED text (shared
        definition: module-level ``_verdict_rows``)."""
        return _verdict_rows(
            docs_df.select(
                self._id_expr().alias("doc_id"),
                F.col(self.text_col).alias("text"),
            ),
            self.top_cap,
        )

    # ------------------------------------------------------ advance

    def advance(
        self,
        to_snapshot_id: int | None = None,
        changes: DataFrame | None = None,
    ) -> dict:
        """Fold the docs-table commits in (cursor, to] into the status
        table. Crash-safe: the status merge is idempotent by
        (writer-id, batch-id) and the cursor moves LAST — a replay
        lands on the same rows and the same markers. ``changes`` lets a
        caller share an already-scanned PLAIN-mode change feed for this
        exact range (the advance_all pattern; the caller owns the
        range-match responsibility)."""
        cur = self.docs.current_snapshot
        to_id = cur["id"] if to_snapshot_id is None and cur else to_snapshot_id
        frm = self._cursor()
        if to_id is None or (frm is not None and to_id <= frm):
            return {"processed": 0, "deleted": 0, "to": to_id}

        try:
            ch = (
                changes
                if changes is not None
                else self.docs.read_changes(frm, to_id)
            )
            changed = ch.filter(
                F.col("_change_type").isin("insert", "update")
            ).select(*self.id_cols, self.text_col)
            deleted = ch.filter(F.col("_change_type") == "delete").select(
                self._id_expr().alias("doc_id")
            )
        except ValueError:
            # cursor snapshot EXPIRED (docs-table retention ran ahead of
            # this index — the expired-consumer-offset failure mode):
            # REBOOTSTRAP from the live state. Every live doc is
            # recomputed, every status row without a live doc is
            # tombstoned; the layout invariant survives because status
            # rows are functions of final text only. O(corpus) once,
            # by construction.
            import logging

            logging.getLogger("delta_spark.curation").warning(
                "curation status cursor %s expired on %s — rebootstrapping",
                frm, self.docs.path,
            )
            state0 = self.docs.read(snapshot_id=to_id)
            changed = state0.select(*self.id_cols, self.text_col)
            deleted = (
                self.status.read()
                .select("doc_id")
                .join(
                    changed.select(self._id_expr().alias("doc_id")),
                    "doc_id",
                    "left_anti",
                )
            )

        ups = self._status_rows(changed).withColumn("op", F.lit("UPSERT"))
        dels = deleted.select(
            "doc_id",
            F.lit(None).cast("string").alias("fingerprint"),
            F.lit(None).cast("boolean").alias("keep"),
            F.lit(None).cast("string").alias("split"),
            F.lit(None).cast("long").alias("pack_tokens"),
            F.lit("DELETE").alias("op"),
        )
        stats = self.status.merge(
            ups.unionByName(dels).withColumn(
                "seq", F.lit(to_id).cast("long")
            ),
            writer_id="curation-index",
            batch_id=f"{frm}->{to_id}",
            mode="auto",
        ) or {}  # None = exactly-once marker blocked a replayed batch
        self._commit_cursor(to_id)
        return {
            "processed": stats.get("upserts", 0),
            "deleted": stats.get("deletes", 0),
            "to": to_id,
        }

    # ------------------------------------------------------- layout

    def curated_layout(self) -> DataFrame:
        """The curated packed layout derived from status rows alone —
        the same order statistics batch ``curate_corpus`` applies, in
        the same order: min-id winner per fingerprint over KEPT docs
        (all splits — a train doc shadowed by a kept valid twin stays
        shadowed), then the train filter, then greedy boundary packing
        in id order within md5 shards. No text is read; the pass is
        O(live docs) over ~40-byte rows."""
        out_id = self.id_col if isinstance(self.id_col, str) else "doc_id"
        st = self.status.read()
        kept = st.filter(F.col("keep") & F.col("fingerprint").isNotNull())
        wf = Window.partitionBy("fingerprint")
        uniq = (
            kept.withColumn("_kid", F.min("doc_id").over(wf))
            .filter(F.col("doc_id") == F.col("_kid"))
        )
        train = uniq.filter(F.col("split") == "train")
        shard = F.pmod(
            md5_long(F.col("doc_id").cast("string")), F.lit(self.n_shards)
        )
        base = train.select(
            F.col("doc_id").alias(out_id),
            F.col("pack_tokens").alias("n_tokens"),
            shard.alias("shard"),
        )
        w = Window.partitionBy("shard").orderBy(out_id)
        off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
            "bin_start"
        )
        return base.select(out_id, "n_tokens", "shard", off).withColumn(
            "bin", F.floor(F.col("bin_start") / F.lit(self.budget))
        )


class ConversationCurationIndexer:
    """CONVERSATION-level curation maintained over the CDC feed — the
    semantic unit transcript training data actually ships (one packed
    document per conversation, turns concatenated in order), kept
    current as individual TURNS arrive, get revised, and get deleted.

    The granularity argument: a changed turn invalidates only its own
    conversation's verdicts, so ``advance()``
      1. names the touched conversations from the plain change feed
         (every insert/update/delete row carries its conv id),
      2. re-reads ONLY those conversations' live turns from the target
         snapshot — the conv column is the table's bucket column, so
         the re-read is bucket-hash pruned + per-value stats-skipped
         and PINNED at ``to`` (``read(buckets=…, ranges=…,
         snapshot_id=to)``, the same driver-side plan ``lookup()``
         builds) — O(touched convs) files, never a corpus scan,
      3. re-assembles their dialogues (``role: text`` lines in
         turn order — identical to ``conversation_corpus``) and
         re-gates them through the SHARED ``_verdict_rows`` definition,
      4. merges verdicts into the status table (touched convs with no
         live turns left are deleted) through the engine's exactly-once
         idempotent path.

    ``curated_layout()`` then derives the packed conversation-level
    training layout from slim status rows, equal to batch
    ``curate_corpus`` over the assembled final corpus — the same
    invariant (and driver oracle) as ``conversation_curated``.

    When the touched-conversation count exceeds ``max_lookup_convs``
    (driver-side value list) the re-read falls back to one pinned scan
    semi-joined on the touched set — loud in the logs, correct, and
    bounded by a single pass; the expired-cursor rebootstrap uses the
    same full pass by construction.
    """

    def __init__(
        self,
        spark: SparkSession,
        docs: LakeTable,
        root: str,
        conv_col: str = "conv_id",
        turn_col: str = "turn_idx",
        role_col: str = "role",
        text_col: str = "text",
        top_cap: float = 0.5,
        budget: int = 512,
        n_shards: int = 8,
        num_buckets: int = 16,
        max_lookup_convs: int = 100_000,
    ):
        self.spark = spark
        self.docs = docs
        self.root = root
        self.conv_col, self.turn_col = conv_col, turn_col
        self.role_col, self.text_col = role_col, text_col
        self.top_cap, self.budget, self.n_shards = top_cap, budget, n_shards
        self.max_lookup_convs = max_lookup_convs
        self.status_path = os.path.join(root, "status")
        self.cursor_path = os.path.join(root, "_cursor.json")
        if LakeTable.exists(self.status_path):
            self.status = LakeTable.load(spark, self.status_path)
        else:
            self.status = LakeTable.create(
                spark,
                self.status_path,
                _status_schema(T.StringType()),
                key_cols=["doc_id"],
                num_buckets=num_buckets,
            )
        self._write_definition()

    def _write_definition(self) -> None:
        """conv_curation.json sidecar — same freeze policy as the other
        indexes: the columns and top_cap shape stored verdicts (frozen
        by field id, rename-proof); budget/n_shards are layout-time."""
        import uuid as _uuid

        by_name = {f["name"]: f["id"] for f in self.docs.fields}
        p = os.path.join(self.root, "conv_curation.json")
        cols = (self.conv_col, self.turn_col, self.role_col, self.text_col)
        body = {
            "docs_path": os.path.abspath(self.docs.path),
            "status_path": os.path.abspath(self.status_path),
            "cols": list(cols),
            "col_field_ids": [by_name.get(c) for c in cols],
            "top_cap": self.top_cap,
            "budget": self.budget,
            "n_shards": self.n_shards,
        }
        try:
            with open(p) as f:
                prev = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            prev = None
        if prev == body:
            return
        if prev is not None:
            ids_known = prev.get("col_field_ids") and all(
                i is not None for i in body["col_field_ids"]
            )
            frozen = (
                ("col_field_ids", "top_cap")
                if ids_known
                else ("cols", "top_cap")
            )
            diffs = {
                k: (prev.get(k), body[k])
                for k in frozen
                if prev.get(k) != body[k]
            }
            if diffs:
                raise ValueError(
                    f"conversation-curation index at {self.root} was "
                    f"built with different verdict-shaping parameters "
                    f"{diffs} — stored verdicts would silently mix "
                    "rules. Delete the root to rebootstrap, or reopen "
                    "with the recorded parameters."
                )
            if prev.get("docs_path") != body["docs_path"]:
                import logging

                logging.getLogger("delta_spark.curation").warning(
                    "conversation-curation index %s re-pointed %s -> %s",
                    self.root, prev.get("docs_path"), body["docs_path"],
                )
        os.makedirs(self.root, exist_ok=True)
        tmp = f"{p}.{_uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(body, f, sort_keys=True)
        os.replace(tmp, p)

    def _cursor(self) -> int | None:
        try:
            with open(self.cursor_path) as f:
                return json.load(f)["last_snapshot"]
        except FileNotFoundError:
            return None

    def _commit_cursor(self, snap_id: int) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_snapshot": snap_id}, f)
        os.replace(tmp, self.cursor_path)

    # ---------------------------------------------------- assembly

    def _assemble(self, turns: DataFrame) -> DataFrame:
        """(conv, dialogue) from turn rows — THE shared assembly
        definition (curation.dialogue_expr, the same aggregate the
        batch conversation_corpus query uses), so the incremental and
        batch corpora can never drift."""
        from .curation import dialogue_expr

        return turns.groupBy(
            F.col(self.conv_col).cast("string").alias("doc_id")
        ).agg(
            dialogue_expr(
                self.turn_col, self.role_col, self.text_col
            ).alias("text")
        )

    def _pinned_touched_turns(self, convs: list, to_id: int) -> DataFrame:
        """The touched conversations' live turns AT the target snapshot
        — lookup()'s driver-side bucket-hash + per-value stats plan,
        with the snapshot pinned so racing base commits cannot leak
        future turns into this epoch's verdicts."""
        if self.docs.bucket_col != self.conv_col:
            raise _FallbackScan()
        # lookup() owns the driver-side plan (bucket-hash set,
        # per-value stats ranges, strict value/column type gate) — one
        # definition, pinned at the target snapshot
        return self.docs.lookup(convs, snapshot_id=to_id)

    # ----------------------------------------------------- advance

    def advance(self, to_snapshot_id: int | None = None) -> dict:
        cur = self.docs.current_snapshot
        to_id = cur["id"] if to_snapshot_id is None and cur else to_snapshot_id
        frm = self._cursor()
        if to_id is None or (frm is not None and to_id <= frm):
            return {"convs": 0, "deleted": 0, "to": to_id}

        import logging

        log = logging.getLogger("delta_spark.curation")
        conv_str = F.col(self.conv_col).cast("string")
        try:
            ch = self.docs.read_changes(frm, to_id)
            # control-plane list of NATIVE conv values (lookup's type
            # gate needs them un-cast): O(touched convs) on the driver;
            # past the cap, one pinned semi-joined scan instead
            touched_rows = (
                ch.select(self.conv_col)
                .distinct()
                .limit(self.max_lookup_convs + 1)
                .collect()
            )
            convs = [r[self.conv_col] for r in touched_rows]
            if not convs:
                # a commit range that nets to zero changed keys
                # (compaction, row-neutral replay): nothing to fold —
                # NOT a reason to rescan the corpus
                self._commit_cursor(to_id)
                return {"convs": 0, "deleted": 0, "to": to_id}
            if len(convs) > self.max_lookup_convs:
                log.warning(
                    "conv-curation %s: %d+ touched convs exceeds the "
                    "lookup cap — one pinned scan semi-joined on the "
                    "touched set", self.root, self.max_lookup_convs,
                )
                touched_df = ch.select(conv_str.alias("doc_id")).distinct()
                turns = self.docs.read(snapshot_id=to_id).join(
                    touched_df.withColumnRenamed("doc_id", "_tc"),
                    conv_str == F.col("_tc"),
                    "left_semi",
                )
            else:
                # the full touched set is already on the driver — the
                # deleted-set anti-join below runs against this tiny
                # local frame instead of re-executing the feed diff
                touched_df = self.spark.createDataFrame(
                    [(str(v),) for v in convs], "doc_id string"
                )
                try:
                    turns = self._pinned_touched_turns(convs, to_id)
                except _FallbackScan:
                    turns = self.docs.read(snapshot_id=to_id).join(
                        touched_df.withColumnRenamed("doc_id", "_tc"),
                        conv_str == F.col("_tc"),
                        "left_semi",
                    )
            assembled = self._assemble(turns)
            deleted = touched_df.join(
                assembled.select("doc_id"), "doc_id", "left_anti"
            )
        except ValueError:
            log.warning(
                "conv-curation cursor %s expired on %s — rebootstrapping",
                frm, self.docs.path,
            )
            assembled = self._assemble(self.docs.read(snapshot_id=to_id))
            deleted = (
                self.status.read()
                .select("doc_id")
                .join(assembled.select("doc_id"), "doc_id", "left_anti")
            )

        ups = _verdict_rows(assembled, self.top_cap).withColumn(
            "op", F.lit("UPSERT")
        )
        dels = deleted.select(
            "doc_id",
            F.lit(None).cast("string").alias("fingerprint"),
            F.lit(None).cast("boolean").alias("keep"),
            F.lit(None).cast("string").alias("split"),
            F.lit(None).cast("long").alias("pack_tokens"),
            F.lit("DELETE").alias("op"),
        )
        stats = self.status.merge(
            ups.unionByName(dels).withColumn(
                "seq", F.lit(to_id).cast("long")
            ),
            writer_id="conv-curation-index",
            batch_id=f"{frm}->{to_id}",
            mode="auto",
        ) or {}
        self._commit_cursor(to_id)
        return {
            "convs": stats.get("upserts", 0),
            "deleted": stats.get("deletes", 0),
            "to": to_id,
        }

    # ------------------------------------------------------ layout

    def curated_layout(self) -> DataFrame:
        """Packed conversation-level training layout from status rows
        alone — identical order statistics to batch ``curate_corpus``
        over the assembled corpus (the conversation_curated oracle)."""
        st = self.status.read()
        kept = st.filter(F.col("keep") & F.col("fingerprint").isNotNull())
        wf = Window.partitionBy("fingerprint")
        uniq = (
            kept.withColumn("_kid", F.min("doc_id").over(wf))
            .filter(F.col("doc_id") == F.col("_kid"))
        )
        train = uniq.filter(F.col("split") == "train")
        shard = F.pmod(
            md5_long(F.col("doc_id").cast("string")), F.lit(self.n_shards)
        )
        base = train.select(
            F.col("doc_id").alias(self.conv_col),
            F.col("pack_tokens").alias("n_tokens"),
            shard.alias("shard"),
        )
        w = Window.partitionBy("shard").orderBy(self.conv_col)
        off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
            "bin_start"
        )
        return base.select(
            self.conv_col, "n_tokens", "shard", off
        ).withColumn("bin", F.floor(F.col("bin_start") / F.lit(self.budget)))


class _FallbackScan(Exception):
    """Internal: the pruned touched-conv re-read is unavailable (conv
    is not the bucket column / exotic type) — use the pinned scan."""
