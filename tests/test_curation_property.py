"""Property sweep for incremental curation: a seeded random
interleaving of inserts, revisions, deletions, duplicate replays, and
advance calls (including skipped/coalesced advances that fold several
docs commits at once) must keep ``curated_layout()`` equal to batch
``curate_corpus`` over the live corpus after EVERY advance. This is
the invariant that makes the status table safe to trust as the source
of a training corpus: no interleaving of CDC traffic and maintenance
schedules can make the incremental answer drift from the batch one."""

import random

import pytest
from pyspark.sql import types as T

from delta_spark.functions import curation as cur
from delta_spark.functions.curation_incremental import CurationIndexer
from delta_spark.lake import LakeTable

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# word pool shaped to straddle the quality gate: some docs pass, some
# fail on length, some on repetition, and revisions can flip a verdict
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _text(rng: random.Random) -> str | None:
    kind = rng.randrange(6)
    if kind == 0:
        return "hi"  # too short: gate drops
    if kind == 1:
        return "spam " * rng.randint(20, 40)  # repetition: gate drops
    if kind == 2:  # duplicate-prone: a handful of canonical bodies
        return " ".join(_WORDS[: 12 + (rng.randrange(3))])
    n = rng.randint(12, 30)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _key(pdf):
    return {
        tuple(int(r[c]) for c in ("doc_id", "n_tokens", "shard",
                                  "bin_start", "bin"))
        for _, r in pdf.iterrows()
    }


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_curation_interleaving_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    tbl = LakeTable.create(
        spark, str(tmp_path / "docs"), DOCS_SCHEMA, key_cols=["doc_id"]
    )
    ix = CurationIndexer(spark, tbl, str(tmp_path / "cur"), n_shards=4)

    live: dict[int, str | None] = {}
    seq = 0
    applied: list[tuple] = []  # (rows, op, seq, bid) for replays

    def commit(rows, op):
        nonlocal seq
        seq += 1
        bid = f"b{seq}"
        df = spark.createDataFrame(rows, DOCS_SCHEMA)
        from pyspark.sql import functions as F

        tbl.merge(
            df.withColumn("op", F.lit(op)).withColumn(
                "seq", F.lit(seq).cast("long")
            ),
            writer_id="w",
            batch_id=bid,
        )
        applied.append((rows, op, seq, bid))

    for step in range(12):
        action = rng.choice(
            ["insert", "insert", "update", "delete", "replay", "advance",
             "advance"]
        )
        if action == "insert":
            rows = []
            for _ in range(rng.randint(3, 10)):
                did = rng.randrange(200)
                txt = _text(rng)
                rows.append((did, txt))
                live[did] = txt
            # last writer wins inside the batch too: dedupe by id,
            # keeping the later tuple (merge collapses by max seq; equal
            # seq within a batch resolves identically in the model)
            rows = list({d: (d, t) for d, t in rows}.values())
            commit(rows, "INSERT")
        elif action == "update" and live:
            ids = rng.sample(sorted(live), min(4, len(live)))
            rows = []
            for did in ids:
                txt = _text(rng)
                rows.append((did, txt))
                live[did] = txt
            commit(rows, "UPDATE")
        elif action == "delete" and live:
            ids = rng.sample(sorted(live), min(3, len(live)))
            rows = [(did, None) for did in ids]
            for did in ids:
                del live[did]
            commit(rows, "DELETE")
        elif action == "replay" and applied:
            rows, op, s, bid = rng.choice(applied)
            from pyspark.sql import functions as F

            # exact duplicate re-send: the exactly-once marker must
            # swallow it, so neither corpus nor verdicts move
            tbl.merge(
                spark.createDataFrame(rows, DOCS_SCHEMA)
                .withColumn("op", F.lit(op))
                .withColumn("seq", F.lit(s).cast("long")),
                writer_id="w",
                batch_id=bid,
            )
        elif action == "advance":
            ix.advance()
            inc = _key(ix.curated_layout().toPandas())
            batch = _key(
                cur.curate_corpus(
                    tbl.read(), "doc_id", "text", budget=512, n_shards=4
                ).toPandas()
            )
            assert inc == batch, f"seed {seed} step {step}: drift"

    # final reconciliation regardless of where the walk ended
    ix.advance()
    inc = _key(ix.curated_layout().toPandas())
    batch = _key(
        cur.curate_corpus(
            tbl.read(), "doc_id", "text", budget=512, n_shards=4
        ).toPandas()
    )
    assert inc == batch
