"""Property sweep for the rollback drill: a seeded random interleaving
of merges, duplicate replays, rollbacks, revoked-batch re-sends, and
snapshot expiry must keep the engine state equal to a pure-Python LWW
model after EVERY operation. This is the invariant that makes rollback
safe to run against a live exactly-once pipeline: revocation + replay
can never lose or duplicate an event, in any order."""

import datetime
import random

import pytest

from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)
KEYS = [f"c{i}" for i in range(10)]


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (k, 0, "user", None if op == "DELETE" else text, "", TS, op, seq)
            for k, (seq, text, op) in sorted(rows.items())
        ],
        DDL,
    )


def _engine_state(t):
    return {
        r["conv_id"]: r["text"]
        for r in t.read().select("conv_id", "text").collect()
    }


def _model_live(state):
    return {k: txt for k, (_s, txt, op) in state.items() if op != "DELETE"}


def _apply_model(state, rows):
    for k, (seq, text, op) in rows.items():
        if k not in state or seq > state[k][0]:
            state[k] = (seq, text, op)


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_rollback_interleaving_property(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], "conv_id", 4,
    )
    state: dict = {}            # key -> (seq, text, op) — latest event
    model_states: dict = {}     # engine snapshot id -> frozen model state
    applied: dict = {}          # batch_id -> (rows, snapshot id it landed in)
    revoked_pool: dict = {}     # batch_id -> rows, eligible for re-send
    next_batch, next_seq = 0, 1

    def fresh_rows():
        nonlocal next_seq
        rows = {}
        for k in rng.sample(KEYS, rng.randint(1, 5)):
            op = "DELETE" if rng.random() < 0.15 else "UPDATE"
            rows[k] = (next_seq, f"s{next_seq}", op)
            next_seq += 1
        return rows

    def lineage_ids():
        by_id = {s["id"]: s for s in t.metadata["snapshots"]}
        cur, out = t.metadata["current_snapshot_id"], []
        while cur is not None:
            out.append(cur)
            cur = by_id[cur].get("parent") if cur in by_id else None
        return out  # head first

    for step in range(14):
        op = rng.choice(
            ["merge", "merge", "merge", "dup", "rollback", "resend", "expire"]
        )
        if op == "merge":
            next_batch += 1
            bid = f"b{next_batch}"
            rows = fresh_rows()
            assert t.merge(_df(spark, rows), "w", bid, mode="auto") is not None
            t = t.refresh()
            _apply_model(state, rows)
            sid = t.metadata["current_snapshot_id"]
            model_states[sid] = dict(state)
            applied[bid] = (rows, sid)
        elif op == "dup" and applied:
            bid = rng.choice(sorted(applied))
            rows, _ = applied[bid]
            # exactly-once: replaying a live batch is a no-op
            assert t.merge(_df(spark, rows), "w", bid, mode="auto") is None
        elif op == "rollback":
            lin = lineage_ids()
            targets = [s for s in lin[1:] if s in model_states]
            if not targets:
                continue
            sid = rng.choice(targets)
            cut = set(lin[: lin.index(sid)])  # abandoned ids
            # rollback_to reports FRESH revocations only: a chain
            # crossing an earlier drill's already-revoked snapshots
            # does not recount them (matches rollback_preview)
            by_id = {s["id"]: s for s in t.metadata["snapshots"]}
            fresh = [c for c in cut if not by_id[c].get("rolled_back")]
            n = t.rollback_to(sid)
            assert n == len(fresh)
            t = t.refresh()
            state = dict(model_states[sid])
            for bid in list(applied):
                rows, at = applied[bid]
                if at in cut:
                    revoked_pool[bid] = rows
                    del applied[bid]
            model_states[t.metadata["current_snapshot_id"]] = dict(state)
        elif op == "resend" and revoked_pool:
            bid = rng.choice(sorted(revoked_pool))
            rows = revoked_pool.pop(bid)
            # the repaired upstream re-sends the revoked batch: it must
            # land (marker revoked) and fold by seq like any other batch
            assert t.merge(_df(spark, rows), "w", bid, mode="auto") is not None
            t = t.refresh()
            _apply_model(state, rows)
            sid = t.metadata["current_snapshot_id"]
            model_states[sid] = dict(state)
            applied[bid] = (rows, sid)
        elif op == "expire":
            t.expire_snapshots(keep_last=3)
            t = t.refresh()
            kept = {s["id"] for s in t.metadata["snapshots"]}
            model_states = {
                k: v for k, v in model_states.items() if k in kept
            }
        else:
            continue
        got = _engine_state(t.refresh())
        assert got == _model_live(state), f"divergence after {op} at step {step}"

    # drain: every still-revoked batch re-sends, then states agree
    for bid, rows in sorted(revoked_pool.items()):
        t.merge(_df(spark, rows), "w", bid, mode="auto")
        _apply_model(state, rows)
    t = t.refresh()
    assert _engine_state(t) == _model_live(state)
