"""Deterministic synthetic transcript changelog: generator + scan.

Generator properties (FIXTURES.md §2, mirroring the reference's mock
source replay fixtures — /root/reference/delta-test/src/main/java/io/
cdap/delta/test/mock/MockEventReader.java:43-77 and the E2E golden
lists in DeltaPipelineStateStoreBaseTest.java:85-116):

  * seeded + fully vectorized (numpy) — scale-free row count
  * snapshot prefix (``is_snapshot=True`` INSERTs), then streamed
    INSERT/UPDATE/DELETE with valid per-key lifecycles
    (INSERT < UPDATEs < DELETE in seq order)
  * ~30% UPDATE / ~1% DELETE by default
  * one hot conv_id receiving ~20% of stream events (skew/salting test)
  * duplicate-seq injections (exact row replays — dedup test)
  * out-of-order file placement within a bounded window (watermark test)
  * optional mid-stream DDL add/rename/widen sequence
  * multi-file parquet output in file order = replay order

The *file order* is the order a tailing source observes; ``seq`` is the
authoritative total order (reference: Sequenced.java:26-53).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .schema import (
    DDL_ADD_COLUMN,
    DDL_DROP_COLUMN,
    DDL_RENAME_COLUMN,
    DDL_WIDEN_COLUMN,
    DML_DELETE,
    DML_INSERT,
    DML_UPDATE,
    KEY_COLS,
)

_BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")

# default mid-stream DDL sequence: add a nullable column, rename a
# payload column, widen a key column (reference analog:
# TransformationUtil.transformDDLEvent remaps renamed PKs,
# delta-app/.../transformation/TransformationUtil.java:121-132)
DEFAULT_DDLS = [
    {"op": DDL_ADD_COLUMN, "column": "score", "new_type": "double"},
    {"op": DDL_RENAME_COLUMN, "column": "tool", "new_name": "tool_name"},
    {"op": DDL_WIDEN_COLUMN, "column": "turn_idx", "new_type": "bigint"},
]


@dataclass
class ChangelogSpec:
    n_events: int = 20_000          # stream DML events (excl. snapshot)
    n_convs: int = 400
    mean_turns: float = 8.0         # snapshot turns per conv
    update_frac: float = 0.30
    delete_frac: float = 0.01
    hot_frac: float = 0.20          # share of stream events on 1 conv
    dup_frac: float = 0.02          # duplicate-seq injection rate
    tie_frac: float = 0.0           # equal-seq COMPETING revisions rate
    # (UN_ORDERED source: same seq, different payload + ingest_ts —
    # resolved by the target's sort-key tiebreak, SortKey.java:26-41)
    shuffle_window: int = 64        # out-of-order bound (rows)
    seed: int = 42
    text_chars: int = 160
    include_ddl: bool = False
    ddls: list = field(default_factory=lambda: [dict(d) for d in DEFAULT_DDLS])
    n_files: int = 8


def _mk_text(conv: np.ndarray, turn: np.ndarray, ver: np.ndarray, width: int) -> np.ndarray:
    """Deterministic per-(conv,turn,version) text, ~width chars.
    Assembled with pyarrow's element-wise join (C++): ~5x faster than
    np.char at multi-million-row scale."""
    import pyarrow as pa
    import pyarrow.compute as pc

    filler = " lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    reps = max(1, width // len(filler) + 1)
    joined = pc.binary_join_element_wise(
        "conv=",
        pa.array(conv.astype(str)),
        " turn=",
        pa.array(turn.astype(str)),
        " v",
        pa.array(ver.astype(str)),
        filler * reps,
        "",
    )
    return joined.to_numpy(zero_copy_only=False).astype(object)


def generate_changelog(spec: ChangelogSpec) -> pd.DataFrame:
    """Build the full changelog as one pandas DataFrame in replay
    (file) order, with authoritative ``seq`` assigned in event order."""
    rng = np.random.default_rng(spec.seed)
    roles = np.array(["user", "assistant", "system", "tool"], dtype=object)
    tools = np.array(["", "search", "python", "browser", "calculator"], dtype=object)

    # ---------------- snapshot: turns 0..T_c-1 per conv, in order
    turns_per_conv = rng.poisson(spec.mean_turns, spec.n_convs).astype(np.int64) + 1
    conv_of_snap = np.repeat(np.arange(spec.n_convs), turns_per_conv)
    n_snap = conv_of_snap.size
    starts = np.concatenate(([0], np.cumsum(turns_per_conv)[:-1]))
    turn_of_snap = np.arange(n_snap) - np.repeat(starts, turns_per_conv)

    # ---------------- stream inserts: new turns appended per conv
    n_ins = max(1, int(spec.n_events * (1 - spec.update_frac - spec.delete_frac)))
    # conv choice: hot conv 0 gets hot_frac of stream events
    p = np.full(spec.n_convs, (1 - spec.hot_frac) / max(1, spec.n_convs - 1))
    p[0] = spec.hot_frac
    conv_of_ins = rng.choice(spec.n_convs, size=n_ins, p=p)
    # turn_idx for appended turns: per conv, next indices after snapshot
    order = np.argsort(conv_of_ins, kind="stable")
    sorted_conv = conv_of_ins[order]
    within = np.arange(n_ins) - np.concatenate(
        ([0], np.cumsum(np.bincount(sorted_conv, minlength=spec.n_convs))[:-1])
    )[sorted_conv]
    turn_sorted = turns_per_conv[sorted_conv] + within
    turn_of_ins = np.empty(n_ins, dtype=np.int64)
    turn_of_ins[order] = turn_sorted

    # ---------------- event ordering key
    # within a conv, inserts must be in turn order; across convs, free.
    # order_key monotone in turn_idx (jitter < 1 preserves it).
    snap_key = turn_of_snap - 1e9  # snapshot strictly first
    ins_key = turn_of_ins + rng.uniform(0, 0.999, n_ins)

    all_conv = np.concatenate([conv_of_snap, conv_of_ins])
    all_turn = np.concatenate([turn_of_snap, turn_of_ins])
    all_key = np.concatenate([snap_key, ins_key])
    is_snap = np.concatenate(
        [np.ones(n_snap, dtype=bool), np.zeros(n_ins, dtype=bool)]
    )
    n_base = all_conv.size

    # ---------------- updates: re-image existing (conv, turn) rows
    n_upd = int(spec.n_events * spec.update_frac)
    upd_src = rng.integers(0, n_base, n_upd)  # uniform over inserted keys
    upd_conv = all_conv[upd_src]
    upd_turn = all_turn[upd_src]
    upd_key = all_key[upd_src] + rng.uniform(0.001, 4.0, n_upd)

    # ---------------- deletes: distinct keys, strictly last per key
    n_del = int(spec.n_events * spec.delete_frac)
    del_src = rng.choice(n_base, size=min(n_del, n_base), replace=False)
    del_conv = all_conv[del_src]
    del_turn = all_turn[del_src]
    # delete order key beyond any possible update of that key
    del_key = all_key[del_src] + 5.0 + rng.uniform(0, 1.0, del_src.size)

    conv = np.concatenate([all_conv, upd_conv, del_conv])
    turn = np.concatenate([all_turn, upd_turn, del_turn])
    okey = np.concatenate([all_key, upd_key, del_key])
    op = np.concatenate(
        [
            np.where(is_snap, DML_INSERT, DML_INSERT).astype(object),
            np.full(n_upd, DML_UPDATE, dtype=object),
            np.full(del_src.size, DML_DELETE, dtype=object),
        ]
    )
    snap_flag = np.concatenate(
        [is_snap, np.zeros(n_upd + del_src.size, dtype=bool)]
    )

    n = conv.size
    event_order = np.argsort(okey, kind="stable")
    conv, turn, okey, op, snap_flag = (
        conv[event_order],
        turn[event_order],
        okey[event_order],
        op[event_order],
        snap_flag[event_order],
    )
    seq = np.arange(1, n + 1, dtype=np.int64)

    # version counter per key for deterministic text evolution —
    # vectorized cumcount over an integer key (a pandas groupby on
    # string keys is minutes at 5M rows; this is seconds)
    ikey = conv.astype(np.int64) * 10_000_000 + turn.astype(np.int64)
    korder = np.argsort(ikey, kind="stable")
    ks = ikey[korder]
    new_grp = np.concatenate(([True], ks[1:] != ks[:-1]))
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
    ver_sorted = np.arange(n) - grp_start
    ver = np.empty(n, dtype=np.int64)
    ver[korder] = ver_sorted
    text = _mk_text(conv, turn, ver, spec.text_chars)
    # previous row image only exists on UPDATEs — build just those
    upd_mask = op == DML_UPDATE
    prev_text = np.full(n, None, dtype=object)
    ui = np.flatnonzero(upd_mask)
    prev_text[ui] = _mk_text(
        conv[ui], turn[ui], np.maximum(ver[ui] - 1, 0), spec.text_chars
    )
    rng2 = np.random.default_rng(spec.seed + 1)
    role = roles[(conv + turn) % roles.size]
    tool = tools[rng2.integers(0, tools.size, n)]
    ts = _BASE_TS + (conv.astype("int64") * 86_400_000_000 + turn.astype("int64") * 60_000_000)
    ingest_ts = _BASE_TS + seq * 1_000_00  # 0.1 s cadence

    # DELETE rows carry no new image (reference: DMLEvent row null
    # semantics are target-side; we null the payload except the key).
    # Everything stays in numpy arrays until ONE final DataFrame build —
    # pandas frame concat/sort/masked-assign dominated generation time
    # at 5M rows.
    is_del = op == DML_DELETE
    for arr in (role, text, tool, prev_text):
        arr[is_del] = None
    ts = ts.copy()
    ts[is_del] = np.datetime64("NaT")

    cols = {
        "seq": seq,
        "op": op,
        "conv_id": np.char.add("c", conv.astype(str)).astype(object),
        "turn_idx": turn.astype("float64"),  # float64 carries NaN for DDL rows
        "is_snapshot": snap_flag,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts,
        "prev_text": prev_text,
        "ingest_ts": ingest_ts,
        "ddl": np.full(n, None, dtype=object),
    }

    # ---------------- mid-stream DDL rows (inserted positionally)
    if spec.include_ddl and spec.ddls:
        lo = int(n_snap) + 1
        positions = np.linspace(lo, n - 1, num=len(spec.ddls) + 2)[1:-1].astype(int)
        ins_at = np.sort(positions)
        ddl_vals = {
            "op": np.array([d["op"] for d in spec.ddls], dtype=object),
            "ddl": np.array([json.dumps(d) for d in spec.ddls], dtype=object),
        }
        k = len(spec.ddls)
        nulls = {
            "conv_id": None, "role": None, "text": None, "tool": None,
            "prev_text": None,
        }
        for name, arr in list(cols.items()):
            if name == "seq":
                continue
            if name in ddl_vals:
                fill = ddl_vals[name]
            elif name in nulls:
                fill = np.full(k, None, dtype=object)
            elif name == "is_snapshot":
                fill = np.zeros(k, dtype=bool)
            elif name in ("ts", "ingest_ts"):
                fill = np.full(k, np.datetime64("NaT"), dtype=arr.dtype)
            elif name == "turn_idx":
                fill = np.full(k, np.nan)
            else:
                fill = np.full(k, None, dtype=object)
            cols[name] = np.insert(arr, ins_at, fill)
        n = n + k
        cols["seq"] = np.arange(1, n + 1, dtype=np.int64)

    # ---------------- duplicate-seq injections (exact replays)
    rng3 = np.random.default_rng(spec.seed + 2)
    n_dup = int(n * spec.dup_frac)
    dup_idx = rng3.choice(n, size=n_dup, replace=False)

    # ---------------- out-of-order file placement
    file_key = np.arange(n) + rng3.uniform(0, spec.shuffle_window, n)
    dup_key = dup_idx + rng3.uniform(1, spec.shuffle_window * 2, n_dup)
    perm = np.argsort(np.concatenate([file_key, dup_key]), kind="stable")
    take = np.concatenate([np.arange(n), dup_idx])[perm]

    out = pd.DataFrame({name: arr[take] for name, arr in cols.items()})
    out["turn_idx"] = out["turn_idx"].astype("Int32")
    out = out.reset_index(drop=True)

    # ---------------- equal-seq competing revisions (UN_ORDERED source)
    if spec.tie_frac:
        rng4 = np.random.default_rng(spec.seed + 3)
        elig = out.index[
            out["op"].isin([DML_INSERT, DML_UPDATE]) & ~out["is_snapshot"]
        ].to_numpy()
        n_tie = min(int(len(out) * spec.tie_frac), elig.size)
        if n_tie:
            pick = rng4.choice(elig, size=n_tie, replace=False)
            ties = out.loc[pick].copy()
            # half the revisions WIN the tie (later source ts), half lose
            win = np.arange(n_tie) % 2 == 0
            bump = np.where(win, 50_000, -50_000).astype("timedelta64[us]")
            ties["ingest_ts"] = ties["ingest_ts"].to_numpy() + bump
            ties["text"] = ties["text"].astype(object) + " rev-tie"
            # interleave each revision near its sibling in replay order
            okey = np.concatenate(
                [
                    np.arange(len(out), dtype="float64"),
                    pick + rng4.uniform(1, spec.shuffle_window, n_tie),
                ]
            )
            out = pd.concat([out, ties], ignore_index=True)
            out = out.iloc[np.argsort(okey, kind="stable")].reset_index(drop=True)
    return out


def generate_multi_changelog(
    specs: dict[str, ChangelogSpec], seed: int = 7
) -> pd.DataFrame:
    """Interleave per-table changelogs into ONE multi-table changelog
    with a ``tbl`` column (reference: a pipeline replicates a SET of
    tables — DeltaWorker.assignTables, DeltaWorker.java:594-620).

    The global ``seq`` preserves each table's event order (monotone in
    the per-table seq), and rows sharing a per-table seq (replay
    duplicates / tie revisions) share the global seq too. File order
    interleaves the tables' replay orders deterministically.
    """
    rng = np.random.default_rng(seed)
    frames = []
    for name in sorted(specs):
        df = generate_changelog(specs[name])
        df.insert(0, "tbl", name)
        frames.append(df)
    # global seq: round-robin the tables' per-seq ranks
    pairs = sorted(
        {(s, ti) for ti, f in enumerate(frames) for s in f["seq"].unique()},
        key=lambda p: (p[0], p[1]),
    )
    gmap = {p: i + 1 for i, p in enumerate(pairs)}
    for ti, f in enumerate(frames):
        f["seq"] = f["seq"].map(lambda s, ti=ti: gmap[(s, ti)]).astype("int64")
    # file (replay) order: interleave, preserving each table's order
    keys = np.concatenate(
        [
            np.arange(len(f), dtype="float64") * len(frames)
            + rng.uniform(0, len(frames), len(f))
            for f in frames
        ]
    )
    out = pd.concat(frames, ignore_index=True)
    return out.iloc[np.argsort(keys, kind="stable")].reset_index(drop=True)


def write_changelog(df: pd.DataFrame, path: str, n_files: int = 8) -> list[str]:
    """Write the changelog as n_files parquet files in replay order.

    File names sort lexicographically in replay order so Spark's file
    source (which orders by modification time, then path) tails them
    like a WAL. A ``tbl`` column (multi-table changelog) is carried
    through when present.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    n = len(df)
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    files = []
    arrow_schema = pa.schema(
        [
            *([pa.field("tbl", pa.string())] if "tbl" in df.columns else []),
            pa.field("seq", pa.int64(), False),
            pa.field("op", pa.string(), False),
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("prev_text", pa.string()),
            pa.field("is_snapshot", pa.bool_(), False),
            pa.field("ingest_ts", pa.timestamp("us")),
            pa.field("ddl", pa.string()),
        ]
    )
    cols = [f.name for f in arrow_schema]
    for i in range(n_files):
        chunk = df.iloc[bounds[i] : bounds[i + 1]][cols]
        tbl = pa.Table.from_pandas(chunk, schema=arrow_schema, preserve_index=False)
        f = os.path.join(path, f"part-{i:05d}.parquet")
        pq.write_table(tbl, f)
        files.append(f)
    return files


def generate_and_write(path: str, spec: ChangelogSpec | None = None) -> pd.DataFrame:
    spec = spec or ChangelogSpec()
    df = generate_changelog(spec)
    write_changelog(df, path, spec.n_files)
    return df


# -------------------------------------------------------------- oracle


def oracle_apply(df: pd.DataFrame, sort_col: str | None = None) -> pd.DataFrame:
    """Reference replay in pandas: dedup by seq, apply in seq order,
    last writer wins per (conv_id, turn_idx), DELETE removes, DDL
    applied to the final frame. With ``sort_col`` (UN_ORDERED source),
    equal-seq revisions resolve by that column — highest wins. This is
    the golden oracle for the E2E tests (reference analog:
    FileEventConsumer golden compare,
    delta-test/.../FileEventConsumer.java:90-117)."""
    if sort_col is not None:
        ev = (
            df.drop_duplicates(["seq", sort_col], keep="first")
            .sort_values(["seq", sort_col], kind="stable")
        )
    else:
        ev = df.drop_duplicates("seq", keep="first").sort_values("seq", kind="stable")
    ddl_rows = ev[ev["ddl"].notna()]
    dml = ev[ev["ddl"].isna()]
    last = dml.groupby(KEY_COLS, sort=False, dropna=False).tail(1)
    final = last[last["op"] != DML_DELETE][
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ].reset_index(drop=True)
    final["turn_idx"] = final["turn_idx"].astype("int64")

    for _, r in ddl_rows.iterrows():
        d = json.loads(r["ddl"])
        if d["op"] == DDL_ADD_COLUMN:
            final[d["column"]] = pd.Series([None] * len(final), dtype="float64")
        elif d["op"] == DDL_RENAME_COLUMN:
            final = final.rename(columns={d["column"]: d["new_name"]})
        elif d["op"] == DDL_WIDEN_COLUMN:
            # int32 -> int64 / float64 etc.
            tgt = {"bigint": "int64", "double": "float64", "float": "float32"}[
                d["new_type"]
            ]
            final[d["column"]] = final[d["column"]].astype(tgt)
        elif d["op"] == DDL_DROP_COLUMN:
            final = final.drop(columns=[d["column"]], errors="ignore")
    return final.sort_values(
        [c for c in ("conv_id", "turn_idx") if c in final.columns]
    ).reset_index(drop=True)


def spark_generate(
    spark,
    n_events: int,
    path: str,
    n_convs: int | None = None,
    n_files: int = 64,
    seed: int = 42,
    hot_frac_pct: int = 20,
    update_pct: int = 30,
    delete_pct: int = 1,
    text_chars: int = 160,
) -> int:
    """Scale-free BENCH changelog generator: pure Spark expressions over
    ``range(n)`` — parallel, no driver-side data, works at 10^10 rows.

    Unlike ``generate_changelog`` (the golden-oracle generator), ops are
    hash-assigned without per-key lifecycle ordering: fine for
    throughput benchmarking (the LWW/tombstone merge is insensitive to
    op sequences) but NOT for golden-state comparison. ``seq`` is the
    row id, unique and dense.
    """
    from pyspark.sql import functions as F

    n_convs = n_convs or max(200, n_events // 100)
    filler = " lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    filler = filler * max(1, text_chars // len(filler) + 1)
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    tools = F.array(F.lit(""), F.lit("search"), F.lit("python"), F.lit("browser"))

    df = (
        spark.range(1, n_events + 1, numPartitions=n_files)
        .withColumn("seq", F.col("id"))
        .withColumn("h", F.pmod(F.xxhash64(F.col("id") + F.lit(seed)), F.lit(1_000_000)))
        .withColumn(
            "conv",
            F.when(F.col("h") % 1000 < hot_frac_pct * 10, F.lit(0)).otherwise(
                F.pmod(F.xxhash64(F.col("id") * 7 + F.lit(seed)), F.lit(n_convs))
            ),
        )
        .withColumn("turn", F.pmod(F.xxhash64(F.col("id") * 13), F.lit(400)).cast("int"))
        .withColumn(
            "op",
            F.when(F.col("h") % 100 < delete_pct, F.lit("DELETE"))
            .when(F.col("h") % 100 < delete_pct + update_pct, F.lit("UPDATE"))
            .otherwise(F.lit("INSERT")),
        )
        .withColumn("is_dml", F.lit(True))
        .select(
            F.col("seq"),
            F.col("op"),
            F.concat(F.lit("c"), F.col("conv")).alias("conv_id"),
            F.col("turn").alias("turn_idx"),
            F.element_at(roles, (F.pmod(F.col("conv") + F.col("turn"), F.lit(4)) + 1).cast("int")).alias("role"),
            F.when(
                F.col("op") != "DELETE",
                F.concat(
                    F.lit("conv="), F.col("conv"), F.lit(" turn="), F.col("turn"),
                    F.lit(" s"), F.col("seq"), F.lit(filler),
                ),
            ).alias("text"),
            F.element_at(tools, (F.col("h") % 4 + 1).cast("int")).alias("tool"),
            (F.lit("2025-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=F.col("conv") * 60 + F.col("turn"))).alias("ts"),
            F.lit(None).cast("string").alias("prev_text"),
            F.lit(False).alias("is_snapshot"),
            (F.lit("2025-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=F.col("seq") / 10)).alias("ingest_ts"),
            F.lit(None).cast("string").alias("ddl"),
        )
    )
    df.write.mode("overwrite").parquet(path)
    return n_events
