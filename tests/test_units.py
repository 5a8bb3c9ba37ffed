"""Unit tests: dedup algebra, transforms, assessment, media stubs,
similarity (reference analog: operator-level unit layer, SURVEY.md §5)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_spark import assess
from delta_spark.dedup import (
    dedup_by_seq,
    lww_collapse,
    lww_collapse_salted,
    lww_collapse_window,
)
from delta_spark.schema import TRANSCRIPT_SCHEMA
from delta_spark.transform import (
    CastColumn,
    NormalizeText,
    RenameColumn,
    SetValue,
    chain,
)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (1, "k1", 1, "a"),
        (2, "k1", 1, "b"),
        (5, "k1", 1, "e"),
        (3, "k2", 1, "c"),
        (3, "k2", 1, "c"),  # duplicate seq
        (4, "k2", 2, "d"),
    ]
    return spark.createDataFrame(rows, "seq long, conv_id string, turn_idx int, text string")


def test_lww_variants_agree(ev):
    keys = ["conv_id", "turn_idx"]
    cols = ["conv_id", "turn_idx", "seq", "text"]
    a = lww_collapse(ev, keys).select(cols).orderBy(*keys).collect()
    b = lww_collapse_salted(ev, keys, salt_buckets=4).select(cols).orderBy(*keys).collect()
    c = lww_collapse_window(ev, keys).select(cols).orderBy(*keys).collect()
    assert a == b == c
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in a}
    assert got == {("k1", 1): "e", ("k2", 1): "c", ("k2", 2): "d"}


def test_dedup_by_seq(ev):
    assert dedup_by_seq(ev).count() == 5


def test_lww_plan_is_partial_aggregate(ev):
    plan = lww_collapse(ev, ["conv_id", "turn_idx"])._jdf.queryExecution().executedPlan().toString()
    # aggregate path → map-side partial combine before the exchange
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan


def test_transform_chain(spark):
    df = spark.createDataFrame(
        [("  Hello\t\tWorld \n", 1)], "text string, v int"
    )
    fn = chain(
        [
            NormalizeText("text"),
            RenameColumn("v", "version"),
            CastColumn("version", "bigint"),
            SetValue("source", "cdc"),
        ]
    )
    row = fn(df).collect()[0]
    assert row["text"] == "Hello World"
    assert row["version"] == 1 and isinstance(row["version"], int)
    assert row["source"] == "cdc"
    assert fn(df).schema["version"].dataType.simpleString() == "bigint"


def test_scrub_pii_directive(spark):
    from delta_spark.transform import ScrubPII

    df = spark.createDataFrame(
        [("mail bob@x.io from 10.0.0.7", 1), (None, 2)],
        "text string, v int",
    )
    rows = {r["v"]: r["text"] for r in chain([ScrubPII("text")])(df).collect()}
    assert rows[1] == "mail <EMAIL> from <IP>"
    assert rows[2] is None  # tombstones pass through


def test_nfc_normalize(spark):
    fn = chain([NormalizeText("text", nfc=True)])
    # e + combining acute (NFD) -> é (NFC)
    df = spark.createDataFrame([("étude",)], "text string")
    assert fn(df).collect()[0]["text"] == "étude"


def test_assess_source_only():
    a = assess.assess_table(TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"])
    assert a.ok and all(c.support == "YES" for c in a.columns)


def test_assess_missing_pk_and_unselected():
    a = assess.assess_table(TRANSCRIPT_SCHEMA, ["conv_id", "nope"])
    assert not a.ok and any("nope" in p for p in a.problems)
    b = assess.assess_table(
        TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], selected_columns=["conv_id", "text"]
    )
    assert any("turn_idx" in p for p in b.problems)


def test_assess_against_target(spark, tmp_path):
    from delta_spark.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"]
    )
    src = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("extra", T.StringType(), True),  # needs ADD_COLUMN
            T.StructField("ts", T.StringType(), True),     # string vs timestamp: NO
        ]
    )
    a = assess.assess_table(src, ["conv_id", "turn_idx"], target=t)
    by_name = {c.name: c for c in a.columns}
    assert by_name["extra"].support == "PARTIAL"
    assert by_name["ts"].support == "NO"
    assert by_name["text"].support == "YES"
    assert not a.ok


def test_unsupported_type():
    src = T.StructType([T.StructField("m", T.MapType(T.StringType(), T.StringType()))])
    a = assess.assess_table(src, [])
    assert a.columns[0].support == "NO"


def test_media_pipeline(spark):
    from delta_spark.functions import media

    docs = spark.createDataFrame(
        [(i, f"text {i} " * (i + 1)) for i in range(9)], "doc_id long, text string"
    )
    m = media.synth_media_from_text(docs, "doc_id", "text")
    feats = media.extract_features(m).toPandas()
    assert len(feats) == 9
    assert set(feats["kind"]) == {"image", "audio", "video"}
    img = feats[feats["kind"] == "image"]
    assert img["width"].notna().all() and img["duration_s"].isna().all()
    aud = feats[feats["kind"] == "audio"]
    assert aud["duration_s"].notna().all() and aud["width"].isna().all()
    # deterministic: re-run equals
    feats2 = media.extract_features(m).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )
    plan = media.extract_features(m)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_frame_sample_plan(spark):
    from delta_spark.functions import media

    docs = spark.createDataFrame(
        [(i, "x" * 100) for i in range(30)], "doc_id long, text string"
    )
    m = media.synth_media_from_text(docs, "doc_id", "text")
    plan = media.frame_sample_plan(m, every_n=10).toPandas()
    assert (plan["frame_indices"].map(len) >= 1).all()


def test_media_codecs_real_decode(spark):
    """The extractor must derive features by PARSING payload bytes —
    proven by feeding hand-built binaries the synthesizer never emits
    (non-canonical WAV chunk order, exotic dims) and malformed ones."""
    import struct

    from delta_spark.functions import media

    def ppm(w, h):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes(3 * w * h)

    # WAV with a LIST chunk between fmt and data — a naive offset-44
    # reader breaks; a real RIFF chunk walk does not. 8000 Hz stereo.
    data = bytes(4 * 250)  # 250 stereo 16-bit samples
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 12 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rvid = b"RVID" + struct.pack("<II", 3, 10) + ppm(5, 4) * 3
    rows = [
        (1, "image", ppm(123, 7), None),
        (2, "audio", wav, None),
        (3, "video", rvid, None),
    ]
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in media.extract_features(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (123, 7, 1)
    assert out[2]["duration_s"] == 250 / 8000.0 and out[2]["width"] is None
    assert (out[3]["n_frames"], out[3]["width"], out[3]["height"]) == (3, 5, 4)
    assert out[3]["duration_s"] == 3 / 10.0

    import pytest as _pytest

    for bad in [
        (9, "video", b"RVID" + struct.pack("<II", 4, 10) + ppm(5, 4) * 3, None),
        (10, "image", b"JFIF-not-a-real-format", None),
        (11, "image", b"P6\n9 9\n255\n" + bytes(10), None),  # truncated raster
    ]:
        bad_df = spark.createDataFrame([bad], media.MEDIA_SCHEMA)
        with _pytest.raises(Exception):
            media.extract_features(bad_df).collect()


def test_lsh_recall_vs_brute_force(spark):
    """LSH top-k must share most results with brute force on clustered
    vectors (sanity of the approximate path)."""
    import numpy as np

    from delta_spark.functions import similarity

    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 16))
    rows = []
    for i in range(200):
        c = i % 4
        v = base[c] + rng.normal(scale=0.15, size=16)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[0][1]
    bf = [r["vec_id"] for r in similarity.brute_force_topk(df.filter("vec_id<>0"), q, k=10).collect()]
    ap = [r["vec_id"] for r in similarity.lsh_topk(df.filter("vec_id<>0"), q, k=10, n_planes=4).collect()]
    assert len(set(bf) & set(ap)) >= 5


def test_commit_protocol_seam(tmp_path):
    """The atomic version-claim seam: POSIX impl claims exactly once;
    object-store URIs fail fast with the conditional-put contract
    (never a silent non-atomic fallback); unknown schemes rejected."""
    import json

    import pytest

    from delta_spark.lake.commit import (
        CommitConflict,
        ObjectStoreCommit,
        PosixLinkCommit,
        protocol_for,
    )
    from delta_spark.lake.table import CommitConflict as TableConflict

    assert TableConflict is CommitConflict  # one exception type, one seam

    assert isinstance(protocol_for(str(tmp_path)), PosixLinkCommit)
    assert isinstance(protocol_for("file:///x"), PosixLinkCommit)
    for uri in ("s3://b/t", "s3a://b/t", "gs://b/t", "abfss://c@a/t"):
        proto = protocol_for(uri)
        assert isinstance(proto, ObjectStoreCommit)
        with pytest.raises(NotImplementedError, match="conditional"):
            proto.claim(str(tmp_path), "v1.json", {})
    with pytest.raises(ValueError, match="scheme"):
        protocol_for("ftp://host/x")

    p = PosixLinkCommit()
    p.claim(str(tmp_path), "v7.json", {"v": 7})
    assert json.load(open(tmp_path / "v7.json")) == {"v": 7}
    with pytest.raises(CommitConflict):
        p.claim(str(tmp_path), "v7.json", {"v": 8})
    assert json.load(open(tmp_path / "v7.json")) == {"v": 7}  # loser never tore it
    assert not list(tmp_path.glob("*.tmp"))  # temp files always cleaned


def test_media_frame_sample_plan(spark):
    """frame_sample_plan: per-video decode plan (every Nth frame index,
    clamped to n_frames) — pure column ops over the feature frame."""
    from delta_spark.functions import media

    docs = spark.createDataFrame(
        [(i, f"clip {i} " * (i + 1)) for i in range(9)], "doc_id long, text string"
    )
    m = media.synth_media_from_text(docs, "doc_id", "text")
    plan = media.frame_sample_plan(m, every_n=10).toPandas()
    feats = media.extract_features(m).toPandas()
    vids = feats[feats["kind"] == "video"].set_index("media_id")
    assert len(plan) == len(vids) > 0
    for _, r in plan.iterrows():
        n = int(vids.loc[r["media_id"], "n_frames"])
        idx = list(r["frame_indices"])
        assert idx == list(range(0, max(n - 1, 0) + 1, 10))  # stride + clamp
        assert idx[-1] <= n - 1 or n == 0


def test_connected_components_transitive_and_multi(spark):
    """Min-label propagation: a 4-chain (1-2, 2-3, 3-4) collapses to
    ONE cluster labeled by its smallest id even though (1,4) never
    shared an LSH band; disjoint components keep separate labels."""
    from delta_spark.functions.neardup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_pii_scrub_and_chunks(spark):
    from delta_spark.functions import text as tx

    rows = [
        (1, "mail a@b.io and 10.1.2.3 call +44-123-456-7890 ssn 123-45-6789"),
        (2, ""),
        (3, None),
        (4, "x" * 600),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.coalesce(F.col("text"), F.lit(""))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", tx.pii_scrub(t).alias("clean"),
        *[v.alias(k) for k, v in tx.pii_hits(t).items()],
    ).collect()}
    assert out[1]["clean"] == "mail <EMAIL> and <IP> call <PHONE> ssn <SSN>"
    assert (out[1]["email"], out[1]["phone"], out[1]["ipv4"], out[1]["ssn"]) == (1, 1, 1, 1)
    assert out[2]["clean"] == "" and out[3]["clean"] == ""
    # chunking: 600 chars at size 256 / overlap 32 (step 224) → 3 chunks
    spans = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", tx.chunk_spans(t, 256, 32).alias("s")).collect()}
    assert spans[4] == [1, 225, 449]
    assert spans[2] == [1] and spans[3] == [1]  # one empty chunk
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tx.chunk_spans(t, 64, 64)
    # plan: pure JVM generate+project — no shuffle, no python UDF
    q = df.select("doc_id", F.posexplode(tx.chunk_spans(t)).alias("i", "st"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_normalize_ranges_accepts_bare_two_list():
    """Back-compat: a bare 2-element list of scalars is one interval
    (the pre-list-of-intervals calling convention must keep working)."""
    from delta_spark.lake.stats import normalize_ranges

    assert normalize_ranges({"ts": [1, 9]}) == {"ts": [(1, 9)]}
    assert normalize_ranges({"ts": (1, 9)}) == {"ts": [(1, 9)]}
    assert normalize_ranges({"ts": [(1, 2), (5, 9)]}) == {
        "ts": [(1, 2), (5, 9)]
    }
    assert normalize_ranges({"ts": [[1, 2], (5, 9)]}) == {
        "ts": [(1, 2), (5, 9)]
    }
    import pytest as _pt

    with _pt.raises(ValueError):
        normalize_ranges({"ts": [1, 2, 3]})
