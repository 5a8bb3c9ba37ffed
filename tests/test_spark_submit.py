"""Deployment-shape proof: the north rule ships the job via
``spark-submit --py-files delta_spark.zip``. This test builds the zip,
copies the entry script OUT of the repo (so its path bootstrap points
at an empty temp dir, not the checkout), and runs the real
spark-submit binary — every ``delta_spark`` import must resolve from
the shipped zip, exactly as on a cluster. Publishes Iceberg in the
same run to prove the full artifact chain ships too."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "delta_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "delta_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit binary")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    # generate a changelog with the in-process session (fixture)
    from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply

    log_dir = str(tmp_path / "log")
    raw = generate_and_write(
        log_dir, ChangelogSpec(n_events=1500, n_convs=25, seed=77)
    )

    zpath = _build_zip(str(tmp_path))
    job = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            job,
            "--changelog", log_dir,
            "--table", str(tmp_path / "tbl"),
            "--checkpoint", str(tmp_path / "ck"),
            "--mode", "batch",
            "--buckets", "8",
            "--generation", "3",
            "--publish-iceberg", str(tmp_path / "ice"),
            "--matview", str(tmp_path / "mv"),
            "--matview-sums", '{"sum_chars": "length(text)"}',
            "--matview-mins", '{"min_chars": "length(text)"}',
            # scrub-at-ingest wiring: the generator text is PII-free so
            # the oracle comparison below still holds exactly; the
            # redaction itself (that the chain bites) is hash-checked by
            # the scrubbed_replay_lww driver key and the ScrubPII unit
            "--scrub-cols", "text",
            "--vocab-root", str(tmp_path / "vocab"),
            "--curation-root", str(tmp_path / "cur"),
            "--conv-curation-root", str(tmp_path / "ccur"),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [
        json.loads(line)
        for line in out.stdout.splitlines()
        if line.startswith("{")
    ]
    stats = next(d for d in lines if "rows_in" in d)
    assert stats["upserts"] > 0
    voc = next(d for d in lines if "vocab_tokens_touched" in d)
    assert voc["vocab_tokens_touched"] > 0
    curd = next(d for d in lines if "curation_processed" in d)
    assert curd["curation_processed"] > 0
    ccur = next(d for d in lines if "conv_curation_convs" in d)
    assert ccur["conv_curation_convs"] > 0
    pub = next(d for d in lines if "published_iceberg_metadata" in d)
    assert os.path.exists(pub["published_iceberg_metadata"])
    mvd = next(d for d in lines if "matview_epoch" in d)
    assert mvd["matview_epoch"] > 0

    # final state equals the replay oracle (checked back in-process)
    from delta_spark.lake import LakeTable

    from conftest import assert_pdf_equal

    t = LakeTable.load(spark, str(tmp_path / "tbl"))
    assert_pdf_equal(
        t.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"]
    )
    # and the published Iceberg table matches too, Spark-free
    from delta_spark.lake.iceberg import read_iceberg_duckdb

    got = read_iceberg_duckdb(pub["published_iceberg_metadata"]).df()
    assert_pdf_equal(got, oracle_apply(raw), ["conv_id", "turn_idx"])
    # the --matview flag maintained the aggregate view in the same run
    from pyspark.sql import functions as F

    from delta_spark.lake import MaterializedAggregate

    mv = next(d for d in lines if "matview_epoch" in d)
    assert mv["matview_epoch"] == t.metadata["current_snapshot_id"]
    view = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["role"], {"sum_chars": "length(text)"}
    )
    got_mv = sorted(
        tuple(r) for r in view.read().select("role", "n_rows", "sum_chars").collect()
    )
    want_mv = sorted(
        tuple(r)
        for r in t.read()
        .groupBy("role")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("sum_chars"),
        )
        .collect()
    )
    assert got_mv == want_mv


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit binary")
def test_spark_submit_fleet_wap_publish(spark, tmp_path):
    """The multi-table deployment shape: jobs/run_fleet.py shipped via
    --py-files stages a 2-table fleet on a WAP branch, audits, publishes
    via fast_forward_all, and catches the per-table Iceberg copies and
    matview up to the published state — all in one spark-submit run."""
    from delta_spark.changelog import (
        ChangelogSpec,
        generate_multi_changelog,
        oracle_apply,
        write_changelog,
    )

    raw = generate_multi_changelog({
        t: ChangelogSpec(n_events=400, n_convs=10, seed=5 + i, n_files=1)
        for i, t in enumerate(("alpha", "beta"))
    })
    log_dir = str(tmp_path / "log")
    write_changelog(raw, log_dir, 2)

    zpath = _build_zip(str(tmp_path))
    job = str(tmp_path / "run_fleet.py")
    shutil.copy(os.path.join(REPO, "jobs", "run_fleet.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    mv_specs = json.dumps({
        "alpha": {"dest": str(tmp_path / "mv-alpha"),
                  "group_cols": ["role"],
                  "sums": {"sum_chars": "length(text)"}},
    })
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            job,
            "--changelog", log_dir,
            "--catalog", str(tmp_path / "cat"),
            "--checkpoint", str(tmp_path / "ck"),
            "--tables", "alpha,beta",
            "--mode", "batch",
            "--buckets", "8",
            "--generation", "3",
            "--create-tables",
            "--branch", "stage",
            "--publish-on-clean-audit",
            "--publish-iceberg-root", str(tmp_path / "ice"),
            "--matview-specs", mv_specs,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [
        json.loads(line) for line in out.stdout.splitlines()
        if line.startswith("{")
    ]
    run = next(d for d in lines if "my_tables" in d)
    assert sorted(run["my_tables"]) == ["alpha", "beta"]
    pub = next(d for d in lines if "published" in d)
    assert pub["published"]["alpha"] is not None
    assert not pub["audit"]["alpha"]["dup_keys"]

    # published mains equal the per-table replay oracle; the Iceberg
    # copies (post-publish catch-up) match them Spark-free
    from delta_spark.catalog import Catalog
    from delta_spark.lake import MaterializedAggregate
    from delta_spark.lake.iceberg import read_iceberg_duckdb

    from conftest import assert_pdf_equal

    cat = Catalog.load_or_create(spark, str(tmp_path / "cat"))
    for t in ("alpha", "beta"):
        want = oracle_apply(raw[raw["tbl"] == t])
        assert_pdf_equal(
            cat.table(t).read().toPandas(), want, ["conv_id", "turn_idx"]
        )
        hint = open(
            os.path.join(str(tmp_path / "ice"), t, "metadata",
                         "version-hint.text")
        ).read().strip()
        mp = os.path.join(str(tmp_path / "ice"), t, "metadata",
                          f"v{hint}.metadata.json")
        assert_pdf_equal(
            read_iceberg_duckdb(mp).df(), want, ["conv_id", "turn_idx"]
        )
    # the matview caught up to the published alpha state
    from pyspark.sql import functions as F

    alpha = cat.table("alpha")
    mv = MaterializedAggregate(
        spark, alpha, str(tmp_path / "mv-alpha"), ["role"],
        {"sum_chars": "length(text)"},
    )
    got = sorted(tuple(r) for r in mv.read()
                 .select("role", "n_rows", "sum_chars").collect())
    want_mv = sorted(
        tuple(r) for r in alpha.read().groupBy("role").agg(
            F.count("*").alias("n_rows"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("sum_chars"),
        ).collect()
    )
    assert got == want_mv


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit binary")
def test_spark_submit_format_replication(spark, tmp_path):
    """The deltaspark DataSource under the real deployment shape: the
    replicate_table job runs through spark-submit --py-files from
    OUTSIDE the checkout, so the format class (and its executor-side
    reader/writer halves) must unpickle from the shipped zip. The
    replica must equal the source exactly, across a second run with
    updates and a delete."""
    from delta_spark.lake import LakeTable
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    src = LakeTable.create(
        spark, str(tmp_path / "src"), schema,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )

    def commit(rows, op, seq, bid):
        src.merge(
            spark.createDataFrame(rows, schema)
            .withColumn("op", F.lit(op))
            .withColumn("seq", F.lit(seq).cast("long")),
            writer_id="w",
            batch_id=bid,
        )

    commit([(f"c{i}", 0, f"v0 {i}") for i in range(15)], "INSERT", 1, "b1")

    zpath = _build_zip(str(tmp_path))
    job = str(tmp_path / "replicate_table.py")
    shutil.copy(os.path.join(REPO, "jobs", "replicate_table.py"), job)
    env = dict(os.environ)
    # the STREAMING source's planning worker (python_streaming_source
    # _runner) receives no python includes from the JVM, so the
    # deltaspark streaming source's documented deployment contract is:
    # export PYTHONPATH to the shipped zip alongside --py-files (on a
    # cluster: spark.yarn.appMasterEnv.PYTHONPATH / kubernetes
    # driverEnv). Batch reads/writes need no such help — the
    # run_pipeline test above strips PYTHONPATH entirely.
    env["PYTHONPATH"] = zpath
    env["PYSPARK_PYTHON"] = sys.executable

    def run_job():
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zpath,
                job,
                "--source", str(tmp_path / "src"),
                "--dest", str(tmp_path / "dst"),
                "--checkpoint", str(tmp_path / "ck"),
                "--once",
            ],
            capture_output=True,
            text=True,
            cwd=str(tmp_path),
            env=env,
            timeout=600,
        )
        assert out.returncode == 0, out.stderr[-3000:]

    run_job()

    def rows(path):
        return sorted(
            map(tuple, LakeTable.load(spark, path).read().collect())
        )

    assert rows(str(tmp_path / "dst")) == rows(str(tmp_path / "src"))
    assert len(rows(str(tmp_path / "dst"))) == 15

    commit([("c3", 0, "v1 3")], "UPDATE", 2, "b2")
    commit([("c5", 0, None)], "DELETE", 3, "b3")
    run_job()
    assert rows(str(tmp_path / "dst")) == rows(str(tmp_path / "src"))
    assert len(rows(str(tmp_path / "dst"))) == 14
