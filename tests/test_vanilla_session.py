"""Driver-shape regression gate: every ``queries()`` entry must run on
a VANILLA SparkSession — ``SparkSession.builder.master(...)`` with *no*
engine confs — because that is exactly the session the external driver
harness passes to the contract (round-5 lesson: the repo suite runs
under ``build_session`` and stayed green while ``datasource_scan``
failed in the driver on the missing ``spark.sql.python.filterPushdown.
enabled``; this test would have caught it before ship).

The vanilla session must live in its OWN JVM — ``getOrCreate`` inside
the pytest process would return the fixture session with the engine
confs already applied — so the check runs in a subprocess.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

_RUNNER = textwrap.dedent(
    """
    import sys

    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession

    # the driver's shape: a stock session, zero engine confs
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla_contract")
        .config("spark.ui.enabled", "false")  # sandbox hygiene only
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    failures = []
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            pdf = fn(spark, {sf_dir!r}).toPandas()
            assert pdf is not None
        except Exception as e:  # noqa: BLE001 — report every key
            failures.append((name, repr(e)[:500]))
    if failures:
        for name, err in failures:
            print(f"FAIL {{name}}: {{err}}")
        sys.exit(1)
    print("OK", flush=True)
    """
)


def test_every_query_runs_on_vanilla_session(tmp_path):
    script = tmp_path / "vanilla_runner.py"
    script.write_text(_RUNNER.format(repo=REPO, sf_dir=SF_DIR))
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
    )
    assert out.returncode == 0, (
        f"vanilla-session contract run failed:\n{out.stdout[-4000:]}\n"
        f"{out.stderr[-2000:]}"
    )
