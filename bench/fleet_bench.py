#!/usr/bin/env python
"""Fleet-scale bench: 4 worker instances over a 20-table catalog
(round-robin routing, one process + one SparkSession per instance —
the reference's per-instance worker containers,
DeltaWorker.java:157-168), replaying ONE interleaved multi-table
changelog with write-audit-publish staging, then a fleet-wide audit +
fast_forward_all publish from instance 0.

Numbers reported: per-instance routed tables + rows applied, fleet
wall-clock and events/sec for the staged replay phase (4 concurrent
JVMs, 8 pinned cores each on the 32-core box — cores striped so
instances don't share SMT siblings), and the audit+publish phase
(clean audit over all 20 staged branches, atomic-per-table
fast-forward). Writes BENCH/fleet_r5.json.

Run: python bench/fleet_bench.py  (env: FLEET_TABLES, FLEET_EVENTS_PER,
FLEET_INSTANCES, FLEET_CORES_PER)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

N_TABLES = int(os.environ.get("FLEET_TABLES", "20"))
EVENTS_PER = int(os.environ.get("FLEET_EVENTS_PER", "20000"))
N_INST = int(os.environ.get("FLEET_INSTANCES", "4"))
CORES_PER = int(os.environ.get("FLEET_CORES_PER", "8"))


def _instance_env(i: int) -> dict:
    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = (
        f"--master local[{CORES_PER}] "
        f"--conf spark.ui.enabled=false "
        f"--conf spark.driver.memory=8g "
        f"--conf spark.sql.shuffle.partitions={4 * CORES_PER} "
        f"--conf spark.driver.extraJavaOptions="
        f"-XX:+UseParallelGC\\ -XX:ActiveProcessorCount={CORES_PER} "
        f"pyspark-shell"
    )
    return env


def _taskset(i: int) -> list[str]:
    ncpu = os.cpu_count() or 32
    cores = sorted((i + k * N_INST) % ncpu for k in range(CORES_PER))
    return ["taskset", "-c", ",".join(map(str, cores))]


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wd = tempfile.mkdtemp(prefix="fleet_bench_", dir=base)
    tables = [f"db.t{i:02d}" for i in range(N_TABLES)]

    # 1) one interleaved multi-table changelog (deterministic, pandas)
    from delta_spark.changelog import (
        ChangelogSpec,
        generate_multi_changelog,
        write_changelog,
    )

    specs = {
        t: ChangelogSpec(
            n_events=EVENTS_PER, n_convs=max(20, EVENTS_PER // 100),
            seed=100 + i,
        )
        for i, t in enumerate(tables)
    }
    t0 = time.time()
    raw = generate_multi_changelog(specs)
    log = os.path.join(wd, "log")
    write_changelog(raw, log, n_files=16)
    n_events = len(raw)
    gen_sec = time.time() - t0

    # 2) catalog with the 20 tables (pre-created so instance startup
    #    races are out of the measurement)
    from delta_spark.catalog import Catalog
    from delta_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA
    from delta_spark.session import build_session

    spark = build_session(cpus=8, app_name="fleet_bench_setup")
    spark.sparkContext.setLogLevel("ERROR")
    cat_root = os.path.join(wd, "cat")
    cat = Catalog.load_or_create(spark, cat_root)
    for t in tables:
        cat.create_table(t, TRANSCRIPT_SCHEMA, KEY_COLS, "conv_id", 16)
    spark.stop()

    # 3) staged replay: N_INST concurrent instances, batch mode, WAP
    #    branch — each stages only its routed tables
    def launch(i: int, extra: list[str]) -> subprocess.Popen:
        cmd = _taskset(i) + [
            sys.executable, os.path.join(REPO, "jobs", "run_fleet.py"),
            "--changelog", log,
            "--catalog", cat_root,
            "--checkpoint", os.path.join(wd, "ck"),
            "--tables", ",".join(tables),
            "--mode", "batch",
            "--generation", "1",
            "--instance-id", str(i),
            "--num-instances", str(N_INST),
            "--branch", "stage",
            *extra,
        ]
        return subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=_instance_env(i), cwd=REPO,
        )

    t0 = time.time()
    # staging instances skip the per-instance observability audit so
    # stage_sec measures REPLAY alone; the publish phase below audits
    # the whole fleet exactly once
    procs = [launch(i, ["--skip-self-audit"]) for i in range(N_INST)]
    outs = [p.communicate() for p in procs]
    stage_sec = time.time() - t0
    per_instance = []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            sys.stderr.write(f"instance {i} FAILED:\n{err[-3000:]}\n")
            raise SystemExit(1)
        first = json.loads(
            [ln for ln in out.splitlines() if ln.startswith("{")][0]
        )
        rows = sum(first["rows_in"].values())
        # NB: no per-instance rate — instances share one wall clock;
        # the honest number is the fleet-wide events/sec above
        per_instance.append(
            {
                "instance": i,
                "tables": len(first["my_tables"]),
                "rows_in": rows,
            }
        )

    # 4) audit + publish from instance 0 (re-run is exactly-once no-op
    #    on the data; audits all 20 branches, fast-forwards fleet-wide)
    t0 = time.time()
    pub = launch(0, ["--publish-on-clean-audit"])
    out, err = pub.communicate()
    publish_sec = time.time() - t0
    if pub.returncode != 0:
        sys.stderr.write(f"publish instance FAILED:\n{err[-3000:]}\n")
        raise SystemExit(1)
    audit_line = json.loads(out.splitlines()[-1])
    audited = len(audit_line["audit"])
    dirty = [
        t for t, a in audit_line["audit"].items()
        if a["dup_keys"] or a["null_keys"]
    ]
    published = audit_line.get("published")

    result = {
        "metric": "fleet CDC staged replay + WAP publish",
        "tables": N_TABLES,
        "instances": N_INST,
        "cores_per_instance": CORES_PER,
        "events": n_events,
        "gen_sec": round(gen_sec, 2),
        "stage_sec": round(stage_sec, 2),
        "stage_events_per_sec": round(n_events / stage_sec, 1),
        "per_instance": per_instance,
        "publish_sec": round(publish_sec, 2),
        "audited_tables": audited,
        "dirty_tables": dirty,
        "published_tables": (
            len(published) if isinstance(published, (list, dict)) else published
        ),
    }
    out_path = os.path.join(REPO, "BENCH", "fleet_r5.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
