#!/usr/bin/env python
"""Separate-executor-JVM scaling evidence (VERDICT r5 "do this" #5):
run the SAME CDC batch replay under ``local-cluster[1,1,m]`` vs
``local-cluster[4,1,m]`` — real executor processes with their own
heaps, so the measured N->4N efficiency crosses process boundaries
instead of sharing one JVM the way ``local[N]`` does. This tests the
memory-bandwidth-ceiling model behind the 100x claim without a
cluster.

Runs each leg in a FRESH driver JVM (subprocess), interleaved
best-of-N like bench/scaling.py, and pins the process tree to
stride-spread cores per the replay_once.py finding (adjacent vCPUs on
this VM share a contended resource). Prints one JSON line and appends
a section to BENCH/BASELINE.md is left to the caller; the artifact is
the JSON written to BENCH/local_cluster_r6.json by --write.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
n_exec = {n_exec}
if os.environ.get("SCALE_PIN", "1") == "1":
    ncpu = os.cpu_count() or 32
    stride = max(1, ncpu // max(n_exec + 1, 1))
    pins = {{(i * stride + stride // 2) % ncpu for i in range(n_exec + 1)}}
    os.sched_setaffinity(0, pins)
from delta_spark.session import _export_package_path
_export_package_path()
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local-cluster[%d,1,%d]" % (n_exec, {exec_mb}))
    .appName("lc_probe")
    .config("spark.sql.shuffle.partitions", str(max(2 * n_exec, 4)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.executor.memory", "{exec_mb}m")
    .config("spark.driver.memory", "3g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC -XX:ActiveProcessorCount=1")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from delta_spark.pipeline import Pipeline, PipelineConfig
wd = {wd!r}
# warmup: touch the log + spawn executors before t0
spark.read.parquet(os.path.join(wd, "log")).count()
tag = {tag!r}
t0 = time.time()
cfg = PipelineConfig(
    changelog_path=os.path.join(wd, "log"),
    table_path=os.path.join(wd, "tbl-" + tag),
    checkpoint_dir=os.path.join(wd, "ck-" + tag),
    generation=1,
    num_buckets=16,
)
st = Pipeline(spark, cfg).run_batch()
wall = time.time() - t0
print(json.dumps({{"wall": wall, "upserts": st.upserts, "deletes": st.deletes}}))
"""


def leg(n_exec: int, exec_mb: int, wd: str, tag: str) -> dict:
    code = _CHILD.format(repo=REPO, n_exec=n_exec, exec_mb=exec_mb, wd=wd, tag=tag)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not line:
        raise RuntimeError(f"leg failed rc={out.returncode}: {out.stderr[-2000:]}")
    return json.loads(line[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes", default="2000000,8000000",
        help="comma-separated event counts; two sizes let the serial "
        "driver fraction (commit, planning, footers) be subtracted so "
        "the published number is the MARGINAL per-event efficiency",
    )
    ap.add_argument("--exec-mb", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--write", default=None, help="JSON artifact path")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    sys.path.insert(0, REPO)
    from delta_spark.session import build_session

    spark = build_session(cpus=8, app_name="lc_gen")
    spark.sparkContext.setLogLevel("ERROR")
    from delta_spark.changelog import spark_generate

    wds = {}
    for ev in sizes:
        wd = tempfile.mkdtemp(prefix=f"lc_probe_{ev}_", dir=base)
        spark_generate(spark, ev, os.path.join(wd, "log"), n_files=16, seed=42)
        wds[ev] = wd
    spark.stop()

    runs: dict[tuple[int, int], list[float]] = {}
    for i in range(args.repeats):  # interleaved: host noise hits all legs
        for ev in sizes:
            for n_exec in (1, 4):
                r = leg(n_exec, args.exec_mb, wds[ev], f"{n_exec}x-{i}")
                runs.setdefault((ev, n_exec), []).append(round(r["wall"], 3))
                print(
                    f"events {ev} leg {n_exec} run {i}: {r['wall']:.2f}s",
                    file=sys.stderr,
                )
    best = {k: min(v) for k, v in runs.items()}
    lo, hi = sizes[0], sizes[-1]
    out = {
        "sizes": sizes,
        "exec_mb": args.exec_mb,
        "walls": {f"{ev}ev_{ne}exec": runs[(ev, ne)] for ev, ne in runs},
        "eta_wall": {
            str(ev): round(best[(ev, 1)] / (4 * best[(ev, 4)]), 3) for ev in sizes
        },
        "note": (
            "separate executor JVMs (local-cluster[N,1,m]), 1 core + "
            "own heap each; interleaved best-of-%d; stride-pinned cores"
            % args.repeats
        ),
    }
    if len(sizes) >= 2:
        # marginal per-event cost with the serial fraction subtracted:
        # w_c = (T_c(hi) - T_c(lo)) / (hi - lo); eta_marginal = w_1/(4 w_4)
        w1 = (best[(hi, 1)] - best[(lo, 1)]) / (hi - lo)
        w4 = (best[(hi, 4)] - best[(lo, 4)]) / (hi - lo)
        out["marginal_us_per_event_1exec"] = round(w1 * 1e6, 3)
        out["marginal_us_per_event_4exec"] = round(w4 * 1e6, 3)
        out["eta_marginal_1_to_4"] = round(w1 / (4 * w4), 3)
    print(json.dumps(out))
    if args.write:
        with open(args.write, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
