#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule: ≥0.8 from N
to 4N executors). No real cluster exists in the sandbox, so we run the
SAME replay job on the SAME pre-generated input at two parallelism
levels (local[8] vs local[32], fresh JVM each) and report throughput
at both plus η = (T_N/T_4N)/4 ... expressed as
η = (throughput_4N / throughput_N) / 4.

Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(cpus: int, log_dir: str, events: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "replay_once.py"),
            "--cpus", str(cpus),
            "--events", str(events),
            "--log-dir", log_dir,
            "--buckets", "64",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_lo = int(os.environ.get("SCALE_N", "8"))
    n_hi = int(os.environ.get("SCALE_4N", "32"))
    events = int(os.environ.get("SCALE_EVENTS", "400000"))

    with tempfile.TemporaryDirectory(prefix="scaling_log_") as d:
        # generate the input ONCE so both runs see identical bytes
        sys.path.insert(0, REPO)
        from delta_spark.changelog import ChangelogSpec, generate_and_write

        log_dir = os.path.join(d, "log")
        df = generate_and_write(
            log_dir,
            ChangelogSpec(
                n_events=events, n_convs=max(200, events // 100), seed=42, n_files=64
            ),
        )
        total = len(df)
        lo = run(n_lo, log_dir, total)
        hi = run(n_hi, log_dir, total)

    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (n_hi / n_lo)
    result = {
        "events": total,
        f"local[{n_lo}]": lo,
        f"local[{n_hi}]": hi,
        "scaling_factor": n_hi / n_lo,
        "speedup": round(hi["events_per_sec"] / lo["events_per_sec"], 3),
        "efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — CDC replay scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox evidence (no real cluster): the same replay job on
the same pre-generated changelog at two parallelism levels, fresh JVM
each.

| config | events | wall (s) | events/sec |
|---|---|---|---|
| local[{n_lo}] | {total} | {lo['sec']} | {lo['events_per_sec']} |
| local[{n_hi}] | {total} | {hi['sec']} | {hi['events_per_sec']} |

- speedup {n_lo}->{n_hi} cores: **{result['speedup']}x** (ideal {n_hi // n_lo}x)
- scaling efficiency η = (thr_4N / thr_N) / 4 = **{result['efficiency']}**

Replay = read changelog parquet -> dedup by seq -> LWW collapse
(map-side combinable aggregate) -> seq-guarded MERGE into the
hash-bucketed lake table (64 buckets) -> snapshot commit + lineage.

Reproduce: `python bench/scaling.py` (env: SCALE_N, SCALE_4N,
SCALE_EVENTS).
"""
        )


if __name__ == "__main__":
    main()
