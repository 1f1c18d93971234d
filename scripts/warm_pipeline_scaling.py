"""WARM whole-pipeline scaling at N vs 4N pinned cores.

BENCH/BASELINE.md's contract metric (scoring-stage throughput) scales at
0.957; the WHOLE-pipeline number including per-run cold start measured
0.627 — this script separates the fixed per-JVM overhead (session
creation, first-job scheduling, python-worker fork + first-touch page
faults) from the steady-state pipeline cost a long-running deployment
actually pays.  Per level, ONE JVM runs the full pipeline ``reps+1``
times, each against a FRESH warehouse (so every stage recomputes — no
checkpoint resume), the first (cold) run is discarded, and the fastest
warm run is kept.  The process tree is taskset-pinned to exactly N CPUs.

Usage: python scripts/warm_pipeline_scaling.py  (env: WARM_PIPE_LEVELS
"2,8", WARM_PIPE_REPS 2, SCALE_BENCH_ENTITIES 10000)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from name_matching_spark.session import get_spark
from name_matching_spark.pipeline import EntityResolutionPipeline

cores = int(sys.argv[1]); fixture = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark(app_name=f"nms-warm-pipe-{{cores}}",
                  master=f"local[{{cores}}]", shuffle_partitions=2 * cores)
transcripts = spark.read.parquet(
    os.path.join(fixture, "transcripts.parquet")).localCheckpoint()
runs = []
pairs = None
for rep in range(reps + 1):
    wh = tempfile.mkdtemp(prefix=f"nms_warm_{{cores}}_{{rep}}_")
    try:
        t0 = time.time()
        pipe = EntityResolutionPipeline(spark, wh)
        stages = pipe.run(transcripts)
        # materialize the terminal table (the stage writer already ran
        # every upstream job; this is the driver-visible completion point)
        n_resolved = stages["resolved_conversations"].count()
        total = time.time() - t0
        if pairs is None:
            pairs = pipe.ckpt.read("scored_pairs").count()
        runs.append({{"total_sec": round(total, 2),
                      "stage_timings": pipe.timings,
                      "n_resolved": n_resolved}})
    finally:
        shutil.rmtree(wh, ignore_errors=True)
best = min(runs[1:], key=lambda r: r["total_sec"])  # discard cold run 0
print("RESULT " + json.dumps({{
    "cores": cores, "pairs_scored": pairs, "cold": runs[0],
    "warm_best": best, "all_warm": [r["total_sec"] for r in runs[1:]],
}}))
spark.stop()
"""


def run_level(cores: int, fixture: str, reps: int) -> dict:
    cmd = [sys.executable, "-c", WORKER.format(repo=REPO), str(cores), fixture, str(reps)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            out = json.loads(line[len("RESULT "):])
            out["wall_sec"] = round(time.time() - t0, 1)
            return out
    raise RuntimeError(
        f"level {cores} produced no RESULT\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    levels = [int(x) for x in os.environ.get("WARM_PIPE_LEVELS", "2,8").split(",")]
    reps = int(os.environ.get("WARM_PIPE_REPS", "2"))
    n_ent = int(os.environ.get("SCALE_BENCH_ENTITIES", "10000"))
    fixture = os.path.join(REPO, "data", f"bench_transcripts_e{n_ent}")
    results = {c: run_level(c, fixture, reps) for c in levels}
    lo, hi = min(levels), max(levels)
    thr = {
        c: results[c]["pairs_scored"] / results[c]["warm_best"]["total_sec"]
        for c in levels
    }
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    print(json.dumps({
        "levels": results,
        "warm_pipeline_pairs_per_sec": {c: round(t, 1) for c, t in thr.items()},
        "warm_pipeline_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
