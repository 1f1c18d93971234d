"""Warm scorer throughput at N vs 4N executor PROCESSES (local-cluster).

The north rule's two-cluster-size criterion, measured at the stage that
carries ~90% of pipeline compute (Arrow-UDF pairwise scoring), across real
process boundaries:

* each level runs `local-cluster[n_exec, cores_per_exec, 3072]` in a fresh
  subprocess — separate executor JVMs, each with its own python UDF
  workers, shuffles crossing processes;
* the process tree is taskset-pinned to exactly
  ``n_exec * cores_per_exec + 1`` CPUs: the +1 absorbs the driver JVM so
  the EXECUTOR core count is exactly N vs 4N at both levels (the north
  rule scales executors; the driver is constant infrastructure — without
  the correction the driver steals a different fraction of the pinned set
  at each level);
* per level the scorer runs ``reps+1`` times over the SAME materialized
  candidate-pair parquet; the first run is discarded (python worker
  fork + numpy first-touch page faults — this VM's documented pathology)
  and the fastest remaining run is kept;
* levels are interleaved (N, 4N, N, 4N) across outer repetitions so
  hypervisor co-tenancy drift cannot systematically favor one level.

Writes the result table into BENCH/LOCAL_CLUSTER.md (warm-scorer section)
and prints one JSON line.

Env knobs: WARM_SCALE_EXECS="1,4" WARM_SCALE_EXEC_CORES=2
WARM_SCALE_REPS=2 WARM_SCALE_OUTER=2 SCALE_BENCH_ENTITIES=10000.
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
import json, sys, time
sys.path.insert(0, {repo!r})
from name_matching_spark.session import get_spark
from name_matching_spark.model.train import load_artifacts
from name_matching_spark.operators.scoring import score_pairs
from pyspark.sql import functions as F

n_exec = int(sys.argv[1]); cores = int(sys.argv[2])
pairs_path = sys.argv[3]; reps = int(sys.argv[4])
total_cores = n_exec * cores
extra = {{
    "spark.executorEnv.PYTHONPATH": {repo!r},
    "spark.executorEnv.MALLOC_MMAP_THRESHOLD_": "1073741824",
    "spark.executorEnv.MALLOC_TRIM_THRESHOLD_": "1073741824",
    "spark.executorEnv.MALLOC_ARENA_MAX": "2",
    "spark.executor.memory": "3g",
    "spark.python.worker.reuse": "true",
}}
spark = get_spark(
    app_name=f"nms-warm-{{n_exec}}x{{cores}}",
    master=f"local-cluster[{{n_exec}},{{cores}},3072]",
    shuffle_partitions=2 * total_cores,
    extra_conf=extra,
)
spark.sparkContext.setLogLevel("ERROR")
model, tfidf = load_artifacts()
pairs = spark.read.parquet(pairs_path).repartition(2 * total_cores)
pairs = pairs.localCheckpoint()  # input resident on executors, scan cost off the clock
n_pairs = pairs.count()
times = []
for i in range(reps + 1):
    t0 = time.time()
    out = score_pairs(pairs, model.to_json(), tfidf.to_json(), threshold=0.85)
    out.where(F.col("prediction") == 1).count()
    times.append(time.time() - t0)
# times[0] is the warm-up (python worker fork + first-touch); drop it
best = min(times[1:])
print("RESULT " + json.dumps({{
    "n_exec": n_exec, "cores_per_exec": cores, "pairs": n_pairs,
    "warmup_sec": round(times[0], 2), "runs_sec": [round(t, 2) for t in times[1:]],
    "best_sec": round(best, 2), "pairs_per_sec": round(n_pairs / best, 1),
}}))
spark.stop()
"""


def run_level(n_exec: int, cores: int, pairs_path: str, reps: int) -> dict:
    script = WORKER.format(repo=REPO)
    cmd = [sys.executable, "-c", script, str(n_exec), str(cores), pairs_path, str(reps)]
    if shutil.which("taskset"):
        # executors get exactly n_exec*cores CPUs; +1 CPU hosts the driver
        cmd = ["taskset", "-c", f"0-{n_exec * cores}"] + cmd
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker[{n_exec}x{cores}] failed after {time.time() - t0:.0f}s:\n"
        f"{proc.stderr[-3000:]}"
    )


def main() -> None:
    from name_matching_spark.datagen import write_fixture
    from name_matching_spark.pipeline import EntityResolutionPipeline
    from name_matching_spark.session import get_spark

    n_entities = int(os.environ.get("SCALE_BENCH_ENTITIES", "10000"))
    execs = [int(x) for x in os.environ.get("WARM_SCALE_EXECS", "1,4").split(",")]
    cores = int(os.environ.get("WARM_SCALE_EXEC_CORES", "2"))
    reps = int(os.environ.get("WARM_SCALE_REPS", "2"))
    outer = int(os.environ.get("WARM_SCALE_OUTER", "2"))

    fixture = os.path.join(REPO, "data", f"bench_transcripts_e{n_entities}")
    if not os.path.exists(os.path.join(fixture, "transcripts.parquet")):
        write_fixture(fixture, n_entities=n_entities, convs_per_entity=5, seed=42)
    pairs_path = os.path.join(REPO, "data", f"bench_pairs_e{n_entities}")
    if not os.path.exists(pairs_path):
        # materialize the candidate pairs ONCE (blocking is not under test)
        import tempfile

        spark = get_spark(app_name="nms-warm-prep", master="local[16]")
        wh = tempfile.mkdtemp(prefix="nms_warm_prep_")
        try:
            pipe = EntityResolutionPipeline(spark, wh)
            transcripts = spark.read.parquet(
                os.path.join(fixture, "transcripts.parquet")
            )
            pipe.run(transcripts)
            pipe.ckpt.read("candidate_pairs").select("name_x", "name_y").write.parquet(
                pairs_path
            )
        finally:
            shutil.rmtree(wh, ignore_errors=True)
            spark.stop()

    best: dict[int, dict] = {}
    for _ in range(outer):
        for n in execs:  # interleaved: N, 4N, N, 4N
            r = run_level(n, cores, pairs_path, reps)
            if n not in best or r["best_sec"] < best[n]["best_sec"]:
                best[n] = r
    results = [best[n] for n in execs]
    lo, hi = results[0], results[-1]
    factor = (hi["n_exec"] * hi["cores_per_exec"]) / (
        lo["n_exec"] * lo["cores_per_exec"]
    )
    eff = (hi["pairs_per_sec"] / lo["pairs_per_sec"]) / factor

    section = [
        "",
        "## Warm scorer, N vs 4N executor JVMs (reproducible: scripts/warm_scaling_bench.py)",
        "",
        "Same materialized candidate-pair table, separate executor processes",
        f"(`local-cluster[N,{cores},3072]`), process tree pinned to",
        f"`N*{cores}+1` CPUs — the +1 hosts the driver JVM at BOTH levels so the",
        "executor core count is exactly N vs 4N (driver-CPU-share correction).",
        "First run per level discarded (worker fork + first-touch page",
        "faults); fastest warm run kept; levels interleaved across",
        f"{outer} repetitions.",
        "",
        "| executors | exec cores | pairs | warm-up sec | best warm sec | pairs/sec |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        section.append(
            f"| {r['n_exec']} | {r['n_exec'] * r['cores_per_exec']} | {r['pairs']} "
            f"| {r['warmup_sec']} | {r['best_sec']} | {r['pairs_per_sec']} |"
        )
    section += [
        "",
        f"**Warm multi-executor scaling efficiency: {eff:.3f}**  "
        f"( = (thr@{hi['n_exec']} / thr@{lo['n_exec']}) / {factor:.0f} )",
        "",
    ]
    path = os.path.join(REPO, "BENCH", "LOCAL_CLUSTER.md")
    marker = "## Warm scorer, N vs 4N executor JVMs"
    existing = ""
    if os.path.exists(path):
        with open(path) as f:
            existing = f.read()
        if marker in existing:  # replace the previous warm section
            existing = existing[: existing.index(marker)].rstrip() + "\n"
    with open(path, "w") as f:
        f.write(existing + "\n".join(section))
    print(json.dumps({
        "execs": execs,
        "throughput": [r["pairs_per_sec"] for r in results],
        "efficiency": round(eff, 3),
        "written": path,
    }))


if __name__ == "__main__":
    main()
