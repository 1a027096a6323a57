"""Per-query profiling harness for the optimization rounds: run each
named registered query into the noop sink in ONE session and report,
per run, wall seconds + job count + stage count + task count + shuffle
read/write bytes from Spark's status REST API (UI numbers without the
UI). Matched-session best-of-N so variants compare apples-to-apples.

Run:  python tools/profile_queries.py <sf_dir> <query> [query ...]
Env:  PROFILE_RUNS (default 3) — passes per query; first is reported
      separately as the cold pass.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_spark import get_spark
from crane_spark.queries import REGISTRY


def api(base: str, path: str):
    with urllib.request.urlopen(base + path) as fh:
        return json.load(fh)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("profile_queries", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{spark.sparkContext.applicationId}"

    # codegen/session warmup
    REGISTRY["q6_revenue_forecast"].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    results: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        per_run = []
        for r in range(runs):
            group = f"prof-{name}-{r}"
            spark.sparkContext.setJobGroup(group, name)
            start = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - start
            spark.sparkContext.setJobGroup(None, None)
            jobs = [j for j in api(base, "/jobs") if j.get("jobGroup") == group]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            n_tasks = sum(j.get("numCompletedTasks", 0) for j in jobs)
            sread = swrite = 0
            for sid in stage_ids:
                try:
                    for att in api(base, f"/stages/{sid}"):
                        sread += att.get("shuffleReadBytes", 0)
                        swrite += att.get("shuffleWriteBytes", 0)
                except Exception:
                    pass
            per_run.append(
                {
                    "wall": round(wall, 3),
                    "jobs": len(jobs),
                    "stages": len(stage_ids),
                    "tasks": n_tasks,
                    "shuffle_read_mb": round(sread / 1e6, 2),
                    "shuffle_write_mb": round(swrite / 1e6, 2),
                }
            )
            gc.collect()
        results[name] = {
            "cold": per_run[0],
            "best_warm": min(per_run[1:], key=lambda d: d["wall"])
            if len(per_run) > 1
            else None,
            "runs": per_run,
        }
        w = results[name]["best_warm"] or per_run[0]
        print(
            f"{name:32s} cold={per_run[0]['wall']:6.2f}s "
            f"warm={w['wall']:6.2f}s jobs={w['jobs']:3d} stages={w['stages']:3d} "
            f"tasks={w['tasks']:5d} shW={w['shuffle_write_mb']:8.2f}MB",
            flush=True,
        )
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
