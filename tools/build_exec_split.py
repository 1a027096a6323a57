"""Split each registered query's wall time into BUILD (the Python/py4j
DataFrame-construction call, `spec.fn`) and EXEC (the noop-sink action)
so construction-dominated queries are identifiable at a glance — the
r10 lever behind the server-side expression-assembly commits (guide
§1.2: measure where the time goes before touching anything).

Run:  python tools/build_exec_split.py <sf_dir> [query ...]
Env:  SPLIT_RUNS (default 2) — passes; the LAST pass is reported
      (steady state: codegen + Python-worker startup amortized).
Output: per-query "build exec total" sorted by build share, plus a
JSON blob on the last line for downstream tooling.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_spark import get_spark
from crane_spark.queries import REGISTRY


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or list(REGISTRY)
    runs = int(os.environ.get("SPLIT_RUNS", "2"))
    spark = get_spark("build_exec_split")
    spark.sparkContext.setLogLevel("ERROR")
    # session warm-up: any registered query serves (ADVICE r10 — a
    # hard-coded name breaks if that entry is ever renamed)
    warm = names[0] if names else next(iter(REGISTRY))
    REGISTRY[warm].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        build = exec_ = 0.0
        for _ in range(runs):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            build, exec_ = t1 - t0, t2 - t1
            gc.collect()
        out[name] = {
            "build": round(build, 3),
            "exec": round(exec_, 3),
            "total": round(build + exec_, 3),
        }
        print(
            f"{name:36s} build={build:6.2f}s exec={exec_:6.2f}s",
            flush=True,
        )

    ranked = sorted(out.items(), key=lambda kv: -kv[1]["build"])
    print("\n== top build-time queries ==")
    for name, d in ranked[:25]:
        share = d["build"] / max(d["total"], 1e-9)
        print(f"{d['build']:6.2f}s build ({share:4.0%} of {d['total']:6.2f}s)  {name}")
    tb = sum(d["build"] for d in out.values())
    te = sum(d["exec"] for d in out.values())
    print(f"\nTOTAL build={tb:.1f}s exec={te:.1f}s over {len(out)} queries")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
