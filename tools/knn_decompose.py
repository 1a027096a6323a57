"""Decompose knn_graph_topk's job/stage budget by pipeline phase:
run each phase of the exact query (same parameters as the registered
entry) and report the delta in job/stage counts after each phase
boundary, using the status REST API. Walls are ambient-sensitive; the
counts are deterministic — the r10 measurement discipline.

Run: python tools/knn_decompose.py <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crane_spark import get_spark
from crane_spark.tables import table


def api(base, path):
    with urllib.request.urlopen(base + path) as fh:
        return json.load(fh)


def main() -> int:
    sf_dir = sys.argv[1]
    spark = get_spark("knn_decompose", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{spark.sparkContext.applicationId}"

    from crane_spark.llm.graph_ann import (
        graph_search_topk,
        knn_graph_build,
        normalized_vectors,
    )

    marks = []

    def mark(label):
        jobs = api(base, "/jobs")
        stages = api(base, "/stages")
        marks.append((label, len(jobs), len(stages), time.perf_counter()))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for rep in range(2):
        t0 = time.perf_counter()
        mark(f"[{rep}] start")
        emb = table(spark, sf_dir, "embeddings")
        nv = normalized_vectors(emb)
        mark(f"[{rep}] nv ckpt")
        stats = nv.agg(F.min("vec_id"), F.max("vec_id"), F.count(F.lit(1))).first()
        mark(f"[{rep}] stats")
        edges = knn_graph_build(emb, k=6, n_iter=1, prenormalized=nv, id_stats=stats)
        mark(f"[{rep}] build returns (lazy)")
        noop(edges)
        mark(f"[{rep}] edges materialized")
        queries = emb.filter(F.col("vec_id") < 5)
        res = graph_search_topk(
            queries, emb, edges, k=3, beam=12, hops=2, prenormalized=nv,
            id_stats=stats,
        )
        mark(f"[{rep}] search built")
        noop(res)
        mark(f"[{rep}] search materialized")
        prev = None
        for label, j, s, t in marks:
            if prev is not None:
                print(
                    f"{label:32s} +jobs {j - prev[1]:3d}  +stages {s - prev[2]:3d}"
                    f"  +wall {t - prev[3]:6.2f}s   (cum jobs {j})"
                )
            prev = (label, j, s, t)
        print(f"[{rep}] total wall {time.perf_counter() - t0:.2f}s")
        marks.clear()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
