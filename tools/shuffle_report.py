"""Measured shuffle-byte scaling for the headline queries.

Shuffle bytes are THE cluster-scale bottleneck: a plan whose wall-clock
looks linear on local[32] can still hide a shuffle that grows faster
than the data and saturates the network fabric at 1000 executors. This
tool runs each headline query into the noop sink at several sf rungs
with a per-(query, rung) job group, then reads the per-stage
shuffle-write totals from Spark's own status REST API (the same
numbers the UI shows) and reports bytes + per-decade growth factors.

The claims this verifies are the ones the plan guards assert
structurally (tests/test_plans.py) but cannot QUANTIFY:

* broadcast-join queries shuffle only their final aggregate rows
  (q5: dimension tables never hit the wire);
* candidate-pair joins shuffle bare ids, not array payloads
  (prefix_jaccard_join: bytes per candidate ~ 2 ids + overhead);
* aggregate-fed window re-plans shuffle cell offsets, not data rows
  (window_analytics, pack_by_budget);
* map-side combine keeps token aggregates vocabulary-bounded
  (wordcount, dup_span_ranges).

Run: python tools/shuffle_report.py      (splices its section into SCALE.md)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTION_HEADER = "## Shuffle-byte scaling (measured)"

# query -> (declared shuffle shape, expected growth note)
SHUFFLE_SET: dict[str, str] = {
    "q1_pricing_summary": "partial-agg rows only (4 groups x partitions): flat",
    "q5_local_supplier_volume": "broadcast dims; final nation group-by only: flat",
    "q18_large_volume": "fact-fact join: linear in matching orders",
    "wordcount": "map-side-combined token partials: vocab-bounded",
    "minhash_lsh_pairs": "band signatures + bucket pairs: linear in docs",
    "prefix_jaccard_join": "bare-id candidate pairs: candidate-bounded",
    "copurchase_pairs": "basket pair fan-out: linear in baskets",
    "dup_span_ranges": "gram hash agg + pruned hits: linear in tokens",
    "dedup_clusters": "LSH pairs + CC rounds: linear in docs",
    "window_analytics": "exact_rank cell offsets from AGGREGATE rows: nation-bounded",
    "pack_by_budget": "doc rows once into (source, range-bucket) cells + offsets: linear, skew-bounded",
    "trigram_lm_quality": "(doc, trigram) pair partials: linear in docs x ~900 alphabet-bounded trigrams (r8 decomposition corrected the old 'distinct trigrams' note)",
}


def _rungs() -> list[tuple[str, str]]:
    rungs = [
        ("/root/testdata/sf0.01", "sf0.01"),
        ("/root/testdata/sf0.1", "sf0.1"),
    ]
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/crane_sf1")
    if os.path.exists(sf1):
        rungs.append((sf1, "sf1"))
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/crane_sf10")
    if os.path.exists(sf10):
        rungs.append((sf10, "sf10"))
    return rungs


def _group_stage_totals(sc, tag: str) -> dict[str, int]:
    """Per-metric totals over all COMPLETE stages whose jobs ran under
    job group `tag` (read from the status REST API; stage ids are
    deduped so AQE retries/attempts never double-count)."""
    base, app = sc.uiWebUrl, sc.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        jobs = json.load(r)
    stage_ids: set[int] = set()
    for j in jobs:
        if j.get("jobGroup") == tag:
            stage_ids.update(j["stageIds"])
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    totals = {"shuffleWriteBytes": 0, "diskBytesSpilled": 0, "memoryBytesSpilled": 0}
    seen: set[int] = set()
    for s in stages:
        sid = s["stageId"]
        if sid in stage_ids and sid not in seen and s["status"] == "COMPLETE":
            seen.add(sid)
            for k in totals:
                totals[k] += s[k]
    return totals


def _group_shuffle_bytes(sc, tag: str) -> int:
    """Total shuffle-write bytes for job group `tag` (the CI guards'
    metric; see _group_stage_totals for the full set)."""
    return _group_stage_totals(sc, tag)["shuffleWriteBytes"]


def _fmt(b: int | None) -> str:
    if b is None:
        return "—"
    if b < 1_000_000:
        return f"{b / 1e3:.0f} KB"
    return f"{b / 1e6:.1f} MB"


def shuffle_section(spark) -> list[str]:
    """Measure SHUFFLE_SET across the available rungs and return the
    SCALE.md section lines. Requires a session with the UI enabled
    (spark.ui.enabled=true) — raises loudly otherwise rather than
    reporting zeros."""
    from crane_spark.queries import REGISTRY

    sc = spark.sparkContext
    if not sc.uiWebUrl:
        raise RuntimeError(
            "shuffle_report needs spark.ui.enabled=true (the status REST "
            "API is the metrics source) — build the session with "
            "extra_conf={'spark.ui.enabled': 'true'}"
        )
    rungs = _rungs()
    rows: list[tuple[str, list[int | None]]] = []
    spills: list[str] = []
    for name in SHUFFLE_SET:
        vals: list[int | None] = []
        for sf_dir, label in rungs:
            tag = f"shufrep:{name}@{label}"
            sc.setJobGroup(tag, tag)
            try:
                REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)
            t = _group_stage_totals(sc, tag)
            vals.append(t["shuffleWriteBytes"])
            if t["diskBytesSpilled"] or t["memoryBytesSpilled"]:
                spills.append(
                    f"{name}@{label}: disk {_fmt(t['diskBytesSpilled'])}, "
                    f"memory {_fmt(t['memoryBytesSpilled'])}"
                )
        rows.append((name, vals))

    labels = [label for _, label in rungs]
    head = " | ".join(f"{lb} shuffle" for lb in labels)
    factors = " | ".join(
        f"x10-{i + 1}" for i in range(len(labels) - 1)
    )
    lines = [
        "",
        SECTION_HEADER,
        "",
        "Per-query total shuffle-WRITE bytes (all stages, noop sink),",
        "read from Spark's status store — the number that hits the wire",
        "on a real cluster. Wall-clock hides a growing shuffle behind",
        "local-machine memory bandwidth; bytes do not. Each `x10-N` is",
        "the byte growth per 10x data step: a query whose shuffle is",
        "aggregate-bounded must stay ~flat, a linear one must stay at or",
        "under ~10.",
        "",
        f"| query | shuffle contents (declared) | {head} | {factors} |",
        "|---" * (2 + len(labels) + len(labels) - 1) + "|",
    ]
    for name, vals in rows:
        cells = [_fmt(v) for v in vals]
        fs = []
        for i in range(len(vals) - 1):
            a, b = vals[i], vals[i + 1]
            # growth on a near-zero base is dispatch noise, not data
            fs.append(f"{b / a:.1f}" if a and a >= 50_000 else "—")
        lines.append(
            f"| {name} | {SHUFFLE_SET[name]} | "
            + " | ".join(cells)
            + " | "
            + " | ".join(fs)
            + " |"
        )
    lines += [
        "",
        "Reading: the broadcast-join and aggregate-fed plans hold flat or",
        "vocabulary-bounded shuffles while inputs grow 100x — those queries'",
        "network cost at 1000 executors is the final aggregate, not the data.",
        "Linear-shuffle queries (joins, pair generation) track the data",
        "volume, which partitions away by executor count. Factors on a",
        "< 50 KB base are suppressed (dispatch-noise, not data).",
        "",
        "Two measured artifacts worth naming (both plan-probed):",
        "* q1's sf0.01/sf0.1 bytes are the `fan_out` bootstrap repartition —",
        "  the driver-written single-row-group parquet gets one RoundRobin",
        "  exchange to reach 32-way parallelism; the multi-row-group sf1/sf10",
        "  files scan in place and q1 drops to pure partial-agg rows (37 KB",
        "  at sf1). At 100 TB every table has row groups; the bootstrap",
        "  exchange is a toy-rung artifact, not a scale cost.",
        "* q18's sf0.1 -> sf1 step (~36x) is a map-side-combine CLUSTERING",
        "  effect, not plan growth: the testdata parquet is orderkey-",
        "  clustered so per-order lineitem partials collapse before the",
        "  exchange; make_sfn's round-robin-written sf1 destroys that",
        "  clustering and partials stop combining. Same plan at both rungs,",
        "  both joins BHJ (probed) — physical layout is the lever (see the",
        "  Z-order section in TUNING.md). The sf1 -> sf10 step (16.2) adds",
        "  the justified size-based flip: the HAVING-result side outgrows the",
        "  broadcast threshold and one join becomes SortMergeJoin (probed) —",
        "  an unbounded set must stop broadcasting somewhere, and the extra",
        "  bytes are that side's shuffle, linear from here on.",
    ]
    if spills:
        lines += [
            "",
            "Stages that SPILLED during these runs (partition sizing watch",
            "list — spill is the other cluster-scale killer):",
        ] + [f"* {s}" for s in spills] + [
            "",
            "Spill attribution (r7, per-stage REST metrics + knob sweep):",
            "both spilling queries funnel a pair fan-out through a distinct/",
            "group-by — prefix_jaccard's two candidate-dedup stages buffer",
            "172M id pairs across 32 reducers (~530 MB in-memory per task)",
            "and spill exactly there; every other stage of every query is",
            "spill-free. Raising the reducer count does NOT help on one",
            "machine: shuffle.partitions=256 and AQE initialPartitionNum=256",
            "both INCREASED spill and wall time (copurchase 32.7 s -> 43.3 /",
            "112.2 s; shuffle bytes ~constant) because local[32] has fixed",
            "aggregate memory and one disk — more partitions just fragment",
            "the same budget. On a real cluster the same stages get more",
            "executors and therefore more aggregate memory (TUNING.md's",
            "sizing mapping); the spill path is the correct local behavior,",
            "completes within the declared growth shapes, and is bounded by",
            "the candidate count the prefix filter already minimizes.",
            "",
            "r9 update: copurchase_pairs left this list — its saturated-",
            "keyspace pair count was re-planned (packed 64-bit key + a",
            "width gated to ~8 MB of scan input per task, targeted at the",
            "one spilling stage instead of the r7 sweep's GLOBAL partition",
            "raise that fragmented every stage's budget at once): sf10",
            "spill 606 MB -> 0, wall ~20 -> ~14.8 s (SCALE.md r9 section).",
        ]
    else:
        lines += [
            "",
            "Zero spill: no stage of any query at any rung spilled to disk",
            "or memory during these runs — partitions are sized inside",
            "executor memory through sf10 (see TUNING.md's",
            "maxPartitionBytes/shuffle.partitions mapping).",
        ]
    return lines


def splice_into_scale(lines: list[str]) -> None:
    """Replace (or insert) the shuffle section in SCALE.md, keeping the
    rest of the file byte-identical."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    with open(path) as f:
        content = f.read().splitlines()
    out: list[str] = []
    i = 0
    replaced = False
    while i < len(content):
        if content[i] == SECTION_HEADER:
            # skip the old section: header + body up to the next "## "
            j = i + 1
            while j < len(content) and not content[j].startswith("## "):
                j += 1
            # drop one leading blank we emit ourselves
            while out and out[-1] == "":
                out.pop()
            out.extend(lines)
            out.append("")
            i = j
            replaced = True
            continue
        out.append(content[i])
        i += 1
    if not replaced:
        out.extend(lines)
    with open(path, "w") as f:
        f.write("\n".join(out).rstrip("\n") + "\n")


def main() -> int:
    from crane_spark.session import get_spark

    spark = get_spark(
        "shuffle_report",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    lines = shuffle_section(spark)
    splice_into_scale(lines)
    print("\n".join(lines))
    print("\nSCALE.md updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
