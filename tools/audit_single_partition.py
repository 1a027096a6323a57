"""Audit every registered query's physical plan for single-partition
exchanges — the repeatable version of the manual WindowExec sweep that
round 3 ran at sf1.

`Exchange SinglePartition` is how an unpartitioned global sort, global
window, or global limit-by-sort lands in a physical plan: one task
processes every row that reaches it. That is EXPECTED when the input
is aggregate-sized or k-row-bounded (a top-20 rank window, a final
1-row summary, ntile over an orders table pinned by the oracle
contract) and a scale-killer when the input grows with the corpus.

The audit cannot know the semantic bound, so it reports every query
whose plan contains the node along with the immediate child operator,
and asserts the set matches the reviewed ALLOWLIST below. A new query
that introduces a global exchange fails the audit until a human either
re-plans it (dense_index, TakeOrdered, bounded frame) or classifies it
here with a justification.

Run: python tools/audit_single_partition.py [sf_dir]
Exit 0 = every flagged query is allowlisted and every allowlisted
query still flags (stale entries fail too, so the list never rots).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_spark import get_spark
from crane_spark.queries import REGISTRY

# Benign-by-construction child patterns (input to the exchange is
# bounded regardless of data size):
#  - a PARTIAL global aggregate with no keys: the exchange carries one
#    partial row per upstream task, never data rows;
#  - a 1-row Range frame (literal summary assembly);
#  - WindowGroupLimit: Spark's rank-limit pushdown caps rows to k per
#    partition BEFORE the exchange, so the global window sees at most
#    k * tasks rows.
_BENIGN = (
    re.compile(r"(Object|Sort)?HashAggregate\(keys=\[\], functions=\[partial_"),
    re.compile(r"Range \(0, 1,"),
    re.compile(r"WindowGroupLimit"),
)

# query -> why its non-benign single-partition exchange is
# semantically bounded (reviewed; everything else in the registry is
# either exchange-free or matches a _BENIGN pattern). The two former
# data-sized entries (equidepth_histogram, curriculum_order ntile
# windows) were re-planned in round 5 onto operators.indexing
# .exact_ntile — range-bucketed parallel rank + literal boundary
# arithmetic, bit-identical to ANSI ntile — so only the three
# aggregate-/calendar-bounded frames remain.
ALLOWLIST: dict[str, str] = {
    "error_rate_spikes": (
        "global frame over per-HOUR aggregate rows - calendar-bounded "
        "input (hours, not events)"
    ),
    "ks_drift_sources": (
        "cumsum over the value-space aggregate (distinct 1e-9-grid "
        "values) - distribution-sized, not corpus-sized"
    ),
    "orders_mom_growth": (
        "lag over per-MONTH aggregate rows - calendar-bounded input"
    ),
}


DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    if not os.path.isdir(sf_dir):
        print(f"fixture dir not found: {sf_dir} (set SPARK_GRAFT_AUDIT_SF_DIR)")
        return 3
    spark = get_spark("audit_single_partition")
    spark.sparkContext.setLogLevel("ERROR")
    flagged: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        try:
            plan = spec.fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            return 2
        if "Exchange SinglePartition" in plan:
            lines = plan.splitlines()
            ctxs = [
                lines[i + 1].strip()
                for i, ln in enumerate(lines)
                if "Exchange SinglePartition" in ln and i + 1 < len(lines)
            ]
            bad = [
                c for c in ctxs if not any(p.search(c) for p in _BENIGN)
            ]
            if bad:
                flagged[name] = re.sub(r"#\d+L?", "", bad[0])[:80]
    unexpected = sorted(set(flagged) - set(ALLOWLIST))
    stale = sorted(set(ALLOWLIST) - set(flagged))
    for name in sorted(flagged):
        mark = "ok " if name in ALLOWLIST else "NEW"
        print(f"{mark}  {name}: {flagged[name]}")
    if unexpected:
        print(f"\nUNEXPECTED single-partition exchanges: {unexpected}")
    if stale:
        print(f"\nSTALE allowlist entries (no longer flag): {stale}")
    print(f"\n{len(flagged)} flagged / {len(REGISTRY)} queries")
    return 1 if (unexpected or stale) else 0


if __name__ == "__main__":
    raise SystemExit(main())
