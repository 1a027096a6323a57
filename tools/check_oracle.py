"""Differential check: run every registered query in Spark AND DuckDB,
compare row count, column names, and values exactly.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_spark import get_spark
from crane_spark.queries import REGISTRY
from crane_spark.queries.core import ROWS_ONLY_ANCHORS
from crane_spark.testing import diff_frames, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        # fail BEFORE any Spark work, on stdout: a typo'd name under
        # `2>/dev/null` otherwise dies as an invisible KeyError after
        # the valid names ran, reading like a passed sweep
        print(f"unknown query names (not in REGISTRY): {unknown}")
        return 2
    spark = get_spark("check_oracle")
    con = duck_connection(sf_dir)
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if spec.sql is None:
            anchor = ROWS_ONLY_ANCHORS.get(name)
            if anchor is None:
                failures += 1
                print(f"FAIL  {name}: rows-only with NO declared anchor")
            else:
                print(
                    f"ok    {name}: rows-only ({len(spark_pdf)} rows)"
                    f" [anchored by {anchor}]"
                )
            continue
        try:
            duck_pdf = con.execute(spec.sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = diff_frames(spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name} ({len(spark_pdf)} rows)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
