"""Differential check: run every registered query in Spark AND DuckDB,
compare row count, column names, and values exactly.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_spark import get_spark
from crane_spark.queries import REGISTRY
from crane_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype).startswith(("Int", "UInt")) or (
            pd.api.types.is_integer_dtype(df[c]) and df[c].isna().any()
        ):
            df[c] = df[c].astype("float64")  # nullable ints -> float (NaN for null)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
    # Sort on stringified values: robust to None/NaN mixtures in object
    # columns (identical frames stringify identically).
    order = df.astype(str).sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c]) or pd.api.types.is_float_dtype(d[c]):
            sv, dv = s[c].astype(float), d[c].astype(float)
            if not ((sv == dv) | (sv.isna() & dv.isna())).all():
                bad = (~((sv == dv) | (sv.isna() & dv.isna()))).idxmax()
                problems.append(f"float col {c} differs, e.g. row {bad}: {sv[bad]!r} vs {dv[bad]!r}")
        else:
            sv = s[c].astype(object).where(s[c].notna(), None)
            dv = d[c].astype(object).where(d[c].notna(), None)
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(f"col {c} differs, e.g. row {bad}: {s[c][bad]!r} vs {d[c][bad]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
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
            print(f"ok?   {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.execute(spec.sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name} ({len(spark_pdf)} rows)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
