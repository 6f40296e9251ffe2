#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle, compare row count, schema width and
order-insensitive values.

Usage: python scripts/check_oracle.py [--sf DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(df):
    """Sort columns by name, round floats, stringify, sort rows."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(4)
        # unify timestamp precision/None repr
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.floor("us")
        df[c] = df[c].astype(str)
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb

    import tdengine_spark.queries_extra  # noqa: F401  (self-registers)
    import tdengine_spark.queries_pipeline  # noqa: F401  (self-registers)
    from tdengine_spark.queries import REGISTRY
    from tdengine_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{name}.parquet')"
        )

    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = n_rowsonly = 0
    for name, query in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = query.spark_fn(spark, args.sf).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if not query.oracle:
            print(f"rows-only  {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(query.oracle).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            n_fail += 1
            continue
        srows, orows = normalize(sdf), normalize(odf)
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1
        elif srows != orows:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
