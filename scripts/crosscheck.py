"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, schema (column names), and order-insensitive values.

Usage: python scripts/crosscheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """pandas DataFrame -> canonical sorted list of row tuples."""
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{v:.9g}")
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            else:
                row.append(repr(v))
        rows.append(tuple(row))
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from logpipe.session import get_spark

    spark = get_spark(app_name="crosscheck", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {str(ex)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only check, {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            failed.append(name)
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} duckdb={sorted(exp.columns)}")
            failed.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount spark={len(got)} duckdb={len(exp)}")
            failed.append(name)
            continue
        ng, ne = normalize(got), normalize(exp)
        if ng != ne:
            diff = [(a, b) for a, b in zip(ng, ne) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            failed.append(name)
            continue
        print(f"PASS {name}: {len(got)} rows")
    print()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all passed")


if __name__ == "__main__":
    main()
