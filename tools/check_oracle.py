"""Driver-style correctness check: run every __spark_entry__ query on Spark
and its oracle on DuckDB, compare row count + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_prefix...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def canon(df_pandas):
    """Sort columns by name, canonicalize values, sort rows."""
    import pandas as pd
    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)

    def norm(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if hasattr(v, "isoformat"):
            return v.isoformat().replace("+00:00", "")
        return str(v)

    rows = sorted(tuple(norm(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:] or None

    import duckdb

    import __spark_entry__ as E
    from redactify_spark.plans.session import build_session

    spark = build_session("oracle-check", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(ddf)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duckdb={len(b)}")
            n_fail += 1
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(a)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
