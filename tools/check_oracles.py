"""Local mirror of the driver's CORRECTNESS gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row-count + schema + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64").round(6)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6g").encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry
    from mias_spark.session import get_spark

    spark = get_spark(cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    qs, osql = entry.queries(), entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in osql:
            print(f"okro {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.execute(osql[name]).df()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        g, x = normalize(got), normalize(exp)
        if list(g.columns) != list(x.columns):
            fails.append(name)
            print(f"FAIL {name}: schema {list(g.columns)} vs {list(x.columns)}")
            continue
        if len(g) != len(x):
            fails.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            continue
        if value_hash(g) != value_hash(x):
            fails.append(name)
            diff = (g != x).any(axis=1)
            print(f"FAIL {name}: value hash; first diffs:")
            print(" spark:", g[diff].head(3).to_dict("records"))
            print(" duck :", x[diff].head(3).to_dict("records"))
            continue
        print(f"ok   {name}: {len(g)} rows")
    print(f"\n{len(qs) - len(fails)}/{len(qs)} matched")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
