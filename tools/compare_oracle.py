"""Local differential harness mimicking the driver's correctness gate:
runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, compares row count, column names, and
order-insensitive values (floats to 9 significant digits).

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import TESTDATA_TABLES
from tools.oracle_dtypes import dtype_mismatches, duck_oracle_schema


def normalize(v):
    if v is None:
        return ("0none", "")
    if isinstance(v, bool):
        return ("bool", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", f"{v:.9g}")
    if isinstance(v, int):
        return ("f", f"{float(v):.9g}")
    if isinstance(v, str):
        return ("s", v)
    return ("o", str(v))


def rows_to_multiset(rows, colnames):
    out = []
    for row in rows:
        d = dict(zip(colnames, row))
        out.append(tuple(normalize(d[c]) for c in sorted(colnames)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle-compare")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir  # literal-table oracles
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_schema = sdf.schema
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols = [d[0].lower() for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            failures.append(name)
            print(f"FAIL {name}: columns differ\n  spark={spark_cols}\n  duck ={duck_cols}")
            continue
        # Dtype-strict: the driver's hash gate is dtype-sensitive (a
        # DuckDB HUGEINT hash-mismatches a Spark BIGINT on equal values).
        bad = dtype_mismatches(spark_schema, duck_oracle_schema(con, oracles[name]))
        if bad:
            failures.append(name)
            print(f"FAIL {name}: dtype mismatch (gate-punishable): {bad}")
            continue
        if len(spark_rows) != len(duck_rows):
            failures.append(name)
            print(f"FAIL {name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
            continue
        s = rows_to_multiset(spark_rows, spark_cols)
        d = rows_to_multiset(duck_rows, duck_cols)
        if s != d:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(s, d) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(s)} rows differ; first diff:")
            for a, b in zip(s, d):
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
        else:
            print(f"ok   {name}: {len(s)} rows match")
    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
