"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark at sf0.01 and its oracle_sql() on DuckDB, compare row count,
schema width and an order-insensitive value hash over name-sorted columns.

Usage: python scripts/check_entry.py [name_filter ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v) -> str:
    import math
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(rows, cols) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    filters = sys.argv[1:]
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs, os_ = E.queries(), E.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            n_s, h_s = frame_hash(rows, cols)
        except Exception as e:
            print(f"FAIL  {name:<32} spark error: {e}")
            bad += 1
            continue
        if name not in os_:
            print(f"ROWS  {name:<32} spark_rows={n_s} (no oracle)")
            continue
        try:
            res = con.sql(os_[name])
            o_cols = res.columns
            o_rows = res.fetchall()
            n_o, h_o = frame_hash(o_rows, o_cols)
        except Exception as e:
            print(f"FAIL  {name:<32} duckdb error: {e}")
            bad += 1
            continue
        ok = (n_s == n_o and h_s == h_o and sorted(cols) == sorted(o_cols))
        status = "OK  " if ok else "FAIL"
        if not ok:
            bad += 1
        print(f"{status}  {name:<32} rows {n_s}/{n_o} hash "
              f"{h_s}/{h_o} cols {sorted(cols) == sorted(o_cols)}")
        if not ok and n_s == n_o and sorted(cols) == sorted(o_cols):
            # show first differing line for debugging
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            a = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
            oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            b = sorted("|".join(norm_cell(r[i]) for i in oo) for r in o_rows)
            for x, y in zip(a, b):
                if x != y:
                    print(f"      spark: {x}\n      duck : {y}")
                    break
    print(f"\n{'ALL OK' if bad == 0 else f'{bad} FAILURES'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
