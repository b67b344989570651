"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from walker_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    return v


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        # progress-bar \r output interleaves with the ok lines and makes
        # log greps undercount
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        dt_spark = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, {dt_spark:.1f}s)")
            if len(srows) == 0 and name != "dedup_exact_prefix":
                print(f"      WARNING: empty result")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        ok_vals = ok_cols and ok_n and rows_key(scols, srows) == rows_key(dcols, drows)
        status = "ok" if (ok_cols and ok_n and ok_vals) else "FAIL"
        print(
            f"{status:5} {name}: spark {len(srows)} rows / duckdb {len(drows)} rows"
            f" cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
            f" vals={'=' if ok_vals else 'MISMATCH'} ({dt_spark:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_n:
                sk, dk = rows_key(scols, srows), rows_key(dcols, drows)
                for a, b in zip(sk, dk):
                    if a != b:
                        print(f"      spark : {a}\n      duckdb: {b}")
                        break
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
