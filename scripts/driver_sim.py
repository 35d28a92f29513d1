"""Simulates the driver's verify pass: smoke entry(), then run every
queries() entry at sf0.01 side-by-side with its oracle_sql() via DuckDB,
comparing row-count + column names + order-insensitive canonical values.

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from chroma_spark.registry import TABLES  # noqa: E402
from chroma_spark.session import get_spark  # noqa: E402


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    spark = get_spark("driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    t0 = time.time()
    edf = entrymod.entry(spark)
    rows = edf.collect()
    print(f"entry(): {len(rows)} rows, schema={[f.name for f in edf.schema.fields]} "
          f"({time.time() - t0:.1f}s)")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = [s for s in os.environ.get("DRIVER_SIM_ONLY", "").split(",") if s]
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and not any(s in name for s in only):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            acols = df.columns
            arows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(arows)} rows ({time.time() - t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ecols = [d[0] for d in res.description]
            erows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        a, e = normalize(arows, acols), normalize(erows, ecols)
        if sorted(acols) != sorted(ecols):
            print(f"FAIL  {name}: cols spark={sorted(acols)} duck={sorted(ecols)}")
            n_fail += 1
        elif a != e:
            diff = [(x, y) for x, y in zip(a, e) if x != y]
            print(f"FAIL  {name}: rows spark={len(a)} duck={len(e)}, "
                  f"first diffs: {diff[:2]}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(a)} rows ({time.time() - t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only @ {sf_dir}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
