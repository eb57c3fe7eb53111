"""Local differential checker mirroring the driver's correctness gate.

For each query in ``__spark_entry__.queries()``: run the Spark DataFrame
and the DuckDB oracle on the same sf dir, then compare row count, sorted
column names, and the order-insensitive multiset of normalized values.
Strictly exact on values; float near-misses (< 1e-9 rel) are reported
separately so numeric-determinism bugs are distinguishable from logic bugs.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" "))
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    return str(v)


def row_key(row_dict, cols):
    return tuple(normalize(row_dict[c]) for c in cols)


def close(a, b):
    if a == b:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        if len(a) == len(b) == 2 and a[0] == "f" and b[0] == "f":
            x, y = a[1], b[1]
            if x == y:
                return True
            if any(math.isnan(v) for v in (x, y)):
                return math.isnan(x) and math.isnan(y)
            return abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
        if len(a) == len(b):
            return all(close(x, y) for x, y in zip(a, b))
    return False


def rows_close(a, b):
    return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from data_pipeline_demo_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.queries or sorted(qs)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            s_ms = [row_key(r.asDict(), scols) for r in srows]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            dcols_raw = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dcols = sorted(dcols_raw)
        d_ms = [
            row_key(dict(zip(dcols_raw, r)), dcols) for r in drows
        ]
        took = time.time() - t0
        if scols != dcols:
            print(f"FAIL  {name}: schema {scols} != {dcols}")
            n_fail += 1
            continue
        if len(s_ms) != len(d_ms):
            print(f"FAIL  {name}: rowcount {len(s_ms)} != {len(d_ms)}")
            n_fail += 1
            continue
        s_sorted, d_sorted = sorted(s_ms, key=repr), sorted(d_ms, key=repr)
        if s_sorted == d_sorted:
            print(f"PASS  {name}: {len(s_ms)} rows  ({took:.1f}s)")
            n_pass += 1
        elif rows_close(s_sorted, d_sorted):
            print(f"CLOSE {name}: {len(s_ms)} rows — float-only drift (<1e-9)")
            for a, b in zip(s_sorted, d_sorted):
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
            n_fail += 1
        else:
            print(f"FAIL  {name}: value mismatch ({len(s_ms)} rows)")
            shown = 0
            for a, b in zip(s_sorted, d_sorted):
                if a != b and shown < 3:
                    print(f"      spark={a}\n      duck ={b}")
                    shown += 1
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
