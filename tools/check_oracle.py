"""Local differential checker mirroring the driver's correctness gate.

For each query in ``__spark_entry__.queries()``: run the Spark DataFrame
and the DuckDB oracle on the same sf dir, then compare row count, sorted
column names, and the order-insensitive multiset of normalized values.

Gate queries (the first 50 in registration order — the set the driver
attests in CORRECTNESS_r{N}.json) are compared in STRICT mode: Decimal
never collapses to float, there is no float tolerance path, and the
query FAILS if its Spark result schema carries any output type outside
the proven-hash-stable set (double / int types / string / date /
timestamp / boolean / binary / arrays thereof). This is the round-7
lesson: the driver's value hash is TYPE-sensitive, and a local mirror
that is more lenient than the gate invites silent regressions (q74
emitted DECIMAL columns with bit-identical values and failed the gate
while this checker passed it).

Past-cap queries keep the tolerant comparator, but a float near-miss
(< 1e-9 rel) is still reported as CLOSE and counted as a failure —
it only affects the printed diagnosis, never the exit code.

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

GATE_SIZE = 50

# Output dtypes allowed to cross the driver gate (prefix match for
# parametrized types); DECIMAL is deliberately absent.
_GATE_OK_DTYPES = (
    "double",
    "float",
    "bigint",
    "int",
    "smallint",
    "tinyint",
    "string",
    "date",
    "timestamp",
    "boolean",
    "binary",
    "array",
    "struct",
    "map",
)


def _dtype_gate_ok(dtype: str) -> bool:
    d = dtype.strip().lower()
    if d.startswith("decimal"):
        return False
    if d.startswith(("array<", "struct<", "map<")):
        # element types must also be clean
        return "decimal" not in d
    return d.startswith(_GATE_OK_DTYPES)


def normalize(v, strict: bool = False):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        if strict:
            # Keep decimals distinct from floats, normalized so that
            # scale-only differences (1.50 vs 1.5) still agree.
            return ("dec", format(v.normalize(), "f"))
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
        return tuple(normalize(x, strict) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    return str(v)


def row_key(row_dict, cols, strict: bool = False):
    return tuple(normalize(row_dict[c], strict) for c in cols)


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
    ap.add_argument(
        "--no-strict-gate",
        action="store_true",
        help="disable strict (type-sensitive) comparison for gate queries",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from data_pipeline_demo_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = e.queries()
    oracles = e.oracle_sql()
    gate_set = set(list(qs)[:GATE_SIZE])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.queries or sorted(qs)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        strict = name in gate_set and not args.no_strict_gate
        tag = "GATE " if strict else ""
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sdtypes = dict(sdf.dtypes)
            s_ms = [row_key(r.asDict(), scols, strict) for r in srows]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if strict:
            print(
                f"dtype {name}: "
                + ", ".join(f"{c}:{sdtypes[c]}" for c in scols)
            )
            bad_types = [c for c in scols if not _dtype_gate_ok(sdtypes[c])]
            if bad_types:
                print(
                    f"FAIL  {name}: gate-unsafe output dtypes "
                    f"{[(c, sdtypes[c]) for c in bad_types]} — the driver "
                    "hash is type-sensitive; final-cast to double/bigint/"
                    "string/date/timestamp"
                )
                n_fail += 1
                continue
        if name not in oracles:
            print(f"rows  {tag}{name}: {len(srows)} rows (no oracle — rows-only)")
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
            row_key(dict(zip(dcols_raw, r)), dcols, strict) for r in drows
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
            print(f"PASS  {tag}{name}: {len(s_ms)} rows  ({took:.1f}s)")
            n_pass += 1
        elif not strict and rows_close(s_sorted, d_sorted):
            print(f"CLOSE {name}: {len(s_ms)} rows — float-only drift (<1e-9)")
            for a, b in zip(s_sorted, d_sorted):
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
            n_fail += 1
        else:
            print(f"FAIL  {tag}{name}: value mismatch ({len(s_ms)} rows)")
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
