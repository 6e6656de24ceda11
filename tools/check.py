#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (parquet per query) against the DuckDB oracle
SQL (oracle_sql.json), registering each testdata parquet as a view.
Compares: column names (sorted), arrow value TYPES (the driver's hash
compare is type-sensitive: DuckDB decimal128 vs Spark int64 is a FAIL
even when values agree — cast oracle aggregates explicitly), row
counts, and values (rows sorted, columns sorted by name, floats
rounded to 6 decimals).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, sorted(
        (tuple(canon(col[i]) for col in data) for i in range(table.num_rows)),
        key=lambda r: tuple((x is None, str(x)) for x in r))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no verify output ({e})")
            fail += 1
            continue
        try:
            want = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        gc, gr = rows_of(got)
        wc, wr = rows_of(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            fail += 1
            continue
        # Driver-hash semantics: python canonicalization makes integer
        # widths and float widths indistinguishable, but Decimal hashes
        # differently from int/float — keep decimal (and other exotic
        # types) distinct so q33-style HUGEINT mismatches fail locally.
        def nt(t):
            if t.startswith(("int", "uint")):
                return "int"
            if t in ("float", "double", "halffloat"):
                return "float"
            if t == "large_string":
                return "string"
            if t.startswith("timestamp"):
                return "timestamp"
            return t
        gt = [str(got.schema.field(c).type) for c in gc]
        wt = [str(want.schema.field(c).type) for c in wc]
        norm = lambda ts: [nt(t) for t in ts]
        if norm(gt) != norm(wt):
            print(f"FAIL {name}: column types {list(zip(gc, gt))} != "
                  f"{list(zip(wc, wt))}")
            fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; "
                  f"first at {i}:\n  spark={a}\n  duck ={b}\n  cols={gc}")
            fail += 1
            continue
        print(f"ok   {name} ({len(gr)} rows)")
        ok += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
