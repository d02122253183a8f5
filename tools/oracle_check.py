#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()[name]`` from ``__spark_entry__`` on Spark and the
matching ``oracle_sql()[name]`` on DuckDB (same parquet tables registered
as views), then compares row count, column names, and values
order-insensitively (columns sorted by name, rows sorted, floats compared
both exactly and with tolerance so we can see HOW far off a mismatch is).

Usage:
    python3 tools/oracle_check.py [--sf DIR] [name-substring ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def canon_cell(v):
    if v is None:
        return ("none",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return ("arr",) + tuple(canon_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date
        return ("t", v.isoformat())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", float(v))
    except Exception:
        pass
    return (type(v).__name__, v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def cells_close(a, b, rtol=1e-9, atol=1e-9):
    if a == b:
        return True
    if a[0] == "f" and b[0] == "f":
        return math.isclose(a[1], b[1], rel_tol=rtol, abs_tol=atol)
    if a[0] == "arr" and b[0] == "arr" and len(a) == len(b):
        return all(cells_close(x, y, rtol, atol) for x, y in zip(a[1:], b[1:]))
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("filters", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from uts_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{args.sf}/{name}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [
        n for n in qs
        if not args.filters or any(f in n for f in args.filters)
    ]

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {str(ex).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {str(ex).splitlines()[0][:200]}")
            n_fail += 1
            continue

        ok = True
        msgs = []
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"row count: spark={len(srows)} oracle={len(orows)}")
        if ok:
            _, s_c = canon_rows(scols, srows)
            _, o_c = canon_rows(ocols, orows)
            exact = s_c == o_c
            if not exact:
                close = len(s_c) == len(o_c) and all(
                    all(cells_close(a, b) for a, b in zip(rs, ro))
                    for rs, ro in zip(s_c, o_c)
                )
                if close:
                    msgs.append("NOT exact but within 1e-9 tolerance — hash would MISMATCH")
                    ok = False
                else:
                    diffs = [
                        (rs, ro) for rs, ro in zip(s_c, o_c) if rs != ro
                    ][:3]
                    msgs.append(f"values differ, e.g. {diffs}")
                    ok = False
        if ok:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only / {len(names)} checked")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
