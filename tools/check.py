#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare each Verify
parquet dump against the paired DuckDB oracle SQL (sorted columns,
sorted rows, exact value equality). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), sorted(data, key=lambda t: tuple(repr(x) for x in t))


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            stypes = dict(r[:2] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{files[0]}')").fetchall())
            otypes = dict(r[:2] for r in con.execute(
                f"DESCRIBE {sql}").fetchall())
            scols, srows = rows_of(con.execute(
                f"SELECT * FROM read_parquet('{files[0]}')"))
            ocols, orows = rows_of(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs oracle {ocols}")
            n_fail += 1
            continue
        badtypes = {c: (stypes[c], otypes[c]) for c in scols
                    if stypes.get(c) != otypes.get(c)}
        if badtypes:
            print(f"WARN {name}: type mismatches {badtypes}")
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs oracle {len(orows)}")
            print(f"  spark[:3]={srows[:3]}\n  oracle[:3]={orows[:3]}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows))
               if not eq(a, b)]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"  cols   = {scols}")
            print(f"  spark  = {a}")
            print(f"  oracle = {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
