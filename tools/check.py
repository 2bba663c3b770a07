#!/usr/bin/env python3
"""Local correctness loop (mimics the driver's DuckDB-oracle compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran
  2. registers each /root/testdata table as a DuckDB view
  3. runs each oracle_sql.json entry, compares vs the parquet dump:
     columns sorted by name, rows sorted, exact value equality
     (NaN-safe), with a small report per query.

Driver-side tooling only — NOT part of the shipped library.

CAVEAT — this mirror is MORE tolerant than the real driver: norm()
tuple-izes list/ndarray cells and the sort is str-keyed, so a query
that emits an ARRAY/MAP/STRUCT column passes here but dies in the
driver's pandas sort_values ("unhashable type: numpy.ndarray", see
v18 in CORRECTNESS_r07). graft.Verify now rejects nested-typed output
columns up front (exit 2), so a green Verify run is the real contract;
treat any nested-column pass from this script as suspect.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple(norm(v) for v in tup))
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return df.columns.tolist(), rows


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # pandas Timestamp / numpy types -> canonical python
    try:
        import numpy as np
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
    except ImportError:
        pass
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # HUGEINT guard (VERDICT r12 item 2): DuckDB SUM(BIGINT) returns
    # HUGEINT, which pandas widens to float64 while Spark emits int64 —
    # the driver's dtype-sensitive hash then mismatches on values that
    # are identical (the t52/q35 class). DESCRIBE every oracle and fail
    # on any HUGEINT/UHUGEINT output column so the class can't recur;
    # authors must cast (`SUM(x)::BIGINT AS ...`).
    for name, sql in sorted(oracle.items()):
        try:
            types = con.execute(f"DESCRIBE {sql}").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: describe error: {str(e)[:200]}")
            n_fail += 1
            continue
        huge = [(r["column_name"], r["column_type"])
                for _, r in types.iterrows()
                if "HUGEINT" in str(r["column_type"]).upper()]
        if huge:
            print(f"FAIL {name}: uncast HUGEINT output column(s) {huge} — "
                  "cast to BIGINT in the oracle SQL")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows = canon(con, sql)
            scols, srows = canon(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
        elif orows != srows:
            diff = [(a, b) for a, b in zip(orows, srows) if a != b]
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}"
                  f" first-diffs={diff[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
