#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB against an sf dir — the baseline leg
of the bench comparison (the reference publishes no numbers, so the
bar is the same queries on the same parquet in a strong single-node
engine).

Usage: python3 tools/oracle_bench.py <sfDir> <oracle_sql.json> [threads]
Prints one JSON line: {"total": sec, "queries": {name: sec}}.
"""
import json
import sys
import time

import duckdb


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    times = {}
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 - report, keep timing others
            print(f"[oracle_bench] {name} failed: {e}", file=sys.stderr)
            times[name] = -1.0
    total = round(sum(v for v in times.values() if v >= 0), 1)
    print(json.dumps({"total": total, "queries": times}))


if __name__ == "__main__":
    main()
