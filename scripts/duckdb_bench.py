"""Time each bench query's DuckDB oracle SQL at a given scale factor.

DuckDB is the informal single-node baseline (BASELINE.md: the reference
publishes no numbers). This records the per-query seconds the judge
compares BENCH_r{N}.json against, so bench tuning targets real numbers
measured on this machine rather than guesses.

Usage: python scripts/duckdb_bench.py [sf_dir] > BENCH_DUCKDB.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import BENCH_QUERIES, ITERATIVE_QUERIES  # noqa: E402
from beametrics_spark.sources import TABLES  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = entrymod.oracle_sql()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in oracles:
            print(f"# {name}: no oracle (skipped)", file=sys.stderr)
            continue
        sql = oracles[name]
        con.execute(sql).fetchall()  # warm (page cache, catalog)
        trials = []
        for _ in range(2):  # min-of-2, mirroring bench.py's methodology
            t0 = time.perf_counter()
            rows = con.execute(sql).fetchall()
            trials.append(time.perf_counter() - t0)
        timings[name] = round(min(trials), 3)
        print(f"# {name}: {timings[name]:.3f}s ({len(rows)} rows)", file=sys.stderr)

    # Iterative workloads (pagerank: 5 unrolled CTE iterations;
    # dedup_clusters: recursive-CTE transitive closure) — reported
    # separately, mirroring bench.py's iterative_queries section.
    iterative: dict[str, float] = {}
    for name in ITERATIVE_QUERIES:
        if name not in oracles:
            continue
        sql = oracles[name]
        con.execute(sql).fetchall()
        trials = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            trials.append(time.perf_counter() - t0)
        iterative[name] = round(min(trials), 3)
        print(f"# {name}: {iterative[name]:.3f}s (iterative)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_query_set_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "iterative_queries": iterative,
                "sf": os.path.basename(sf_dir.rstrip("/")).replace("sf", ""),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
