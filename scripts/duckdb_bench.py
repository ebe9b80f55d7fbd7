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
import threading
import time

import duckdb

# Per-query wall cap (seconds; 0 = unlimited). At sf1 a handful of
# oracle formulations are unbounded where the Spark side is capped
# (e.g. uncapped shingle pair expansion vs HOT_GROUP_CAP), so the sf1
# compare runs with DUCKDB_BENCH_TIMEOUT_S set and records DNF rows.
TIMEOUT_S = float(os.environ.get("DUCKDB_BENCH_TIMEOUT_S", "0") or 0)


def run_sql(con, sql):
    """fetchall with the optional interrupt-based timeout. Returns
    (rows, timed_out).

    The timer callback checks a `done` flag before interrupting
    (ADVICE r6 #3): without it, a timer firing in the window between
    fetchall() returning and timer.cancel() would poison the connection
    and surface as a spurious InterruptException on the NEXT query's
    warm run — a false DNF.
    """
    if not TIMEOUT_S:
        return con.execute(sql).fetchall(), False
    done = threading.Event()

    def _interrupt():
        if not done.is_set():
            con.interrupt()

    timer = threading.Timer(TIMEOUT_S, _interrupt)
    timer.start()
    try:
        rows = con.execute(sql).fetchall()
        done.set()
        return rows, False
    except duckdb.InterruptException:
        return None, True
    except duckdb.Error as e:  # interrupt surfaces differently by version
        if "INTERRUPT" in str(e).upper():
            return None, True
        raise
    finally:
        done.set()
        timer.cancel()

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
        _, warm_dnf = run_sql(con, sql)  # warm (page cache, catalog)
        if warm_dnf:
            timings[name] = None
            print(f"# {name}: DNF (> {TIMEOUT_S:.0f}s)", file=sys.stderr)
            continue
        trials = []
        for _ in range(2):  # min-of-2 (bench.py uses min-of-4 since r9 —
            # that raise compensates HotSpot C2 warm-up, which DuckDB's
            # precompiled vectorized kernels don't have)
            t0 = time.perf_counter()
            rows, dnf = run_sql(con, sql)
            trials.append(None if dnf else time.perf_counter() - t0)
        if None in trials:
            timings[name] = None
            print(f"# {name}: DNF (> {TIMEOUT_S:.0f}s)", file=sys.stderr)
            continue
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
        _, warm_dnf = run_sql(con, sql)
        if warm_dnf:
            iterative[name] = None
            print(f"# {name}: DNF (> {TIMEOUT_S:.0f}s)", file=sys.stderr)
            continue
        trials = []
        for _ in range(2):
            t0 = time.perf_counter()
            _, dnf = run_sql(con, sql)
            trials.append(None if dnf else time.perf_counter() - t0)
        if None in trials:
            iterative[name] = None
            print(f"# {name}: DNF (> {TIMEOUT_S:.0f}s)", file=sys.stderr)
            continue
        iterative[name] = round(min(trials), 3)
        print(f"# {name}: {iterative[name]:.3f}s (iterative)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_query_set_wall",
                "value": round(
                    sum(v for v in timings.values() if v is not None), 3
                ),
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
