"""Dump .explain("formatted") for named queries into a directory.

Usage: python scripts/capture_plans.py OUT_DIR SUFFIX query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query, built at sf0.01
(plan shape, pushdown and join strategy do not depend on the scale
factor; AQE-final shapes are pinned by tests instead). Round-13
before/after plan artifacts under plans/r13/ are produced by this
script — run it from a worktree at the round-baseline commit for the
"before" files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beametrics_spark import plans  # noqa: E402
from beametrics_spark.registry import load_all  # noqa: E402
from beametrics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    qs = load_all()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        print(f"known: {', '.join(sorted(qs))}", file=sys.stderr)
        return 2
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn, _ = qs[name]
        df = fn(spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plans.formatted_plan(df).strip() + "\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
