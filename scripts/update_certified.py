"""Print the DRIVER_CERTIFIED delta for a new driver correctness artifact.

Usage: python scripts/update_certified.py CORRECTNESS_r04.json

Reads the driver artifact, reports which queries earned a green row
(rows+schema+hash all matching, or rows+schema for registered rows-only
entries) that are not yet in ``__spark_entry__.DRIVER_CERTIFIED``, and
which went red (must be LEFT OUT so they re-enter the next round's
prefix). Paste the printed names into the DRIVER_CERTIFIED literal —
the mechanical step round 3 forgot (VERDICT r3 "What's wrong" #3),
never to be forgotten again.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    artifact = json.load(open(sys.argv[1]))
    oracles = entrymod.oracle_sql()

    green, red = [], []
    for name, row in artifact.items():
        if row.get("err"):
            red.append((name, f"err: {row['err']}"))
            continue
        ok = row.get("rows_match") and row.get("schema_match")
        if name in oracles:
            ok = ok and row.get("hash_match")
        if ok:
            green.append(name)
        else:
            red.append(
                (
                    name,
                    f"rows={row.get('rows_match')} schema={row.get('schema_match')} "
                    f"hash={row.get('hash_match')}",
                )
            )

    new = sorted(n for n in green if n not in entrymod.DRIVER_CERTIFIED)
    print(f"# artifact rows: {len(artifact)}  green: {len(green)}  red: {len(red)}")
    if red:
        print("# RED (keep OUT of DRIVER_CERTIFIED so they re-enter the prefix):")
        for name, why in red:
            print(f"#   {name}: {why}")
    if not new:
        print("# no new names to append")
        return 0
    print("# append to DRIVER_CERTIFIED in __spark_entry__.py:")
    for name in new:
        print(f'        "{name}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
