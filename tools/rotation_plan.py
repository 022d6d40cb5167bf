"""Print the attestation-rotation plan: which registered queries have
never appeared in any ``CORRECTNESS_r*.json`` (the external gate's
per-round 50-query sample), and a suggested next ``_ATTESTATION_FRONT``
of up to 50 oracle-bearing never-attested names.

The registry front-loads ``plans/registry.py:_ATTESTATION_FRONT`` so the
external gate's first-50 sample rotates each round; this tool makes the
re-derivation mechanical. Rows-only queries (no oracle) are listed but
not suggested — the driver's check for them is weaker, so oracle-bearing
queries spend the sample budget better.

Usage: python tools/rotation_plan.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    attested: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        attested |= set(json.load(open(f)).keys())

    from nyc_taxi_etl_pyspark_spark.plans.registry import (
        _ATTESTATION_FRONT,
        all_oracle_sql,
        all_queries,
    )

    names = list(all_queries())
    oracles = set(all_oracle_sql())
    never = [n for n in names if n not in attested]
    never_oracle = [n for n in never if n in oracles]
    never_rows_only = [n for n in never if n not in oracles]

    print(f"registered: {len(names)}  ever-attested: {len(attested & set(names))}")
    print(f"never attested: {len(never)} ({len(never_oracle)} with oracle)")
    cur_unattested = [n for n in _ATTESTATION_FRONT if n not in attested]
    print(
        f"current front: {len(_ATTESTATION_FRONT)} names, "
        f"{len(cur_unattested)} still awaiting attestation"
    )
    # suggestion: keep current-front names that are STILL unattested
    # (the driver may not have run yet this round), then fill with the
    # remaining never-attested oracle queries in registration order,
    # then (once the oracle-bearing tail is short — the ledger-closing
    # endgame) the never-attested rows-only queries: their driver check
    # is weaker (rows>0) but one external attestation each still beats
    # none
    suggest = cur_unattested + [
        n for n in never_oracle if n not in set(cur_unattested)
    ]
    if len(suggest) < 50:
        suggest += [n for n in never_rows_only if n not in set(suggest)]
    print("\nsuggested next _ATTESTATION_FRONT (≤50):")
    for n in suggest[:50]:
        print(f'    "{n}",')
    if never_rows_only:
        print(f"\nrows-only never-attested ({len(never_rows_only)}, not suggested):")
        for n in never_rows_only:
            print(f"    {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
