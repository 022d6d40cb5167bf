"""Derive the attestation-rotation window: which registered queries the
external gate's per-round first-50 sample should front-load, and why.

The registry front-loads ``plans/registry.py:_ATTESTATION_FRONT`` so the
external gate's 50-query sample rotates each round; this tool makes the
re-derivation mechanical and the provenance a committed artifact.

Policy (round 13+, the post-ledger-closing regime — every registered
query already carries ≥1 external attestation, so the goal shifts from
COVERAGE to bounded STALENESS):

1. never-attested queries first (i.e. queries registered since the last
   driver run), oracle-bearing before rows-only — a new query must never
   wait a round for its first external check;
2. then every other query ordered by LAST-ATTESTED ROUND ascending
   (oldest external check first), registration order as tie-break.

With 50 slots per round over ~257 queries this bounds attestation
staleness at ~5 rounds for every query.

Wording precision (round-13 advice item 8): "attested" here means
SAMPLED by the external gate — the CORRECTNESS_r*.json record exists,
pass or fail. It is NOT a cumulative zero-failure claim: the ledger
contains one historical miss (q_winsorize, round 2, hash mismatch —
fixed that round and re-attested passing in every sample since). The
per-round pass/fail truth is always the CORRECTNESS file itself.

Usage:
    python tools/rotation_plan.py            # print the derivation
    python tools/rotation_plan.py --emit 13  # also write ROTATION_r13.json
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def derive() -> dict:
    last_attested: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for k in json.load(open(f)):
            last_attested[k] = max(last_attested.get(k, 0), rnd)

    from nyc_taxi_etl_pyspark_spark.plans.registry import (
        _ATTESTATION_FRONT,
        all_oracle_sql,
        all_queries_registration_order,
    )

    names = list(all_queries_registration_order())
    reg_pos = {n: i for i, n in enumerate(names)}
    oracles = set(all_oracle_sql())

    never = [n for n in names if n not in last_attested]
    never_oracle = [n for n in never if n in oracles]
    never_rows_only = [n for n in never if n not in oracles]
    # oldest external check first; registration order breaks ties
    stale_order = sorted(
        (n for n in names if n in last_attested),
        key=lambda n: (last_attested[n], reg_pos[n]),
    )
    window = (never_oracle + never_rows_only + stale_order)[:WINDOW]
    return {
        "names": names,
        "oracles": oracles,
        "last_attested": last_attested,
        "never": never,
        "never_oracle": never_oracle,
        "never_rows_only": never_rows_only,
        "window": window,
        "current_front": list(_ATTESTATION_FRONT),
    }


def main() -> int:
    emit_round = None
    if "--emit" in sys.argv:
        emit_round = int(sys.argv[sys.argv.index("--emit") + 1])
    d = derive()
    names, last = d["names"], d["last_attested"]

    print(
        f"registered: {len(names)}  "
        f"ever-attested: {len(set(last) & set(names))}"
    )
    print(
        f"never attested: {len(d['never'])} "
        f"({len(d['never_oracle'])} with oracle)"
    )
    by_round: dict[int, int] = {}
    for n in names:
        if n in last:
            by_round[last[n]] = by_round.get(last[n], 0) + 1
    print("staleness (last-attested round -> #queries):",
          dict(sorted(by_round.items())))
    print(f"\nsuggested next _ATTESTATION_FRONT ({len(d['window'])}):")
    for n in d["window"]:
        print(f'    "{n}",')

    if emit_round is not None:
        window_in_front = [
            n for n in d["window"] if n in set(d["current_front"])
        ]
        out = {
            "round": emit_round,
            "registered": len(names),
            "policy": (
                "post-ledger-closing staleness bound: never-attested "
                "first (oracle-bearing before rows-only), then "
                "last-attested round ascending (oldest external check "
                "first), registration-order tie-break; 50-slot window "
                "bounds staleness at ~ceil(registered/50) rounds"
            ),
            "never_attested": d["never"],
            "note": (
                "'attested' = sampled by the external gate (record "
                "exists, pass or fail) — not a cumulative zero-failure "
                "claim; the ledger's one historical miss is "
                "q_winsorize r02 (hash), fixed same round, passing in "
                "every sample since"
            ),
            "staleness_by_round": {
                str(k): v for k, v in sorted(by_round.items())
            },
            f"window_r{emit_round}": d["window"],
            "window_matches_registry_front": (
                d["window"] == d["current_front"]
            ),
            "counts": {
                "window": len(d["window"]),
                "window_oracle_bearing": len(
                    [n for n in d["window"] if n in d["oracles"]]
                ),
                "window_already_in_front": len(window_in_front),
            },
        }
        path = os.path.join(REPO, f"ROTATION_r{emit_round}.json")
        json.dump(out, open(path, "w"), indent=1)
        print(f"\nwrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
