"""Rotation-contract auditor for the driver-gate measurement cap.

The round driver executes only the first ~50 registered `queries()`
entries (the `_PRIORITY` list in `__spark_entry__.py` sets that order)
and records the results in `CORRECTNESS_r{N}.json`; the standing
contract is that every live registry entry's newest GREEN driver row
stays within the last three measured rounds.  Each round's mandatory
re-measure set is therefore the cohort whose newest green row is
exactly three rounds old — arithmetic that was previously recomputed
by hand every round (and audited by hand every verdict).  This tool
pins it:

    python tools/rotation_audit.py          # histogram + contract check

exits non-zero with a named cohort when the CURRENT `_PRIORITY` would
break the contract, and `tests/test_rotation_contract.py` runs the
same check in the suite so a future round cannot forget the rotation.

No Spark needed — it reads the CORRECTNESS_r*.json driver artifacts
and imports the registry.

BY-DESIGN RED WINDOW: the artifacts are globbed from the WORKING TREE,
so the moment a new round's CORRECTNESS_r{N}.json lands (committed or
not) this audit — and test_rotation_contract.py with it — fails until
`_PRIORITY` is rotated for round N+1.  That failure is the start-of-
round rotation reminder (its message names the exact mandatory
cohort), not a regression: a suite run that is green except for the
rotation contract on a tree carrying a fresh driver artifact is a
healthy tree awaiting its rotation commit.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CAP = 50


def newest_green_rounds(repo: str = REPO) -> tuple[dict[str, int], int, int]:
    """{entry name -> newest round with a fully green driver row} plus
    the latest recorded round number and that round's row count.
    Green = rows+schema matched and no error (a hash-bearing row also
    green when the hash matched — the driver omits hash_match for
    rows-only entries)."""
    newest: dict[str, int] = {}
    latest = 0
    latest_rows = 0
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        rows = json.load(open(f))
        if rnd > latest:
            latest, latest_rows = rnd, len(rows)
        for name, row in rows.items():
            green = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
            )
            if green and rnd > newest.get(name, 0):
                newest[name] = rnd
    return newest, latest, latest_rows


def audit(repo: str = REPO) -> dict:
    """Returns the audit record; raises AssertionError with a named
    cohort when the contract would break next round."""
    sys.path.insert(0, repo)
    import __spark_entry__ as entry_mod

    live = list(entry_mod.queries())
    priority = live[:DRIVER_CAP]
    newest, latest, latest_rows = newest_green_rounds(repo)

    # DRIVER_CAP is hardcoded (the driver's "first ~50" behavior);
    # self-check it against the observed row count of the newest
    # CORRECTNESS artifact — while the registry exceeds the cap the two
    # must match, so a silent driver-side cap change cannot drift the
    # auditor's arithmetic
    if latest and len(live) > DRIVER_CAP:
        assert latest_rows == DRIVER_CAP, (
            f"DRIVER_CAP={DRIVER_CAP} but the newest driver artifact "
            f"(round {latest}) recorded {latest_rows} rows — the driver's "
            "measurement cap changed; update DRIVER_CAP to match or the "
            "rotation arithmetic below is wrong"
        )

    hist: dict[int, int] = {}
    for n in live:
        hist[newest.get(n, 0)] = hist.get(newest.get(n, 0), 0) + 1

    # (a) the driver measures at most DRIVER_CAP entries — everything the
    # rotation depends on must sit inside that window
    # (b) a live entry with NO green row ever must be new this round:
    # it must be in the measured window
    never = [n for n in live if n not in newest and n not in priority]
    # (c) entries whose newest green row is already at the 3-round
    # staleness limit (latest - 2) fall out of contract unless measured
    # THIS round — they are the mandatory cohort
    mandatory = sorted(
        n for n in live if n in newest and newest[n] <= latest - 2
    )
    missed = [n for n in mandatory if n not in priority]
    # (d) an entry even staler than the limit means the contract is
    # ALREADY broken (a prior round missed it) — flag it loudest
    broken = sorted(n for n in live if n in newest and newest[n] < latest - 2)

    record = {
        "latest_recorded_round": latest,
        "live_entries": len(live),
        "newest_green_histogram": dict(sorted(hist.items())),
        "mandatory_cohort": mandatory,
        "mandatory_count": len(mandatory),
        "priority_size": len(priority),
        "slack": DRIVER_CAP - len(mandatory),
        "never_measured_outside_window": never,
        "mandatory_missing_from_priority": missed,
        "already_stale_beyond_contract": broken,
    }
    assert not broken, (
        f"contract ALREADY broken: {broken} have no green driver row in "
        f"the last 3 recorded rounds (newest {[newest[n] for n in broken]}, "
        f"latest {latest})"
    )
    assert not missed, (
        f"{len(missed)} mandatory entries (newest green row == round "
        f"{latest - 2}) are outside the first {DRIVER_CAP} registered "
        f"entries and would fall out of contract after the next driver "
        f"run: {missed} — EXPECTED at the start of a new round (the "
        f"round-{latest} driver artifact just landed): this is the "
        f"designed rotation reminder, not a regression; rotate "
        f"_PRIORITY in __spark_entry__.py to clear it"
    )
    assert not never, (
        f"live entries with no green driver row ever, not scheduled for "
        f"measurement: {never}"
    )
    return record


def main() -> None:
    record = audit()
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
