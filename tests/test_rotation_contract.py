"""The rotation contract, mechanized (r10): every live registry entry's
newest GREEN driver row must stay within the last three measured rounds,
and the driver only measures the first ~50 registered entries — so each
round's `_PRIORITY` must contain the whole cohort whose newest row is
exactly at the staleness limit.  This was hand-recomputed (and
hand-audited by the judge) every round; now the suite fails if a future
round forgets an entry, schedules a never-measured entry outside the
measured window, or has already let one go stale."""

from tools.rotation_audit import DRIVER_CAP, audit, newest_green_rounds


def test_rotation_contract_holds():
    record = audit()
    assert record["mandatory_missing_from_priority"] == []
    assert record["already_stale_beyond_contract"] == []
    assert record["never_measured_outside_window"] == []
    assert record["priority_size"] <= DRIVER_CAP
    # the cap must leave headroom for the mandatory cohort
    assert record["mandatory_count"] <= DRIVER_CAP


def test_priority_entries_registered_and_unique():
    import __spark_entry__ as e

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.queries_testdata import (
        ORACLES,
        QUERIES,
    )

    p = e._PRIORITY
    assert len(p) == len(set(p)), "duplicate names in _PRIORITY"
    missing = [n for n in p if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in the registry: {missing}"
    assert len(QUERIES) == len(ORACLES)  # zero rows-only registry
    # queries() must actually lead with _PRIORITY — the driver takes
    # the first ~50 in registration order
    assert list(e.queries())[: len(p)] == p


def test_newest_green_parser_sees_all_rounds():
    newest, latest, latest_rows = newest_green_rounds()
    assert latest >= 9  # r01-r09 recorded when this test was written
    assert len(newest) >= 140  # most of the registry has history
    # the auditor's hardcoded cap is self-checked inside audit() against
    # the newest artifact's row count; pin the raw observation here too
    assert latest_rows == DRIVER_CAP
