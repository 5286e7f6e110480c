"""Driver-verification rotation canary.

The driver checks ~50 queries per round in `queries()` dict order;
`__spark_entry__._ordered_specs` queues never-verified queries first so
every registered query eventually earns a green CORRECTNESS row. These
asserts keep that rotation honest across refactors:

- a rename/delete must not orphan a name that only exists in old
  CORRECTNESS artifacts (the registry would silently stop re-verifying
  its replacement while the judge still counts the old row);
- the pending set must actually be ordered first;
- the pending backlog must fit one driver window, so "every query is
  driver-verified" stays reachable within a round of adding queries.
"""

from __future__ import annotations

DRIVER_WINDOW = 50  # queries the driver checks per round


def _entry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as e

    return e


def test_no_orphaned_verified_names():
    e = _entry()
    registered = set(e.all_queries())
    orphans = e._driver_verified() - registered
    assert not orphans, (
        f"names with driver-green rows no longer in the registry: "
        f"{sorted(orphans)} — renamed or deleted without a successor"
    )


def test_pending_ordered_first():
    e = _entry()
    verified = e._driver_verified()
    names = list(e._ordered_specs())
    seen_verified = False
    for n in names:
        if n in verified:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"pending query {n!r} ordered after a verified one — "
                "the driver's check window may never reach it"
            )


def test_pending_fits_driver_window():
    e = _entry()
    pending = set(e.all_queries()) - e._driver_verified()
    assert len(pending) <= DRIVER_WINDOW, (
        f"{len(pending)} never-driver-verified queries exceed the "
        f"~{DRIVER_WINDOW}-query per-round window; stop adding queries "
        "until the rotation clears"
    )
