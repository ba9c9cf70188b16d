"""Mechanical enforcement of the driver-window rotation guarantee.

The driver records correctness rows for only the FIRST 50 registry
entries each round (observed contract, COVERAGE.md "Driver CORRECTNESS
window").  The repo's standing promise is that no registered query goes
more than two rounds without a driver row.  Until r6 that promise lived
only in prose and a hand-ordered tuple; these tests make it red/green:

- every registered query that lacks a row in the MOST RECENT committed
  ``CORRECTNESS_r*.json`` must sit inside the first 50 positions of the
  current registry order (so it is guaranteed a row next round);
- the registry must not exceed 100 queries — with a 50-row window, two
  consecutive windows can cover at most 100, so growth past that breaks
  the guarantee silently no matter how the tuple is ordered.

No Spark session needed: this is pure registry-order + JSON parsing.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50
SUSTAINABLE_MAX = 2 * WINDOW


def _correctness_rounds() -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        data = json.loads(p.read_text())
        if isinstance(data, dict):
            out[int(m.group(1))] = set(data.keys())
    return out


def _registry_order() -> list[str]:
    from homelogging_spark.plans.registry import QUERIES

    return list(QUERIES.keys())


def test_registry_size_sustainable():
    order = _registry_order()
    assert len(order) <= SUSTAINABLE_MAX, (
        f"{len(order)} registered queries > {SUSTAINABLE_MAX}: a {WINDOW}-row "
        "driver window cannot give every query a row within 2 rounds. "
        "Consolidate near-duplicate queries or widen the window "
        "(COVERAGE.md 'Registry growth policy')."
    )


def test_no_query_goes_two_rounds_stale():
    rounds = _correctness_rounds()
    assert rounds, "no committed CORRECTNESS_r*.json found"
    latest = rounds[max(rounds)]
    order = _registry_order()
    must_be_windowed = [q for q in order if q not in latest]
    late = [
        (q, order.index(q)) for q in must_be_windowed if order.index(q) >= WINDOW
    ]
    assert not late, (
        "queries without a driver row from the latest recorded round sit "
        f"past the {WINDOW}-row window and would go 2+ rounds stale: {late}. "
        "Move them into the head of _DRIVER_WINDOW_PRIORITY."
    )


def test_priority_tuple_covers_registry_exactly():
    # the tuple IS the registry order — a query missing from it would be
    # appended at the tail silently; a stale name raises at import, but
    # pin both directions here for a clear failure message.
    from homelogging_spark.plans.registry import _DRIVER_WINDOW_PRIORITY

    order = _registry_order()
    assert list(_DRIVER_WINDOW_PRIORITY) == order[: len(_DRIVER_WINDOW_PRIORITY)]
    missing = set(order) - set(_DRIVER_WINDOW_PRIORITY)
    assert not missing, (
        f"queries not listed in _DRIVER_WINDOW_PRIORITY (tail-appended "
        f"implicitly, rotation unmanaged): {sorted(missing)}"
    )
