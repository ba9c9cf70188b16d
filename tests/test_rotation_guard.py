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


def _size_ok(n_queries: int) -> bool:
    return n_queries <= SUSTAINABLE_MAX


def test_registry_size_sustainable():
    order = _registry_order()
    assert _size_ok(len(order)), (
        f"{len(order)} registered queries > {SUSTAINABLE_MAX}: a {WINDOW}-row "
        "driver window cannot give every query a row within 2 rounds. "
        "Consolidate near-duplicate queries or widen the window "
        "(COVERAGE.md 'Registry growth policy')."
    )


def test_sustainable_cap_boundary():
    """The exact-100 boundary (COVERAGE.md at-cap maintenance): two
    50-row windows cover at most 100 queries, so the guard must accept
    exactly 100 and red-flag 101 — checked synthetically so the
    boundary stays pinned while the live registry sits under the cap."""
    assert _size_ok(SUSTAINABLE_MAX)
    assert not _size_ok(SUSTAINABLE_MAX + 1)


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
        "Since r7 registry._CHANGED_IN_ROUND entries auto-expire when a "
        "green row from their change round lands, so this should only "
        "fire on genuine window overflow — consolidate queries to free "
        "window slots."
    )


def test_computed_order_is_staleness_sorted():
    """Since r6 the registry order is COMPUTED (stalest green row first;
    never-green and actively-changed forced to the front). Re-derive
    the expected order from the committed files INDEPENDENTLY of the
    registry's own parser and pin the grouping: no query with an older
    (or no) green row may sit after a query with a newer one, unless
    the newer one is flagged changed and not yet recertified."""
    from homelogging_spark.plans.registry import _CHANGED_IN_ROUND

    order = _registry_order()
    assert set(_CHANGED_IN_ROUND) <= set(order), (
        f"_CHANGED_IN_ROUND names unknown queries: "
        f"{sorted(set(_CHANGED_IN_ROUND) - set(order))}"
    )

    greens: dict[str, int] = {}
    for rnd, rows_by_name in sorted(_correctness_rounds_green().items()):
        for name in rows_by_name:
            greens[name] = rnd

    active = {
        n for n, rnd in _CHANGED_IN_ROUND.items() if greens.get(n, 0) < rnd
    }

    def rank(q: str) -> int:
        return -1 if q not in greens or q in active else greens[q]

    ranks = [rank(q) for q in order]
    assert ranks == sorted(ranks), (
        "registry order is not sorted by driver-row staleness; first "
        f"inversion near: {[(q, rank(q)) for q in order][:60]}"
    )


def test_changed_entries_expire_when_their_round_lands():
    """The r6 judge-time failure: the flat changed-set kept force-
    fronting queries AFTER the round's CORRECTNESS file had recertified
    them, pushing rotation candidates past the window. The round-tagged
    form must expire each entry once a green row >= its change round
    exists — simulated here by feeding the expiry rule a synthetic
    greens map, independent of what is currently committed."""
    from homelogging_spark.plans.registry import (
        _CHANGED_IN_ROUND,
        _active_changed,
    )

    if not _CHANGED_IN_ROUND:
        return  # nothing flagged this round — trivially safe
    # before the artifact lands: every entry is active
    before = {n: rnd - 1 for n, rnd in _CHANGED_IN_ROUND.items()}
    assert _active_changed(before) == set(_CHANGED_IN_ROUND)
    # the moment each entry's change round is certified: all expire
    after = dict(_CHANGED_IN_ROUND)
    assert _active_changed(after) == set()
    # later rounds keep them expired
    later = {n: rnd + 3 for n, rnd in _CHANGED_IN_ROUND.items()}
    assert _active_changed(later) == set()


def _correctness_rounds_green() -> dict[int, set[str]]:
    """round -> names with a GREEN row (matches the registry's
    definition: rows+schema match and hash not explicitly false)."""
    out: dict[int, set[str]] = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        data = json.loads(p.read_text())
        if not isinstance(data, dict):
            continue
        out[int(m.group(1))] = {
            name
            for name, row in data.items()
            if isinstance(row, dict)
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match") is not False
        }
    return out
