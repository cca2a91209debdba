"""Registry-ordering invariants — the driver contract.

The driver verifies the first 50 registered queries per round, so the
ordering logic in ``queries/__init__.load_all_queries`` IS evidence
policy. These tests pin its invariants so a refactor (or a silently
clobbered module — the round-7 relational12 incident) cannot waste
driver window slots unnoticed.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def registry():
    from syllabus_sense_spark import queries as q

    q.load_all_queries()
    return q


def test_priority_list_names_all_resolve(registry):
    """Every force/new name must exist in QUERIES: a missing name means
    a module was silently lost (clobber guard, round-7 incident)."""
    missing = [
        n
        for n in registry._NEW_THIS_ROUND + registry._FORCE_RECHECK
        if n not in registry.QUERIES
    ]
    assert missing == [], f"silently-lost queries: {missing}"


def test_window_is_spent_on_evidence_holes(registry):
    """While evidence holes (never-checked + force-listed stale) could
    fill the driver's 50-slot window, every window slot must go to one
    — a green-and-unchanged query in the window is a wasted slot. Once
    holes run short, the tail legitimately back-fills with the
    oldest-green rotation, so the assertion scopes to the hole count."""
    last_green = registry._evidence_from_past_rounds()
    names = list(registry.QUERIES)
    holes = [
        n
        for n in names
        if n not in last_green or n in registry._FORCE_RECHECK
    ]
    budget = min(50, len(holes))
    wasted = [
        n
        for n in names[:budget]
        if n in last_green and n not in registry._FORCE_RECHECK
    ]
    assert wasted == [], f"window slots wasted on green queries: {wasted}"


def test_never_checked_outrank_stale_rechecks(registry):
    """While the never-checked backlog exceeds the window, the whole
    window goes to it (round-7 judge direction); force-listed
    re-checks may only appear interleaved once the backlog fits."""
    last_green = registry._evidence_from_past_rounds()
    names = list(registry.QUERIES)
    never = [n for n in names if n not in last_green]
    if len(never) > 50:
        assert all(n not in last_green for n in names[:50])


def test_oracle_keys_subset_of_queries(registry):
    """Every oracle belongs to a registered query, and both dicts keep
    the same relative order for shared keys (the driver zips them)."""
    assert set(registry.ORACLE) <= set(registry.QUERIES)
    qorder = [n for n in registry.QUERIES if n in registry.ORACLE]
    assert qorder == list(registry.ORACLE)
