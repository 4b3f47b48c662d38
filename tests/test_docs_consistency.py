"""Docs must not drift from the registry: COVERAGE.md / README.md quote
query counts that have gone stale three times already this round."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod


def test_coverage_counts_match_registry():
    n_queries = len(entrymod.queries())
    n_oracle = len(entrymod.oracle_sql())
    text = open("/root/repo/COVERAGE.md").read()
    match = re.search(r"(\d+) queries in `queries\(\)`; (\d+) oracle-backed", text)
    assert match, "COVERAGE.md totals line missing"
    assert int(match.group(1)) == n_queries, "COVERAGE.md query count stale"
    assert int(match.group(2)) == n_oracle, "COVERAGE.md oracle count stale"
    readme = open("/root/repo/README.md").read()
    match = re.search(r"\((\d+) registered queries, (\d+) oracle-backed", readme)
    assert match and int(match.group(1)) == n_queries, "README count stale"
    assert int(match.group(2)) == n_oracle
    survey = open("/root/repo/SURVEY.md").read()
    match = re.search(r"(\d+) queries, (\d+) oracle-backed", survey)
    assert match and int(match.group(1)) == n_queries, "SURVEY count stale"
    assert int(match.group(2)) == n_oracle, "SURVEY oracle count stale"


def test_every_oracle_has_a_query():
    queries = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in queries, f"oracle_sql has {name} but queries() does not"


def test_every_query_named_in_coverage():
    """COVERAGE.md is the inventory→query map: every registered query name
    must literally appear in it (backticked), so the map cannot silently
    omit an operator."""
    text = open("/root/repo/COVERAGE.md").read()
    for name in entrymod.queries():
        assert f"`{name}`" in text, f"COVERAGE.md does not mention `{name}`"


def test_driver_window_covers_every_oracle_query():
    """Every oracle-backed query must have a hard external correctness row
    in SOME round: either hash-green in CORRECTNESS_r01.json or inside the
    driver's 50-query window this round.  (The driver checks only the
    first 50 registered queries per round.)"""
    import json

    queries = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window = queries[:50]
    assert window == entrymod._DRIVER_WINDOW
    assert len(set(window)) == 50
    r1 = json.load(open("/root/repo/CORRECTNESS_r01.json"))
    r1_green = {k for k, v in r1.items() if v.get("hash_match")}
    for name in queries:
        if name in oracles:
            assert name in r1_green or name in window, (
                f"{name} is oracle-backed but has no driver row in any round"
            )
    # and the window wastes no slots on rows-only queries
    assert all(name in oracles for name in window)
