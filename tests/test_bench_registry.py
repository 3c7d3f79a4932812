"""Registry consistency: the driver runs bench.py and __ray_entry__
against RAY_QUERIES — a stale name in the bench list or a query
missing its oracle/rows-only classification should fail HERE, not in
the graded driver run."""

import ast
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: legitimately-no-oracle queries — EMPTY since round 4 (media_decode
#: gained a real stdlib decoder + analytic oracle); everything in
#: RAY_QUERIES must have an oracle_sql_strings entry
ROWS_ONLY: set[str] = set()


def _bench_names() -> list[str]:
    """String literals of the bench query list, parsed from the AST
    (the list is a literal inside run_bench)."""
    src = open(os.path.join(REPO, "bench.py")).read()
    tree = ast.parse(src)
    names: list[str] = []
    for node in ast.walk(tree):
        # the `for name in only if only else [ ... ]:` loop
        if isinstance(node, ast.IfExp) and isinstance(node.orelse,
                                                      ast.List):
            vals = [e.value for e in node.orelse.elts
                    if isinstance(e, ast.Constant)]
            if len(vals) > len(names):
                names = vals
    assert len(names) > 50, "failed to locate the bench query list"
    return names


def test_bench_names_all_registered():
    from d1_log_aggregation_ray.pipelines.queries import RAY_QUERIES
    missing = [n for n in _bench_names() if n not in RAY_QUERIES]
    assert not missing, f"bench.py names not in RAY_QUERIES: {missing}"


def test_every_query_has_oracle_or_rows_only_reason():
    from d1_log_aggregation_ray.pipelines.queries import (
        RAY_QUERIES, oracle_sql_strings)
    oracles = set(oracle_sql_strings("/root/testdata/sf0.001"))
    unknown = set(RAY_QUERIES) - oracles - ROWS_ONLY
    assert not unknown, (
        f"queries with neither an oracle nor a rows-only listing: "
        f"{sorted(unknown)}")
    stale = ROWS_ONLY & oracles
    assert not stale, f"rows-only set now HAS oracles: {sorted(stale)}"


def test_no_duplicate_bench_entries():
    names = _bench_names()
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"duplicated bench entries: {sorted(dupes)}"
