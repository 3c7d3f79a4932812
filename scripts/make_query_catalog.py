"""Regenerate docs/QUERIES.md from the queries() registry docstrings.

Run after adding or changing queries:
    python scripts/make_query_catalog.py
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "docs", "QUERIES.md")
MAX = 220  # docstring truncation for the table cell

HEADER = """# Query catalog — `queries()` name -> pipeline -> check

Generated from the `queries()` registry docstrings (scripts/make_query_catalog.py).  Every entry runs via `__ray_entry__.queries()[name](sf_dir)`; `oracle` = DuckDB SQL compared row/schema/hash-exact by the driver, `rows-only` = no SQL equivalent (reason in the docstring).

| # | query | check | what it does |
|---|---|---|---|
"""


def main() -> None:
    from d1_log_aggregation_ray.pipelines.queries import (
        RAY_QUERIES, oracle_sql_strings)
    oracles = set(oracle_sql_strings("/root/testdata/sf0.001"))
    lines = [HEADER]
    for i, name in enumerate(sorted(RAY_QUERIES), 1):
        fn = RAY_QUERIES[name]
        doc = re.sub(r"\s+", " ", (fn.__doc__ or "").strip())
        if len(doc) > MAX:
            doc = doc[:MAX].rstrip() + "..."
        check = "oracle" if name in oracles else "rows-only"
        lines.append(f"| {i} | `{name}` | {check} | {doc} |\n")
    with open(OUT, "w") as f:
        f.writelines(lines)
    print(f"wrote {OUT}: {len(RAY_QUERIES)} queries, "
          f"{len(oracles & set(RAY_QUERIES))} oracle-checked")


if __name__ == "__main__":
    main()
