"""Registry hygiene: the counts documented in README.md and SURVEY.md
§2.0 must track ``len(registry.all_queries())`` — they drifted in
rounds 2-3 and were hand-resynced; this pins them (VERDICT r4 task 9).
"""

from __future__ import annotations

import os
import re

from webarchive_indexing_spark.registry import (
    REGISTRY,
    _ensure_loaded,
    all_oracles,
    all_queries,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ensure_loaded()


def test_readme_count_matches_registry():
    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    m = re.search(r"(\d+) registered queries", text)
    assert m, "README.md no longer states a registered-query count"
    assert int(m.group(1)) == len(all_queries()), (
        f"README.md says {m.group(1)} queries, registry has "
        f"{len(all_queries())} — update README.md:68"
    )


def test_survey_counts_match_registry():
    with open(os.path.join(ROOT, "SURVEY.md")) as f:
        text = f.read()
    m = re.search(r"(\d+) queries, (\d+) oracles", text)
    assert m, "SURVEY.md §2.0 no longer states the registry counts"
    assert int(m.group(1)) == len(all_queries()), (
        f"SURVEY.md says {m.group(1)} queries, registry has "
        f"{len(all_queries())}"
    )
    assert int(m.group(2)) == len(all_oracles()), (
        f"SURVEY.md says {m.group(2)} oracles, registry has "
        f"{len(all_oracles())}"
    )


def test_every_query_has_oracle_or_documented_reason():
    """Round-4 state: zero rows-only queries.  A new rows-only entry
    needs an explicit doc sentence explaining why SQL can't express it."""
    for q in REGISTRY.values():
        if q.oracle is None:
            assert "rows-only" in (q.doc or "").lower(), (
                f"{q.name} registered without an oracle and without a "
                f"'rows-only' justification in its docstring"
            )
