"""Probe-registry linkage guard: every probe's serving half, run
against its family's pre-built store, returns exactly the rows of its
parent registry query (which the DuckDB oracle checks) — so the probe
pins measure the SAME plan the correctness gate proves, and the two
cannot drift apart."""

from __future__ import annotations

from webarchive_indexing_spark.queries.probes import PROBES
from webarchive_indexing_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_probe_halves_match_parent_queries(spark, sf_dir):
    ctxs: dict[str, object] = {}
    for name, p in sorted(PROBES.items()):
        if p.family not in ctxs:
            ctxs[p.family] = p.build(spark, sf_dir)
        got = sorted(map(tuple, p.probe(spark, ctxs[p.family]).collect()))
        if p.check == "nonempty":
            # build-only probes: the timed plan CONSTRUCTS what the
            # parent's oracle-checked store serves — row equality to
            # the parent's serving output is not meaningful
            assert got, name
            continue
        want = sorted(
            map(tuple, REGISTRY[p.parent].fn(spark, sf_dir).collect())
        )
        assert got == want, name
