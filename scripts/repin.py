#!/usr/bin/env python
"""Quiet best-of-4 re-pin for flagged capability pins.

Protocol (BASELINE.md / round-12 memory): pins are only measured with
NOTHING else running (no pytest, no sweeps), at sf0.1 on local[32],
noop-sink materialization, after an untimed warmup — best-of-4 so a
single GC/compilation stall never becomes the capability number.

By default re-pins exactly what ``scripts/pin_audit.py`` flags
(code_changed + driver_over_2x + stale_age); pass names to re-pin a
specific subset::

    python scripts/repin.py                 # everything the audit flags
    python scripts/repin.py q1_pricing_summary pack_token_budget

Writes PINS.json in place with round-stamped provenance (round =
latest BENCH_r{N}.json + 1, the round in progress).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

SHOTS = 4


def main() -> None:
    from pin_audit import audit, latest_bench

    from webarchive_indexing_spark.registry import all_queries
    from webarchive_indexing_spark.session import get_session

    cur_round = latest_bench()[0] + 1
    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    if argv:
        targets = {n: "manual" for n in argv}
    else:
        targets = {}
        for r in audit():
            if r["section"] == "pins":
                targets.setdefault(r["name"], r["reason"])

    from webarchive_indexing_spark.queries.probes import PROBES

    pins_path = os.path.join(ROOT, "PINS.json")
    with open(pins_path) as fh:
        pdata = json.load(fh)
    pins = pdata["pins"]
    ppins = pdata.setdefault("probe_pins", {})

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("webarchive-indexing-spark-repin")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    probe_names = sorted(n for n in targets if n in PROBES)
    query_names = sorted(n for n in targets if n not in PROBES)
    missing = sorted(n for n in query_names if n not in qs)
    if missing:
        sys.exit(f"flagged pins with no registered query/probe: {missing}")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def best_of(run) -> float:
        from bench import _reclaim

        run()  # untimed warmup
        _reclaim(spark)
        best = None
        for _ in range(SHOTS):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            _reclaim(spark)
        return best

    prov = (
        f"round-{cur_round} quiet best-of-{SHOTS} "
        f"(sf0.1, local[32], noop sink, clean /tmp)"
    )
    print(f"pinning {len(query_names)} query pin(s) + "
          f"{len(probe_names)} probe pin(s), best-of-{SHOTS}, {sf_dir}")
    def fmt_old(old) -> str:
        return f"{old:7.3f}s" if old is not None else "    new "

    for name in query_names:
        best = best_of(lambda: materialize(qs[name](spark, sf_dir)))
        old = pins[name]["sec"] if name in pins else None
        pins[name] = {
            "sec": round(best, 3),
            "provenance": prov + f" (pin_audit: {targets[name]})",
        }
        print(f"  {name:40s} {fmt_old(old)} -> {best:7.3f}s")
    ctxs: dict[str, object] = {}
    for name in probe_names:
        p = PROBES[name]
        if p.family not in ctxs:
            ctxs[p.family] = p.build(spark, sf_dir)
        best = best_of(lambda: materialize(p.probe(spark, ctxs[p.family])))
        old = ppins[name]["sec"] if name in ppins else None
        ppins[name] = {"sec": round(best, 3), "provenance": prov}
        print(f"  {name:40s} {fmt_old(old)} -> {best:7.3f}s")
    with open(pins_path, "w") as fh:
        json.dump(pdata, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {pins_path}")


if __name__ == "__main__":
    main()
