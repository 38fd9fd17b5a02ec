#!/usr/bin/env python
"""Bench-context pinning: run bench.py N times (quiet host, nothing
else running) and pin every headline query and probe at its MINIMUM
across the runs.

Why this replaces the small-session best-of-4 protocol (round-13
finding, BASELINE.md): pins measured in small dedicated sessions are
systematically FASTER than the same queries inside a full 160+-query
bench session (block-manager churn, python-worker pool growth, GC
pressure from neighboring store builds) — the driver measures the
LATTER, so small-session pins made an ordinary driver run read 1.4x
"over pins" with dozens of spurious over-2x flags.  Pinning from the
same context the driver measures in makes measured/pinned ≈ 1 an
actual invariant instead of an apples-to-oranges artifact.  Min
across runs keeps the capability semantics (best observed under the
honest context).

    python scripts/pin_from_bench.py [N_RUNS]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        cwd=ROOT, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs = []
    for i in range(n_runs):
        print(f"bench run {i + 1}/{n_runs} ...", flush=True)
        r = run_bench()
        print(f"  total {r['value']}s, {len(r['queries'])} queries, "
              f"{len(r.get('probes', {}))} probes", flush=True)
        runs.append(r)

    pins_path = os.path.join(ROOT, "PINS.json")
    with open(pins_path) as fh:
        pdata = json.load(fh)
    # Round derived like repin.py (latest BENCH drop + 1 = the round
    # in progress) — a hardcoded round makes pins self-flagging the
    # moment that round's own BENCH drop lands (round-13 ADVICE).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pin_audit import latest_bench

    cur_round = latest_bench()[0] + 1
    prov = (
        f"round-{cur_round} bench-context min-of-{n_runs} "
        f"(quiet full bench.py runs, sf0.1, local[32], noop sink)"
    )
    for section, key in (("pins", "queries"), ("probe_pins", "probes")):
        names = set()
        for r in runs:
            names |= set(r.get(key, {}))
        for name in sorted(names):
            vals = [r[key][name] for r in runs if name in r.get(key, {})]
            if not vals:
                continue
            best = min(vals)
            old = pdata[section].get(name, {}).get("sec")
            pdata[section][name] = {
                "sec": round(best, 3), "provenance": prov,
            }
            tag = f"{old:7.3f}s" if old is not None else "    new "
            print(f"  {name:42s} {tag} -> {best:7.3f}s")
    with open(pins_path, "w") as fh:
        json.dump(pdata, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {pins_path}")


if __name__ == "__main__":
    main()
