#!/usr/bin/env python
"""Pin-provenance freshness audit (round-12 verdict task).

A pin is only evidence about the CURRENT code if the code path it
timed hasn't changed since it was measured.  The drift guard in
tests/test_pins.py checks existence and well-formedness; this audit
checks FRESHNESS: for every entry in PINS.json, compare the round
named in its provenance string against the last git commit touching
the module that defines the pinned query (resolved via
``inspect.getsourcefile`` on the registered callable — the module a
regression would land in).

A flagged pin is NOT automatically wrong — most module commits touch
other queries — but it is exactly the blind spot the round-11 verdict
called out (`cdx_post_request_key` carried a round-9 pin across two
SURT rewrites): a genuine 2× regression on a rewritten path would be
indistinguishable from a stale pin.  Protocol: quiet best-of-4
re-measure every flagged pin you have reason to doubt, and always the
ones whose module diff actually intersects their code path; re-pin
with current-round provenance.

Round mapping uses the commit date of ``BENCH_r{N}.json`` (the
driver's per-round drop, committed at round close) as "when round N's
numbers were current".

Two granularities:

* default — ``git log -L`` on the registered FUNCTION's current line
  span: flags a pin only when commits newer than its provenance round
  touched the query body itself.  Helpers the body calls (operators/,
  functions/) are outside the span, so this can under-flag a rewrite
  of a shared helper — pair it with ``--module`` when a shared seam
  (SURT, BPE, ANN store) was rewritten.
* ``--module`` — last commit touching the whole defining module: the
  conservative superset (noisy: queries/llm.py changes every round).

Usage::

    python scripts/pin_audit.py            # function-span audit
    python scripts/pin_audit.py --module   # module-level superset
    python scripts/pin_audit.py --quiet    # names only
"""

from __future__ import annotations

import inspect
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _git_ct(path: str) -> int | None:
    """Unix timestamp of the last commit touching ``path`` (None if
    untracked or git unavailable)."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", path],
            cwd=ROOT, capture_output=True, text=True, timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    s = out.stdout.strip()
    return int(s) if s.isdigit() else None


def _round_close_times() -> dict[int, int]:
    """round → commit time of its BENCH_r{N}.json drop."""
    out: dict[int, int] = {}
    for f in os.listdir(ROOT):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if not m:
            continue
        ct = _git_ct(f)
        if ct is not None:
            out[int(m.group(1))] = ct
    return out


def _provenance_round(prov: str) -> int | None:
    m = re.search(r"round[- ](\d+)", prov)
    return int(m.group(1)) if m else None


def _git_span_ct(path: str, lo: int, hi: int) -> int | None:
    """Newest commit time touching lines [lo, hi] of ``path``."""
    try:
        out = subprocess.run(
            ["git", "log", "--no-patch", "--format=%ct",
             f"-L{lo},{hi}:{path}"],
            cwd=ROOT, capture_output=True, text=True, timeout=60,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    lines = [ln for ln in out.stdout.splitlines() if ln.strip().isdigit()]
    return int(lines[0]) if lines else None


def audit(granularity: str = "span") -> list[dict]:
    from webarchive_indexing_spark.queries.probes import PROBES
    from webarchive_indexing_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    with open(os.path.join(ROOT, "PINS.json")) as fh:
        pdata = json.load(fh)
    closes = _round_close_times()
    latest_round = max(closes) if closes else 0
    flagged: list[dict] = []
    mod_ct: dict[str, int | None] = {}

    def locate(name: str):
        """(module_relpath, first_line, last_line) of the pinned
        query's defining function."""
        if name.endswith("_probe") and name[: -len("_probe")] in {
            p.parent for p in PROBES.values()
        }:
            name = name[: -len("_probe")]
        q = REGISTRY.get(name)
        if q is None:
            return None
        fn = inspect.unwrap(q.fn)
        src = inspect.getsourcefile(fn)
        if not src:
            return None
        lines, lo = inspect.getsourcelines(fn)
        return os.path.relpath(src, ROOT), lo, lo + len(lines) - 1

    for section in ("pins", "probe_pins"):
        for name, entry in pdata.get(section, {}).items():
            rnd = _provenance_round(entry.get("provenance", ""))
            if rnd is None or rnd >= latest_round:
                continue
            close = closes.get(rnd)
            loc = locate(name)
            if loc is None or close is None:
                continue
            mod, lo, hi = loc
            if granularity == "module":
                if mod not in mod_ct:
                    mod_ct[mod] = _git_ct(mod)
                ct = mod_ct[mod]
            else:
                ct = _git_span_ct(mod, lo, hi)
            if ct is not None and ct > close:
                flagged.append(
                    {"name": name, "section": section, "module": mod,
                     "pin_round": rnd, "pin_sec": entry["sec"]}
                )
    return flagged


def main() -> None:
    gran = "module" if "--module" in sys.argv else "span"
    rows = audit(gran)
    if "--quiet" in sys.argv:
        for r in rows:
            print(r["name"])
        return
    if not rows:
        print(f"all pins fresh ({gran} granularity): nothing changed "
              "after each pin's provenance round closed")
        return
    print(f"{len(rows)} pin(s) whose {gran} changed after their "
          f"provenance round closed (re-measure before trusting):")
    for r in sorted(rows, key=lambda r: (r["module"], r["name"])):
        print(f"  {r['name']:40s} pinned r{r['pin_round']:<2d} "
              f"{r['pin_sec']:>7.3f}s  module {r['module']}")


if __name__ == "__main__":
    main()
