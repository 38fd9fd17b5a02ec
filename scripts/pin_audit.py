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

Three independent rules (round-13 verdict hardened the audit — the
git-history rule alone missed ``pack_token_budget``'s round-3 pin
because its module never changed):

* ``code_changed`` — git history newer than the pin's provenance
  round touched the query (two granularities: default ``git log -L``
  on the registered FUNCTION's current line span; ``--module`` = last
  commit touching the whole defining module, the conservative
  superset — noisy: queries/llm.py changes every round).  Helpers the
  body calls (operators/, functions/) are outside the span, so the
  span rule can under-flag a rewrite of a shared seam (SURT, BPE,
  ANN store) — pair with ``--module`` then.
* ``driver_over_2x`` — the LATEST driver bench drop
  (``BENCH_r{N}.json``) read this pin >2× regardless of git history.
  Per BASELINE.md single-shot host variance is 2-4×, so this is
  usually noise — but the repo protocol treats it as unresolved until
  quiet-re-measured.
* ``stale_age`` — provenance predates round ``current-4``
  (current = latest BENCH round + 1, the round in progress).  A pin
  nobody has re-measured in 5+ rounds is stale evidence even if its
  code never changed: host state, Spark config, and fixture sizes
  drift.

Usage::

    python scripts/pin_audit.py            # all rules, span granularity
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


#: a pin older than this many rounds behind the round in progress is
#: stale evidence regardless of git history (round-13 verdict rule)
AGE_FLOOR_ROUNDS = 4


def latest_bench() -> tuple[int, dict, dict]:
    """(round, query_over_2x, probe_over_2x) from the newest
    BENCH_r{N}.json drop.  The drop stores the bench's stdout TAIL
    (possibly truncated at the front), so the vs_pins objects are
    regex-extracted rather than json-loading the whole line; they are
    flat objects, so non-greedy brace matching is safe."""
    import glob

    best_round, tail = 0, ""
    for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(p))
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd <= best_round:
            continue
        try:
            with open(p) as fh:
                tail = json.load(fh).get("tail", "") or ""
            best_round = rnd
        except (OSError, ValueError):
            continue

    def over2x(section: str) -> dict:
        m = re.search(rf'"{section}": ({{.*?}})', tail)
        if not m:
            return {}
        try:
            obj = json.loads(m.group(1))
        except ValueError:
            return {}
        return {n: True for n in obj.get("over_2x", [])}

    return best_round, over2x("vs_pins"), over2x("vs_probe_pins")


def age_flags(
    pdata: dict, current_round: int, floor: int = AGE_FLOOR_ROUNDS
) -> list[dict]:
    """Pure rule: pins whose provenance round predates
    ``current_round - floor`` (unparseable provenance never flags —
    the drift guard in tests/test_pins.py checks well-formedness)."""
    out = []
    for section in ("pins", "probe_pins"):
        for name, entry in pdata.get(section, {}).items():
            rnd = _provenance_round(entry.get("provenance", ""))
            if rnd is not None and rnd < current_round - floor:
                out.append(
                    {"name": name, "section": section, "reason": "stale_age",
                     "pin_round": rnd, "pin_sec": entry["sec"]}
                )
    return out


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
                     "reason": "code_changed",
                     "pin_round": rnd, "pin_sec": entry["sec"]}
                )

    # rule 2: the latest driver bench read the pin >2× (git-blind).
    # A pin measured in the SAME round as that bench drop or later
    # (provenance round >= bench round) is resolved evidence — the
    # bench-context protocol measured it with N quiet full-bench runs
    # in the same context the driver's single shot ran, so the newer
    # multi-sample number supersedes the single-shot excursion.
    # Strictly-older pins stay flagged until re-measured.  (Round-13
    # ADVICE: with a strict '>' the round-N drop flags round-N pins
    # the moment it is committed, failing the closing invariant for
    # a pin nobody had a chance to re-measure.)
    bench_round, q_over, p_over = latest_bench()
    for section, over in (("pins", q_over), ("probe_pins", p_over)):
        for name in over:
            entry = pdata.get(section, {}).get(name)
            if entry is None:
                continue
            rnd = _provenance_round(entry.get("provenance", ""))
            if rnd is not None and rnd >= bench_round:
                continue
            flagged.append(
                {"name": name, "section": section,
                 "reason": "driver_over_2x",
                 "pin_round": rnd, "pin_sec": entry["sec"]}
            )

    # rule 3: provenance age floor (current round = latest bench + 1)
    flagged.extend(age_flags(pdata, bench_round + 1))
    return flagged


def main() -> None:
    gran = "module" if "--module" in sys.argv else "span"
    rows = audit(gran)
    if "--quiet" in sys.argv:
        for name in sorted({r["name"] for r in rows}):
            print(name)
        return
    if not rows:
        print(f"all pins fresh ({gran} granularity + driver-over-2x + "
              f"age<{AGE_FLOOR_ROUNDS} rounds): nothing to re-measure")
        return
    print(f"{len(rows)} flag(s) — quiet best-of-4 re-measure before "
          "trusting:")
    for r in sorted(rows, key=lambda r: (r["reason"], r["name"])):
        rnd = r["pin_round"] if r["pin_round"] is not None else "?"
        mod = r.get("module", "-")
        print(f"  {r['name']:40s} {r['reason']:14s} pinned r{rnd!s:<3s}"
              f"{r['pin_sec']:>7.3f}s  {mod}")


if __name__ == "__main__":
    main()
