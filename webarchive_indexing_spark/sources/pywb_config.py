"""pywb config-file loaders (SURVEY.md §2 P5 + ACL fidelity, tier B).

A real pywb deployment carries two config artifacts; loading them
unmodified into the engine's existing fuzzy/ACL compilers makes the
engine drop-in against an existing archive:

* ``rules.yaml`` — ordered rule blocks keyed by SURT ``url_prefix``,
  each with a ``fuzzy_lookup`` in one of three grammars [U pywb
  default rules.yaml; pywb fuzzymatcher]:

  - a plain regex STRING (the match/strip regex over the canonical
    urlkey);
  - a ``match:`` dict — the regex as a string or a nested
    ``{regex: ...}`` mapping (pywb's extended form).  A sibling
    ``replace:`` key is HONORED: the matched span is rewritten to
    that literal string instead of stripped (pywb's volatile-param
    canonicalization — see ``FuzzyRule.replace``).  A sibling
    ``filter:``/``filters:`` key is HONORED too (pywb's param-echo
    result filtering): the templates load into ``FuzzyRule.filters``
    and the retry becomes pywb's truncated-prefix scan plus the
    echoed cdx filters (``operators.cdx_query.fuzzy_retry_spec``);
    templates the engine cannot expand (named placeholders, group
    refs the regex lacks) quarantine the WHOLE rule — never
    half-applied.  ``type:`` is accepted and ignored (response
    tuning, not key derivation);
  - an ``args:`` LIST naming the query params to KEEP — every other
    param is stripped from the fuzzy key (pywb's youtube
    ``get_video_info`` style).  Compiled to a keep-list pattern using
    negative lookahead, which Spark's Java regex executes natively;
    RE2-based oracles (DuckDB) cannot run these — keep args-form
    rules pytest-pinned (see tests/test_pywb_config.py).

  ``url_prefix`` may be a string or a LIST of strings (one scoped
  rule per prefix, same behavior — pywb semantics); empty/missing
  means global.  An optional ``name:`` key inside ``fuzzy_lookup`` is
  an ENGINE EXTENSION (pywb rules are anonymous): it sets the
  ``fuzzy_rule`` output label so a loaded table can be byte-identical
  to an in-code one; absent, a deterministic ``rule<i>`` /
  ``rule<i>:<prefix>`` name is derived.

* ``<coll>.aclj`` — wb-manager access-control JSON-lines
  ``<surt> - {json}``, reverse-key-sorted, the JSON carrying
  ``access`` ∈ {allow, block, exclude, allow_ignore_embargo} [U pywb
  wb-manager acl].  Loads into the ``(surt_prefix, access)`` list
  ``operators.cdx_query.apply_acl`` compiles (longest-prefix-wins).
  ``allow_ignore_embargo`` is kept DISTINCT — it exempts its subtree
  from a collection embargo (``load_embargo``) and displays as plain
  ``allow``.

* ``config.yaml`` ``embargo:`` block — pywb's collection-level
  embargo [U pywb config embargo]: ``before``/``after`` fixed ts14
  prefixes, ``newer``/``older`` duration dicts.  ``load_embargo`` is
  ALL-OR-NOTHING: any malformed part quarantines the WHOLE block
  (returns ``None`` + reasons) so the caller can refuse to serve —
  an embargo is the one config whose failure direction inverts: a
  half-loaded embargo would WIDEN access by serving embargoed
  captures, so partial application is never allowed.

Both loaders are QUARANTINE parsers — the same damage posture as the
takedown-feed reader (sinks/zipnum.py): a malformed entry can never
widen a rule's scope (an unparseable ACL line must not become a
wildcard, an unparseable regex must not become match-everything) and
never kills the load; it lands in the returned ``bad`` list for
operator review.  Config files are driver-side metadata (KBs), so
plain-Python parsing here is free; the OUTPUT of both loaders
compiles into scan-side codegen CASE chains exactly like the in-code
tables.
"""

from __future__ import annotations

import json
import re

from ..operators.cdx_query import FuzzyRule

_ACL_ACCESS = {"allow", "block", "exclude", "allow_ignore_embargo"}


def _pattern_rejection(pattern: str) -> str | None:
    """Best-effort Java-dialect screening for a rule regex: the table
    compiles into Spark's Java regex engine AND embeds into the
    DuckDB-oracle SQL string, so constructs Python's ``re`` accepts
    but those contexts reject must quarantine at LOAD time — a rule
    that loads green and then throws ``PatternSyntaxException`` mid-
    query fails the whole job instead of that one rule.  Returns a
    reason, or None when the pattern passes.  Best-effort: it screens
    the known Python-only syntax family; exotic divergences degrade
    to a query-time error, never to a silently-different match."""
    try:
        re.compile(pattern)
    except re.error as e:
        return f"bad regex: {e}"
    if "(?P" in pattern:
        return (
            "Python-only (?P named-group syntax; Spark's Java regex "
            "rejects it at run time"
        )
    if "'" in pattern:
        return (
            "single quote cannot embed in the generated shared-SQL "
            "rule chain"
        )
    return None


def _compile_keep_args(names: list[str]) -> str:
    """``args: [a, b]`` keep-list → strip-pattern for every OTHER
    param.  The repeated inner unit consumes whole junk params
    (non-empty, so the ``+`` can't zero-width-loop and the rule can't
    fire on a key with only kept params); consecutive junk params
    fall in one match, so a single replace-all pass strips them even
    when adjacent.  Java-regex only (negative lookahead)."""
    alts = "|".join(re.escape(n) for n in names)
    return rf"([?&])(?:(?!(?:{alts})=)[^&]+&?)+"


def parse_fuzzy_rules_obj(
    obj: object,
) -> tuple[tuple[FuzzyRule, ...], list[str]]:
    """Parsed-YAML object → (rule table, quarantined-entry reprs)."""
    bad: list[str] = []
    rules: list[FuzzyRule] = []
    if not isinstance(obj, dict) or not isinstance(obj.get("rules"), list):
        return (), [f"top-level 'rules' list missing: {type(obj).__name__}"]
    for i, entry in enumerate(obj["rules"]):
        if not isinstance(entry, dict):
            bad.append(f"rule {i}: not a mapping")
            continue
        fl = entry.get("fuzzy_lookup")
        prefixes = entry.get("url_prefix", "")
        if isinstance(prefixes, str):
            prefixes = [prefixes]
        if not isinstance(prefixes, list) or not all(
            isinstance(p, str) for p in prefixes
        ):
            bad.append(f"rule {i}: url_prefix must be string or string list")
            continue
        name = None
        replace = None
        flt_raw = None
        if isinstance(fl, str):
            pattern = fl
        elif isinstance(fl, dict):
            flt_raw = fl.get("filter", fl.get("filters"))
            name = fl.get("name") if isinstance(fl.get("name"), str) else None
            r = fl.get("replace")
            if r is not None:
                if not isinstance(r, str):
                    bad.append(f"rule {i}: replace: must be a string")
                    continue
                if "'" in r or "\\" in r:
                    bad.append(
                        f"rule {i}: replace {r!r}: quote/backslash cannot "
                        "embed identically in the shared-SQL rule chain"
                    )
                    continue
                replace = r
            m = fl.get("match")
            if isinstance(m, dict):
                m = m.get("regex")
            if isinstance(m, str):
                pattern = m
            elif isinstance(fl.get("args"), list) and fl["args"] and all(
                isinstance(a, str) for a in fl["args"]
            ):
                pattern = _compile_keep_args(fl["args"])
            else:
                bad.append(f"rule {i}: fuzzy_lookup has no match regex or args list")
                continue
        else:
            bad.append(f"rule {i}: fuzzy_lookup missing or wrong type")
            continue
        reason = _pattern_rejection(pattern)
        if reason is not None:
            bad.append(f"rule {i}: regex {pattern!r}: {reason}")
            continue
        filters: tuple[str, ...] = ()
        if flt_raw is not None:
            filters, reason = _validate_filters(flt_raw, pattern)
            if reason is not None:
                bad.append(f"rule {i}: {reason}")
                continue
        for p in prefixes:
            rules.append(
                FuzzyRule(
                    name or (f"rule{i}:{p}" if p else f"rule{i}"),
                    pattern,
                    key_prefix=p or None,
                    replace=replace,
                    filters=filters,
                )
            )
    return tuple(rules), bad


def _validate_filters(
    flt: object, pattern: str
) -> tuple[tuple[str, ...], str | None]:
    """pywb ``filter:`` param-echo templates → validated tuple, or a
    quarantine reason.  A template must be a cdx filter= string whose
    ``{N}`` placeholders name positional groups the rule's regex
    actually captures — a template that would IndexError/KeyError at
    query time quarantines the WHOLE rule at load (never
    half-applied), and named ``{key}`` placeholders (pywb's
    query-param echoes) quarantine too: the engine substitutes match
    groups only."""
    if isinstance(flt, str):
        flt = [flt]
    if not isinstance(flt, list) or not flt or not all(
        isinstance(f, str) for f in flt
    ):
        return (), "filter: must be a string or non-empty string list"
    ngroups = re.compile(pattern).groups
    out = []
    for t in flt:
        try:
            probe = t.format(*[""] * ngroups)
        except (IndexError, KeyError, ValueError) as e:
            return (), (
                f"filter {t!r} cannot expand from the regex's {ngroups} "
                f"group(s): {type(e).__name__}: {e}"
            )
        if ":" not in probe and "~" not in probe:
            return (), f"filter {t!r} is not a field:value cdx filter"
        out.append(t)
    return tuple(out), None


def load_fuzzy_rules(path: str) -> tuple[tuple[FuzzyRule, ...], list[str]]:
    """``rules.yaml`` file → (ordered FuzzyRule table, quarantined).

    The returned table feeds ``apply_fuzzy_rules`` /
    ``sql_fuzzy_rule_exprs`` / ``fuzzy_key_py`` unchanged — same
    first-match-wins order as the file's block order, same compiled
    CASE chain as an in-code table."""
    import yaml

    with open(path) as fh:
        try:
            obj = yaml.safe_load(fh)
        except yaml.YAMLError as e:
            return (), [f"unparseable yaml: {e}"]
    return parse_fuzzy_rules_obj(obj)


def dump_fuzzy_rules(rules: tuple[FuzzyRule, ...]) -> str:
    """FuzzyRule table → rules.yaml text (round-trips through
    ``load_fuzzy_rules`` to an identical table — names carried via
    the documented ``name:`` extension key)."""
    import yaml

    entries = []
    for r in rules:
        fl: dict = {"name": r.name, "match": {"regex": r.pattern}}
        if r.replace is not None:
            fl["replace"] = r.replace
        if r.filters:
            fl["filter"] = list(r.filters)
        entries.append({"url_prefix": r.key_prefix or "", "fuzzy_lookup": fl})
    return yaml.safe_dump({"rules": entries}, sort_keys=False)


def parse_aclj_lines(
    lines: list[str],
) -> tuple[list[tuple[str, str]], list[str]]:
    """aclj text lines → ((surt_prefix, access) list, quarantined).

    Grammar per line: ``<surt> - {json}``.  Quarantined (NEVER
    widened): blank surt (would be a wildcard rule), missing
    separator, bad JSON, unknown access value, and keys carrying a
    backslash (outside the SURT alphabet, and not representable
    identically in the shared Spark/DuckDB SQL chain — see
    ``operators.cdx_query._sq``).  ``allow_ignore_embargo`` survives
    DISTINCT: it exempts its subtree from a collection embargo."""
    out: list[tuple[str, str]] = []
    bad: list[str] = []
    for ln in lines:
        s = ln.rstrip("\n")
        if not s.strip():
            continue
        key, sep, js = s.partition(" - ")
        key = key.strip()
        if not sep or not key or "\\" in key:
            bad.append(s)
            continue
        try:
            props = json.loads(js)
        except ValueError:
            bad.append(s)
            continue
        access = props.get("access") if isinstance(props, dict) else None
        if access not in _ACL_ACCESS:
            bad.append(s)
            continue
        out.append((key, access))
    return out, bad


def load_aclj(path: str) -> tuple[list[tuple[str, str]], list[str]]:
    """``.aclj`` file → rule list for ``apply_acl`` (+ quarantined).

    File order is preserved; ``apply_acl`` itself imposes the
    longest-prefix-first precedence (with first-listed winning among
    duplicate prefixes), so a hand-edited unsorted file and
    wb-manager's reverse-sorted output load to the same verdict
    chain."""
    with open(path) as fh:
        return parse_aclj_lines(fh.readlines())


_EMBARGO_KEYS = {"before", "after", "newer", "older"}
# fixed day-count conventions (documented in cdx_query._embargo_pred):
# years=365d, months=30d, weeks=7d — timedelta offsets, not calendar math
_DURATION_UNITS = {
    "years", "months", "weeks", "days", "hours", "minutes", "seconds"
}


def parse_embargo_obj(obj: object) -> tuple[dict | None, list[str]]:
    """Parsed-YAML object → (embargo dict for ``apply_acl``, reasons).

    Accepts a pywb collection ``config.yaml`` mapping (the block under
    its top-level ``embargo:`` key) or the embargo mapping itself.
    ALL-OR-NOTHING: one malformed part poisons the whole block
    (``None`` + reasons) — dropping just the bad clause would serve
    captures the operator meant to hide, the one widening the
    quarantine posture forbids.  A block that parses here is accepted
    verbatim by ``operators.cdx_query.apply_acl`` (same validation,
    re-run there as defense in depth)."""
    bad: list[str] = []
    if isinstance(obj, dict) and "embargo" in obj:
        obj = obj["embargo"]
    if not isinstance(obj, dict) or not obj:
        return None, ["embargo block missing or not a non-empty mapping"]
    unknown = set(obj) - _EMBARGO_KEYS
    if unknown:
        bad.append(f"unknown embargo keys {sorted(map(str, unknown))}")
    for k in ("before", "after"):
        if k in obj:
            s = str(obj[k])
            if not (4 <= len(s) <= 14 and s.isdigit()):
                bad.append(f"{k}: {obj[k]!r} is not a ts14 prefix")
    for k in ("newer", "older"):
        if k in obj:
            v = obj[k]
            if not isinstance(v, dict) or not v:
                bad.append(f"{k}: must be a non-empty duration mapping")
                continue
            extra = set(v) - _DURATION_UNITS
            if extra:
                bad.append(f"{k}: unknown duration units {sorted(map(str, extra))}")
            for unit, n in v.items():
                if unit in _DURATION_UNITS and (
                    not isinstance(n, int) or isinstance(n, bool) or n < 0
                ):
                    bad.append(f"{k}.{unit}: {n!r} must be an int >= 0")
    if bad:
        return None, bad
    # normalize before/after to plain strings so a YAML int loads the
    # same as a quoted string
    out = dict(obj)
    for k in ("before", "after"):
        if k in out:
            out[k] = str(out[k])
    return out, []


def load_embargo(path: str) -> tuple[dict | None, list[str]]:
    """pywb collection ``config.yaml`` → embargo dict (or ``None`` +
    reasons).  See ``parse_embargo_obj`` for the all-or-nothing
    posture; a file with no ``embargo:`` block is a reported reason,
    not a silent no-embargo."""
    import yaml

    with open(path) as fh:
        try:
            obj = yaml.safe_load(fh)
        except yaml.YAMLError as e:
            return None, [f"unparseable yaml: {e}"]
    return parse_embargo_obj(obj)


def dump_aclj(rules: list[tuple[str, str]], url_prefix: str = "") -> str:
    """(surt_prefix, access) list → aclj text in wb-manager's
    reverse-key-sorted order, one ``<surt> - {json}`` line each."""
    lines = []
    for key, access in sorted(rules, key=lambda r: r[0], reverse=True):
        props = {"access": access}
        if url_prefix:
            props["url"] = url_prefix + key
        lines.append(f"{key} - {json.dumps(props)}")
    return "\n".join(lines) + "\n"


def default_rules_path() -> str:
    """Path of the BUNDLED default rules.yaml — a pywb-grammar rule
    table shipping with the engine (jsonp/cachebust/session strips, a
    youtube param-echo filter rule, the get_video_info args keep-list,
    the scoped googlevideo block, the removeall fallback), loadable
    through the same quarantine parser as any deployment's file."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        "default_rules.yaml",
    )


def load_default_fuzzy_rules():
    """→ the bundled table via ``load_fuzzy_rules`` (zero quarantined
    entries — enforced by tests/test_pywb_config.py)."""
    return load_fuzzy_rules(default_rules_path())
