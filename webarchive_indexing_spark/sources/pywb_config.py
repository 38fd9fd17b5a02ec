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
    ``{regex: ...}`` mapping (pywb's extended form; sibling keys like
    ``filter``/``replace``/``type`` are accepted and ignored — they
    tune pywb's response filtering, not key derivation);
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
  ``operators.cdx_query.apply_acl`` compiles (longest-prefix-wins);
  ``allow_ignore_embargo`` maps to ``allow`` (the engine has no
  embargo clock).

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

_ACL_ACCESS = {"allow", "block", "exclude"}


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
        if isinstance(fl, str):
            pattern = fl
        elif isinstance(fl, dict):
            name = fl.get("name") if isinstance(fl.get("name"), str) else None
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
        try:
            re.compile(pattern)
        except re.error as e:
            bad.append(f"rule {i}: bad regex {pattern!r}: {e}")
            continue
        for p in prefixes:
            rules.append(
                FuzzyRule(
                    name or (f"rule{i}:{p}" if p else f"rule{i}"),
                    pattern,
                    key_prefix=p or None,
                )
            )
    return tuple(rules), bad


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
        entries.append(
            {
                "url_prefix": r.key_prefix or "",
                "fuzzy_lookup": {"name": r.name, "match": {"regex": r.pattern}},
            }
        )
    return yaml.safe_dump({"rules": entries}, sort_keys=False)


def parse_aclj_lines(
    lines: list[str],
) -> tuple[list[tuple[str, str]], list[str]]:
    """aclj text lines → ((surt_prefix, access) list, quarantined).

    Grammar per line: ``<surt> - {json}``.  Quarantined (NEVER
    widened): blank surt (would be a wildcard rule), missing
    separator, bad JSON, unknown access value."""
    out: list[tuple[str, str]] = []
    bad: list[str] = []
    for ln in lines:
        s = ln.rstrip("\n")
        if not s.strip():
            continue
        key, sep, js = s.partition(" - ")
        key = key.strip()
        if not sep or not key:
            bad.append(s)
            continue
        try:
            props = json.loads(js)
        except ValueError:
            bad.append(s)
            continue
        access = props.get("access") if isinstance(props, dict) else None
        if access == "allow_ignore_embargo":
            access = "allow"  # no embargo clock in the engine
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
