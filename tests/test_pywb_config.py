"""pywb config-file loader tests (sources/pywb_config): both file
grammars, round-trips to the in-code tables, and the quarantine
posture — a malformed entry never widens a rule and never kills the
load."""

from __future__ import annotations

import pytest

from webarchive_indexing_spark.operators.cdx_query import (
    FuzzyRule,
    apply_fuzzy_rules,
    fuzzy_key_py,
    sql_acl_access,
)
from webarchive_indexing_spark.sources.pywb_config import (
    dump_aclj,
    dump_fuzzy_rules,
    load_aclj,
    load_fuzzy_rules,
    parse_aclj_lines,
    parse_fuzzy_rules_obj,
)


def _rules_eq(a, b):
    return [(r.name, r.pattern, r.key_prefix) for r in a] == [
        (r.name, r.pattern, r.key_prefix) for r in b
    ]


# --- rules.yaml ------------------------------------------------------------


def test_dump_load_roundtrip_identity(tmp_path):
    from webarchive_indexing_spark.queries.cdx_surface import _fuzzy_match_rules

    rules = _fuzzy_match_rules()
    p = tmp_path / "rules.yaml"
    p.write_text(dump_fuzzy_rules(rules))
    loaded, bad = load_fuzzy_rules(str(p))
    assert bad == []
    assert _rules_eq(loaded, rules)


def test_plain_string_and_match_forms(tmp_path):
    p = tmp_path / "rules.yaml"
    p.write_text(
        """
rules:
  - url_prefix: ''
    fuzzy_lookup: '([?&])_=[0-9]+&?'
  - url_prefix: 'com,example)'
    fuzzy_lookup:
      match: '([?&])v=[0-9]+&?'
  - url_prefix: ['com,a)', 'com,b)']
    fuzzy_lookup:
      match:
        regex: '([?&])x=[0-9]+&?'
"""
    )
    loaded, bad = load_fuzzy_rules(str(p))
    assert bad == []
    # list url_prefix fans out to one scoped rule per prefix, in order
    assert [(r.key_prefix, r.pattern) for r in loaded] == [
        (None, "([?&])_=[0-9]+&?"),
        ("com,example)", "([?&])v=[0-9]+&?"),
        ("com,a)", "([?&])x=[0-9]+&?"),
        ("com,b)", "([?&])x=[0-9]+&?"),
    ]
    # anonymous pywb rules get deterministic derived names
    assert [r.name for r in loaded] == [
        "rule0",
        "rule1:com,example)",
        "rule2:com,a)",
        "rule2:com,b)",
    ]


def test_args_keep_list_semantics(tmp_path):
    """pywb's ``args:`` form — keep only the named params.  Java-regex
    only (negative lookahead), so pinned here, not via DuckDB."""
    p = tmp_path / "rules.yaml"
    p.write_text(
        """
rules:
  - url_prefix: 'com,youtube)/get_video_info'
    fuzzy_lookup:
      args:
        - video_id
        - html5
"""
    )
    (rule,), bad = load_fuzzy_rules(str(p))
    assert bad == []
    rules = (rule,)
    key = "com,youtube)/get_video_info?el=x&html5=1&t=9&video_id=abc"
    fz, name = fuzzy_key_py(key, rules)
    assert fz == "com,youtube)/get_video_info?html5=1&video_id=abc"
    assert name == rule.name
    # adjacent junk params strip in ONE replace-all pass
    key2 = "com,youtube)/get_video_info?a=1&b=2&video_id=abc&c=3"
    assert fuzzy_key_py(key2, rules)[0] == "com,youtube)/get_video_info?video_id=abc"
    # only kept params present -> rule must NOT fire (no zero-width match)
    key3 = "com,youtube)/get_video_info?html5=1&video_id=abc"
    assert fuzzy_key_py(key3, rules) == (key3, None)
    # prefix scope: same params elsewhere fall through
    key4 = "com,vimeo)/watch?el=x&video_id=abc"
    assert fuzzy_key_py(key4, rules) == (key4, None)
    # a param NAME that extends a kept name is junk (video_idx != video_id)
    key5 = "com,youtube)/get_video_info?video_idx=1&video_id=abc"
    assert fuzzy_key_py(key5, rules)[0] == "com,youtube)/get_video_info?video_id=abc"


def test_args_rule_spark_parity(spark, tmp_path):
    p = tmp_path / "rules.yaml"
    p.write_text(
        "rules:\n"
        "  - url_prefix: 'com,youtube)'\n"
        "    fuzzy_lookup:\n"
        "      args: [video_id]\n"
    )
    rules, bad = load_fuzzy_rules(str(p))
    assert bad == []
    keys = [
        "com,youtube)/watch?t=1&video_id=abc",
        "com,youtube)/watch?video_id=abc",
        "com,youtube)/watch",
        "com,other)/watch?t=1&video_id=abc",
    ]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: (r["key_fuzzy"], r["fuzzy_rule"])
        for r in apply_fuzzy_rules(df, "k", rules).collect()
    }
    for k in keys:
        assert got[k] == fuzzy_key_py(k, rules), k


def test_rules_yaml_quarantine():
    obj = {
        "rules": [
            "not-a-mapping",
            {"url_prefix": "com,x)"},  # no fuzzy_lookup
            {"url_prefix": 7, "fuzzy_lookup": "a"},  # bad prefix type
            {"url_prefix": "", "fuzzy_lookup": "(unclosed"},  # bad regex
            {"url_prefix": "", "fuzzy_lookup": {"args": []}},  # empty args
            {"url_prefix": "", "fuzzy_lookup": {"args": [1]}},  # bad args
            {"url_prefix": "", "fuzzy_lookup": "([?&])ok=1&?"},  # good
        ]
    }
    rules, bad = parse_fuzzy_rules_obj(obj)
    assert len(rules) == 1 and rules[0].pattern == "([?&])ok=1&?"
    assert len(bad) == 6


def test_rules_yaml_top_level_damage(tmp_path):
    p = tmp_path / "rules.yaml"
    p.write_text(":\n  - ::bad yaml::")
    rules, bad = load_fuzzy_rules(str(p))
    assert rules == () and len(bad) == 1
    p.write_text("just a string")
    rules, bad = load_fuzzy_rules(str(p))
    assert rules == () and len(bad) == 1


def test_replace_and_filter_honored(tmp_path):
    """pywb fuzzy_lookup sibling keys: ``replace:`` rewrites the
    matched span to the literal, ``filter:`` loads as param-echo
    templates (the retry becomes pywb's truncated-prefix scan + echoed
    cdx filters), and ``type:`` stays ignored.  Templates the engine
    cannot expand quarantine the WHOLE rule — never half-applied."""
    from webarchive_indexing_spark.operators.cdx_query import fuzzy_retry_spec

    p = tmp_path / "rules.yaml"
    p.write_text(
        """
rules:
  - url_prefix: 'com,facebook)'
    fuzzy_lookup:
      match: '[?&](data=[^&]+)&?'
      filter: ['urlkey:{0}']
      type: 'fuzzy'
  - url_prefix: ''
    fuzzy_lookup:
      match: 'a=[0-9]+'
      replace: 'a=1'
      type: 'fuzzy'
"""
    )
    rules, bad = load_fuzzy_rules(str(p))
    assert bad == [] and len(rules) == 2
    fb, rule = rules
    assert fb.filters == ("urlkey:{0}",)
    # the loaded filter rule produces pywb's prefix+echo retry shape
    assert fuzzy_retry_spec("com,facebook)/x?data=q7&z=1", rules) == (
        "prefix",
        "com,facebook)/x?",
        ("urlkey:data=q7",),
        fb.name,
    )
    # a filter template the regex cannot feed quarantines the rule
    p.write_text(
        """
rules:
  - url_prefix: ''
    fuzzy_lookup:
      match: 'data=[^&]+'
      filter: ['urlkey:{0}']
"""
    )
    qrules, qbad = load_fuzzy_rules(str(p))
    assert qrules == () and len(qbad) == 1 and "cannot expand" in qbad[0]
    assert rule.pattern == "a=[0-9]+" and rule.replace == "a=1"
    # the loaded replace rule REWRITES instead of stripping
    assert fuzzy_key_py("com,x)/p?a=777&b=2", (rule,)) == (
        "com,x)/p?a=1&b=2",
        rule.name,
    )
    # replace values that cannot embed identically in the shared-SQL
    # chain quarantine at load, not at query time
    p.write_text(
        """
rules:
  - url_prefix: ''
    fuzzy_lookup:
      match: 'a=[0-9]+'
      replace: "it's"
"""
    )
    rules, bad = load_fuzzy_rules(str(p))
    assert rules == () and len(bad) == 1


def test_python_only_regex_quarantined(tmp_path):
    """A rule regex Python's re accepts but Spark's Java engine (or
    the shared-SQL embedding) rejects quarantines at LOAD time — a
    bad pattern degrades to that rule not loading, never to a
    PatternSyntaxException killing the whole query."""
    p = tmp_path / "rules.yaml"
    p.write_text(
        """
rules:
  - url_prefix: ''
    fuzzy_lookup: '(?P<name>cb)=[0-9]+'
  - url_prefix: ''
    fuzzy_lookup: "it's=[0-9]+"
  - url_prefix: ''
    fuzzy_lookup: '([?&])ok=[0-9]+&?'
"""
    )
    rules, bad = load_fuzzy_rules(str(p))
    assert [r.pattern for r in rules] == ["([?&])ok=[0-9]+&?"]
    assert len(bad) == 2
    assert any("(?P" in b for b in bad)


# --- .aclj -----------------------------------------------------------------


def test_aclj_roundtrip_and_precedence(tmp_path):
    from webarchive_indexing_spark.queries.cdx_surface import _ACL_RULES

    p = tmp_path / "access.aclj"
    p.write_text(dump_aclj(_ACL_RULES, url_prefix="https://example.org/"))
    # wb-manager convention: reverse-key-sorted lines
    keys = [ln.split(" - ")[0] for ln in p.read_text().splitlines()]
    assert keys == sorted(keys, reverse=True)
    loaded, bad = load_aclj(str(p))
    assert bad == []
    assert sorted(loaded) == sorted(_ACL_RULES)
    # the compiled verdict chain is order-insensitive for distinct
    # prefixes: file order and in-code order produce the same SQL
    assert sql_acl_access("k", loaded) == sql_acl_access("k", _ACL_RULES)


def test_aclj_quarantine_never_widens():
    lines = [
        'com,example) - {"access": "allow"}',
        "",  # blank line: skipped silently
        ' - {"access": "exclude"}',  # blank surt -> would be a wildcard
        "com,example,evil)",  # no separator
        "com,example,evil) - {broken json",
        'com,example,evil) - {"access": "nuke-it"}',  # unknown access
        'com,example,evil) - ["access", "block"]',  # non-dict json
        'com,ok) - {"access": "allow_ignore_embargo", "url": "x"}',
    ]
    rules, bad = parse_aclj_lines(lines)
    # allow_ignore_embargo survives DISTINCT (embargo exemption)
    assert rules == [
        ("com,example)", "allow"),
        ("com,ok)", "allow_ignore_embargo"),
    ]
    assert len(bad) == 5
    # none of the quarantined lines became a rule for the evil subtree
    assert not any("evil" in p for p, _ in rules)
    # a backslash key is outside the SURT alphabet and cannot embed
    # identically in the shared Spark/DuckDB chain — quarantined
    rules, bad = parse_aclj_lines(['com,e\\vil) - {"access": "exclude"}'])
    assert rules == [] and len(bad) == 1


# --- fuzz: the quarantine can never raise or widen ------------------------


def test_aclj_fuzz_never_raises_never_widens():
    """Property (hypothesis): ARBITRARY text lines through the aclj
    parser never raise, and no surviving rule has a blank prefix or an
    access outside the known set — a damaged feed line can never
    become a wildcard rule (same posture as the takedown-feed
    quarantine)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.one_of(
        st.text(max_size=80),
        st.text(alphabet=' -{}":,abcdexclude', max_size=60),
        st.builds(
            lambda k, a: f'{k} - {{"access": "{a}"}}',
            st.text(max_size=20),
            st.text(max_size=12),
        ),
    )

    @given(st.lists(line, max_size=20))
    @settings(max_examples=200, deadline=None)
    def prop(lines):
        rules, bad = parse_aclj_lines(lines)
        for prefix, access in rules:
            assert prefix.strip() != ""
            assert access in {
                "allow", "block", "exclude", "allow_ignore_embargo",
            }
            assert "\\" not in prefix
        # every input line is accounted for: parsed, quarantined, or blank
        assert len(rules) + len(bad) <= len(lines)

    prop()


def test_rules_yaml_fuzz_never_raises():
    """Property (hypothesis): arbitrary parsed-YAML shapes through the
    rules parser never raise; every surviving rule carries a
    compilable pattern and a string-or-None prefix."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalar = st.one_of(
        st.none(), st.integers(), st.text(max_size=20), st.booleans()
    )
    fuzzy = st.one_of(
        scalar,
        st.dictionaries(
            st.sampled_from(["match", "args", "name", "filter", "replace"]),
            st.one_of(
                scalar,
                st.lists(scalar, max_size=3),
                st.dictionaries(
                    st.sampled_from(["regex", "args"]), scalar, max_size=2
                ),
            ),
            max_size=4,
        ),
    )
    entry = st.one_of(
        scalar,
        st.fixed_dictionaries(
            {},
            optional={
                "url_prefix": st.one_of(scalar, st.lists(scalar, max_size=3)),
                "fuzzy_lookup": fuzzy,
            },
        ),
    )
    top = st.one_of(scalar, st.fixed_dictionaries({"rules": st.lists(entry, max_size=6)}))

    @given(top)
    @settings(max_examples=200, deadline=None)
    def prop(obj):
        rules, bad = parse_fuzzy_rules_obj(obj)
        for r in rules:
            re.compile(r.pattern)  # loader guaranteed compilable
            assert r.key_prefix is None or isinstance(r.key_prefix, str)
            assert isinstance(r.name, str) and r.name

    prop()


# --- embargo (config.yaml) -------------------------------------------------


def test_embargo_load_happy_path(tmp_path):
    from webarchive_indexing_spark.sources.pywb_config import load_embargo

    p = tmp_path / "config.yaml"
    p.write_text(
        """
collection: web
embargo:
    newer:
        days: 366
"""
    )
    emb, bad = load_embargo(str(p))
    assert bad == [] and emb == {"newer": {"days": 366}}
    # fixed-date forms normalize YAML ints to ts14-prefix strings
    p.write_text("embargo:\n    before: 20200101\n")
    emb, bad = load_embargo(str(p))
    assert bad == [] and emb == {"before": "20200101"}


def test_embargo_all_or_nothing(tmp_path):
    """One malformed part poisons the WHOLE block: dropping just the
    bad clause would SERVE captures the operator meant to hide — the
    one widening direction the quarantine posture forbids."""
    from webarchive_indexing_spark.sources.pywb_config import (
        load_embargo,
        parse_embargo_obj,
    )

    # valid newer + unknown sibling -> nothing loads
    emb, bad = parse_embargo_obj(
        {"embargo": {"newer": {"days": 366}, "embargoo": 1}}
    )
    assert emb is None and bad
    # valid newer + bad unit in older -> nothing loads
    emb, bad = parse_embargo_obj(
        {"embargo": {"newer": {"days": 1}, "older": {"days": "soon"}}}
    )
    assert emb is None and bad
    # file without an embargo block is a REPORTED reason, not a
    # silent no-embargo
    p = tmp_path / "config.yaml"
    p.write_text("collection: web\n")
    emb, bad = load_embargo(str(p))
    assert emb is None and bad


def test_embargo_fuzz_never_raises_all_or_nothing():
    """Property (hypothesis): arbitrary YAML-ish shapes through the
    embargo parser never raise, and the outcome is binary — either a
    fully-validated block that apply_acl accepts verbatim, or None
    plus reasons.  Never a partial block."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from webarchive_indexing_spark.operators.cdx_query import sql_acl_access
    from webarchive_indexing_spark.sources.pywb_config import parse_embargo_obj

    scalar = st.one_of(
        st.none(), st.booleans(), st.integers(-5, 10**15), st.text(max_size=16)
    )
    duration = st.dictionaries(
        st.one_of(st.sampled_from(["years", "days", "hours", "minutes",
                                   "seconds", "weeks", ""]), st.text(max_size=8)),
        st.one_of(scalar, st.integers(0, 10**6)),
        max_size=4,
    )
    block = st.dictionaries(
        st.one_of(st.sampled_from(["before", "after", "newer", "older",
                                   "embargoo", ""]), st.text(max_size=8)),
        st.one_of(scalar, duration),
        max_size=4,
    )
    top = st.one_of(scalar, block, st.fixed_dictionaries({"embargo": st.one_of(scalar, block)}))

    @given(top)
    @settings(max_examples=250, deadline=None)
    def prop(obj):
        emb, bad = parse_embargo_obj(obj)
        assert (emb is None) != (bad == [])
        if emb is not None:
            # a block that loads green is accepted verbatim by the
            # verdict compiler (as_of supplied for relative forms)
            sql_acl_access("k", [], embargo=emb, as_of="20200101000000")

    prop()


def test_apply_acl_embargo_validation_fails_closed():
    """apply_acl/sql_acl_access re-validate embargo dicts (defense in
    depth for programmatic callers): unknown keys, bad durations, and
    relative forms without as_of all RAISE — the query dies loudly
    instead of serving embargoed captures."""
    import pytest as _pytest

    from webarchive_indexing_spark.operators.cdx_query import sql_acl_access

    with _pytest.raises(ValueError):
        sql_acl_access("k", [], embargo={"newer": {"days": 1}})  # no as_of
    with _pytest.raises(ValueError):
        sql_acl_access("k", [], embargo={"typo": 1}, as_of="2020")
    with _pytest.raises(ValueError):
        sql_acl_access("k", [], embargo={"older": {"days": -1}}, as_of="2020")
    with _pytest.raises(ValueError):
        sql_acl_access("k", [], embargo={"before": "not-a-ts"})
    with _pytest.raises(ValueError):
        sql_acl_access("k", [], embargo={}, as_of="2020")
    # backslash in a programmatic rule literal raises (shared-SQL
    # non-representability), never silently diverges
    with _pytest.raises(ValueError):
        sql_acl_access("k", [("com,a\\b", "exclude")])


def test_sql_acl_access_empty_rules_and_embargo_shape():
    """An empty rule list compiles to the bare default verdict (no
    zero-arm CASE — the ParseException path), and the embargo folds
    into arm VALUES so the chain is never duplicated."""
    from webarchive_indexing_spark.operators.cdx_query import sql_acl_access

    assert sql_acl_access("k", []) == "'allow'"
    s = sql_acl_access("k", [], embargo={"after": "2016"})
    assert s == (
        "CASE WHEN (timestamp > '20169999999999' OR timestamp IS NULL) "
        "THEN 'exclude' ELSE 'allow' END"
    )  # NULL ts14 fails CLOSED — see _embargo_pred
    # no-embargo output is byte-identical to the pre-embargo engine's
    assert sql_acl_access("k", [("p", "block")]) == (
        "CASE WHEN substr(k, 1, 1) = 'p' THEN 'block' ELSE 'allow' END"
    )
    # aie arm displays as allow; chain text appears ONCE even with
    # embargo (arm-value folding, not chain duplication)
    s = sql_acl_access(
        "k",
        [("p", "allow_ignore_embargo"), ("q", "block")],
        embargo={"newer": {"days": 10}},
        as_of="20200101000000",
    )
    assert s.count("substr(k, 1, 1) = 'q'") == 1
    assert "'allow_ignore_embargo'" not in s


def test_embargo_months_weeks_conventions():
    """months:/weeks: durations are supported with the documented
    fixed day-count conventions (years=365d, months=30d, weeks=7d —
    timedelta offsets, not calendar arithmetic), identically in the
    yaml loader and the verdict compiler."""
    from webarchive_indexing_spark.operators.cdx_query import sql_acl_access
    from webarchive_indexing_spark.sources.pywb_config import parse_embargo_obj

    emb, bad = parse_embargo_obj(
        {"embargo": {"newer": {"months": 2, "weeks": 1}}}
    )
    assert bad == [] and emb == {"newer": {"months": 2, "weeks": 1}}
    # 2020-03-01 - (2*30 + 1*7) days = 2019-12-25
    s = sql_acl_access("k", [], embargo=emb, as_of="20200301000000")
    assert "'20191225000000'" in s
    # 1 year = a fixed 365 days: over 2020-02-29 the window lands on
    # 2019-03-02, NOT the calendar anniversary 2019-03-01
    s = sql_acl_access(
        "k", [], embargo={"older": {"years": 1}}, as_of="20200301000000"
    )
    assert "'20190302000000'" in s


def test_bundled_default_rules_load_clean():
    """The shipped data/default_rules.yaml loads with ZERO quarantined
    entries and exercises every grammar form: global strips, a scoped
    param-echo filter rule, the args: keep-list, and the removeall
    fallback — a deployment can start from it as pywb users start from
    pywb's default rules."""
    from webarchive_indexing_spark.operators.cdx_query import fuzzy_retry_spec
    from webarchive_indexing_spark.sources.pywb_config import (
        load_default_fuzzy_rules,
    )

    rules, bad = load_default_fuzzy_rules()
    assert bad == []
    names = [r.name for r in rules]
    assert names == [
        "jsonp", "cachebust", "session", "youtube-watch",
        "youtube-getvideoinfo", "googlevideo", "removeall",
    ]
    # strip family
    assert fuzzy_retry_spec(
        "com,example)/p?_cb=123", rules
    ) == ("key", "com,example)/p", (), "cachebust")
    # the echo rule fires only under its SURT prefix, with the id echoed
    assert fuzzy_retry_spec(
        "com,youtube)/watch?t=9s&v=abc_12-Z", rules
    ) == ("prefix", "com,youtube)/watch?", ("urlkey:v=abc_12-Z",),
          "youtube-watch")
    # args keep-list (Java-only pattern; py twin exercises it)
    assert fuzzy_key_py(
        "com,youtube)/get_video_info?el=x&video_id=abc",
        tuple(r for r in rules if not r.filters),
    )[0] == "com,youtube)/get_video_info?video_id=abc"
    # scoped googlevideo strip + terminal fallback
    assert fuzzy_retry_spec(
        "com,googlevideo,r4---sn)/videoplayback?expire=1&id=9", rules
    )[3] == "googlevideo"
    assert fuzzy_retry_spec("com,other)/p?zz=1", rules)[3] == "removeall"
