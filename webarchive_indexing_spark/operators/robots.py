"""robots.txt evaluation → CDX ``robotflags`` (SURVEY.md §2 tier B;
[B IA CDX robotflags 'A' = blocked-by-robots; pywb/IA wayback robots
handling]).

The classic CDX line carries a ``robotflags`` field the engine's
parsers faithfully round-trip but never COMPUTE — the flag exists
because archives evaluate each capture's URL against its host's
robots.txt and mark disallowed captures ('A'), which replay UIs and
the cdx-server's filter grammar then honor.  This module is that
evaluator, relational end to end:

* ``parse_robots`` — robots.txt TEXT per host → a rule table
  ``(host, prefix, allow, like_pat)``: the ``User-agent: *`` groups'
  ``Allow:`` / ``Disallow:`` path patterns, with stacked user-agent
  lines ("User-agent: a\\nUser-agent: *\\nDisallow: /x" — the run
  governs the rules below it), comments and other agents' groups
  ignored.  FULL RFC 9309 pattern grammar (round 10): ``*`` matches
  any character run and a trailing ``$`` anchors the end — each
  pattern compiles ONCE at parse time to a SQL LIKE pattern
  (metacharacters escaped, ``*`` → ``%``, trailing ``$`` dropped
  instead of appending the open-ended ``%``), so matching stays a
  JVM-side LIKE, no regex per row.  A mid-pattern ``$`` is literal
  (the RFC anchors only at the end).  An empty ``Disallow:`` is the
  classic allow-everything no-op and is dropped.
* ``apply_robots`` — captures ⋈ rules on host, the longest matching
  pattern wins (length convention: octets of the pattern text as
  written, wildcards included — Google's documented most-specific
  rule), Allow beats Disallow on equal length; winners that disallow
  mark ``robotflags='A'``.

Scale shape: robots.txt files are per-HOST (metadata-sized relative
to captures); the parse is one posexplode + per-host window over
line positions (robots files are small — the window partitions on
host, never a global order), and the apply is ONE equi-join on host
with the prefix test as a join residual + one per-capture argmax
window.  Rule tables for even millions of hosts stay a fraction of
capture volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def parse_robots(
    robots: DataFrame, *, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → (host, prefix, allow) rule rows for the
    ``User-agent: *`` groups.  See the module docstring for the
    grammar subset."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        # strip comments, then whitespace; directives are case-blind
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias(
            "directive"
        ),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "value"
        ),
    ).filter(F.col("directive").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("directive") == "user-agent"
    run_start = is_ua & ~F.coalesce(
        F.lag(is_ua.cast("boolean")).over(w), F.lit(False)
    )
    grouped = parsed.withColumn(
        "grp", F.sum(run_start.cast("int")).over(w)
    )
    star_groups = (
        grouped.filter(is_ua & (F.col("value") == "*"))
        .select("host", "grp")
        .distinct()
    )
    rules = grouped.filter(~is_ua).join(star_groups, ["host", "grp"])
    # compile each pattern to a LIKE pattern once, at parse time:
    # escape LIKE metacharacters, '*' → '%', a trailing '$' anchors
    # (no open-ended '%'), otherwise the pattern is a prefix ('%'
    # appended).  An empty Disallow is the classic allow-everything
    # no-op (dropped — no rule is exactly allow-by-default).
    esc = F.regexp_replace("value", r"([%_\\])", r"\\$1")
    star = F.replace(esc, F.lit("*"), F.lit("%"))
    with_star = rules.filter(F.col("value") != "").withColumn("__star", star)
    like_pat = F.when(
        F.col("__star").endswith("$"),
        F.expr("substring(__star, 1, length(__star) - 1)"),
    ).otherwise(F.concat(F.col("__star"), F.lit("%")))
    return with_star.select(
        "host",
        F.col("value").alias("prefix"),
        (F.col("directive") == "allow").alias("allow"),
        like_pat.alias("like_pat"),
    )


def apply_robots(
    cdx: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    flags_col: str = "robotflags",
) -> DataFrame:
    """Mark robots-disallowed captures: per capture, the longest
    matching rule prefix wins (Allow beats Disallow at equal length);
    a winning Disallow sets ``robotflags='A'`` [B IA CDX robotflags];
    no matching rule (or no robots.txt for the host) means allowed —
    NULL flags, the CDX convention the parsers already round-trip.

    Scoping: captures key on the FULL authority ``host[:port]``
    (userinfo stripped, lowercased) — RFC 9309 scopes robots.txt per
    scheme+host+port, so ``http://host:8080/`` is governed only by
    rules whose ``host`` column says ``host:8080``, never by bare
    ``host``'s file.  Rule tables must carry the same authority form.

    Row identity: the per-capture argmax window keys on a surrogate
    id minted BEFORE the join (``monotonically_increasing_id`` —
    partition-local counters, no shuffle), so (a) fully identical
    duplicate capture rows each survive with their own flag, and
    (b) the shuffle hashes one long instead of every (possibly wide
    string) input column."""
    host = F.lower(
        F.regexp_extract(
            url_col, r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1
        )
    )
    path = F.regexp_replace(
        url_col, r"^[a-z][a-z0-9+.-]*://[^/?#]*", ""
    )
    path = F.when(path == "", "/").otherwise(path)
    keyed = (
        cdx.withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("__host", host)
        .withColumn("__path", path)
    )
    j = keyed.join(
        rules.select(
            F.col("host").alias("__host"),
            F.col("prefix").alias("__prefix"),
            F.col("allow").alias("__allow"),
            F.col("like_pat").alias("__like"),
        ),
        on="__host",
        how="left",
    ).withColumn(
        # a rule row only COMPETES when its pattern matches the path
        # (LIKE compiled at parse time — '*' runs and '$' anchors per
        # RFC 9309); non-matching rows must still carry the capture
        # through (a rule-bearing host whose rules all miss is
        # ALLOWED, not dropped)
        "__match",
        F.col("__like").isNotNull() & F.expr("__path LIKE __like"),
    )
    w = Window.partitionBy("__rid").orderBy(
        F.col("__match").desc(),
        F.length("__prefix").desc_nulls_last(),
        F.col("__allow").desc_nulls_last(),
    )
    best = j.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") == 1
    )
    flag = F.when(
        F.col("__match") & ~F.col("__allow"), F.lit("A")
    ).otherwise(F.lit(None).cast("string"))
    flagged = best.withColumn(flags_col, flag)
    cols = list(cdx.columns)
    if flags_col not in cols:
        cols.append(flags_col)
    return flagged.select(*cols)
