"""Crawl politeness: robots.txt parsing, URL admission, frontier scheduling.

A crawl-scale ingest cannot legally or practically fetch every discovered
URL: robots.txt says what each host permits, and per-domain politeness
budgets say how fast. This module supplies both halves as pure DataFrame
operators:

- :func:`robots_rules` parses raw robots.txt text (RFC 9309 semantics:
  user-agent groups with specific-agent precedence over ``*``, stacked
  ``User-agent`` lines, ``#`` comments, ``*`` / trailing-``$`` wildcards
  in rule paths) into an exploded (domain, allow, pattern) relation.
  The line-ordered, group-stateful parse — inherently sequential per
  document — runs as ONE ``F.aggregate`` fold over the split lines:
  JVM-side, map-only, no Python, no UDF.
- :func:`robots_allowed` joins candidate URLs against the rules on the
  site key — per-HOST by default, the grain robots.txt is actually
  fetched at (RFC 9309); registered-domain grain opt-in for
  curator-imposed domain policy — and resolves each URL with
  Google/RFC-9309 precedence:
  longest (most-specific) matching pattern wins, ``Allow`` beats
  ``Disallow`` on ties, no matching rule means allowed. Rule patterns
  compile to anchored Java regexes by COLUMN arithmetic (escape, ``*``
  → ``.*``, trailing ``$`` → anchor) so matching is `regexp_like`
  inside codegen — no per-rule driver work, robots relations with
  millions of domains stay fully distributed.
- :func:`frontier_schedule` turns a scored frontier (priority = e.g.
  PageRank × novelty from the link-graph tier) into per-domain fetch
  cycles under a politeness budget: at most ``per_domain_budget``
  fetches per domain per cycle, highest priority first.

Scale shape: rules explode to (domains × rules-per-domain) rows —
domain-sized, not page-sized; the admission join shuffles on the domain
key both sides (or broadcasts when the rules relation is small). The
scheduler is one window over the domain partition — politeness is
per-domain sequential by definition, so domain is the natural partition
grain; a mega-domain's queue is bounded with ``max_per_domain`` BEFORE
ranking cost matters (the filter runs on the same window rank).

Reference behavior anchor: the reference repo ingests from curated
sources and has no crawl tier; this extends the engine toward the
crawl-corpus pipelines (CommonCrawl-style) described in public corpus
papers (C4, RefinedWeb, Gopher).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import urls as urls_ops

_RULE_TYPE = "array<struct<allow:boolean,pattern:string>>"
_STATE_TYPE = (
    "struct<in_ua:boolean,star_on:boolean,agent_on:boolean,agent_seen:boolean,"
    "star:array<struct<allow:boolean,pattern:string>>,"
    "agent:array<struct<allow:boolean,pattern:string>>,"
    "star_delay:string,agent_delay:string>"
)


def _fold_robots(robots: Column, agent: str) -> Column:
    """Fold robots.txt lines into parse state (see _STATE_TYPE).

    RFC 9309 group semantics: consecutive ``User-agent`` lines stack
    onto one group; the first non-user-agent line closes the stack;
    rules bind to every agent named in the open group. Rules for the
    specific ``agent`` and for ``*`` accumulate separately so the
    caller can apply specific-group precedence. ``#`` starts a comment
    anywhere on a line. Directive names are case-insensitive; rule
    paths are case-sensitive (they address URLs).
    """
    agent_l = agent.lower()
    init = F.lit(None).cast(_STATE_TYPE)
    # a NULL-typed literal struct can't be field-updated; build the real
    # initial value explicitly
    init = F.struct(
        F.lit(False).alias("in_ua"),
        F.lit(False).alias("star_on"),
        F.lit(False).alias("agent_on"),
        F.lit(False).alias("agent_seen"),
        F.array().cast(_RULE_TYPE).alias("star"),
        F.array().cast(_RULE_TYPE).alias("agent"),
        F.lit(None).cast("string").alias("star_delay"),
        F.lit(None).cast("string").alias("agent_delay"),
    )

    def step(acc: Column, raw: Column) -> Column:
        line = F.trim(F.regexp_replace(raw, "#.*$", ""))
        lline = F.lower(line)
        is_ua = lline.rlike(r"^user-agent\s*:")
        is_allow = lline.rlike(r"^allow\s*:")
        is_dis = lline.rlike(r"^disallow\s*:")
        is_delay = lline.rlike(r"^crawl-delay\s*:")
        # value after the FIRST colon, original case (paths are
        # case-sensitive); directive matching above is on the lowered line
        value = F.trim(F.regexp_extract(line, r"^[^:]*:(.*)$", 1))
        ua_val = F.lower(value)
        star_on = F.when(
            is_ua,
            F.when(acc["in_ua"], acc["star_on"] | (ua_val == "*")).otherwise(
                ua_val == "*"
            ),
        ).otherwise(acc["star_on"])
        agent_on = F.when(
            is_ua,
            F.when(acc["in_ua"], acc["agent_on"] | (ua_val == agent_l)).otherwise(
                ua_val == agent_l
            ),
        ).otherwise(acc["agent_on"])
        rule = F.struct(is_allow.alias("allow"), value.alias("pattern"))
        # empty Disallow: means "no restriction" (RFC 9309) — no rule;
        # empty Allow: is equally vacuous
        is_rule = (is_allow | is_dis) & (value != "")
        star = F.when(
            is_rule & acc["star_on"], F.array_append(acc["star"], rule)
        ).otherwise(acc["star"])
        agent_rules = F.when(
            is_rule & acc["agent_on"], F.array_append(acc["agent"], rule)
        ).otherwise(acc["agent"])
        star_delay = F.when(
            is_delay & acc["star_on"] & acc["star_delay"].isNull(), value
        ).otherwise(acc["star_delay"])
        agent_delay = F.when(
            is_delay & acc["agent_on"] & acc["agent_delay"].isNull(), value
        ).otherwise(acc["agent_delay"])
        return F.struct(
            is_ua.alias("in_ua"),
            star_on.alias("star_on"),
            agent_on.alias("agent_on"),
            (acc["agent_seen"] | agent_on).alias("agent_seen"),
            star.alias("star"),
            agent_rules.alias("agent"),
            star_delay.alias("star_delay"),
            agent_delay.alias("agent_delay"),
        )

    # real robots files frequently start with a UTF-8 BOM, which would
    # otherwise glue itself to the first directive name and silently
    # void the first group
    return F.aggregate(
        F.split(F.regexp_replace(robots, "^\ufeff", ""), r"\r?\n"), init, step
    )


def robots_group(robots: Column, agent: str = "*") -> Column:
    """The rule array governing ``agent``: its own group's rules when a
    group named it (even an empty one — a present-but-empty specific
    group means "everything allowed", NOT "fall back to *", per RFC
    9309), else the ``*`` group's. ``array<struct<allow, pattern>>``."""
    st = _fold_robots(robots, agent)
    if agent == "*":
        return st["star"]
    return F.when(st["agent_seen"], st["agent"]).otherwise(st["star"])


def robots_crawl_delay(robots: Column, agent: str = "*") -> Column:
    """Crawl-delay (seconds, double; NULL when unset) for ``agent``,
    with the same specific-group-over-* precedence as the rules."""
    st = _fold_robots(robots, agent)
    if agent == "*":
        return st["star_delay"].try_cast("double")
    return (
        F.when(st["agent_seen"], st["agent_delay"])
        .otherwise(st["star_delay"])
        .try_cast("double")
    )


def robots_sitemaps(robots: Column) -> Column:
    """``Sitemap:`` URLs declared anywhere in robots.txt —
    ``array<string>``. Per RFC 9309 the directive is GLOBAL (not
    group-scoped), so this is one case-insensitive multiline regex
    pass, no fold. Feeds :func:`urls.sitemap_entries` to close the
    frontier-seeding loop: robots → sitemaps → URLs."""
    cleaned = F.regexp_replace(robots, "^\ufeff", "")
    lines = F.regexp_extract_all(
        cleaned, F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^#\r\n]+)"), F.lit(1)
    )
    # NB: transform(lines, F.trim) would pass the element INDEX as
    # trim's second (trim-chars) argument — explicit lambda required
    return F.filter(F.transform(lines, lambda x: F.trim(x)), lambda x: x != "")


def pattern_regex(pattern: Column) -> Column:
    """Compile a robots rule path to an anchored Java regex, by column
    arithmetic: regex metachars escaped, ``*`` → ``.*``, a trailing
    ``$`` → end anchor (a mid-pattern ``$`` is literal). Prefix
    semantics: the result is left-anchored and open on the right unless
    the rule ended with ``$``."""
    esc = F.regexp_replace(pattern, r"([.^+?(){}\[\]|\\])", r"\\$1")
    anchored = esc.rlike(r"\$$")
    body = F.when(anchored, F.substr(esc, F.lit(1), F.length(esc) - 1)).otherwise(esc)
    body = F.regexp_replace(body, r"\$", r"\\\$")
    body = F.regexp_replace(body, r"\*", ".*")
    return F.concat(
        F.lit("^"), body, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def robots_rules(
    robots_df: DataFrame,
    domain_col: str,
    robots_col: str,
    agent: str = "*",
) -> DataFrame:
    """Exploded per-domain rule relation: (domain, allow, pattern,
    specificity, regex). One parse fold + one explode per robots file;
    output is domain-sized. Domains whose robots yield no applicable
    rules emit no rows (the admission join's left side defaults them to
    allowed). Specificity is the rule-path length — the RFC-9309 /
    Google most-specific-match ordering key."""
    rules = robots_df.select(
        F.col(domain_col).alias("domain"),
        F.explode(robots_group(F.col(robots_col), agent)).alias("r"),
    )
    return rules.select(
        "domain",
        F.col("r.allow").alias("allow"),
        F.col("r.pattern").alias("pattern"),
        F.length("r.pattern").cast("int").alias("specificity"),
        pattern_regex(F.col("r.pattern")).alias("regex"),
    )


def robots_allowed(
    urls_df: DataFrame,
    url_col: str,
    rules: DataFrame,
    broadcast_rules: bool = False,
    key: str = "host",
) -> DataFrame:
    """Attach ``crawl_allowed`` (boolean) and ``matched_pattern`` (the
    winning rule's path, '' when no rule matched) to every input row.

    Match target is path + '?query' of the URL (fragments never reach
    the server); candidate rules come from an inner join of the URL's
    ``key`` — ``"host"`` (the RFC-9309 grain: robots.txt is fetched per
    host, so the rules relation is keyed by the host it was fetched
    from) or ``"domain"`` (registered-domain grain, for curator-imposed
    domain-level policy) — against the rules' ``domain`` column, so
    only same-site rules are ever evaluated.
    Winner = max(struct(specificity, allow)) — longest pattern first,
    Allow over Disallow on ties. URLs on hosts with no rules (or
    matching none) are allowed: robots is deny-by-exception.

    Two shuffles worst-case (rules join + winner agg on the URL key);
    set ``broadcast_rules=True`` when the rule relation is small enough
    to broadcast, which removes the first. The winner aggregate is a
    partial-aggregatable max — no window, no skew hotspot even for a
    domain holding most of the frontier."""
    if key not in ("host", "domain"):
        raise ValueError(f"key must be 'host' or 'domain', got {key!r}")
    c = F.col(url_col)
    q = urls_ops.url_part(c, 4)
    path = urls_ops.url_part(c, 3)
    # RFC 9309: an empty path is '/' — without the fold, a host-root URL
    # ('https://ex.org', no trailing slash) would dodge even Disallow: /
    path = F.when(path == "", F.lit("/")).otherwise(path)
    target = F.concat(
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    site = (
        urls_ops.url_host(c)
        if key == "host"
        else urls_ops.registered_domain(urls_ops.url_host(c))
    )
    lhs = urls_df.select(
        F.col(url_col).alias("_u"),
        site.alias("_dom"),
        target.alias("_target"),
    )
    rhs = rules.select(
        F.col("domain").alias("_dom"),
        "allow",
        "pattern",
        "specificity",
        "regex",
    )
    if broadcast_rules:
        rhs = F.broadcast(rhs)
    hits = (
        lhs.join(rhs, "_dom")
        .filter(F.regexp_like(F.col("_target"), F.col("regex")))
        .groupBy("_u")
        .agg(
            F.max(
                F.struct(
                    F.col("specificity"),
                    F.col("allow"),
                    F.col("pattern"),
                )
            ).alias("w")
        )
        .select(
            "_u",
            F.col("w.allow").alias("_allowed"),
            F.col("w.pattern").alias("_matched"),
        )
    )
    out = urls_df.join(
        hits, urls_df[url_col] == hits["_u"], "left"
    )
    return out.select(
        *[urls_df[c0] for c0 in urls_df.columns],
        F.coalesce(F.col("_allowed"), F.lit(True)).alias("crawl_allowed"),
        F.coalesce(F.col("_matched"), F.lit("")).alias("matched_pattern"),
    )


def frontier_schedule(
    frontier: DataFrame,
    url_col: str,
    priority_col: str,
    per_domain_budget: int = 10,
    max_per_domain: int | None = None,
    domain_col: str | None = None,
) -> DataFrame:
    """Assign each frontier URL a politeness-scheduled fetch cycle:
    within each registered domain, URLs rank by priority (descending,
    URL string as the deterministic tie-break) and cycle
    ``rank // per_domain_budget`` — at most ``per_domain_budget``
    fetches per domain per cycle, best first. ``max_per_domain`` drops
    the queue tail past the cap (the knob that bounds a mega-domain's
    share of the crawl). Output adds ``domain``, ``fetch_cycle``,
    ``cycle_slot``.

    One window over the domain partition — politeness is per-domain
    sequential by definition so this is the minimal shape; the cap
    applies on the SAME rank so no second pass. Domain comes from the
    URL unless ``domain_col`` names a precomputed column."""
    if per_domain_budget < 1:
        raise ValueError(f"per_domain_budget must be >= 1, got {per_domain_budget}")
    from pyspark.sql.window import Window

    c = F.col(url_col)
    dom = (
        F.col(domain_col)
        if domain_col
        else urls_ops.registered_domain(urls_ops.url_host(c))
    )
    ranked = frontier.withColumn("_dom", dom).withColumn(
        "_rank",
        F.row_number().over(
            Window.partitionBy("_dom").orderBy(
                F.col(priority_col).desc(), F.col(url_col)
            )
        )
        - 1,
    )
    if max_per_domain is not None:
        ranked = ranked.filter(F.col("_rank") < max_per_domain)
    # output 'domain' IS the scheduling key; an input column of the same
    # name is either that key already (domain_col='domain') or replaced
    # by the computed key — never duplicated into an ambiguous pair
    passthrough = [frontier[c0] for c0 in frontier.columns if c0 != "domain"]
    return ranked.select(
        *passthrough,
        F.col("_dom").alias("domain"),
        (F.col("_rank") / per_domain_budget).cast("int").alias("fetch_cycle"),
        (F.col("_rank") % per_domain_budget).cast("int").alias("cycle_slot"),
    )
