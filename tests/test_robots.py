"""Crawl politeness tier: robots.txt parse/admission + frontier schedule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import robots as R

ROBOTS = """# top comment
User-agent: googlebot
Disallow: /

User-agent: alpha
User-agent: *
DISALLOW: /private   # trailing comment
Allow: /private/pub
Disallow: /*.pdf$
Disallow:
Crawl-delay: 3
Crawl-delay: 9

User-agent: other
Disallow: /other
Crawl-delay: 7
"""


def _group(spark, txt, agent="*"):
    df = spark.createDataFrame([(txt,)], "robots string")
    rows = df.select(R.robots_group(F.col("robots"), agent).alias("g")).collect()
    return [(r["allow"], r["pattern"]) for r in rows[0]["g"]]


def test_star_group_rules_parse(spark):
    # googlebot's Disallow:/ and other's /other must NOT leak into *;
    # the empty Disallow: line is vacuous (RFC 9309) and emits no rule
    assert _group(spark, ROBOTS) == [
        (False, "/private"),
        (True, "/private/pub"),
        (False, "/*.pdf$"),
    ]


def test_stacked_user_agent_lines_share_rules(spark):
    # "alpha" stacks onto the same group as *
    assert _group(spark, ROBOTS, "alpha") == _group(spark, ROBOTS)


def test_specific_agent_precedence(spark):
    assert _group(spark, ROBOTS, "googlebot") == [(False, "/")]
    assert _group(spark, ROBOTS, "other") == [(False, "/other")]


def test_empty_specific_group_means_allow_all_not_star_fallback(spark):
    txt = "User-agent: bot\n\nUser-agent: *\nDisallow: /\n"
    # bot has a group with no rules -> everything allowed for bot,
    # NOT the * group's Disallow-everything
    assert _group(spark, txt, "bot") == []
    assert _group(spark, txt) == [(False, "/")]


def test_crawl_delay_first_value_wins_with_precedence(spark):
    df = spark.createDataFrame([(ROBOTS,)], "robots string")
    got = df.select(
        R.robots_crawl_delay(F.col("robots")).alias("star"),
        R.robots_crawl_delay(F.col("robots"), "other").alias("other"),
        R.robots_crawl_delay(F.col("robots"), "googlebot").alias("gbot"),
    ).collect()[0]
    assert got["star"] == 3.0  # first of the two delays in the group
    assert got["other"] == 7.0
    assert got["gbot"] is None  # its group sets no delay; no * fallback


def test_pattern_regex_wildcards_and_literals(spark):
    pats = ["/a*b$", "/p(1).x", "/mid$dle", "/plain"]
    df = spark.createDataFrame([(p,) for p in pats], "p string")
    got = {
        r["p"]: r["rx"]
        for r in df.select("p", R.pattern_regex(F.col("p")).alias("rx")).collect()
    }
    assert got["/a*b$"] == "^/a.*b$"
    assert got["/p(1).x"] == r"^/p\(1\)\.x"
    assert got["/mid$dle"] == r"^/mid\$dle"
    assert got["/plain"] == "^/plain"


@pytest.fixture()
def rules(spark):
    df = spark.createDataFrame([("ex.org", ROBOTS)], "domain string, robots string")
    return R.robots_rules(df, "domain", "robots")


def _admit(spark, rules, url, **kw):
    urls = spark.createDataFrame([(url,)], "url string")
    row = R.robots_allowed(urls, "url", rules, **kw).collect()[0]
    return row["crawl_allowed"], row["matched_pattern"]


def test_admission_longest_match_and_ties(spark, rules):
    assert _admit(spark, rules, "https://ex.org/private/x") == (False, "/private")
    # longer Allow beats shorter Disallow
    assert _admit(spark, rules, "https://ex.org/private/pub/1") == (
        True,
        "/private/pub",
    )
    # prefix semantics: /privateer matches /private
    assert _admit(spark, rules, "https://ex.org/privateer") == (False, "/private")


def test_admission_wildcard_anchor_and_query(spark, rules):
    assert _admit(spark, rules, "https://ex.org/d/x.pdf") == (False, "/*.pdf$")
    # query string is part of the match target, so the $ anchor misses
    assert _admit(spark, rules, "https://ex.org/d/x.pdf?dl=1") == (True, "")


def test_admission_defaults_to_allowed(spark, rules):
    # no matching rule; and a host with no rules at all
    assert _admit(spark, rules, "https://ex.org/open/page") == (True, "")
    assert _admit(spark, rules, "https://nobody.net/anything") == (True, "")
    assert _admit(
        spark, rules, "https://ex.org/open/page", broadcast_rules=True
    ) == (True, "")


def test_admission_key_grain_host_vs_domain(spark, rules):
    # robots.txt is per host: a subdomain does NOT inherit ex.org's
    # rules under the default host grain...
    assert _admit(spark, rules, "https://www.ex.org/private/x") == (True, "")
    # ...but does under the curator-policy domain grain
    assert _admit(
        spark, rules, "https://www.ex.org/private/x", key="domain"
    ) == (False, "/private")
    with pytest.raises(ValueError, match="key must be"):
        _admit(spark, rules, "https://ex.org/x", key="page")


def test_frontier_schedule_budget_and_cap(spark):
    fr = spark.createDataFrame(
        [(f"https://www.ex{i % 2}.org/p{i:02d}", float(100 - i)) for i in range(10)],
        "url string, prio double",
    )
    out = R.frontier_schedule(
        fr, "url", "prio", per_domain_budget=2, max_per_domain=4
    ).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert set(by_dom) == {"ex0.org", "ex1.org"}
    for rows in by_dom.values():
        assert len(rows) == 4  # cap applied
        rows.sort(key=lambda r: -r["prio"])
        assert [(r["fetch_cycle"], r["cycle_slot"]) for r in rows] == [
            (0, 0),
            (0, 1),
            (1, 0),
            (1, 1),
        ]


def test_frontier_schedule_politeness_grain_under_psl_wildcards(spark):
    """The politeness budget keys on the PSL registered domain, wildcard
    rules included: under *.ck every direct child of .ck is a public
    suffix, so a.shop.ck and b.shop.ck are DIFFERENT registrants (their
    own budgets) while www.a.shop.ck shares a.shop.ck's; the !www.ck
    exception makes www.ck its own registrable grain."""
    fr = spark.createDataFrame(
        [
            ("https://a.shop.ck/p1", 9.0),
            ("https://www.a.shop.ck/p2", 8.0),   # same registrant as p1
            ("https://b.shop.ck/p3", 7.0),       # different registrant
            ("https://www.ck/p4", 6.0),          # !www.ck exception grain
            ("https://sub.www.ck/p5", 5.0),      # registers under www.ck
        ],
        "url string, prio double",
    )
    out = R.frontier_schedule(fr, "url", "prio", per_domain_budget=1).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["fetch_cycle"])
    assert set(by_dom) == {"a.shop.ck", "b.shop.ck", "www.ck"}
    # shared grains serialize into successive fetch cycles (budget 1)
    assert sorted(by_dom["a.shop.ck"]) == [0, 1]
    assert sorted(by_dom["www.ck"]) == [0, 1]
    assert by_dom["b.shop.ck"] == [0]


def test_frontier_schedule_validates_budget(spark):
    fr = spark.createDataFrame([("https://a.org/x", 1.0)], "url string, prio double")
    with pytest.raises(ValueError, match="per_domain_budget"):
        R.frontier_schedule(fr, "url", "prio", per_domain_budget=0)


def test_bom_and_crlf_robots_parse(spark):
    txt = "﻿User-agent: *\r\nDisallow: /x\r\n"
    assert _group(spark, txt) == [(False, "/x")]


def test_robots_sitemaps_global_any_group(spark):
    txt = (
        "﻿Sitemap: https://ex.org/s1.xml\n"
        "User-agent: bot\nDisallow: /\n"
        "sitemap: https://ex.org/s2.xml   # comment\n"
        "Sitemap:\n"  # empty -> skipped
    )
    df = spark.createDataFrame([(txt,)], "robots string")
    got = df.select(R.robots_sitemaps(F.col("robots")).alias("s")).collect()[0]["s"]
    assert got == ["https://ex.org/s1.xml", "https://ex.org/s2.xml"]


def test_admission_host_root_url_matches_disallow_all(spark):
    # RFC 9309: empty path is '/' — 'Disallow: /' must block the homepage
    df = spark.createDataFrame(
        [("blocked.example.com", "User-agent: *\nDisallow: /\n")],
        "domain string, robots string",
    )
    rules = R.robots_rules(df, "domain", "robots")
    assert _admit(spark, rules, "https://blocked.example.com") == (False, "/")
    assert _admit(spark, rules, "https://blocked.example.com?a=1") == (False, "/")


def test_frontier_schedule_with_precomputed_domain_column(spark):
    fr = spark.createDataFrame(
        [("u1", 2.0, "siteA"), ("u2", 1.0, "siteA"), ("u3", 3.0, "siteB")],
        "url string, prio double, domain string",
    )
    out = R.frontier_schedule(fr, "url", "prio", per_domain_budget=1,
                              domain_col="domain").collect()
    assert sorted((r["domain"], r["url"], r["fetch_cycle"]) for r in out) == [
        ("siteA", "u1", 0), ("siteA", "u2", 1), ("siteB", "u3", 0),
    ]
    # exactly one domain column in the output
    assert [f for f in out[0].asDict()].count("domain") == 1
