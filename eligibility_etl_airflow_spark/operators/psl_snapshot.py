"""Vendored snapshot of multi-label public suffixes.

A *public suffix* is a domain under which internet users can directly
register names (`publicsuffix.org` — the Mozilla-maintained Public
Suffix List, MPL-2.0, a public resource). The registered domain
(eTLD+1) of a host is one label more than its longest matching public
suffix; getting this wrong merges unrelated sites — `a.example.co.uk`
and `b.other.co.uk` are different registrants, but a naive
last-two-labels rule calls them both `co.uk` — which corrupts
politeness budgets, domain-grain PageRank, and domain blocklists.

This module vendors a *snapshot subset*: the single-label TLD case
needs no table (last-two-labels is already correct there), so only
multi-label ICANN suffixes plus the most common private-section
suffixes (hosting platforms whose subdomains belong to unrelated
users) are listed. The set is compiled into a literal Catalyst
``IN``-set predicate — JVM-side, codegen'd, zero join, zero shuffle —
so the lookup runs at scan speed. A production deployment regenerates
these tuples from the full, current PSL file with the one-liner in the
docstring of :func:`eligibility_etl_airflow_spark.operators.urls.registered_domain`;
the column shape and plan shape are identical at any list size
(Catalyst switches In → InSet hash lookup past a handful of entries).

Wildcard rules (``*.ck``-style) and their ``!``-exceptions ARE modeled,
as two more ``IN``-set ladders: ``WILDCARD_PARENTS_<n>`` lists the
suffixes whose DIRECT children are all public suffixes (so the
registered domain under them is one label deeper than the explicit-
suffix case), and ``EXCEPTION_HOSTS_<n>`` lists the ``!`` carve-outs —
hosts that the wildcard would have made public suffixes but that are in
fact registrable themselves (``!www.ck`` → ``www.ck`` is a registered
domain, and ``anything.www.ck`` registers under it). PSL precedence —
exception beats wildcard beats explicit, longest match first — becomes
the ``when()`` ladder order in ``registered_domain``.
"""

from __future__ import annotations

# Two-label public suffixes: a host ending in one of these registers at
# the THIRD label from the right (registered domain = last 3 labels).
SUFFIXES_2 = (
    # United Kingdom
    "co.uk", "org.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk",
    "ac.uk", "gov.uk", "sch.uk", "nhs.uk", "police.uk",
    # Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "geek.nz",
    "gen.nz", "iwi.nz", "maori.nz", "school.nz",
    # South Africa
    "co.za", "net.za", "org.za", "ac.za", "gov.za", "web.za",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "blog.br", "eco.br", "emp.br",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "gov.in", "mil.in", "nic.in", "res.in",
    # South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    # Mexico / Argentina / Colombia / Venezuela / Peru / Ecuador
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "nom.pe",
    "com.ec", "net.ec", "org.ec", "gob.ec", "edu.ec",
    # Turkey
    "com.tr", "net.tr", "org.tr", "gen.tr", "web.tr", "av.tr",
    "bbs.tr", "bel.tr", "gov.tr", "edu.tr", "k12.tr",
    # Russia-adjacent ccTLD conventions
    "com.ua", "net.ua", "org.ua", "in.ua", "gov.ua", "edu.ua",
    "kiev.ua", "lviv.ua", "od.ua", "kh.ua",
    # Poland
    "com.pl", "net.pl", "org.pl", "biz.pl", "info.pl", "edu.pl",
    "gov.pl", "waw.pl", "wroc.pl", "krakow.pl",
    # Israel
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    # Southeast Asia
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "name.my",
    "co.id", "net.id", "or.id", "web.id", "sch.id", "go.id", "ac.id",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    # Hong Kong / Taiwan / Macau
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.mo", "net.mo", "org.mo", "edu.mo", "gov.mo",
    # Middle East / Africa
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng",
    "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz",
    # Europe misc
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    # Private-section hosting platforms: subdomains belong to
    # unrelated users, so each subdomain IS the registrable grain
    "github.io", "gitlab.io", "githubusercontent.com",
    "blogspot.com", "appspot.com", "herokuapp.com", "netlify.app",
    "vercel.app", "pages.dev", "web.app", "firebaseapp.com",
    # NOTE: bare "amazonaws.com" / "fastly.net" are deliberately NOT
    # here — the real PSL private section only lists specific subtrees
    # (s3.amazonaws.com, *.compute.amazonaws.com, a.ssl.fastly.net, …;
    # those service grains are modeled below in SUFFIXES_3/SUFFIXES_4/
    # WILDCARD_PARENTS_3). A bare entry would make every
    # X.amazonaws.com host its own registered domain, fragmenting
    # politeness budgets and PageRank beyond what the PSL says.
    "azurewebsites.net", "cloudfront.net",
    "wordpress.com", "glitch.me", "fastlylb.net",
    "readthedocs.io", "onrender.com", "surge.sh", "neocities.org",
)

# Three-label public suffixes (snapshot of the most common): a host
# ending in one of these registers at the FOURTH label from the right.
SUFFIXES_3 = (
    # Australian education / state government
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au",
    "sa.edu.au", "tas.edu.au", "vic.edu.au", "wa.edu.au",
    "act.gov.au", "nsw.gov.au", "nt.gov.au", "qld.gov.au",
    "sa.gov.au", "tas.gov.au", "vic.gov.au", "wa.gov.au",
    # US K-12 convention (state two-letter under k12.<st>.us)
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.wa.us", "k12.il.us",
    "cc.ca.us", "cc.ny.us", "cc.tx.us",
    # AWS service grains (private section). compute/compute-1 are ALSO
    # wildcard parents (WILDCARD_PARENTS_3): listing them here gives an
    # n==4 host that IS a wildcard child its pass-through.
    "s3.amazonaws.com",
    "elb.amazonaws.com", "compute.amazonaws.com",
    "compute-1.amazonaws.com",
    # Fastly service grains (private section, exact entries)
    "freetls.fastly.net", "map.fastly.net", "map.fastlylb.net",
)

# Four-label public suffixes (private-section snapshot): a host ending
# in one of these registers at the FIFTH label from the right.
SUFFIXES_4 = (
    # Fastly TLS/edge service grains: each customer subdomain under
    # these is an unrelated registrant
    "a.ssl.fastly.net", "b.ssl.fastly.net", "global.ssl.fastly.net",
    "a.prod.fastly.net", "global.prod.fastly.net",
)

# --- Wildcard rules (*.<parent>) ------------------------------------------
# Every DIRECT child of a listed parent is itself a public suffix, so a
# host strictly below a child registers one label deeper than the
# explicit-suffix ladder would say. Keyed by the PARENT's label count.
#
# *.ck / *.jm / … (ICANN section): any.ck is a public suffix, so
# foo.bar.ck registers as foo.bar.ck (last 3 labels).
WILDCARD_PARENTS_1 = (
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
)
# Japanese geographic wildcards: *.kawasaki.jp etc. — bar.kawasaki.jp is
# a public suffix, foo.bar.kawasaki.jp registers at the 4th label.
# (These parents also sit in SUFFIXES_2-equivalent position: a host that
# IS bar.kawasaki.jp must pass through, handled by the wildcard ladder's
# n-guards plus the explicit listing below.)
WILDCARD_PARENTS_2 = (
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
)
# Private-section wildcards: *.compute.amazonaws.com — the region label
# is the suffix (us-east-1.compute.amazonaws.com), instances register
# one deeper. The parents themselves stay in SUFFIXES_3 so an n==4 host
# (exactly a wildcard child) passes through unchanged.
WILDCARD_PARENTS_3 = (
    "compute.amazonaws.com", "compute-1.amazonaws.com",
)

# --- Exception rules (!<host>) --------------------------------------------
# Carve-outs from a wildcard: the listed host is NOT a public suffix but
# a registered domain itself. Keyed by the exception's label count.
# !www.ck (ICANN): www.ck is registrable; sub.www.ck registers under it.
EXCEPTION_HOSTS_2 = ("www.ck",)
# !city.<geo>.jp: the city government's own registrable domain.
EXCEPTION_HOSTS_3 = (
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
)
